"""Explicit PRNG-key threading.

The reference relies on implicit global CUDA RNG (``torch.randn`` inside the
reparameterization, reference transformer_layers.py:45, and host-side
RandomResizedCrop, train_iq.py:264-272).  On TPU under ``jit`` randomness must
be explicit: every stochastic op receives a key derived by folding the step
counter into a root key, which makes training steps reproducible and
trivially shardable (each device can fold in its own axis index).
"""

from __future__ import annotations

from typing import Dict

import jax


class RngStream:
    """Deterministically derives named per-step keys from one root seed.

    ``RngStream(seed).step_keys(step, "dropout", "latent")`` returns a dict of
    independent keys that depend only on (seed, step, name) — no Python-side
    state, safe to use from restarts/resumes.
    """

    def __init__(self, seed: int):
        self.root = jax.random.key(seed)

    def step_keys(self, step, *names: str) -> Dict[str, jax.Array]:
        base = jax.random.fold_in(self.root, step)
        return {name: jax.random.fold_in(base, _stable_hash(name))
                for name in names}

    def key(self, step) -> jax.Array:
        return jax.random.fold_in(self.root, step)


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per-process; use a stable FNV-1a instead so
    # resumed runs derive identical keys.
    h = 0x811C9DC5
    for b in name.encode():
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h


def split_dict(key: jax.Array, *names: str) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def fold_axis(key: jax.Array, axis_name: str) -> jax.Array:
    """Inside shard_map/pjit: give each device along ``axis_name`` its own key."""
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))
