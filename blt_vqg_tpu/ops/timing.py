"""Sinusoidal "timing signal" positional encoding.

Tensor2tensor layout — sin for the first half of channels, cos for the
second half, concatenated (NOT interleaved) — matching reference
models/transformer_layers.py:542-557.  Computed with jnp so it constant-folds
into the compiled program; no host table to ship.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timing_signal(length: int, channels: int,
                  min_timescale: float = 1.0,
                  max_timescale: float = 1.0e4,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Returns [1, length, channels]."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_timescale_increment = (
        math.log(max_timescale / min_timescale) / max(num_timescales - 1, 1))
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_timescale_increment)
    scaled_time = position[:, None] * inv_timescales[None, :]
    signal = jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)
    if channels % 2:
        signal = jnp.pad(signal, ((0, 0), (0, 1)))
    return signal[None].astype(dtype)
