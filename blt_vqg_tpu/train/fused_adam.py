"""Fused global-norm-clip + Adam + LR + parameter update.

The default optax chain (clip_by_global_norm -> scale_by_adam -> scale(-1)
-> per-leaf LR multiply -> apply_updates) expresses the optimizer as ~9
logical passes over ~1 GB trees; on the flagship config the train step is
HBM-bandwidth-bound (benchmarks/METHODOLOGY.md: 27.1 GB/step vs an ~9 GB
ideal), so every extra materialized tree pass costs real milliseconds.

This module computes the ENTIRE update as one expression per parameter
leaf — clip scale, both Adam moments, bias correction, the Noam LR, and
the parameter add — so XLA fuses it into a single read-modify-write loop
per tensor: read (param, grad, mu, nu) once, write (param, mu, nu) once.
The only extra traffic is the one grad-tree reduction for the global norm
(whose scalar is ALSO the free ``grad_norm`` metric — logging it no longer
costs a separate full-tree pass, cf. core/config.py ``log_grad_norm``).

Numerics are replicated operation-for-operation from the optax 0.2.x chain
(clip trigger/select semantics, moment EMA dtype promotion for bf16 mu,
``1 - decay**count`` bias correction, ``eps`` outside the sqrt) so the
fused path is bit-parity-tested against the chain (tests/test_fused_adam.py).

Reference semantics matched: Adam + global grad-clip 5.0 + per-step LR poke
(reference train_iq.py:259-261, 372, 252-257); the frozen ResNet backbone
carries no moments at all (reference encoder_cnn.py:18-19).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    """Adam moments + step count.  Frozen leaves hold ``optax.MaskedNode``
    (an empty pytree — no HBM, nothing serialized).  ``master`` holds f32
    master copies for leaves stored in bf16 (``cfg.param_dtype=bfloat16``
    mixed-precision diet) — MaskedNode everywhere else.  With
    ``cfg.adam_factored_nu`` the ``nu`` entry of every ≥2-D trainable leaf
    is a ``FactoredNu`` pair instead of a full tensor."""

    count: jnp.ndarray  # int32 scalar
    mu: Any
    nu: Any
    master: Any = optax.MaskedNode()


class FactoredNu(NamedTuple):
    """Adafactor-style factored second moment for one ≥2-D leaf
    (``cfg.adam_factored_nu``, round-5 optimizer diet).

    The f32 ν tensor is the bandwidth-floored term the attribution probe
    cannot diet away without changing numerics (benchmarks/METHODOLOGY.md
    round 5: the fused update measures 10.0 ms ≈ its 6.5 GB analytic
    floor).  Following Shazeer & Stern (Adafactor, 2018), ν of a leaf
    with trailing dims (n, m) is replaced by row/col EMAs of g²:

        r ← b2·r + (1−b2)·Σ_cols g²        shape [..., n]
        c ← b2·c + (1−b2)·Σ_rows g²        shape [..., m]
        ν̂ ≈ (r ⊗ c) / Σ r                 (exact when g² is rank-1)

    Leading dims (the nn.scan layer stacking [L, ...]) batch through.
    1-D leaves (biases, LayerNorms) keep full ν — their bytes are noise.
    This changes optimizer NUMERICS (off by default, like the other diet
    knobs); μ, clipping, bias correction and lr semantics are unchanged.
    """

    r: jnp.ndarray  # EMA of g² summed over the last dim
    c: jnp.ndarray  # EMA of g² summed over the second-to-last dim


def _global_sq_norm(grads_and_masks) -> jnp.ndarray:
    """sum of squares over trainable leaves, optax.global_norm summation
    order (python ``sum`` over tree_leaves order).  bf16 grads (mixed-
    precision storage) are squared in f32; the cast is a no-op for f32."""
    total = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g, frozen in grads_and_masks if not frozen)
    return total


class FusedClipAdam:
    """Drop-in ``tx`` for TrainState (``cfg.fused_adam=True``, the default).

    Carries the same knobs as the optax chain it replaces
    (train/state.py make_optimizer): ``grad_clip``, ``adam_mu_dtype``, and
    the frozen-path mask.  ``init`` mirrors ``tx.init``; the update is the
    single fused pass ``update_params``.
    """

    def __init__(self, grad_clip: float, frozen_fn, mu_dtype=jnp.float32,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                 master_fn=None, factored_nu: bool = False):
        self.grad_clip = float(grad_clip)
        self.frozen_fn = frozen_fn  # path -> bool (static, trace-time)
        self.mu_dtype = jnp.dtype(mu_dtype)
        self.b1 = float(b1)
        self.b2 = float(b2)
        self.eps = float(eps)
        # path -> bool: leaf is STORED bf16 with an f32 master copy here
        # (cfg.param_dtype="bfloat16"); None = pure-f32 storage, no masters
        self.master_fn = master_fn
        # cfg.adam_factored_nu: ≥2-D trainable leaves carry a FactoredNu
        # pair instead of a full ν tensor (round-5 optimizer diet)
        self.factored_nu = bool(factored_nu)

    def _is_factored(self, path, p) -> bool:
        return (self.factored_nu and not self.frozen_fn(path)
                and getattr(p, "ndim", 0) >= 2)

    def _is_master(self, path) -> bool:
        return (self.master_fn is not None and not self.frozen_fn(path)
                and self.master_fn(path))

    # -- tx API used by TrainState.reset_optimizer / create_train_state ----
    def init(self, params) -> FusedAdamState:
        """Call with FULL-PRECISION params (f32) — masters are snapshotted
        from them.  ``TrainState.reset_optimizer`` preserves existing
        masters across the phase-boundary Adam restart."""

        def zeros(path, p, dtype=None):
            if self.frozen_fn(path):
                return optax.MaskedNode()
            if dtype is None and self._is_master(path):
                # Mastered leaves may be STORED bf16 by the time init() is
                # re-invoked (TrainState.reset_optimizer at the phase
                # boundary runs after cast_params), but update_params writes
                # their nu in f32 (the grad is promoted to f32 for master
                # math).  Pin f32 here so the opt_state dtype structure is
                # invariant across the restart — otherwise a
                # steps_per_dispatch>1 lax.scan carry mismatches mid-scan,
                # and steps_per_dispatch=1 silently recompiles.
                dtype = jnp.float32
            return jnp.zeros_like(p, dtype=dtype)

        mu = jax.tree_util.tree_map_with_path(
            lambda pth, p: zeros(pth, p, self.mu_dtype), params)

        def nu_zeros(path, p):
            if self._is_factored(path, p):
                return FactoredNu(
                    r=jnp.zeros(p.shape[:-1], jnp.float32),
                    c=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32))
            return zeros(path, p)

        nu = jax.tree_util.tree_map_with_path(nu_zeros, params)
        master = jax.tree_util.tree_map_with_path(
            lambda pth, p: (p.astype(jnp.float32) if self._is_master(pth)
                            else optax.MaskedNode()), params)
        return FusedAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu,
                              master=master)

    def cast_params(self, params):
        """Storage cast: bf16 for every leaf except the f32-consumed heads
        (the compute already used bf16(param) for these leaves, so the
        forward is value-identical; see train/state.py)."""
        if self.master_fn is None:
            return params
        return jax.tree_util.tree_map_with_path(
            lambda pth, p: (p.astype(jnp.bfloat16)
                            if self._is_master(pth) or self.frozen_fn(pth)
                            else p), params)

    # ----------------------------------------------------------------------
    def update_params(self, params, grads, state: FusedAdamState,
                      lr) -> Tuple[Any, FusedAdamState, jnp.ndarray]:
        """One fused pass: returns (new_params, new_state, grad_norm).

        ``lr`` is the scalar learning rate for this step (the Noam value —
        reference train_iq.py:130, 252-257).
        """
        b1, b2, eps, clip = self.b1, self.b2, self.eps, self.grad_clip

        flat, treedef = jax.tree_util.tree_flatten_with_path(params)
        paths = [p for p, _ in flat]
        frozen = [bool(self.frozen_fn(p)) for p in paths]
        mastered = [self._is_master(p) for p in paths]
        p_leaves = [x for _, x in flat]
        g_leaves = jax.tree_util.tree_leaves(grads)
        mu_leaves, _ = _flatten_masked(state.mu)
        nu_leaves, _ = _flatten_masked(state.nu)
        ms_leaves, _ = _flatten_masked(state.master)
        legacy_master = len(ms_leaves) != len(p_leaves)
        if legacy_master:
            # legacy state built without the master field (bare MaskedNode);
            # the RETURNED state preserves that bare structure (below) so the
            # opt_state pytree is identical between input and output — a
            # changed structure would break a steps_per_dispatch>1 lax.scan
            # carry or force a recompile when resuming old checkpoints.
            ms_leaves = [optax.MaskedNode()] * len(p_leaves)

        # global norm over trainable leaves, optax summation order/formula
        g_norm = jnp.sqrt(_global_sq_norm(zip(g_leaves, frozen)))
        trigger = g_norm < clip  # optax.clip_by_global_norm trigger

        count_inc = jnp.where(state.count < jnp.iinfo(jnp.int32).max,
                              state.count + 1, state.count)  # safe_increment
        bc1 = 1 - b1 ** count_inc  # weak f32, as optax bias_correction
        bc2 = 1 - b2 ** count_inc

        new_p, new_mu, new_nu, new_ms = [], [], [], []
        for p, g, mu, nu, ms, frz, mst in zip(p_leaves, g_leaves, mu_leaves,
                                              nu_leaves, ms_leaves, frozen,
                                              mastered):
            if frz:
                new_p.append(p)
                new_mu.append(optax.MaskedNode())
                new_nu.append(optax.MaskedNode())
                new_ms.append(optax.MaskedNode())
                continue
            # mixed-precision leaves: bf16 grad -> f32 math on the master
            g = g.astype(jnp.float32) if mst else g
            gc = jax.lax.select(
                trigger, g, (g / g_norm.astype(g.dtype)) * clip)
            # moment EMAs exactly as optax.tree.update_moment (bf16 mu:
            # b1*mu computed in mu's dtype, then promoted by the add)
            mu32 = (1 - b1) * gc + b1 * mu
            mu_hat = mu32 / bc1.astype(mu32.dtype)
            if isinstance(nu, FactoredNu):
                # Adafactor second moment (see FactoredNu): row/col EMAs
                # of g², rank-1 reconstruction, same bias correction
                g2 = gc.astype(jnp.float32) ** 2
                r1 = b2 * nu.r + (1 - b2) * jnp.sum(g2, axis=-1)
                c1 = b2 * nu.c + (1 - b2) * jnp.sum(g2, axis=-2)
                denom = jnp.maximum(
                    jnp.sum(r1, axis=-1)[..., None, None], 1e-30)
                nu_hat = (r1[..., :, None] * c1[..., None, :] / denom
                          / bc2)
                nu1 = FactoredNu(r1, c1)
            else:
                nu1 = (1 - b2) * (gc ** 2) + b2 * nu
                nu_hat = nu1 / bc2.astype(nu1.dtype)
            u = mu_hat / (jnp.sqrt(nu_hat) + eps)
            # scale(-1) -> lr multiply -> apply_updates, collapsed; IEEE
            # sign symmetry of multiply keeps this bitwise equal to the
            # chain's lr * (-u) then p + (.)
            step = (lr * u.astype(jnp.float32)).astype(u.dtype)
            if mst:
                ms1 = ms - step
                new_p.append(ms1.astype(p.dtype))
                new_ms.append(ms1)
            else:
                new_p.append((p - step).astype(p.dtype))
                new_ms.append(optax.MaskedNode())
            new_mu.append(mu32.astype(self.mu_dtype))
            new_nu.append(nu1)

        # unflatten over the params treedef: MaskedNode values land at leaf
        # positions, reproducing exactly the structure init() builds
        uf = lambda vals: jax.tree_util.tree_unflatten(treedef, vals)
        st = FusedAdamState(
            count=count_inc, mu=uf(new_mu), nu=uf(new_nu),
            master=state.master if legacy_master else uf(new_ms))
        return uf(new_p), st, g_norm


def _flatten_masked(tree):
    """Flatten keeping MaskedNode placeholders (and FactoredNu pairs) as
    single leaves so the moment lists align 1:1 with the param leaves."""
    return jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, (optax.MaskedNode,
                                               FactoredNu)))


def global_norm(tree) -> jnp.ndarray:
    """optax.global_norm formula (shared by the unfused metric path)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))
