"""Mixture-of-Experts feed-forward with expert parallelism.

Capability EXTENSION over the reference (no MoE anywhere in
nihirv/blt-vqg — SURVEY.md §2.4 "EP: no MoE"): a drop-in replacement for
``PositionwiseFeedForward`` (reference transformer_layers.py:367-408
capability) that scales FFN parameters without scaling per-token FLOPs,
designed TPU-first:

- **static shapes, dense dispatch**: routing is expressed as einsums
  against one-hot dispatch/combine tensors (the GShard/Switch pattern for
  XLA), so every op is an MXU matmul — no dynamic gathers, no
  data-dependent shapes, nothing the compiler can't tile;
- **expert parallelism by annotation**: expert-stacked kernels
  ``[E, D, F]`` shard their leading dim over an ``expert`` mesh axis
  (parallel/sharding.py rules); GSPMD inserts the token all-to-alls from
  the shardings alone — no hand-written communication, the same
  scaling-book recipe the rest of parallel/ follows;
- **top-1 (Switch) or top-k (GShard) routing** with a static per-expert
  capacity; overflowing tokens are dropped (their layer output is the
  residual alone) — the standard fixed-capacity contract that keeps the
  program shape-static under jit;
- **load-balance + router-z auxiliary losses** sown into the ``"moe"``
  collection; the train step adds them when the collection is mutable
  (train/step.py), decode/eval applies leave them unrecorded for free.

Routing math follows the Switch Transformer (Fedus et al., 2021) and
GShard (Lepikhin et al., 2020) conventions: gates are the raw top-1
router probability for k=1 (so the gate path itself carries router
gradient) and are renormalized over the selected k for k>1; the balance
loss is ``E · Σ_e f_e · p_e`` with f from first choices; capacity is
``ceil(cf · k · S / E)``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def expert_capacity(num_tokens: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-expert slot count: ceil(cf · k · S / E), clamped to
    [1, S]."""
    cap = int(-(-capacity_factor * top_k * num_tokens // num_experts))
    return max(1, min(cap, num_tokens))


def route_tokens(probs: jnp.ndarray, top_k: int, capacity: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure routing: router probabilities → (dispatch, combine) tensors.

    probs [S, E] (f32, rows sum to 1) → dispatch [S, E, C] one-hot mask of
    (expert, slot) assignments and combine [S, E, C] = dispatch · gate.

    Slots are claimed in token order (position = running count of earlier
    tokens choosing the same expert), with all first choices ranked before
    any second choice — the GShard priority rule, so a token's primary
    expert is never displaced by another token's backup.  Assignments past
    ``capacity`` are dropped (zero rows in both tensors).  Everything is
    one_hot/cumsum/compare — static shapes, fully vectorized.
    """
    s, e = probs.shape
    gates, idx = jax.lax.top_k(probs, top_k)            # [S, K]
    if top_k > 1:
        # GShard-style renormalization over the selected experts
        gates = gates / jnp.maximum(
            jnp.sum(gates, axis=-1, keepdims=True), 1e-9)
    dispatch = jnp.zeros((s, e, capacity), probs.dtype)
    combine = jnp.zeros((s, e, capacity), probs.dtype)
    counts = jnp.zeros((e,), jnp.int32)                 # slots already claimed
    for j in range(top_k):
        oh = jax.nn.one_hot(idx[:, j], e, dtype=jnp.int32)      # [S, E]
        pos = jnp.cumsum(oh, axis=0) - oh + counts[None, :]     # [S, E]
        pos_j = jnp.sum(pos * oh, axis=-1)                      # [S]
        keep = pos_j < capacity
        slot = jax.nn.one_hot(pos_j, capacity, dtype=probs.dtype)  # [S, C]
        sel = (oh.astype(probs.dtype) * keep[:, None].astype(probs.dtype))
        d_j = sel[:, :, None] * slot[:, None, :]                # [S, E, C]
        dispatch = dispatch + d_j
        combine = combine + d_j * gates[:, j][:, None, None]
        counts = counts + jnp.sum(oh, axis=0)
    return dispatch, combine


def balance_loss(probs: jnp.ndarray, top1: jnp.ndarray) -> jnp.ndarray:
    """Switch load-balance loss: E · Σ_e f_e · p_e — equals 1.0 at perfect
    uniformity, grows as routing concentrates.  ``top1`` [S] are the
    first-choice expert ids (the dispatch fractions are computed from
    choices, the probabilities from the full softmax, so the product is
    differentiable through p)."""
    e = probs.shape[-1]
    f = jnp.mean(jax.nn.one_hot(top1, e, dtype=probs.dtype), axis=0)
    p = jnp.mean(probs, axis=0)
    return e * jnp.sum(f * p)


class MoEFeedForward(nn.Module):
    """Mixture-of-experts positionwise FFN (see module docstring).

    Parameter layout (the expert-parallel contract, parallel/sharding.py):
      router/kernel      [D, E]      — replicated (tiny)
      expert_in/kernel   [E, D, F]   — P("expert", None, "model")
      expert_in/bias     [E, F]      — P("expert", None)
      expert_out/kernel  [E, F, D]   — P("expert", "model", None)
      expert_out/bias    [E, D]      — P("expert", None)
    """
    hidden_dim: int
    pwffn_dim: int                 # per-expert FFN width
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    activation: str = "relu"
    router_noise: float = 0.0      # stddev of train-time routing jitter

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        d, f, e = self.hidden_dim, self.pwffn_dim, self.num_experts
        act = nn.gelu if self.activation == "gelu" else nn.relu
        orig_shape = x.shape
        tokens = x.reshape(-1, d)                       # [S, D]
        s = tokens.shape[0]

        # --- router (f32: softmax over logits wants the mantissa) ---
        w_router = self.param(
            "router", nn.initializers.normal(0.02), (d, e), jnp.float32)
        logits = tokens.astype(jnp.float32) @ w_router  # [S, E]
        if self.router_noise > 0.0 and not deterministic:
            logits = logits + self.router_noise * jax.random.normal(
                self.make_rng("dropout"), logits.shape, jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)

        cap = expert_capacity(s, e, self.top_k, self.capacity_factor)
        dispatch, combine = route_tokens(probs, self.top_k, cap)

        # --- auxiliary losses, recorded only when "moe" is mutable ---
        self.sow("moe", "balance",
                 balance_loss(probs, jnp.argmax(probs, axis=-1)))
        self.sow("moe", "router_z",
                 jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1))))

        # --- expert FFNs on dense [E, C, D] blocks (all MXU) ---
        def per_expert(init):
            # independent fan-in-scaled init per expert slice
            def f(key, shape, dtype=jnp.float32):
                return jax.vmap(lambda k: init(k, shape[1:], dtype))(
                    jax.random.split(key, shape[0]))
            return f

        scale_in = nn.initializers.variance_scaling(1.0, "fan_in",
                                                    "truncated_normal")
        w_in = self.param("expert_in", per_expert(scale_in), (e, d, f))
        b_in = self.param("expert_in_bias", nn.initializers.zeros, (e, f))
        w_out = self.param("expert_out", per_expert(scale_in), (e, f, d))
        b_out = self.param("expert_out_bias", nn.initializers.zeros, (e, d))

        dt = self.dtype
        xin = jnp.einsum("sec,sd->ecd", dispatch.astype(dt),
                         tokens.astype(dt))             # [E, C, D]
        h = act(jnp.einsum("ecd,edf->ecf", xin, w_in.astype(dt))
                + b_in[:, None, :].astype(dt))          # [E, C, F]
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = (jnp.einsum("ecf,efd->ecd", h, w_out.astype(dt))
               + b_out[:, None, :].astype(dt))          # [E, C, D]
        y = jnp.einsum("sec,ecd->sd", combine.astype(dt), out)
        return y.reshape(orig_shape)
