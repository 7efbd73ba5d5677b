"""Multi-head attention, TPU-first.

Replaces the reference's hand-rolled MHA (reference
models/transformer_layers.py:412-532) with an einsum formulation XLA maps
straight onto the MXU, plus:

- computation in ``dtype`` (bfloat16 by default) with f32 softmax
  accumulation (``preferred_element_type``) — the numerically safe MXU recipe;
- an explicit single-step decode path over a KV cache (the reference re-runs
  the decoder over the whole growing prefix every step, reference
  iq.py:134-143 — linear vs. quadratic work);
- head-parallel parameter naming (q/k/v/out_proj) that the sharding rules in
  parallel/sharding.py partition over the ``model`` mesh axis;
- optional Pallas flash-attention kernel for the fused softmax(QK^T)V path.

Mask convention: True = masked (see ops/masks.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from blt_vqg_tpu.ops.masks import MASK_FILL


class MultiHeadAttention(nn.Module):
    hidden_dim: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    causal: bool = False  # decoder self-attention: mask j > i structurally
    # sequence parallelism: when a mesh with ``seq_axis`` is given, full
    # attention whose length divides the axis runs as ring attention
    # (ops/ring_attention.py) with Q resident and K/V rotating over ICI;
    # shapes that don't divide (or dropout-active calls) fall back to the
    # einsum path — a Python-time decision, so each jitted program is static
    ring_mesh: Optional[object] = None
    seq_axis: str = "seq"
    # "xla": ppermute-per-hop (ops/ring_attention.py, differentiable
    # directly); "pallas": RDMA inner loop — one kernel per device, hops
    # overlap compute (ops/pallas/ring_attention.py, custom-VJP backward)
    ring_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    def setup(self):
        dense = lambda name: nn.Dense(
            self.hidden_dim, use_bias=False, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.dropout = nn.Dropout(self.dropout_rate)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.head_dim)

    def __call__(self, q_in: jnp.ndarray, kv_in: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """Full attention. q_in [B,Tq,D], kv_in [B,Tk,D].

        ``mask`` is a key-padding mask [B|1, 1, 1, Tk] (True = masked); when
        ``self.causal`` the j>i constraint is added structurally — the
        Pallas path never materializes it, the XLA path ORs it in.
        """
        q = self._split(self.q_proj(q_in)) * (self.head_dim ** -0.5)
        k = self._split(self.k_proj(kv_in))
        v = self._split(self.v_proj(kv_in))

        ring_n = (self.ring_mesh.shape.get(self.seq_axis, 1)
                  if self.ring_mesh is not None else 1)
        use_ring = (ring_n > 1
                    and q_in.shape[1] == kv_in.shape[1]
                    and q_in.shape[1] % ring_n == 0
                    and (mask is None or mask.shape[2] == 1)
                    and (self.dropout_rate == 0.0 or deterministic))
        use_pallas = (self.use_pallas and not use_ring
                      and (mask is None or mask.shape[2] == 1)
                      and (self.dropout_rate == 0.0 or deterministic))
        if use_ring:
            from blt_vqg_tpu.ops.ring_attention import ring_attention
            kv_pad = None if mask is None else jnp.broadcast_to(
                mask[:, 0, 0, :], (kv_in.shape[0], kv_in.shape[1]))
            names = self.ring_mesh.shape
            ctx = ring_attention(
                q, k, v, self.ring_mesh, axis=self.seq_axis,
                causal=self.causal, kv_pad=kv_pad,
                # batches/heads are independent: keep their DP/TP shardings
                # across the shard_map boundary (no extra collectives)
                batch_axis=("data" if "data" in names
                            and q_in.shape[0] % names["data"] == 0
                            else None),
                head_axis=("model" if "model" in names
                           and self.num_heads % names["model"] == 0
                           else None),
                impl=self.ring_impl)
        elif use_pallas:
            from blt_vqg_tpu.ops.pallas.flash_attention import flash_attention
            kv_pad = None if mask is None else jnp.broadcast_to(
                mask[:, 0, 0, :], (kv_in.shape[0], kv_in.shape[1]))
            ctx = flash_attention(q, k, v, kv_pad, causal=self.causal)
        else:
            if self.causal:
                from blt_vqg_tpu.ops.masks import causal_mask
                cm = causal_mask(kv_in.shape[1])[:, :, :q_in.shape[1], :]
                mask = cm if mask is None else jnp.logical_or(mask, cm)
            # [B,H,Tq,Tk] logits in f32 for a stable softmax
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            if mask is not None:
                logits = jnp.where(mask, MASK_FILL, logits)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            # interpretability tap (the reference plumbs attn_dist returns,
            # transformer_layers.py:514, unused upstream): opt in with
            # model.apply(..., mutable=["intermediates"]) — free otherwise
            # (DCE removes the sow when intermediates aren't requested)
            self.sow("intermediates", "attn_weights", weights)
            weights = self.dropout(weights, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, v)

        b, tq = q_in.shape[0], q_in.shape[1]
        return self.out_proj(ctx.reshape(b, tq, self.hidden_dim))

    # ---- decode path: explicit KV cache ----

    def kv(self, kv_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute K/V ([B,Tk,H,Dh] each) — for cross-attention caching."""
        return self._split(self.k_proj(kv_in)), self._split(self.v_proj(kv_in))

    def attend_cached(self, q_in: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Attention against precomputed K/V. q_in [B,1,D] (or [B,Tq,D])."""
        q = self._split(self.q_proj(q_in)) * (self.head_dim ** -0.5)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, MASK_FILL, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        b, tq = q_in.shape[0], q_in.shape[1]
        return self.out_proj(ctx.reshape(b, tq, self.hidden_dim))

    def step(self, q_in: jnp.ndarray, cache_k: jnp.ndarray,
             cache_v: jnp.ndarray, pos: jnp.ndarray,
             key_pad: Optional[jnp.ndarray] = None,
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One self-attention decode step.

        q_in [B,1,D] is the current position's input; its K/V are written
        into the caches ([B,L,H,Dh]) at ``pos``; attention spans positions
        <= pos (future slots masked by position index, so cache garbage past
        ``pos`` never contributes).  ``key_pad`` [B, L] bool additionally
        masks keys whose *token* was <pad> — the reference's decode masks
        the pad seed and any emitted pad this way (generate_pad_mask over
        the grown prefix, reference decoder_transformer.py:44 +
        transformer_layers.py:205-207); plain positional masking is the
        non-compat default.
        Returns (context [B,1,D], new_cache_k, new_cache_v).

        Q/K/V are computed as ONE fused [D, 3D] matmul: the kernel concat is
        loop-invariant, so XLA hoists it out of the decode scan and the MXU
        sees a single wide GEMM per layer instead of three skinny ones.
        """
        wq = self.q_proj.variables["params"]["kernel"]
        wk = self.k_proj.variables["params"]["kernel"]
        wv = self.v_proj.variables["params"]["kernel"]
        w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
        qkv = q_in.astype(self.dtype) @ w                # [B,1,3D]
        q_f, k_f, v_f = jnp.split(qkv, 3, axis=-1)
        k_t = self._split(k_f)                            # [B,1,H,Dh]
        v_t = self._split(v_f)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t, pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t, pos, axis=1)

        q = self._split(q_f) * (self.head_dim ** -0.5)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, cache_k,
                            preferred_element_type=jnp.float32)
        l = cache_k.shape[1]
        future = jnp.arange(l)[None, None, None, :] > pos
        # future slots get a strictly lower fill than pad-masked keys: when
        # EVERY visible key is pad (the reference's row-0-with-pad-seed
        # case), softmax then degenerates to uniform over the visible
        # prefix exactly like the reference's all--1e18 row
        # (transformer_layers.py:504-506) instead of leaking cache garbage
        logits = jnp.where(future, 1e3 * MASK_FILL, logits)
        if key_pad is not None:
            logits = jnp.where(key_pad[:, None, None, :], MASK_FILL, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, cache_v)
        out = self.out_proj(ctx.reshape(q_in.shape[0], 1, self.hidden_dim))
        return out, cache_k, cache_v
