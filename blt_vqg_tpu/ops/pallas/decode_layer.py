"""Fused per-layer decode step (Pallas): the serial-chain diet.

Greedy/beam decode is bound by op LATENCY on its strictly sequential
dependency chain, not FLOPs or bandwidth (benchmarks/METHODOLOGY.md): the
XLA decode step issues ~15 small dependent ops per decoder layer
(LN → fused-QKV GEMM → cache update → attention → out-proj → residual →
LN → cross-attention → residual → LN → FFN → residual), each paying
dispatch/latency that cannot overlap.  These two kernels collapse a layer
to TWO fused ops (VMEM is ~16 MB/core, so one kernel cannot hold all
~20 MB of a flagship layer's weights):

- ``self_attn_step``: grid over heads; per head it re-does the (cheap) LN,
  computes the fused QKV slice, writes K/V into the caches in place
  (``input_output_aliases``), attends causally over the cache, and
  accumulates the output projection into ``x + Σ_h ctx_h·W_out_h``.
- ``cross_ffn_step``: LN → cross-attention over the (tiny, precomputed)
  encoder K/V → out-proj → residual → LN → FFN(+biases) → residual, all
  heads at once (~12.5 MB of weights in VMEM).

Replaces the reference's per-step full-prefix re-encode
(reference iq.py:134-143, models/decoder_transformer.py:43-48) at the
kernel level; the XLA KV-cache path (ops/attention.py step) remains the
default (`use_pallas_decode` opts in).  Runs in interpret mode off-TPU so
CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blt_vqg_tpu.ops.masks import MASK_FILL

NEG_INF = -1e30
# pad-masked keys fill: strictly higher than the future fill so degenerate
# all-pad rows match the XLA decode step.  Imported from ops/masks so the
# three decode paths (XLA step / per-layer kernel / stream kernel) cannot
# silently diverge if the fill value changes.
PAD_FILL = MASK_FILL
assert PAD_FILL > NEG_INF, "pad fill must sit strictly above the future fill"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _layernorm(x, scale, bias, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


# ======================================================================
# kernel 1: fused LN + QKV + cache update + causal cached attention
#           + accumulated out-projection + residual, grid over heads

def _self_attn_kernel(pos_ref, x_ref, ls_ref, lb_ref, wqkv_ref, wout_ref,
                      ck_in_ref, cv_in_ref, *rest,
                      head_dim: int, dtype, has_kp: bool = False):
    if has_kp:
        kp_ref, out_ref, ck_ref, cv_ref = rest
    else:
        kp_ref = None
        out_ref, ck_ref, cv_ref = rest
    h = pl.program_id(0)
    pos = pos_ref[0]
    del ck_in_ref, cv_in_ref  # aliased with ck_ref/cv_ref (in-place caches)

    xn = _layernorm(x_ref[:], ls_ref[0], lb_ref[0])          # [B, D] f32
    qkv = jax.lax.dot_general(                                # [B, 3*Dh] f32
        xn.astype(dtype), wqkv_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    q = qkv[:, :head_dim] * (head_dim ** -0.5)
    k = qkv[:, head_dim:2 * head_dim]
    v = qkv[:, 2 * head_dim:]

    # in-place cache write at pos.  Cache layout is [H, L, B, Dh]: the
    # dynamic ``pos`` index lands in an UNTILED leading dim (Mosaic cannot
    # store at a dynamic sublane offset inside the tiled trailing dims),
    # and the tiled dims stay (B, Dh) — no size-1 sublane padding.
    ck_ref[0, pl.ds(pos, 1), :, :] = k.astype(ck_ref.dtype)[None]
    cv_ref[0, pl.ds(pos, 1), :, :] = v.astype(cv_ref.dtype)[None]

    kc = ck_ref[0].astype(jnp.float32)                        # [L, B, Dh]
    vc = cv_ref[0].astype(jnp.float32)
    l = kc.shape[0]
    s = jnp.sum(q[None, :, :] * kc, axis=-1)                  # [L, B] f32
    future = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0) > pos
    s = jnp.where(future, NEG_INF, s)
    if kp_ref is not None:
        # reference-style pad-token key masking (compat_decode_pad_mask):
        # the pad fill is strictly HIGHER than the future fill, so an
        # all-pad visible prefix degenerates to uniform over the visible
        # keys exactly like the XLA step (ops/attention.py:188-196)
        s = jnp.where(kp_ref[:] != 0.0, PAD_FILL, s)
    w = jax.nn.softmax(s, axis=0)
    ctx = jnp.sum(w[:, :, None] * vc, axis=0)                 # [B, Dh]
    partial = jax.lax.dot_general(                            # [B, D] f32
        ctx.astype(dtype), wout_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(h == 0)
    def _():
        out_ref[:] = (x_ref[:].astype(jnp.float32)
                      + partial).astype(out_ref.dtype)

    @pl.when(h > 0)
    def _():
        out_ref[:] = (out_ref[:].astype(jnp.float32)
                      + partial).astype(out_ref.dtype)


def self_attn_step(x, ln_scale, ln_bias, w_qkv, w_out, cache_k, cache_v,
                   pos, num_heads: int, key_pad=None):
    """x [B, D]; w_qkv [H, D, 3*Dh] (per-head column slices of the fused
    [D, 3D] kernel); w_out [H, Dh, D]; caches [H, L, B, Dh] (see kernel
    comment on the layout) updated in place at ``pos``.  ``key_pad``
    [L, B] f32 (nonzero = pad) adds reference-style pad-token key masking
    (compat_decode_pad_mask; ops/attention.py step semantics).  Returns
    (x + self_attention(LN(x)), new_k, new_v).
    """
    b, d = x.shape
    l = cache_k.shape[1]
    head_dim = d // num_heads
    dtype = x.dtype
    pos = jnp.asarray(pos, jnp.int32).reshape(1)

    grid = (num_heads,)
    out_shape = (
        jax.ShapeDtypeStruct((b, d), x.dtype),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    )
    full = lambda *s: pl.BlockSpec(s, lambda h: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    head4 = pl.BlockSpec((1, l, b, head_dim), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_self_attn_kernel, head_dim=head_dim,
                               dtype=dtype, has_kp=key_pad is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # pos
        full(b, d),                                       # x
        full(1, d), full(1, d),                           # ln scale/bias
        pl.BlockSpec((1, d, 3 * head_dim), lambda h: (h, 0, 0),
                     memory_space=pltpu.VMEM),            # w_qkv
        pl.BlockSpec((1, head_dim, d), lambda h: (h, 0, 0),
                     memory_space=pltpu.VMEM),            # w_out
        head4, head4,                                     # caches (in)
    ]
    args = [pos, x, ln_scale.reshape(1, d), ln_bias.reshape(1, d),
            w_qkv, w_out, cache_k, cache_v]
    if key_pad is not None:
        in_specs.append(full(l, b))                       # pad-key mask
        args.append(key_pad.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(full(b, d), head4, head4),
        out_shape=out_shape,
        input_output_aliases={6: 1, 7: 2},   # caches update in place
        interpret=_interpret(),
    )(*args)


# ======================================================================
# kernel 2: fused LN + cross-attention + residual + LN + FFN + residual

def _cross_ffn_kernel(x_ref, lsc_ref, lbc_ref, wq_ref, ck_ref, cv_ref,
                      mask_ref, woc_ref, lsf_ref, lbf_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                      *, num_heads: int, head_dim: int, dtype):
    x = x_ref[:].astype(jnp.float32)                          # [B, D]
    b = x.shape[0]

    # --- cross attention over the precomputed encoder K/V
    xn = _layernorm(x, lsc_ref[0], lbc_ref[0])
    q = jax.lax.dot_general(                                   # [B, D] f32
        xn.astype(dtype), wq_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    q = q.reshape(b, 1, num_heads, head_dim) * (head_dim ** -0.5)
    ck = ck_ref[:].astype(jnp.float32)                         # [B, Tc, H, Dh]
    cv = cv_ref[:].astype(jnp.float32)
    s = jnp.sum(q * ck, axis=-1)                               # [B, Tc, H]
    s = jnp.where(mask_ref[:][:, :, None] != 0, NEG_INF, s)
    w = jax.nn.softmax(s, axis=1)
    ctx = jnp.sum(w[:, :, :, None] * cv, axis=1)               # [B, H, Dh]
    ctx = ctx.reshape(b, num_heads * head_dim)
    x = x + jax.lax.dot_general(
        ctx.astype(dtype), woc_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # --- FFN
    xn = _layernorm(x, lsf_ref[0], lbf_ref[0])
    h1 = jax.lax.dot_general(
        xn.astype(dtype), w1_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[0], 0.0)
    x = x + jax.lax.dot_general(
        h1.astype(dtype), w2_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[0]
    out_ref[:] = x.astype(out_ref.dtype)


def cross_ffn_step(x, ln_c_scale, ln_c_bias, wq_cross, ck, cv, src_pad,
                   w_out_cross, ln_f_scale, ln_f_bias, w1, b1, w2, b2,
                   num_heads: int):
    """x [B, D]; ck/cv [B, Tc, H, Dh] precomputed cross K/V; src_pad
    [B, Tc] (True/1 = masked).  Returns the layer output after cross
    attention + FFN with residuals (DecoderLayer.step semantics)."""
    b, d = x.shape
    f = w1.shape[1]
    head_dim = d // num_heads
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_cross_ffn_kernel, num_heads=num_heads,
                               head_dim=head_dim, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        in_specs=[vmem()] * 14,
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        interpret=_interpret(),
    )(x, ln_c_scale.reshape(1, d), ln_c_bias.reshape(1, d), wq_cross,
      # int32: Mosaic only supports the [B,Tc]->[B,Tc,1] minor-dim
      # broadcast for 32-bit element types
      ck, cv, src_pad.astype(jnp.int32), w_out_cross,
      ln_f_scale.reshape(1, d), ln_f_bias.reshape(1, d),
      w1, b1.reshape(1, f), w2, b2.reshape(1, d))
