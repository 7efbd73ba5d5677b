"""Blockwise flash attention for TPU (Pallas).

The fused softmax(QKᵀ)·V path of MultiHeadAttention (ops/attention.py):
one kernel computes attention without materializing the [Tq, Tk] score
matrix in HBM — scores live in VMEM one (BQ, BK) tile at a time with the
online-softmax running max/denominator recurrence.  Replaces the reference's
unfused matmul→masked_fill→softmax→dropout→matmul chain (reference
transformer_layers.py:486-532) at the kernel level.

Written blockwise over the key dimension so the same machinery extends to
ring attention over a ``seq`` mesh axis later (SURVEY.md §5 — a non-goal for
parity; the hook is the k-block loop).

Shapes: q [B, Tq, H, D], k/v [B, Tk, H, D], mask bool broadcastable to
[B, 1|H, 1|Tq, Tk] (True = masked).  Sequence dims are padded to the block
size inside the wrapper; padded keys are masked, padded queries discarded.
Runs in interpret mode automatically off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, acc_ref, m_ref, l_ref,
            *, scale: float, num_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                       # [BQ, D]
    k = k_ref[0]                       # [BK, D]
    v = v_ref[0]                       # [BK, D]
    s = jax.lax.dot_general(           # [BQ, BK] in f32
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask_ref[0], NEG_INF, s)

    m_prev = m_ref[:]                  # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)             # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)    # [BQ, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        # fully-masked rows (padded queries) have l == 0; emit zeros
        l = l_ref[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    block_q: int = 128, block_k: int = 128,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Returns attention context [B, Tq, H, D].

    q is expected pre-scaled by 1/sqrt(D) upstream? No — this kernel applies
    the 1/sqrt(D) scale itself iff the caller passes raw q; ops/attention.py
    pre-scales, so it calls with scale folded (see ``_SCALE_APPLIED``).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, tq, h, d = q.shape
    tk = k.shape[1]

    # layout: fold heads into batch, seq-major blocks
    qf = _pad_to(q.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 1, block_q)
    kf = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 1, block_k)
    vf = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 1, block_k)
    tqp, tkp = qf.shape[1], kf.shape[1]

    # materialize the mask at [B, tqp, tkp] (True = masked); padded keys on
    if mask is None:
        m = jnp.zeros((b, 1, 1, tk), dtype=bool)
    else:
        m = mask
    m = jnp.broadcast_to(m, (b, m.shape[1], tq if m.shape[2] != 1 else 1, tk))
    m = m[:, 0] if m.shape[1] == 1 else m.any(axis=1)
    m = jnp.broadcast_to(m, (b, tq, tk)) if m.shape[1] != tq else m
    m = _pad_to(_pad_to(m, 1, block_q, True), 2, block_k, True)

    num_q = tqp // block_q
    num_k = tkp // block_k
    grid = (b * h, num_q, num_k)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0, num_k_blocks=num_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_k),
                         lambda bh, qi, ki: (bh // h, qi, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tqp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, m)

    out = out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out
