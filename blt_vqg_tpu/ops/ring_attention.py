"""Ring attention: sequence-parallel attention over a ``seq`` mesh axis.

The long-context extension SURVEY.md §5 marks as the natural follow-on to
the blockwise flash kernel: the sequence dimension is sharded across
devices; each device keeps its local Q shard resident and the K/V shards
rotate around the ring (``lax.ppermute`` over ICI), one hop per step, while
an online-softmax accumulator (running max / denominator — the same
recurrence as ops/pallas/flash_attention.py) combines the partial attention
from each visiting block.  Peak memory per device is O(T/N · T/N) scores
and the full [T, T] matrix never exists anywhere.

Not needed for reference parity (sequences ≤ 23 tokens) — this is the
scaling path for long-context variants.  Runs under ``shard_map`` on any
mesh axis; tested against full attention on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "data",
                   causal: bool = False,
                   kv_pad: Optional[jnp.ndarray] = None,
                   batch_axis: Optional[str] = None,
                   head_axis: Optional[str] = None,
                   impl: str = "xla") -> jnp.ndarray:
    """Sequence-parallel attention.

    q/k/v [B, T, H, D] with T sharded over ``axis`` (q pre-scaled by
    1/sqrt(D) upstream).  ``kv_pad`` [B, T] bool (True = masked) is the
    key-padding mask; its shards rotate around the ring with K/V.
    Returns [B, T, H, D] sharded the same way.

    ``batch_axis``/``head_axis`` (optional) keep the batch and head dims
    sharded over those mesh axes across the shard_map boundary — batches
    and heads are independent in attention, so DP×TP×SP compose with no
    extra collectives (the ppermute rides only the ``axis`` ring).
    """
    n = mesh.shape[axis]
    t = q.shape[1]
    assert t % n == 0, f"seq len {t} must divide the {axis} axis size {n}"
    chunk = t // n
    if kv_pad is None:
        kv_pad = jnp.zeros((q.shape[0], t), bool)
    kv_pad = jnp.broadcast_to(kv_pad, (q.shape[0], t))

    if impl == "pallas":
        return _make_pallas_ring(mesh, axis, causal, batch_axis, head_axis)(
            q, k, v, kv_pad)
    assert impl == "xla", impl

    spec = P(batch_axis, axis, head_axis, None)
    pad_spec = P(batch_axis, axis)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec, pad_spec),
        out_specs=spec, check_vma=False)

    def _ring(q_l, k_l, v_l, pad_l):
        # local shapes [B, chunk, H, D]
        b, c, h, d = q_l.shape
        my = jax.lax.axis_index(axis)
        q_offset = my * chunk

        acc0 = jnp.zeros((b, c, h, d), jnp.float32)
        m0 = jnp.full((b, h, c, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, c, 1), jnp.float32)

        def body(step, carry):
            acc, m, l, k_cur, v_cur, pad_cur = carry
            # the block visiting at this step originated on device my - step
            src = (my - step) % n
            k_offset = src * chunk

            def upd(args):
                acc, m, l = args
                s = jnp.einsum("bqhd,bkhd->bhqk", q_l, k_cur,
                               preferred_element_type=jnp.float32)
                s = jnp.where(pad_cur[:, None, None, :], NEG_INF, s)
                if causal:
                    rows = q_offset + jnp.arange(c)[:, None]
                    cols = k_offset + jnp.arange(c)[None, :]
                    s = jnp.where((cols > rows)[None, None], NEG_INF, s)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m, m_cur)
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l2 = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                # acc [B, C, H, D]; alpha [B, H, C, 1] -> [B, C, H, 1]
                acc2 = acc * jnp.transpose(alpha, (0, 2, 1, 3)) + jnp.einsum(
                    "bhqk,bkhd->bqhd", p.astype(v_cur.dtype), v_cur)
                return acc2, m_new, l2

            # causal: skip blocks that are entirely in the future
            if causal:
                block_live = k_offset <= q_offset + c - 1
                acc, m, l = jax.lax.cond(
                    block_live, upd, lambda a: a, (acc, m, l))
            else:
                acc, m, l = upd((acc, m, l))

            # rotate k/v (+ their pad shard) to the next device (one ICI hop)
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            pad_nxt = jax.lax.ppermute(pad_cur, axis, perm)
            return acc, m, l, k_nxt, v_nxt, pad_nxt

        acc, m, l, _, _, _ = jax.lax.fori_loop(
            0, n, body, (acc0, m0, l0, k_l, v_l, pad_l))
        l_t = jnp.transpose(l, (0, 2, 1, 3))            # [B, C, H, 1]
        safe = jnp.where(l_t == 0.0, 1.0, l_t)
        return (acc / safe).astype(q_l.dtype)

    return _ring(q, k, v, kv_pad)


@functools.lru_cache(maxsize=32)
def _make_pallas_ring(mesh: Mesh, axis: str, causal: bool,
                      batch_axis: Optional[str], head_axis: Optional[str]):
    """RDMA-inner-loop ring attention (ops/pallas/ring_attention.py).

    One Pallas kernel per device, bidirectional: K/V rotate chip-to-chip
    BOTH ways via ``make_async_remote_copy`` with hops in flight during
    block compute — ceil(n/2) hops on both ICI directions instead of the
    XLA path's n-1 ppermutes.  Backward is a second bidirectional ring
    kernel (FlashAttention-2 recurrence from saved (m, l) softmax
    residuals — no recompute): each stream's dK/dV riders accumulate
    per-device contributions and return home by direct RDMA; dQ
    accumulates locally.
    """
    from blt_vqg_tpu.ops.pallas.ring_attention import (
        ring_attention_bwd_bidir_shard, ring_attention_fwd_bidir_shard)

    n = mesh.shape[axis]
    spec = P(batch_axis, axis, head_axis, None)
    pad_spec = P(batch_axis, axis)
    res_spec = P(batch_axis, axis, head_axis)  # per-row m / l residuals
    fwd_sharded = shard_map(
        functools.partial(ring_attention_fwd_bidir_shard, axis=axis, n=n,
                          causal=causal, return_lse=True),
        mesh=mesh, in_specs=(spec, spec, spec, pad_spec),
        out_specs=(spec, res_spec, res_spec), check_vma=False)
    bwd_sharded = shard_map(
        functools.partial(ring_attention_bwd_bidir_shard, axis=axis, n=n,
                          causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec, pad_spec, spec, res_spec, res_spec,
                  spec),
        out_specs=(spec, spec, spec), check_vma=False)

    @jax.custom_vjp
    def f(q, k, v, pad):
        return fwd_sharded(q, k, v, pad)[0]

    def fwd(q, k, v, pad):
        o, m, l = fwd_sharded(q, k, v, pad)
        return o, (q, k, v, pad, o, m, l)

    def bwd(res, g):
        q, k, v, pad, o, m, l = res
        dq, dk, dv = bwd_sharded(q, k, v, pad, o, m, l, g)
        return dq, dk, dv, np.zeros(pad.shape, jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f
