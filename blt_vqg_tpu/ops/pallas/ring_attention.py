"""Ring attention with an RDMA inner loop (Pallas, TPU).

The Pallas upgrade of ops/ring_attention.py: instead of one ``lax.ppermute``
per hop — which serializes "rotate K/V, then compute" at the XLA level —
each device runs ONE kernel for the whole ring.  K/V (+ the key-padding
shard) rotate via ``pltpu.make_async_remote_copy`` (inter-chip RDMA over
ICI) into double-buffered VMEM slots, so the hop for step s+1 is in flight
*while* step s's block attention runs on the MXU: communication hides
behind compute instead of bracketing it.

Synchronization (the part ppermute gave for free):

- per-hop send/recv DMA semaphores — ``rdma.wait()`` at the end of a step
  guarantees the outgoing slot is drained and the incoming block landed;
- a credit (REGULAR) semaphore for flow control: a device may only
  overwrite its right neighbor's slot after the neighbor *consumed* it
  (signaled to the left at slot-free time).  Without credits a fast device
  laps a slow one and clobbers an unconsumed block — the classic
  double-buffer race; the interpreter's semaphore checker catches it.

Softmax state (running max / denominator / accumulator, all f32 in VMEM)
follows the same online recurrence as ops/pallas/flash_attention.py; the
[T, T] score matrix never exists, globally or locally.

Scope: grid (ring_steps, B·H) per device, whole local shards resident in
VMEM (local chunk × B·H that fits VMEM; comm slots + q/k/v/o + f32
accumulators).  ring_attention(impl="pallas") installs the BIDIRECTIONAL
pair: forward and backward each complete in ceil(n/2) hops using both ICI
directions, with the backward running the FlashAttention-2 recurrence
from saved (m, l) softmax residuals — each stream carries its own dK/dV
riders and fires one direct return-home RDMA at the end.  No recompute,
no gradient all-reduce.  The single-direction kernels (n-1 hops one way)
are kept as the simpler, directly-tested reference schedule.

Replaces nothing in the reference — the reference has no sequence
parallelism at all (SURVEY.md §2.4: max seq 23 tokens); this is the
long-context scaling path, validated against full attention on the
8-virtual-device CPU mesh via the TPU interpreter (which simulates the
remote DMAs and semaphores).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ring_fwd_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, m_ref, l_ref,
                     acc, m_acc, l_acc, kv_buf, pad_buf,
                     kv_send, kv_recv, pad_send, pad_recv, free_sem,
                     *, n: int, num_h: int, chunk: int, causal: bool,
                     axis: str):
    """One device's whole ring pass.

    Refs (local shard, VMEM): q/k/v/o [B*H, C, Dh] (q pre-scaled), pad
    [B, C] int8 (1 = masked key).  Grid (n, B*H): ring step outer, head
    block inner.  Comm buffers: kv_buf [slot, k|v, B*H, C, Dh],
    pad_buf [slot, B, C].
    """
    s = pl.program_id(0)
    bh = pl.program_id(1)
    nbh = pl.num_programs(1)
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    send_slot = jax.lax.rem(s, 2)
    recv_slot = jax.lax.rem(s + 1, 2)

    def kv_rdma():
        return pltpu.make_async_remote_copy(
            src_ref=kv_buf.at[send_slot],
            dst_ref=kv_buf.at[recv_slot],
            send_sem=kv_send.at[send_slot],
            recv_sem=kv_recv.at[recv_slot],
            device_id={axis: right},
            device_id_type=pltpu.DeviceIdType.MESH)

    def pad_rdma():
        return pltpu.make_async_remote_copy(
            src_ref=pad_buf.at[send_slot],
            dst_ref=pad_buf.at[recv_slot],
            send_sem=pad_send.at[send_slot],
            recv_sem=pad_recv.at[recv_slot],
            device_id={axis: right},
            device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when((s == 0) & (bh == 0))
    def _seed():
        kv_buf[0, 0] = k_ref[:]
        kv_buf[0, 1] = v_ref[:]
        pad_buf[0] = pad_ref[:]

    @pl.when(s == 0)
    def _init():
        acc[bh] = jnp.zeros((acc.shape[1], acc.shape[2]), jnp.float32)
        m_acc[bh] = jnp.full((m_acc.shape[1], 1), NEG_INF, jnp.float32)
        l_acc[bh] = jnp.zeros((l_acc.shape[1], 1), jnp.float32)

    # kick off the next hop before computing on the current block: the RDMA
    # rides ICI while the MXU works
    @pl.when((bh == 0) & (s < n - 1))
    def _comm_start():
        @pl.when(s >= 1)
        def _credit():  # right's landing slot must be consumed first
            pltpu.semaphore_wait(free_sem.at[recv_slot], 1)
        kv_rdma().start()
        pad_rdma().start()

    # ---- block attention: local Q vs. the block visiting at step s ----
    src_dev = jax.lax.rem(my - s + n, n)
    k_off = src_dev * chunk
    q_off = my * chunk

    def _update():
        q = q_ref[bh]                     # [C, Dh]
        k = kv_buf[send_slot, 0, bh]      # [C, Dh] — slot s%2 holds step s
        v = kv_buf[send_slot, 1, bh]
        b = jax.lax.div(bh, num_h)
        pad = pad_buf[send_slot, b]       # [C] int8
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = jnp.where(pad[None, :] != 0, NEG_INF, sc)
        if causal:
            rows = q_off + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, chunk), 0)
            cols = k_off + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, chunk), 1)
            sc = jnp.where(cols > rows, NEG_INF, sc)
        m_prev = m_acc[bh]                # [C, 1]
        m_cur = jnp.max(sc, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(sc - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_acc[bh] = l_acc[bh] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc[bh] = acc[bh] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_acc[bh] = m_new

    if causal:
        # blocks entirely in the future contribute nothing — skip compute
        # (the hop still happens: the ring must keep rotating)
        pl.when(k_off <= q_off + chunk - 1)(_update)
    else:
        _update()

    @pl.when((bh == nbh - 1) & (s < n - 1))
    def _comm_finish():
        kv_rdma().wait()
        pad_rdma().wait()
        # our outgoing slot is drained: left may overwrite it next hop.
        # last producer step is n-2, whose consumer-wait is at step n-2's
        # recv — signals past s == n-3 would dangle (nonzero sem at exit)
        @pl.when(s < n - 2)
        def _free():
            pltpu.semaphore_signal(
                free_sem.at[send_slot], inc=1, device_id={axis: left},
                device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when(s == n - 1)
    def _finalize():
        l = l_acc[bh]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[bh] = (acc[bh] / safe).astype(o_ref.dtype)
        # backward residuals are (m, l), NOT lse = m + log(l): for a row
        # whose every visible key is masked (reference semantics: uniform
        # attention over the prefix), m = -1e30 and f32 absorbs log(l)
        # entirely — the backward would reconstruct p = 1 instead of 1/l
        m_ref[bh] = m_acc[bh][:, 0]
        l_ref[bh] = safe[:, 0]


def _interp(interpret):
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return pltpu.InterpretParams() if interpret else False


def ring_attention_fwd_shard(q_l: jnp.ndarray, k_l: jnp.ndarray,
                             v_l: jnp.ndarray, pad_l: jnp.ndarray,
                             *, axis: str, n: int, causal: bool,
                             return_lse: bool = False, interpret=None):
    """Per-device body (call INSIDE shard_map over the ``axis`` ring).

    q_l/k_l/v_l [B, C, H, Dh] local shards (q pre-scaled by 1/sqrt(Dh)),
    pad_l [B, C] bool (True = masked).  Returns [B, C, H, Dh] (and, with
    ``return_lse``, the running max m and denominator l, each [B, C, H] —
    the backward residuals; kept separate rather than lse = m + log l so
    all-keys-masked rows survive f32 absorption, see _finalize).
    """
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf = fold(q_l), fold(k_l), fold(v_l)
    pad8 = pad_l.astype(jnp.int8)

    of, m_res, l_res = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(n, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, c), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((b * h, c, d), jnp.float32),    # acc
            pltpu.VMEM((b * h, c, 1), jnp.float32),    # running max
            pltpu.VMEM((b * h, c, 1), jnp.float32),    # running denom
            pltpu.VMEM((2, 2, b * h, c, d), q_l.dtype),  # K/V comm slots
            pltpu.VMEM((2, b, c), jnp.int8),           # pad comm slots
            pltpu.SemaphoreType.DMA((2,)),             # kv send
            pltpu.SemaphoreType.DMA((2,)),             # kv recv
            pltpu.SemaphoreType.DMA((2,)),             # pad send
            pltpu.SemaphoreType.DMA((2,)),             # pad recv
            pltpu.SemaphoreType.REGULAR((2,)),         # slot-free credits
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=0),
        interpret=_interp(interpret),
    )(qf, kf, vf, pad8)
    o = of.reshape(b, h, c, d).transpose(0, 2, 1, 3)
    if return_lse:
        unf = lambda x: x.reshape(b, h, c).transpose(0, 2, 1)
        return o, unf(m_res), unf(l_res)
    return o


# ======================================================================
# bidirectional forward: blocks travel BOTH ways around the ring
#
# The unidirectional ring needs n-1 hops on one ICI direction; the other
# direction idles.  Here each device sends its current clockwise block
# right AND its current counter-clockwise block left every step, so both
# ICI links carry traffic and the ring completes in ceil(n/2) hops — the
# visiting schedule at step s is block (my - s) from the CW stream and
# block (my + s) from the CCW stream (they coincide at s = n/2 for even
# n, which computes once).  Same online-softmax accumulator; two
# independent credit chains (CW slots freed to the left neighbor, CCW
# slots to the right).

def _ring_fwd_bidir_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, m_ref,
                           l_ref, acc, m_acc, l_acc, cw_buf, ccw_buf,
                           cw_pad, ccw_pad,
                           cw_send, cw_recv, ccw_send, ccw_recv,
                           cwp_send, cwp_recv, ccwp_send, ccwp_recv,
                           cw_free, ccw_free,
                           *, n: int, num_h: int, chunk: int, causal: bool,
                           axis: str):
    """Grid (ceil(n/2) + 1, B*H).  Buffers: {cw,ccw}_buf [slot, k|v,
    B*H, C, Dh]; {cw,ccw}_pad [slot, B, C] int8."""
    steps = n // 2 + 1 if n % 2 == 0 else (n - 1) // 2 + 1
    s = pl.program_id(0)
    bh = pl.program_id(1)
    nbh = pl.num_programs(1)
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    send_slot = jax.lax.rem(s, 2)
    recv_slot = jax.lax.rem(s + 1, 2)

    def rdma(buf, ssem, rsem, dst):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[send_slot], dst_ref=buf.at[recv_slot],
            send_sem=ssem.at[send_slot], recv_sem=rsem.at[recv_slot],
            device_id={axis: dst},
            device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when((s == 0) & (bh == 0))
    def _seed():
        cw_buf[0, 0] = k_ref[:]
        cw_buf[0, 1] = v_ref[:]
        ccw_buf[0, 0] = k_ref[:]
        ccw_buf[0, 1] = v_ref[:]
        cw_pad[0] = pad_ref[:]
        ccw_pad[0] = pad_ref[:]

    @pl.when(s == 0)
    def _init():
        acc[bh] = jnp.zeros((acc.shape[1], acc.shape[2]), jnp.float32)
        m_acc[bh] = jnp.full((m_acc.shape[1], 1), NEG_INF, jnp.float32)
        l_acc[bh] = jnp.zeros((l_acc.shape[1], 1), jnp.float32)

    @pl.when((bh == 0) & (s < steps - 1))
    def _comm_start():
        @pl.when(s >= 1)
        def _credits():
            pltpu.semaphore_wait(cw_free.at[recv_slot], 1)
            pltpu.semaphore_wait(ccw_free.at[recv_slot], 1)
        rdma(cw_buf, cw_send, cw_recv, right).start()
        rdma(cw_pad, cwp_send, cwp_recv, right).start()
        rdma(ccw_buf, ccw_send, ccw_recv, left).start()
        rdma(ccw_pad, ccwp_send, ccwp_recv, left).start()

    # ---- two visiting blocks per step (one at s=0; one at the even-n
    # antipodal step) ----
    q_off = my * chunk

    def update(kv, pad_b, k_off):
        def _upd():
            q = q_ref[bh]
            k = kv[send_slot, 0, bh]
            v = kv[send_slot, 1, bh]
            b = jax.lax.div(bh, num_h)
            pad = pad_b[send_slot, b]
            sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(pad[None, :] != 0, NEG_INF, sc)
            if causal:
                rows = q_off + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, chunk), 0)
                cols = k_off + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, chunk), 1)
                sc = jnp.where(cols > rows, NEG_INF, sc)
            m_prev = m_acc[bh]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=1, keepdims=True))
            p = jnp.exp(sc - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_acc[bh] = l_acc[bh] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc[bh] = acc[bh] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_acc[bh] = m_new
        return _upd

    cw_src = jax.lax.rem(my - s + n, n)
    ccw_src = jax.lax.rem(my + s, n)
    cw_live = (s <= steps - 1)
    ccw_live = (s >= 1) & (ccw_src != cw_src)  # skip own block + antipodal
    cw_off = cw_src * chunk
    ccw_off = ccw_src * chunk
    if causal:
        cw_live = cw_live & (cw_off <= q_off + chunk - 1)
        ccw_live = ccw_live & (ccw_off <= q_off + chunk - 1)
    pl.when(cw_live)(update(cw_buf, cw_pad, cw_off))
    pl.when(ccw_live)(update(ccw_buf, ccw_pad, ccw_off))

    @pl.when((bh == nbh - 1) & (s < steps - 1))
    def _comm_finish():
        rdma(cw_buf, cw_send, cw_recv, right).wait()
        rdma(cw_pad, cwp_send, cwp_recv, right).wait()
        rdma(ccw_buf, ccw_send, ccw_recv, left).wait()
        rdma(ccw_pad, ccwp_send, ccwp_recv, left).wait()

        @pl.when(s < steps - 2)
        def _free():
            pltpu.semaphore_signal(
                cw_free.at[send_slot], inc=1, device_id={axis: left},
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_signal(
                ccw_free.at[send_slot], inc=1, device_id={axis: right},
                device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when(s == steps - 1)
    def _finalize():
        l = l_acc[bh]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[bh] = (acc[bh] / safe).astype(o_ref.dtype)
        # (m, l) residuals — see _ring_fwd_kernel._finalize
        m_ref[bh] = m_acc[bh][:, 0]
        l_ref[bh] = safe[:, 0]


def ring_attention_fwd_bidir_shard(q_l, k_l, v_l, pad_l, *, axis: str,
                                   n: int, causal: bool,
                                   return_lse: bool = False,
                                   interpret=None):
    """Bidirectional per-device forward (shapes as
    ring_attention_fwd_shard); ceil(n/2) hops using both ICI directions."""
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf = fold(q_l), fold(k_l), fold(v_l)
    pad8 = pad_l.astype(jnp.int8)
    steps = n // 2 + 1 if n % 2 == 0 else (n - 1) // 2 + 1

    of, m_res, l_res = pl.pallas_call(
        functools.partial(_ring_fwd_bidir_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(steps, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c), jnp.float32),
                   jax.ShapeDtypeStruct((b * h, c), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((b * h, c, d), jnp.float32),      # acc
            pltpu.VMEM((b * h, c, 1), jnp.float32),      # running max
            pltpu.VMEM((b * h, c, 1), jnp.float32),      # running denom
            pltpu.VMEM((2, 2, b * h, c, d), q_l.dtype),  # CW K/V slots
            pltpu.VMEM((2, 2, b * h, c, d), q_l.dtype),  # CCW K/V slots
            pltpu.VMEM((2, b, c), jnp.int8),             # CW pad slots
            pltpu.VMEM((2, b, c), jnp.int8),             # CCW pad slots
            pltpu.SemaphoreType.DMA((2,)),               # cw kv send
            pltpu.SemaphoreType.DMA((2,)),               # cw kv recv
            pltpu.SemaphoreType.DMA((2,)),               # ccw kv send
            pltpu.SemaphoreType.DMA((2,)),               # ccw kv recv
            pltpu.SemaphoreType.DMA((2,)),               # cw pad send
            pltpu.SemaphoreType.DMA((2,)),               # cw pad recv
            pltpu.SemaphoreType.DMA((2,)),               # ccw pad send
            pltpu.SemaphoreType.DMA((2,)),               # ccw pad recv
            pltpu.SemaphoreType.REGULAR((2,)),           # cw credits
            pltpu.SemaphoreType.REGULAR((2,)),           # ccw credits
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=0),
        interpret=_interp(interpret),
    )(qf, kf, vf, pad8)
    o = of.reshape(b, h, c, d).transpose(0, 2, 1, 3)
    if return_lse:
        unf = lambda x: x.reshape(b, h, c).transpose(0, 2, 1)
        return o, unf(m_res), unf(l_res)
    return o


# ======================================================================
# backward: the FlashAttention-2 recurrence on the same ring
#
# Q, dO, lse, delta stay resident; K/V rotate as in forward, and each
# block's dK/dV partial sums travel WITH it (one extra f32 buffer in the
# rotation), accumulating a contribution on every device they visit.
# After n hops around the ring each block's gradients land back home
# complete — no recompute, no all-reduce.  dQ accumulates locally.

def _ring_bwd_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, lden_ref,
                     delta_ref, pad_ref, dq_ref, dk_ref, dv_ref,
                     dq_acc, kv_buf, grad_buf, pad_buf,
                     kv_send, kv_recv, pad_send, pad_recv,
                     g_send, g_recv, free_sem,
                     *, n: int, num_h: int, chunk: int, causal: bool,
                     axis: str):
    """Grid (n + 1, B*H): n compute steps + one grad-landing step.

    Refs: q/k/v/do [B*H, C, Dh]; lse/delta [B*H, C] f32; pad [B, C] int8.
    Comm: kv_buf [slot, k|v, B*H, C, Dh]; grad_buf [slot, dk|dv, B*H, C,
    Dh] f32; pad_buf [slot, B, C].  The grad hop s→s+1 sits between our
    step-s contribution and the next device's step-s+1 one (it cannot
    overlap the current step's compute the way the K/V hop does — its
    payload is only complete at step end).
    """
    s = pl.program_id(0)
    bh = pl.program_id(1)
    nbh = pl.num_programs(1)
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    send_slot = jax.lax.rem(s, 2)
    recv_slot = jax.lax.rem(s + 1, 2)
    prev_slot = jax.lax.rem(s - 1 + 2, 2)

    def rdma(buf, ssem, rsem, src_slot, dst_slot):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[src_slot], dst_ref=buf.at[dst_slot],
            send_sem=ssem.at[src_slot], recv_sem=rsem.at[dst_slot],
            device_id={axis: right},
            device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when((s == 0) & (bh == 0))
    def _seed():
        kv_buf[0, 0] = k_ref[:]
        kv_buf[0, 1] = v_ref[:]
        pad_buf[0] = pad_ref[:]
        grad_buf[0] = jnp.zeros(grad_buf.shape[1:], jnp.float32)

    @pl.when((bh == 0) & (s >= 1))
    def _step_head():
        # last step's grad hop: our outgoing slot drained + incoming landed
        rdma(grad_buf, g_send, g_recv, prev_slot, send_slot).wait()

        @pl.when(s <= n - 1)
        def _flow():
            # the drained slot is now free for the left neighbor's writes
            pltpu.semaphore_signal(
                free_sem.at[prev_slot], inc=1, device_id={axis: left},
                device_id_type=pltpu.DeviceIdType.MESH)
            # ...and the right's landing slot must be free before ours
            pltpu.semaphore_wait(free_sem.at[recv_slot], 1)

    @pl.when((bh == 0) & (s < n - 1))
    def _kv_start():
        rdma(kv_buf, kv_send, kv_recv, send_slot, recv_slot).start()
        rdma(pad_buf, pad_send, pad_recv, send_slot, recv_slot).start()

    # ---- contribution of this device to the visiting block ----
    src_dev = jax.lax.rem(my - s + n, n)
    k_off = src_dev * chunk
    q_off = my * chunk

    def _contrib():
        q = q_ref[bh]                          # [C, Dh]
        k = kv_buf[send_slot, 0, bh]
        v = kv_buf[send_slot, 1, bh]
        do = do_ref[bh].astype(jnp.float32)
        m = m_ref[bh][:, None]                 # [C, 1]
        linv = 1.0 / lden_ref[bh][:, None]
        delta = delta_ref[bh][:, None]
        b = jax.lax.div(bh, num_h)
        pad = pad_buf[send_slot, b]

        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sc = jnp.where(pad[None, :] != 0, NEG_INF, sc)
        if causal:
            rows = q_off + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, chunk), 0)
            cols = k_off + jax.lax.broadcasted_iota(
                jnp.int32, (chunk, chunk), 1)
            sc = jnp.where(cols > rows, NEG_INF, sc)
        # p from separate (m, l): exact for normal rows; for rows whose
        # every visible key is masked (m = fill), p = 1/l — the uniform
        # attention the forward actually computed
        p = jnp.exp(sc - m) * linv             # [C, C]
        # dv += P^T dO
        grad_buf[send_slot, 1, bh] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        # masked logits carry no gradient to q/k (autodiff's `where`
        # blocks them); for all-masked rows p is nonzero there, so zero
        # ds explicitly
        ds = jnp.where(sc <= 0.5 * NEG_INF, 0.0, ds)
        # dk += dS^T q
        grad_buf[send_slot, 0, bh] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dq += dS k (local)
        dq_acc[bh] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(s == 0)
    def _init_dq():
        dq_acc[bh] = jnp.zeros((dq_acc.shape[1], dq_acc.shape[2]),
                               jnp.float32)

    if causal:
        pl.when((s <= n - 1) & (k_off <= q_off + chunk - 1))(_contrib)
    else:
        pl.when(s <= n - 1)(_contrib)

    @pl.when((bh == nbh - 1) & (s <= n - 1))
    def _step_tail():
        @pl.when(s < n - 1)
        def _kv_finish():
            rdma(kv_buf, kv_send, kv_recv, send_slot, recv_slot).wait()
            rdma(pad_buf, pad_send, pad_recv, send_slot, recv_slot).wait()
        # ship the visiting block's accumulated dK/dV onward (home after
        # n hops); payload complete only now, hence start at step end
        rdma(grad_buf, g_send, g_recv, send_slot, recv_slot).start()

    @pl.when(s == n)
    def _land():
        home = n % 2  # slot the n-th hop landed our own block's grads in
        dq_ref[bh] = dq_acc[bh].astype(dq_ref.dtype)
        dk_ref[bh] = grad_buf[home, 0, bh].astype(dk_ref.dtype)
        dv_ref[bh] = grad_buf[home, 1, bh].astype(dv_ref.dtype)


def ring_attention_bwd_shard(q_l, k_l, v_l, pad_l, o_l, m_l, l_l, do_l,
                             *, axis: str, n: int, causal: bool,
                             interpret=None):
    """Per-device backward (call INSIDE shard_map; see _ring_bwd_kernel).

    Inputs [B, C, H, Dh] local shards (+ the forward's m_l/l_l residuals
    [B, C, H], pad_l [B, C]); returns (dq, dk, dv) with the inputs'
    shapes/dtypes.
    """
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf, dof = fold(q_l), fold(k_l), fold(v_l), fold(do_l)
    of = fold(o_l)
    mf = m_l.transpose(0, 2, 1).reshape(b * h, c)
    lf = l_l.transpose(0, 2, 1).reshape(b * h, c)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)                   # [BH, C]
    pad8 = pad_l.astype(jnp.int8)

    dqf, dkf, dvf = pl.pallas_call(
        functools.partial(_ring_bwd_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(n + 1, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c, d), k_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c, d), v_l.dtype)),
        scratch_shapes=[
            pltpu.VMEM((b * h, c, d), jnp.float32),      # dq accumulator
            pltpu.VMEM((2, 2, b * h, c, d), k_l.dtype),  # K/V comm slots
            pltpu.VMEM((2, 2, b * h, c, d), jnp.float32),  # dK/dV riders
            pltpu.VMEM((2, b, c), jnp.int8),             # pad comm slots
            pltpu.SemaphoreType.DMA((2,)),               # kv send
            pltpu.SemaphoreType.DMA((2,)),               # kv recv
            pltpu.SemaphoreType.DMA((2,)),               # pad send
            pltpu.SemaphoreType.DMA((2,)),               # pad recv
            pltpu.SemaphoreType.DMA((2,)),               # grad send
            pltpu.SemaphoreType.DMA((2,)),               # grad recv
            pltpu.SemaphoreType.REGULAR((2,)),           # slot-free credits
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=0),
        interpret=_interp(interpret),
    )(qf, kf, vf, dof, mf, lf, delta, pad8)
    unfold = lambda x: x.reshape(b, h, c, d).transpose(0, 2, 1, 3)
    return unfold(dqf), unfold(dkf), unfold(dvf)


# ======================================================================
# bidirectional backward: the FA-2 recurrence on the bidirectional ring
#
# Mirrors the bidirectional forward schedule (ceil(n/2) hops, both ICI
# directions) with each stream carrying its own dK/dV rider.  A block's
# gradient ends up SPLIT: the CW rider holds the contributions of devices
# b..b+(S-1), the CCW rider those of b-1..b-(S-2 or S-1) — so after the
# last compute step each device fires one direct return RDMA per stream,
# landing both partials at the block's home, which sums them.  dQ
# accumulates locally as always.

def _ring_bwd_bidir_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, lden_ref,
                           delta_ref, pad_ref, dq_ref, dk_ref, dv_ref,
                           dq_acc, cw_kv, ccw_kv, cw_pad, ccw_pad,
                           cw_grad, ccw_grad, cw_ret, ccw_ret,
                           cwk_send, cwk_recv, ccwk_send, ccwk_recv,
                           cwp_send, cwp_recv, ccwp_send, ccwp_recv,
                           cwg_send, cwg_recv, ccwg_send, ccwg_recv,
                           cwr_send, cwr_recv, ccwr_send, ccwr_recv,
                           cw_free, ccw_free,
                           *, n: int, num_h: int, chunk: int, causal: bool,
                           axis: str):
    """Grid (S + 1, B*H), S = ceil(n/2)(+1 for even n's antipodal step):
    S compute steps + one return-landing step.

    Comm per stream: kv [slot, k|v, B*H, C, Dh], pad [slot, B, C],
    grad rider [slot, dk|dv, B*H, C, Dh] f32; one return buffer
    [dk|dv, B*H, C, Dh] f32 per stream (single-use, no slots)."""
    steps = n // 2 + 1 if n % 2 == 0 else (n - 1) // 2 + 1
    s = pl.program_id(0)
    bh = pl.program_id(1)
    nbh = pl.num_programs(1)
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my - 1 + n, n)
    send_slot = jax.lax.rem(s, 2)
    recv_slot = jax.lax.rem(s + 1, 2)
    prev_slot = jax.lax.rem(s - 1 + 2, 2)

    def rdma(buf, ssem, rsem, src_slot, dst_slot, dst):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[src_slot], dst_ref=buf.at[dst_slot],
            send_sem=ssem.at[src_slot], recv_sem=rsem.at[dst_slot],
            device_id={axis: dst},
            device_id_type=pltpu.DeviceIdType.MESH)

    def ret_rdma(grad, ret, ssem, rsem, src_slot, dst):
        return pltpu.make_async_remote_copy(
            src_ref=grad.at[src_slot], dst_ref=ret,
            send_sem=ssem, recv_sem=rsem,
            device_id={axis: dst},
            device_id_type=pltpu.DeviceIdType.MESH)

    @pl.when((s == 0) & (bh == 0))
    def _seed():
        cw_kv[0, 0] = k_ref[:]
        cw_kv[0, 1] = v_ref[:]
        ccw_kv[0, 0] = k_ref[:]
        ccw_kv[0, 1] = v_ref[:]
        cw_pad[0] = pad_ref[:]
        ccw_pad[0] = pad_ref[:]
        cw_grad[0] = jnp.zeros(cw_grad.shape[1:], jnp.float32)
        ccw_grad[0] = jnp.zeros(ccw_grad.shape[1:], jnp.float32)

    @pl.when((bh == 0) & (s >= 1) & (s <= steps - 1))
    def _step_head():
        # last step's rider hops drained + landed
        rdma(cw_grad, cwg_send, cwg_recv, prev_slot, send_slot, right).wait()
        rdma(ccw_grad, ccwg_send, ccwg_recv, prev_slot, send_slot,
             left).wait()

        @pl.when(s <= steps - 2)
        def _flow():
            pltpu.semaphore_signal(
                cw_free.at[prev_slot], inc=1, device_id={axis: left},
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_signal(
                ccw_free.at[prev_slot], inc=1, device_id={axis: right},
                device_id_type=pltpu.DeviceIdType.MESH)
            pltpu.semaphore_wait(cw_free.at[recv_slot], 1)
            pltpu.semaphore_wait(ccw_free.at[recv_slot], 1)

    @pl.when((bh == 0) & (s < steps - 1))
    def _kv_start():
        rdma(cw_kv, cwk_send, cwk_recv, send_slot, recv_slot, right).start()
        rdma(cw_pad, cwp_send, cwp_recv, send_slot, recv_slot,
             right).start()
        rdma(ccw_kv, ccwk_send, ccwk_recv, send_slot, recv_slot,
             left).start()
        rdma(ccw_pad, ccwp_send, ccwp_recv, send_slot, recv_slot,
             left).start()

    @pl.when(s == 0)
    def _init_dq():
        dq_acc[bh] = jnp.zeros((dq_acc.shape[1], dq_acc.shape[2]),
                               jnp.float32)

    # ---- contributions: one per visiting stream ----
    q_off = my * chunk

    def contrib(kv, pad_b, grad, k_off):
        def _c():
            q = q_ref[bh]
            k = kv[send_slot, 0, bh]
            v = kv[send_slot, 1, bh]
            do = do_ref[bh].astype(jnp.float32)
            m = m_ref[bh][:, None]
            linv = 1.0 / lden_ref[bh][:, None]
            delta = delta_ref[bh][:, None]
            b = jax.lax.div(bh, num_h)
            pad = pad_b[send_slot, b]
            sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(pad[None, :] != 0, NEG_INF, sc)
            if causal:
                rows = q_off + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, chunk), 0)
                cols = k_off + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, chunk), 1)
                sc = jnp.where(cols > rows, NEG_INF, sc)
            # (m, l) residuals + ds masking: see _ring_bwd_kernel
            p = jnp.exp(sc - m) * linv
            grad[send_slot, 1, bh] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta)
            ds = jnp.where(sc <= 0.5 * NEG_INF, 0.0, ds)
            grad[send_slot, 0, bh] += jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_acc[bh] += jax.lax.dot_general(
                ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return _c

    cw_src = jax.lax.rem(my - s + n, n)
    ccw_src = jax.lax.rem(my + s, n)
    cw_live = s <= steps - 1
    ccw_live = (s >= 1) & (s <= steps - 1) & (ccw_src != cw_src)
    if causal:
        cw_live = cw_live & (cw_src * chunk <= q_off + chunk - 1)
        ccw_live = ccw_live & (ccw_src * chunk <= q_off + chunk - 1)
    pl.when(cw_live)(contrib(cw_kv, cw_pad, cw_grad, cw_src * chunk))
    pl.when(ccw_live)(contrib(ccw_kv, ccw_pad, ccw_grad, ccw_src * chunk))

    @pl.when(bh == nbh - 1)
    def _step_tail():
        @pl.when(s < steps - 1)
        def _rotate():
            rdma(cw_kv, cwk_send, cwk_recv, send_slot, recv_slot,
                 right).wait()
            rdma(cw_pad, cwp_send, cwp_recv, send_slot, recv_slot,
                 right).wait()
            rdma(ccw_kv, ccwk_send, ccwk_recv, send_slot, recv_slot,
                 left).wait()
            rdma(ccw_pad, ccwp_send, ccwp_recv, send_slot, recv_slot,
                 left).wait()
            rdma(cw_grad, cwg_send, cwg_recv, send_slot, recv_slot,
                 right).start()
            rdma(ccw_grad, ccwg_send, ccwg_recv, send_slot, recv_slot,
                 left).start()

        @pl.when(s == steps - 1)
        def _returns():
            # my CW rider = block my-(S-1): send home (direct RDMA — the
            # interconnect routes the multi-hop); my CCW rider = my+(S-1)
            cw_home = jax.lax.rem(my - (steps - 1) + n, n)
            ccw_home = jax.lax.rem(my + (steps - 1), n)
            ret_rdma(cw_grad, cw_ret, cwr_send, cwr_recv, send_slot,
                     cw_home).start()
            ret_rdma(ccw_grad, ccw_ret, ccwr_send, ccwr_recv, send_slot,
                     ccw_home).start()

    @pl.when(s == steps)
    def _land():
        @pl.when(bh == 0)
        def _wait_returns():
            prev = jax.lax.rem(steps - 1, 2)
            cw_home = jax.lax.rem(my - (steps - 1) + n, n)
            ccw_home = jax.lax.rem(my + (steps - 1), n)
            ret_rdma(cw_grad, cw_ret, cwr_send, cwr_recv, prev,
                     cw_home).wait()
            ret_rdma(ccw_grad, ccw_ret, ccwr_send, ccwr_recv, prev,
                     ccw_home).wait()
        dq_ref[bh] = dq_acc[bh].astype(dq_ref.dtype)
        dk_ref[bh] = (cw_ret[0, bh] + ccw_ret[0, bh]).astype(dk_ref.dtype)
        dv_ref[bh] = (cw_ret[1, bh] + ccw_ret[1, bh]).astype(dv_ref.dtype)


def ring_attention_bwd_bidir_shard(q_l, k_l, v_l, pad_l, o_l, m_l, l_l,
                                   do_l, *, axis: str, n: int, causal: bool,
                                   interpret=None):
    """Per-device bidirectional backward (shapes as
    ring_attention_bwd_shard); ceil(n/2) hops + one return per stream."""
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf, dof = fold(q_l), fold(k_l), fold(v_l), fold(do_l)
    of = fold(o_l)
    mf = m_l.transpose(0, 2, 1).reshape(b * h, c)
    lf = l_l.transpose(0, 2, 1).reshape(b * h, c)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)
    pad8 = pad_l.astype(jnp.int8)
    steps = n // 2 + 1 if n % 2 == 0 else (n - 1) // 2 + 1

    dqf, dkf, dvf = pl.pallas_call(
        functools.partial(_ring_bwd_bidir_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(steps + 1, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c, d), k_l.dtype),
                   jax.ShapeDtypeStruct((b * h, c, d), v_l.dtype)),
        scratch_shapes=[
            pltpu.VMEM((b * h, c, d), jnp.float32),      # dq accumulator
            pltpu.VMEM((2, 2, b * h, c, d), k_l.dtype),  # CW K/V slots
            pltpu.VMEM((2, 2, b * h, c, d), k_l.dtype),  # CCW K/V slots
            pltpu.VMEM((2, b, c), jnp.int8),             # CW pad slots
            pltpu.VMEM((2, b, c), jnp.int8),             # CCW pad slots
            pltpu.VMEM((2, 2, b * h, c, d), jnp.float32),  # CW riders
            pltpu.VMEM((2, 2, b * h, c, d), jnp.float32),  # CCW riders
            pltpu.VMEM((2, b * h, c, d), jnp.float32),   # CW return
            pltpu.VMEM((2, b * h, c, d), jnp.float32),   # CCW return
            pltpu.SemaphoreType.DMA((2,)),  # cw kv send
            pltpu.SemaphoreType.DMA((2,)),  # cw kv recv
            pltpu.SemaphoreType.DMA((2,)),  # ccw kv send
            pltpu.SemaphoreType.DMA((2,)),  # ccw kv recv
            pltpu.SemaphoreType.DMA((2,)),  # cw pad send
            pltpu.SemaphoreType.DMA((2,)),  # cw pad recv
            pltpu.SemaphoreType.DMA((2,)),  # ccw pad send
            pltpu.SemaphoreType.DMA((2,)),  # ccw pad recv
            pltpu.SemaphoreType.DMA((2,)),  # cw rider send
            pltpu.SemaphoreType.DMA((2,)),  # cw rider recv
            pltpu.SemaphoreType.DMA((2,)),  # ccw rider send
            pltpu.SemaphoreType.DMA((2,)),  # ccw rider recv
            pltpu.SemaphoreType.DMA(()),    # cw return send
            pltpu.SemaphoreType.DMA(()),    # cw return recv
            pltpu.SemaphoreType.DMA(()),    # ccw return send
            pltpu.SemaphoreType.DMA(()),    # ccw return recv
            pltpu.SemaphoreType.REGULAR((2,)),  # cw credits
            pltpu.SemaphoreType.REGULAR((2,)),  # ccw credits
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=0),
        interpret=_interp(interpret),
    )(qf, kf, vf, dof, mf, lf, delta, pad8)
    unfold = lambda x: x.reshape(b, h, c, d).transpose(0, 2, 1, 3)
    return unfold(dqf), unfold(dkf), unfold(dvf)
