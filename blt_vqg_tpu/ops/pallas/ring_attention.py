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

Scope: forward kernel, grid (ring_steps, B·H) per device, whole local
shards resident in VMEM — sized for the serving/decode regime (local chunk
x B·H that fits VMEM, ~4 comm slots + q/k/v/o + f32 accumulators).
Training still differentiates: ring_attention(impl="pallas") installs this
forward under a custom VJP whose backward recomputes through the XLA ring
path (one extra forward, O(chunk²) memory, same autodiff math).

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


def _ring_fwd_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, lse_ref,
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
        dead = l == 0.0                     # fully-masked (padded) rows
        safe = jnp.where(dead, 1.0, l)
        o_ref[bh] = (acc[bh] / safe).astype(o_ref.dtype)
        # lse = m + log(l); 0 for dead rows so backward's exp(s - lse) -> 0
        lse_ref[bh] = jnp.where(dead[:, 0], 0.0,
                                m_acc[bh][:, 0] + jnp.log(safe[:, 0]))


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
    ``return_lse``, the per-row log-sum-exp [B, C, H] — the backward-pass
    residual, mirroring ops/pallas/flash_attention.py).
    """
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf = fold(q_l), fold(k_l), fold(v_l)
    pad8 = pad_l.astype(jnp.int8)

    of, lse = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(n, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
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
        return o, lse.reshape(b, h, c).transpose(0, 2, 1)
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

def _ring_fwd_bidir_kernel(q_ref, k_ref, v_ref, pad_ref, o_ref, lse_ref,
                           acc, m_acc, l_acc, cw_buf, ccw_buf,
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
        dead = l == 0.0
        safe = jnp.where(dead, 1.0, l)
        o_ref[bh] = (acc[bh] / safe).astype(o_ref.dtype)
        lse_ref[bh] = jnp.where(dead[:, 0], 0.0,
                                m_acc[bh][:, 0] + jnp.log(safe[:, 0]))


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

    of, lse = pl.pallas_call(
        functools.partial(_ring_fwd_bidir_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(steps, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b * h, c, d), q_l.dtype),
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
        return o, lse.reshape(b, h, c).transpose(0, 2, 1)
    return o


# ======================================================================
# backward: the FlashAttention-2 recurrence on the same ring
#
# Q, dO, lse, delta stay resident; K/V rotate as in forward, and each
# block's dK/dV partial sums travel WITH it (one extra f32 buffer in the
# rotation), accumulating a contribution on every device they visit.
# After n hops around the ring each block's gradients land back home
# complete — no recompute, no all-reduce.  dQ accumulates locally.

def _ring_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     pad_ref, dq_ref, dk_ref, dv_ref,
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
        lse = lse_ref[bh][:, None]             # [C, 1]
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
        p = jnp.exp(sc - lse)                  # [C, C]
        # dv += P^T dO
        grad_buf[send_slot, 1, bh] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
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


def ring_attention_bwd_shard(q_l, k_l, v_l, pad_l, o_l, lse_l, do_l,
                             *, axis: str, n: int, causal: bool,
                             interpret=None):
    """Per-device backward (call INSIDE shard_map; see _ring_bwd_kernel).

    Inputs [B, C, H, Dh] local shards (+ lse_l [B, C, H] from the forward,
    pad_l [B, C]); returns (dq, dk, dv) with the inputs' shapes/dtypes.
    """
    b, c, h, d = q_l.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, c, d)
    qf, kf, vf, dof = fold(q_l), fold(k_l), fold(v_l), fold(do_l)
    of = fold(o_l)
    lsef = lse_l.transpose(0, 2, 1).reshape(b * h, c)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)                   # [BH, C]
    pad8 = pad_l.astype(jnp.int8)

    dqf, dkf, dvf = pl.pallas_call(
        functools.partial(_ring_bwd_kernel, n=n, num_h=h, chunk=c,
                          causal=causal, axis=axis),
        grid=(n + 1, b * h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
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
    )(qf, kf, vf, dof, lsef, delta, pad8)
    unfold = lambda x: x.reshape(b, h, c, d).transpose(0, 2, 1, 3)
    return unfold(dqf), unfold(dkf), unfold(dvf)
