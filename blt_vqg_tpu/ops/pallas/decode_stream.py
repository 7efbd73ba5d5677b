"""Cross-layer streaming decode step (Pallas): the whole decoder stack in
ONE kernel, weights double-buffered HBM→VMEM.

Greedy decode at small batch is bound by the ~200 MB of HBM traffic a
flagship step must move (6 layers × ~20 MB weights + ~13 MB KV-cache
reads, benchmarks/METHODOLOGY.md): the XLA op stream and even the 2-kernel
per-layer fusion (ops/pallas/decode_layer.py, measured 0.91× XLA) pay a
fetch-then-compute serialization per op because single-program
``pallas_call``s do not overlap their input DMA with compute.  This kernel
runs ALL layers as one program with grid ``(num_layers, S)`` where the
``S`` per-layer stages are

- ``H`` self-attention stages (one head each: fused-QKV column slice,
  cached attention, accumulated out-projection),
- ``Hc`` cross-attention stages (head groups over the tiny precomputed
  encoder K/V),
- ``Fc`` FFN stages (column/row chunks of the two FFN matmuls),

so every grid step touches only ~0.5-2 MB of weights/cache and Pallas's
automatic block pipelining fetches stage ``i+1``'s blocks during stage
``i``'s compute — continuous DMA at close to the HBM roofline.  The
activation (``[B, D]``) rides across stages in VMEM scratch; per-stage
index maps "hold" their last block outside their phase so nothing is
refetched, and next-layer fetches are staggered across the current layer's
early stages.  LayerNorm is computed ONCE per phase into scratch (per-
stage recompute is unoverlappable VPU time — measured 45 µs/step at
flagship shapes).

KV-cache reads come in two modes:

- ``bucketed_cache=True`` (default): the caches stay in HBM and each
  self stage hand-DMAs only a prefix bucket — the smallest of four
  static sizes ≥ ``pos+1`` — into an alternating 2-slot VMEM scratch,
  the copy for stage ``n+1`` issued during stage ``n`` (double
  buffering).  Early decode steps read ~25% of the cache instead of all
  of it, cutting both DMA and the attention VPU chains.
- ``bucketed_cache=False``: full-length cache blocks ride the same
  automatic BlockSpec pipeline as the weights (simpler; the measured
  round-3 baseline).

The kernel does NOT write the KV cache in place: it emits the current
position's K/V (``[L, H, B, Dh]``) and the caller inserts them with one
``dynamic_update_slice`` (XLA updates donated buffers in place), keeping
cache write traffic at one position instead of whole-block writebacks.
Attention therefore treats the current position specially: cached scores
are masked at ``index >= pos`` and the in-register K/V supply position
``pos`` — exactly the XLA step's visible set (ops/attention.py step).

Scope: single-device serving (the kernel gathers each layer's full
weights into stacked arrays; under a TP-sharded mesh use the XLA decode
path, whose GEMMs partition over the model axis).

Semantics parity target: ops/transformer.py ``DecoderLayer.step`` /
``TransformerDecoder.step`` (timing signal and final LN stay outside).
Replaces the reference's per-step full-prefix re-encode hot loop
(reference iq.py:134-143) at the whole-stack kernel level.  Runs in
interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blt_vqg_tpu.ops.masks import MASK_FILL

# future cache slots get a strictly lower fill than pad-masked keys, same
# constant as the XLA decode step (ops/attention.py:194)
FUTURE_FILL = 1e3 * MASK_FILL

_N_BUCKETS = 4


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _layernorm(x, scale, bias, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cache_buckets(lmax: int):
    """Static prefix sizes; the smallest ≥ pos+1 is copied/attended."""
    step = -(-lmax // _N_BUCKETS)
    sizes = []
    for i in range(_N_BUCKETS):
        s = min(step * (i + 1), lmax)
        if not sizes or s > sizes[-1]:
            sizes.append(s)
    return step, tuple(sizes)


def quantize_stack(w: jnp.ndarray):
    """Symmetric per-output-column int8 over the contraction axis (-2).

    Same scheme as ops/pallas/int8_matmul.quantize_int8, applied to the
    stream kernel's stacked weight slices [..., K, N] → (int8 [..., K, N],
    f32 scales [..., 1, N]).  Quantizing each stacked SLICE (per head /
    head-group / FFN chunk) keeps the dequant a cheap [1, N] broadcast in
    the stage that streams it.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def _stream_kernel(*refs,
                   nh: int, hc: int, fc: int, head_dim: int, dtype,
                   nl: int, lmax: int, bucketed: bool, qmask: tuple,
                   has_kp: bool = False):
    # ``qmask``: per-weight-kind int8 flags (wqkv, wout, wqc, woc, w1, w2);
    # each quantized weight ref is immediately followed by its scale ref
    it = iter(refs)
    nxt = lambda: next(it)
    opt = lambda q: next(it) if q else None
    pos_ref, x_in_ref, lns_ref = nxt(), nxt(), nxt()
    wqkv_ref, sqkv_ref = nxt(), opt(qmask[0])
    wout_ref, sout_ref = nxt(), opt(qmask[1])
    kc_ref, vc_ref = nxt(), nxt()
    wqc_ref, sqc_ref = nxt(), opt(qmask[2])
    woc_ref, soc_ref = nxt(), opt(qmask[3])
    ckc_ref, cvc_ref, smask_ref = nxt(), nxt(), nxt()
    w1_ref, s1_ref = nxt(), opt(qmask[4])
    b1_ref = nxt()
    w2_ref, s2_ref = nxt(), opt(qmask[5])
    b2_ref = nxt()
    # pad-key masks (compat_decode_pad_mask): cached rows + current pos
    kp_ref, kpc_ref = (nxt(), nxt()) if has_kp else (None, None)
    xout_ref, knew_ref, vnew_ref = nxt(), nxt(), nxt()
    x_sc, xn_sc, acc_sc, *bufs = list(it)

    def _wblk(ref, sref):
        """The stage's weight block.  When int8-streamed the raw int8 block
        feeds the GEMM DIRECTLY — Mosaic accepts mixed bf16/f32 × s8
        dot_generals on this chip (probed exact,
        benchmarks/probe_int8_mxu.py) — and the per-output-column scale
        moves to the GEMM's f32 OUTPUT via ``_oscale`` (scales are
        constant per column, so ``x @ (w8·s) == (x @ w8)·s``).  History:
        the round-3 in-weight dequant (convert·mul) made int8 streaming
        SLOWER than bf16 (2,312 vs 3,447 q/s); round 4 moved the scale to
        the output (475.8 µs); round 4c deleted the explicit convert and
        measured NO change (477.9 µs) — the convert was never the
        bottleneck (Mosaic lowers the mixed dot through the same upcast);
        the int8 stack's remaining loss vs bf16 streaming is a layout/DMA
        property, quantified in benchmarks/probe_int8_stream_floor.py
        (METHODOLOGY round-4c)."""
        del sref  # scale applies to the GEMM output (_oscale)
        return ref[0, 0]

    def _oscale(y, sref):
        """Per-output-column dequant scale on a GEMM's f32 output."""
        if sref is None:
            return y
        return y * sref[0, 0]

    l = pl.program_id(0)
    s = pl.program_id(1)
    nstage = nh + hc + fc
    pos = pos_ref[0]
    scale = head_dim ** -0.5

    if bucketed:
        kbuf, vbuf, sems = bufs
        step_sz, buckets = _cache_buckets(lmax)
        bidx = jnp.minimum(pos // step_sz, len(buckets) - 1)

        def cache_copies(l_, h_, slot, bsize):
            k = pltpu.make_async_copy(
                kc_ref.at[l_, h_, pl.ds(0, bsize)],
                kbuf.at[slot, pl.ds(0, bsize)], sems.at[slot, 0])
            v = pltpu.make_async_copy(
                vc_ref.at[l_, h_, pl.ds(0, bsize)],
                vbuf.at[slot, pl.ds(0, bsize)], sems.at[slot, 1])
            return k, v

        def start_for(l_, h_):
            slot = (l_ * nh + h_) % 2
            for i, bs in enumerate(buckets):
                @pl.when(bidx == i)
                def _(bs=bs):
                    ck, cv = cache_copies(l_, h_, slot, bs)
                    ck.start()
                    cv.start()

        # pipeline fill: the very first self stage has no predecessor
        @pl.when((l == 0) & (s == 0))
        def _():
            start_for(0, 0)

        # issue stage n+1's cache copies during stage n (slots alternate
        # with the global self-stage counter, so the in-use slot is never
        # the one being filled)
        @pl.when(s < nh - 1)
        def _():
            start_for(l, s + 1)

        @pl.when((s == nstage - 1) & (l < nl - 1))
        def _():
            start_for(l + 1, 0)

    # The phase input is LayerNormed ONCE at each phase-entry stage into
    # ``xn_sc`` (already cast to the GEMM dtype); every stage of the phase
    # reuses it — recomputing LN per stage costs ~0.6 µs × stages of
    # unoverlappable VPU time at flagship shapes.
    @pl.when((l == 0) & (s == 0))
    def _():
        x_sc[:] = x_in_ref[:]

    @pl.when(s == 0)
    def _():
        xn_sc[:] = _layernorm(x_sc[:], lns_ref[0, 0],
                              lns_ref[0, 1]).astype(dtype)

    @pl.when(s == nh)
    def _():
        xn_sc[:] = _layernorm(x_sc[:], lns_ref[0, 2],
                              lns_ref[0, 3]).astype(dtype)

    @pl.when(s == nh + hc)
    def _():
        xn_sc[:] = _layernorm(x_sc[:], lns_ref[0, 4],
                              lns_ref[0, 5]).astype(dtype)

    # ---- self-attention stage (one head) ------------------------------
    @pl.when(s < nh)
    def _self_stage():
        qkv = _oscale(_dot(xn_sc[:], _wblk(wqkv_ref, sqkv_ref)),
                      sqkv_ref)                                  # [B, 3*Dh] f32
        # round-trip through ``dtype``: the XLA step's fused QKV GEMM
        # produces (and caches) dtype values (ops/attention.py:176-184)
        q = qkv[:, :head_dim].astype(dtype) * scale         # [B, Dh] dtype
        k = qkv[:, head_dim:2 * head_dim].astype(knew_ref.dtype)
        v = qkv[:, 2 * head_dim:].astype(vnew_ref.dtype)
        knew_ref[0, 0] = k
        vnew_ref[0, 0] = v

        def attend(kc, vc):
            """Cached attention over a [N, B, Dh] prefix + the current
            position, then the accumulated out-projection.  dtype
            multiplies, f32 accumulation — the MXU einsum recipe the XLA
            step uses (bf16 operand products, f32 sums)."""
            n = kc.shape[0]
            s_cache = jnp.sum(q[None] * kc, axis=-1,
                              dtype=jnp.float32)            # [N, B]
            stale = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                     >= pos)
            s_cache = jnp.where(stale, FUTURE_FILL, s_cache)
            s_cur = jnp.sum(q * k, axis=-1, dtype=jnp.float32)   # [B]
            if has_kp:
                # reference-style pad-token key masking: pad fill strictly
                # higher than FUTURE_FILL so an all-pad visible prefix
                # degenerates to uniform over the visible keys like the
                # XLA step (ops/attention.py:188-196).  Stale rows stay at
                # FUTURE_FILL (the cached row at ``pos`` is garbage — the
                # current key rides in-flight and is masked via its own
                # [1, B] row instead).
                # full-ref load then VALUE slice: bucket sizes are not
                # sublane-aligned, and Mosaic lowers arbitrary static
                # slices of values more robustly than sub-tile ref loads
                s_cache = jnp.where((kp_ref[:][:n] != 0.0) & ~stale,
                                    MASK_FILL, s_cache)
                s_cur = jnp.where(kpc_ref[0] != 0.0, MASK_FILL, s_cur)

            # softmax over the visible set = cached [0, pos) + current
            m = jnp.maximum(jnp.max(s_cache, axis=0), s_cur)     # [B]
            e_cache = jnp.exp(s_cache - m[None])                 # [N, B]
            e_cur = jnp.exp(s_cur - m)                           # [B]
            den = jnp.sum(e_cache, axis=0) + e_cur               # [B]
            ctx = (jnp.sum(e_cache[:, :, None].astype(dtype) * vc,
                           axis=0, dtype=jnp.float32)
                   + e_cur[:, None] * v.astype(jnp.float32)) / den[:, None]
            partial = _oscale(_dot(ctx.astype(dtype),
                                   _wblk(wout_ref, sout_ref)),
                              sout_ref)                          # [B, D]

            @pl.when(s == 0)
            def _():
                acc_sc[:] = x_sc[:].astype(jnp.float32) + partial

            @pl.when(s > 0)
            def _():
                acc_sc[:] = acc_sc[:] + partial

        if bucketed:
            slot = (l * nh + s) % 2
            for i, bs in enumerate(buckets):
                @pl.when(bidx == i)
                def _(bs=bs):
                    ck, cv = cache_copies(l, s, slot, bs)
                    ck.wait()
                    cv.wait()
                    attend(kbuf[slot, :bs], vbuf[slot, :bs])
        else:
            attend(kc_ref[0, 0], vc_ref[0, 0])

        @pl.when(s == nh - 1)
        def _():
            x_sc[:] = acc_sc[:].astype(x_sc.dtype)

    # ---- cross-attention stage (a group of nh//hc heads) --------------
    @pl.when((s >= nh) & (s < nh + hc))
    def _cross_stage():
        hpc = nh // hc
        b = xn_sc.shape[0]
        q = _oscale(_dot(xn_sc[:], _wblk(wqc_ref, sqc_ref)),
                    sqc_ref)                                     # [B, hpc*Dh] f32
        q = (q.astype(dtype) * scale).astype(jnp.float32)
        q = q.reshape(b, hpc, head_dim)
        ck = ckc_ref[0, 0].astype(jnp.float32)              # [Tc, B, hpc*Dh]
        tc = ck.shape[0]
        ck = ck.reshape(tc, b, hpc, head_dim)
        sc = jnp.sum(q[None] * ck, axis=-1)                 # [Tc, B, hpc]
        sc = jnp.where(smask_ref[:][:, :, None] != 0, MASK_FILL, sc)
        w = jax.nn.softmax(sc, axis=0)
        cv = cvc_ref[0, 0].astype(jnp.float32).reshape(tc, b, hpc, head_dim)
        ctx = jnp.sum(w[:, :, :, None] * cv, axis=0)        # [B, hpc, Dh]
        partial = _oscale(_dot(ctx.reshape(b, hpc * head_dim).astype(dtype),
                               _wblk(woc_ref, soc_ref)),
                          soc_ref)                               # [B, D] f32

        @pl.when(s == nh)
        def _():
            acc_sc[:] = x_sc[:].astype(jnp.float32) + partial

        @pl.when(s > nh)
        def _():
            acc_sc[:] = acc_sc[:] + partial

        @pl.when(s == nh + hc - 1)
        def _():
            x_sc[:] = acc_sc[:].astype(x_sc.dtype)

    # ---- FFN stage (one chunk of the pwffn dim) -----------------------
    @pl.when(s >= nh + hc)
    def _ffn_stage():
        h1 = (_oscale(_dot(xn_sc[:], _wblk(w1_ref, s1_ref)), s1_ref)
              + b1_ref[0, 0, 0])
        h1 = jnp.maximum(h1, 0.0)
        partial = _oscale(_dot(h1.astype(dtype), _wblk(w2_ref, s2_ref)),
                          s2_ref)                                # [B, D] f32

        @pl.when(s == nh + hc)
        def _():
            acc_sc[:] = (x_sc[:].astype(jnp.float32)
                         + b2_ref[0, 0] + partial)

        @pl.when(s > nh + hc)
        def _():
            acc_sc[:] = acc_sc[:] + partial

        @pl.when(s == nstage - 1)
        def _():
            x_sc[:] = acc_sc[:].astype(x_sc.dtype)
            xout_ref[:] = acc_sc[:].astype(xout_ref.dtype)


def pick_stages(num_heads: int, pwffn_dim: int) -> tuple:
    """(cross_stages, ffn_stages): the largest divisors ≤ 4 — ~0.5-1 MB
    weight blocks at the flagship config, the VMEM/pipelining sweet spot."""
    hc = next(d for d in (4, 3, 2, 1) if num_heads % d == 0)
    fc = next(d for d in (4, 3, 2, 1) if pwffn_dim % d == 0)
    return hc, fc


def decode_stack_step(x, pos, lns, wqkv, wout, cache_k, cache_v,
                      wqc, woc, ckc, cvc, smask, w1, b1, w2, b2,
                      *, num_heads: int, cross_stages: int, ffn_stages: int,
                      bucketed_cache: bool = True, weight_scales=None,
                      key_pad=None, key_pad_cur=None):
    """One whole-stack decode step.

    ``weight_scales``: pass ``(sqkv, sout, sqc, soc, s1, s2)`` — the per-
    column f32 scales from ``quantize_stack`` — together with int8 weight
    stacks to stream the weights at HALF the HBM bytes; individual entries
    may be None (that kind streams at its own dtype — per-kind mixed
    precision).  int8 blocks feed the GEMM directly (mixed bf16×s8
    dot_general, benchmarks/probe_int8_mxu.py) with the per-column scale
    applied to the f32 output.  Biases, LayerNorms, KV caches and the
    precomputed cross K/V stay in their original dtypes.

    x [B, D]; caches [L, H, Lmax, B, Dh] (READ-only — pos entries come from
    the in-flight K/V); stacked weights as produced by
    ops/transformer.py ``TransformerDecoder._step_stream``:
    lns [L, 6, D] f32 (self/cross/ffn LN scale+bias), wqkv [L, H, D, 3*Dh],
    wout [L, H, Dh, D], wqc [L, Hc, D, (H/Hc)*Dh], woc [L, Hc, (H/Hc)*Dh, D],
    ckc/cvc [L, Hc, Tc, B, (H/Hc)*Dh], smask [Tc, B] int32 (1 = masked),
    w1 [L, Fc, D, F/Fc], b1 [L, Fc, 1, F/Fc] f32, w2 [L, Fc, F/Fc, D],
    b2 [L, 1, D] f32.

    Returns (x_out [B, D], k_new [L, H, B, Dh], v_new [L, H, B, Dh]); the
    caller inserts k_new/v_new into the caches at ``pos``.

    ``key_pad`` [Lmax, B] f32 (nonzero = pad) + ``key_pad_cur`` [1, B]
    add reference-style pad-token key masking in the self stages
    (compat_decode_pad_mask): cached rows < pos via ``key_pad``, the
    in-flight current key via ``key_pad_cur``.
    """
    nl, nh = wqkv.shape[0], wqkv.shape[1]
    hc, fc = cross_stages, ffn_stages
    b, d = x.shape
    dh = d // nh
    hpc = nh // hc
    lmax = cache_k.shape[2]
    tc = ckc.shape[2]
    fchunk = w1.shape[3]
    nstage = nh + hc + fc
    # block switch points for the next layer's cross/FFN blocks — early in
    # the self phase, so their fetches overlap many stages of compute
    # instead of piling onto the layer boundary (must be <= first use)
    t_c = min(2, nh)
    t_f = min(4, nh + hc)

    def self_idx(ndim):
        return lambda l, s: (l, jnp.minimum(s, nh - 1)) + (0,) * (ndim - 2)

    def cross_idx(ndim):
        def f(l, s):
            lc = jnp.where(s >= t_c, l, jnp.maximum(l - 1, 0))
            jc = jnp.where(s >= t_c, jnp.clip(s - nh, 0, hc - 1), hc - 1)
            return (lc, jc) + (0,) * (ndim - 2)
        return f

    def ffn_idx(ndim):
        def f(l, s):
            lf = jnp.where(s >= t_f, l, jnp.maximum(l - 1, 0))
            cf = jnp.where(s >= t_f, jnp.clip(s - nh - hc, 0, fc - 1),
                           fc - 1)
            return (lf, cf) + (0,) * (ndim - 2)
        return f

    vm = pltpu.VMEM
    spec = pl.BlockSpec
    cache_spec = (spec(memory_space=pl.ANY) if bucketed_cache
                  else spec((1, 1, lmax, b, dh), self_idx(5),
                            memory_space=vm))
    # per-weight-kind quantization: weight_scales is a 6-tuple (wqkv, wout,
    # wqc, woc, w1, w2) whose entries may individually be None (that kind
    # streams at its own dtype, no scale input) — the bisection/mixed-
    # precision surface; plain None means no kind is quantized
    scales6 = ((None,) * 6 if weight_scales is None
               else tuple(weight_scales))
    assert len(scales6) == 6, "weight_scales must have 6 entries"
    qmask = tuple(s is not None for s in scales6)

    def wspec(q, block, idx_map, scale_block):
        """Weight spec; when this kind is int8-streamed, follow it with its
        per-column scale block riding the same index map."""
        specs = [spec(block, idx_map, memory_space=vm)]
        if q:
            specs.append(spec(scale_block, idx_map, memory_space=vm))
        return specs

    in_specs = [
        spec(memory_space=pltpu.SMEM),                            # pos
        spec((b, d), lambda l, s: (0, 0), memory_space=vm),       # x
        spec((1, 6, d), lambda l, s: (l, 0, 0), memory_space=vm),  # lns
        *wspec(qmask[0], (1, 1, d, 3 * dh), self_idx(4),
               (1, 1, 1, 3 * dh)),                                # wqkv
        *wspec(qmask[1], (1, 1, dh, d), self_idx(4), (1, 1, 1, d)),  # wout
        cache_spec,                                               # cache k
        cache_spec,                                               # cache v
        *wspec(qmask[2], (1, 1, d, hpc * dh), cross_idx(4),
               (1, 1, 1, hpc * dh)),                              # wqc
        *wspec(qmask[3], (1, 1, hpc * dh, d), cross_idx(4),
               (1, 1, 1, d)),                                     # woc
        spec((1, 1, tc, b, hpc * dh), cross_idx(5), memory_space=vm),
        spec((1, 1, tc, b, hpc * dh), cross_idx(5), memory_space=vm),
        spec((tc, b), lambda l, s: (0, 0), memory_space=vm),      # smask
        *wspec(qmask[4], (1, 1, d, fchunk), ffn_idx(4),
               (1, 1, 1, fchunk)),                                # w1
        spec((1, 1, 1, fchunk), ffn_idx(4), memory_space=vm),     # b1
        *wspec(qmask[5], (1, 1, fchunk, d), ffn_idx(4),
               (1, 1, 1, d)),                                     # w2
        spec((1, 1, d), lambda l, s: (l, 0, 0), memory_space=vm),  # b2
    ]
    has_kp = key_pad is not None
    if has_kp:
        assert key_pad_cur is not None
        in_specs += [
            spec((lmax, b), lambda l, s: (0, 0), memory_space=vm),  # kp
            spec((1, b), lambda l, s: (0, 0), memory_space=vm),  # kp @ pos
        ]
    out_specs = (
        spec((b, d), lambda l, s: (0, 0), memory_space=vm),       # x_out
        spec((1, 1, b, dh), self_idx(4), memory_space=vm),        # k_new
        spec((1, 1, b, dh), self_idx(4), memory_space=vm),        # v_new
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, d), x.dtype),
        jax.ShapeDtypeStruct((nl, nh, b, dh), cache_k.dtype),
        jax.ShapeDtypeStruct((nl, nh, b, dh), cache_v.dtype),
    )
    scratch = [vm((b, d), x.dtype), vm((b, d), x.dtype),
               vm((b, d), jnp.float32)]
    if bucketed_cache:
        scratch += [vm((2, lmax, b, dh), cache_k.dtype),
                    vm((2, lmax, b, dh), cache_v.dtype),
                    pltpu.SemaphoreType.DMA((2, 2))]
    kernel = functools.partial(_stream_kernel, nh=nh, hc=hc, fc=fc,
                               head_dim=dh, dtype=x.dtype, nl=nl,
                               lmax=lmax, bucketed=bucketed_cache,
                               qmask=qmask, has_kp=has_kp)

    def wargs(w, s):
        return (w,) if s is None else (w, s.astype(jnp.float32))

    args = (jnp.asarray(pos, jnp.int32).reshape(1), x, lns,
            *wargs(wqkv, scales6[0]), *wargs(wout, scales6[1]),
            cache_k, cache_v,
            *wargs(wqc, scales6[2]), *wargs(woc, scales6[3]),
            ckc, cvc, smask,
            *wargs(w1, scales6[4]), b1, *wargs(w2, scales6[5]), b2)
    if has_kp:
        args += (key_pad.astype(jnp.float32),
                 key_pad_cur.astype(jnp.float32).reshape(1, b))
    return pl.pallas_call(
        kernel,
        grid=(nl, nstage),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)
