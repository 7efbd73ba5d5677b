"""Fused decode head (Pallas): final LayerNorm + vocab projection + argmax
in ONE kernel, the [D, V] head weights streamed HBM→VMEM in chunks.

Motivation (benchmarks/METHODOLOGY.md round-4b): on the streaming decode
path (ops/pallas/decode_stream.py) the remaining per-step work OUTSIDE the
stack kernel is the final LN, the vocab projection and the argmax.  NOTE
the measured reality: XLA already converts the loop-invariant f32 head to
bf16 (default TPU matmul precision) and hoists the convert out of the
decode scan, so a bf16-streamed fused head only PARITY-TIES XLA's bytes
(measured a small loss from kernel-call overhead).  The win is the INT8
head — half the real bf16 bytes (12.3 MB/step at D=1024, V=12k), measured
356.7 µs/step vs 360.0 no-fuse at flagship b64 and +13% on the int8
stack — which is why ``stream_fused_head="auto"`` engages this kernel
exactly when the head streams int8.  This kernel

- streams the head weights in ``dtype`` or int8, chunked over the vocab
  dim so Pallas's automatic block pipelining overlaps each chunk's DMA
  with the previous chunk's GEMM;
- computes the final LayerNorm once into VMEM scratch (f32 stats, same
  recipe as decode_stream._layernorm / flax LayerNorm);
- keeps a running (max, argmax) pair across chunks and emits ONLY the
  greedy token ids [B, 1] int32 — the [B, V] logits never touch HBM.

Argmax tie-breaking matches XLA/numpy: the within-chunk argmax takes the
FIRST maximal index (explicit iota+min, not a hardware argmax), and the
cross-chunk update is strictly-greater, so earlier chunks win ties.

Serving-path only (greedy tokens, no probe): the validation printer's
top-6 probe and beam search need full logits and stay on the XLA head.
The caller pads the weights to a chunk multiple with ``pad_head`` (zero
weight columns, -1e30 bias, so padded logits can never win).

reference models/iq.py:136-137 (argmax of the vocab projection per decode
step); the reference recomputes the full-prefix logits each step.
Runs in interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_BIAS = -1e30  # bias for padded vocab columns: never the argmax
_NEVER = 2 ** 30  # plain int: jnp constants would be captured consts in Pallas


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def head_chunk(vocab_size: int, target: int = 1024) -> int:
    """Vocab chunk size: ``target`` (a multiple of 128) unless the vocab is
    smaller, then the smallest 128-multiple covering it."""
    return min(target, -(-vocab_size // 128) * 128)


def pad_head(w: jnp.ndarray, b: jnp.ndarray, chunk: int):
    """Pad [D, V] head weights + [V] bias to a multiple of ``chunk`` along
    V.  Padded columns get zero weights and ``PAD_BIAS`` bias."""
    v = w.shape[1]
    vp = -(-v // chunk) * chunk
    if vp != v:
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
        b = jnp.pad(b, (0, vp - v), constant_values=PAD_BIAS)
    return w, b


def _head_kernel(x_ref, lns_ref, w_ref, *rest, dtype, quantized: bool):
    if quantized:
        s_ref, b_ref, tok_ref, xn_sc, m_sc, a_sc = rest
    else:
        b_ref, tok_ref, xn_sc, m_sc, a_sc = rest
        s_ref = None
    i = pl.program_id(0)
    chunk = w_ref.shape[1]

    @pl.when(i == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[0] + lns_ref[1]
        xn_sc[:] = xn.astype(dtype)
        m_sc[:] = jnp.full(m_sc.shape, -jnp.inf, jnp.float32)
        a_sc[:] = jnp.zeros(a_sc.shape, jnp.int32)

    # int8 chunks feed the GEMM directly (mixed dtype × s8 dot_generals
    # compile natively — benchmarks/probe_int8_mxu.py); the per-column
    # scale moves to the GEMM's f32 output (x @ (w8·s) == (x @ w8)·s)
    logits = jax.lax.dot_general(
        xn_sc[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [B, C] f32
    if quantized:
        logits = logits * s_ref[:]
    logits = logits + b_ref[:]

    cm = jnp.max(logits, axis=1, keepdims=True)             # [B, 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    ca = jnp.min(jnp.where(logits == cm, idx, _NEVER),
                 axis=1, keepdims=True) + i * chunk         # [B, 1]
    upd = cm > m_sc[:]
    a_sc[:] = jnp.where(upd, ca, a_sc[:])
    m_sc[:] = jnp.where(upd, cm, m_sc[:])

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        tok_ref[:] = a_sc[:]


def head_argmax(x, ln_scale, ln_bias, w, b, *, chunk: int | None = None,
                scales=None):
    """Greedy token ids from a pre-final-LN decoder output.

    x [B, D] (the stream kernel's raw output); ln_scale/ln_bias [D] (the
    decoder's final LayerNorm); w [D, Vp] head weights ALREADY cast to the
    streaming dtype (or int8 with ``scales`` [1, Vp] f32 per-column) and
    padded via ``pad_head``; b [Vp] f32 bias.  Returns tokens [B] int32.

    All weight prep is loop-invariant, so XLA hoists it out of the decode
    scan — only this kernel runs per step.
    """
    bsz, d = x.shape
    vp = w.shape[1]
    if chunk is None:
        chunk = head_chunk(vp)
    assert vp % chunk == 0, (vp, chunk)
    quantized = scales is not None
    lns = jnp.stack([ln_scale, ln_bias]).astype(jnp.float32)  # [2, D]
    # the LN-output (GEMM LHS) dtype: the activation dtype for int8 streams
    # (the int8 chunk feeds the GEMM directly), else the weights' own dtype
    dtype = x.dtype if quantized else w.dtype

    vm = pltpu.VMEM
    spec = pl.BlockSpec
    in_specs = [
        spec((bsz, d), lambda i: (0, 0), memory_space=vm),   # x
        spec((2, d), lambda i: (0, 0), memory_space=vm),     # lns
        spec((d, chunk), lambda i: (0, i), memory_space=vm),  # w
    ]
    args = [x, lns, w]
    if quantized:
        in_specs.append(spec((1, chunk), lambda i: (0, i), memory_space=vm))
        args.append(scales.astype(jnp.float32).reshape(1, vp))
    in_specs.append(spec((1, chunk), lambda i: (0, i), memory_space=vm))
    args.append(b.astype(jnp.float32).reshape(1, vp))

    kernel = functools.partial(_head_kernel, dtype=dtype, quantized=quantized)
    tok = pl.pallas_call(
        kernel,
        grid=(vp // chunk,),
        in_specs=in_specs,
        out_specs=spec((bsz, 1), lambda i: (0, 0), memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
        scratch_shapes=[vm((bsz, d), dtype), vm((bsz, 1), jnp.float32),
                        vm((bsz, 1), jnp.int32)],
        interpret=_interpret(),
    )(*args)
    return tok[:, 0]
