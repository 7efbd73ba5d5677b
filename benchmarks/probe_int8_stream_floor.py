"""Isolation probe: WHY does int8 weight streaming lose to bf16?

The stream decode kernel (ops/pallas/decode_stream.py) streams ~126 MB of
bf16 weights per decode step through Pallas-pipelined VMEM blocks.  int8
streaming halves the bytes, so a bandwidth-bound pipeline should save
~75 µs/step — instead it ADDS ~112 µs (METHODOLOGY round-4/4c: 477.9 vs
365.9 µs), and deleting the in-kernel int8→bf16 convert (feeding the
mixed bf16×s8 dot_general directly, benchmarks/probe_int8_mxu.py) changed
NOTHING (475.8 → 477.9 µs).  So the loss is not the convert.  This probe
isolates the remaining suspects on a minimal weight-streaming GEMM
pipeline at flagship-like shapes (96 stages × [1024, 640] blocks ≈ the
63M params a decode step streams):

  bf16          bf16 blocks, direct dot            (the winner's shape)
  int8_direct   int8 blocks → mixed dot, scale on the f32 output
  int8_convert  int8 blocks → .astype(bf16) → dot  (the round-3 recipe)
  int8_half     int8 blocks at HALF the stage count (48) — same total
                bytes as 96 bf16 stages would halve to; separates
                per-stage overhead from per-byte DMA rate

If int8_direct ≈ bf16 here, the full kernel's loss lives in its extra
int8 plumbing (per-stage scale blocks, mixed-phase scratch); if
int8_direct ≈ 2× the HALF-byte expectation, Mosaic's int8 VMEM layout
(32, 128) tiling makes int8 DMA/relayout run at bf16-byte cost and the
int8 stream can never win on this chip — write the floor note and close
NEXT #10.

Run ON THE TPU HOST (one TPU process at a time):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache \
    PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/probe_int8_stream_floor.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _enable_compile_cache():
    """The JAX_COMPILATION_CACHE_DIR env var is IGNORED by this jax build
    (round-5 diagnosis, benchmarks/METHODOLOGY.md); the cache must be
    enabled through jax.config after `import jax`."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import numpy as np

B, K, N, STAGES = 64, 1024, 640, 96


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(x_ref, w_ref, *rest, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if mode == "bf16":
        (o_ref, acc) = rest
        s_ref = None
    else:
        (s_ref, o_ref, acc) = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    w = w_ref[0]
    if mode == "int8_convert":
        w = w.astype(x_ref.dtype)
    y = jax.lax.dot_general(x_ref[:], w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if s_ref is not None:
        y = y * s_ref[0]
    # accumulate into a [B, N] f32 scratch (matches the stream kernel's
    # FFN-partial accumulation shape/work)
    acc[:] = acc[:] + y

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]


def build(mode, stages):
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K), jnp.bfloat16)
    wf = rng.randn(stages, K, N).astype(np.float32)
    vm = pltpu.VMEM
    spec = pl.BlockSpec
    in_specs = [spec((B, K), lambda i: (0, 0), memory_space=vm),
                spec((1, K, N), lambda i: (i, 0, 0), memory_space=vm)]
    if mode == "bf16":
        args = [jnp.asarray(wf, jnp.bfloat16)]
    else:
        amax = np.abs(wf).max(axis=1, keepdims=True)
        scale = np.maximum(amax, 1e-8) / 127.0
        w8 = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
        args = [jnp.asarray(w8),
                jnp.asarray(scale.reshape(stages, 1, N), jnp.float32)]
        in_specs.append(spec((1, 1, N), lambda i: (i, 0, 0),
                             memory_space=vm))
    fn = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(stages,),
        in_specs=in_specs,
        out_specs=spec((B, N), lambda i: (0, 0), memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[vm((B, N), jnp.float32)],
    )

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(c, _):
            y = fn(c, *args)
            # data-depend the next iteration on this one (prevents
            # overlap-free enqueue measurement; see METHODOLOGY)
            nxt = (c + y[:, :1].astype(c.dtype) * 1e-6).astype(c.dtype)
            return nxt, ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    return x, run


def measure(mode, stages=STAGES):
    import jax
    _enable_compile_cache()
    x, run = build(mode, stages)
    t0 = time.time()
    _ = float(run(x, 1))
    log(f"{mode} (stages={stages}): compile+first {time.time() - t0:.1f}s")
    cands = []
    for _ in range(5):
        t0 = time.time(); _ = float(run(x, 20)); t1 = time.time() - t0
        t0 = time.time(); _ = float(run(x, 120)); t2 = time.time() - t0
        cands.append((t2 - t1) / 100)
    per = float(np.median(cands))
    us = per * 1e6
    us_stage = us / stages
    gbps = stages * K * N * (2 if mode == "bf16" else 1) / per / 1e9
    log(f"{mode} (stages={stages}): {us:.1f} us/step, "
        f"{us_stage:.2f} us/stage, weight-DMA {gbps:.0f} GB/s")
    return {"us_per_step": round(us, 1), "us_per_stage": round(us_stage, 2),
            "weight_gbps": round(gbps, 1)}


def main():
    import jax
    _enable_compile_cache()
    log("backend:", jax.default_backend(), jax.devices())
    out = {
        "bf16": measure("bf16"),
        "int8_direct": measure("int8_direct"),
        "int8_convert": measure("int8_convert"),
        "int8_half": measure("int8_direct", stages=STAGES // 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()


# reference nihirv/blt-vqg has no quantized-serving path at all; this probe
# documents a hardware property of the TPU-native rebuild's serving kernel.
