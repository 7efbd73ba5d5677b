"""Bisect the full stream kernel's int8 loss, one weight kind at a time.

probe_int8_stream_floor.py showed int8 weight streaming WINS in isolation
(94.6 vs 156.2 µs for the same stage structure — near-ideal half-bytes),
yet the full decode kernel's int8 path loses ~112 µs/step to bf16
(METHODOLOGY round-4/4c).  So one (or more) of the SIX weight kinds'
int8 plumbing is pathological inside the real kernel.  This probe drives
``decode_stack_step`` directly at flagship shapes and quantizes ONE kind
at a time (the per-kind ``weight_scales`` surface), then all six:

    variants: bf16, qkv, out, qc, oc, w1, w2, all

Per-kind deltas localize the cost; if they don't add up to the 'all'
delta the interaction (VMEM budget / pipelining heuristics) is the story.

Run ON THE TPU HOST (one TPU process at a time):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache \
    PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/probe_stream_int8_micro.py
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

B, D, H, L, F = 64, 1024, 8, 6, 2048
# TC=4 matches the flagship input_mode="cat" cross length (image + 3
# context tokens); larger TC over-sizes the resident cross-K/V blocks and
# OOMs the 16M scoped VMEM that the real kernel fits in
LMAX, TC, POS = 51, 4, 25
KINDS = ("qkv", "out", "qc", "oc", "w1", "w2")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(qsel):
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from blt_vqg_tpu.ops.pallas.decode_stream import (decode_stack_step,
                                                      pick_stages,
                                                      quantize_stack)

    dh = D // H
    hc, fc = pick_stages(H, F)
    hpc, fchunk = H // hc, F // fc
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def mk(*shape):
        return jnp.asarray(rng.randn(*shape) * 0.05, dt)

    shapes = {"qkv": (L, H, D, 3 * dh), "out": (L, H, dh, D),
              "qc": (L, hc, D, hpc * dh), "oc": (L, hc, hpc * dh, D),
              "w1": (L, fc, D, fchunk), "w2": (L, fc, fchunk, D)}
    weights, scales = {}, []
    for k in KINDS:
        w = mk(*shapes[k])
        if k in qsel:
            w8, s = quantize_stack(w)
            weights[k] = w8
            scales.append(s)
        else:
            weights[k] = w
            scales.append(None)
    weight_scales = None if not qsel else tuple(scales)

    x = mk(B, D)
    lns = jnp.asarray(
        np.stack([np.ones((L, D)) if i % 2 == 0 else np.zeros((L, D))
                  for i in range(6)], axis=1), jnp.float32)
    ck = mk(L, H, LMAX, B, dh)
    cv = mk(L, H, LMAX, B, dh)
    ckc = mk(L, hc, TC, B, hpc * dh)
    cvc = mk(L, hc, TC, B, hpc * dh)
    smask = jnp.zeros((TC, B), jnp.int32)
    b1 = jnp.zeros((L, fc, 1, fchunk), jnp.float32)
    b2 = jnp.zeros((L, 1, D), jnp.float32)

    step = functools.partial(
        decode_stack_step, num_heads=H, cross_stages=hc, ffn_stages=fc,
        bucketed_cache=True, weight_scales=weight_scales)

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(c, _):
            y, _, _ = step(c, POS, lns, weights["qkv"], weights["out"],
                           ck, cv, weights["qc"], weights["oc"], ckc, cvc,
                           smask, weights["w1"], b1, weights["w2"], b2)
            return y.astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    return x, run


def measure(name, qsel):
    x, run = build(qsel)
    t0 = time.time()
    _ = float(run(x, 1))
    log(f"{name}: compile+first {time.time() - t0:.1f}s")
    cands = []
    for _ in range(5):
        t0 = time.time(); _ = float(run(x, 10)); t1 = time.time() - t0
        t0 = time.time(); _ = float(run(x, 60)); t2 = time.time() - t0
        cands.append((t2 - t1) / 50)
    us = float(np.median(cands)) * 1e6
    log(f"{name}: {us:.1f} us/step")
    return round(us, 1)


def main():
    import jax
    _enable_compile_cache()
    log("backend:", jax.default_backend(), jax.devices())
    out = {"bf16": measure("bf16", ())}
    for k in KINDS:
        out[k] = measure(k, (k,))
    out["all"] = measure("all", KINDS)
    base = out["bf16"]
    out["delta_sum_vs_all"] = round(
        sum(out[k] - base for k in KINDS) - (out["all"] - base), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


# reference nihirv/blt-vqg has no quantized-serving path; this probe
# investigates the TPU-native rebuild's own serving kernel.
