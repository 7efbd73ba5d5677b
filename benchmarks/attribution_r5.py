"""Round-5 train-step attribution with HONEST bytes (VERDICT r4 #2).

The corrected byte model (bench._analytic_step_bytes) puts the b64 step at
~12 GB/step → a ~14.6 ms bandwidth floor and an 8.4 ms compute floor, yet
the measured step is ~24.5 ms — the round-3 "bandwidth-floored 22-24 ms"
claim rested on cost-analysis bytes that overcount (BENCH_r04's
fraction_of_bandwidth_roofline = 1.33).  This probe attributes the gap by
differencing measured step times of structural variants:

  full       flagship step (224px, 6 layers)       — the reference point
  img32      image_size=32 (ResNet pixels /49)     — Δ isolates ResNet
  layers1    num_layers=1 (per-stack)              — Δ/5 isolates per-layer
                                                     cost incl. op latency
  fwd        forward+loss only                     — optimizer/bwd split
  grads      value_and_grad only                   — optimizer = full-grads

Each variant is measured with the readback-synchronized two-point slope
(benchmarks/METHODOLOGY.md).  The per-layer analytic cost at T=21 is
~0.15 GFLOP + ~25 MB of weights (bf16) per stack-layer triple — if the
measured per-layer Δ is far above flops/bytes, the step is op-LATENCY
bound (many small GEMMs on T=21 sequences), not bandwidth bound, and the
fix direction is fewer/bigger ops (fused QKV), not byte diets.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attribution_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _slope(run_k, k1=5, k2=25, repeats=5):
    run_k(1)
    ests = []
    for _ in range(repeats):
        t0 = time.time(); run_k(k1); t1 = time.time() - t0
        t0 = time.time(); run_k(k2); t2 = time.time() - t0
        ests.append((t2 - t1) / (k2 - k1))
    ests.sort()
    return max(ests[len(ests) // 2], 1e-9)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import _loss_fn, make_train_step

    def flagship(**kw):
        base = dict(emb_dim=300, hidden_dim=1024, latent_dim=1024,
                    pwffn_dim=2048, num_layers=6, num_heads=8,
                    batch_size=BATCH, input_mode="cat", dtype="bfloat16",
                    image_size=224, log_grad_norm=False)
        base.update(kw)
        return Config(**base)

    out = {}

    def time_step(tag, cfg):
        model = IQ(cfg, 12000)
        batch = {k: jax.device_put(v) for k, v in
                 _example_batch(cfg, 12000, BATCH).items()}
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=True)
        holder = {"s": state}

        def run_k(k):
            s = holder["s"]
            for i in range(k):
                s, mm = step(s, batch, jax.random.key(i))
            holder["s"] = s
            return float(mm["loss"])

        sec = _slope(run_k)
        out[tag] = {"ms": round(1000 * sec, 2),
                    "samples_per_sec": round(BATCH / sec, 1)}
        log(tag, out[tag])
        return cfg, model, batch, state

    cfg, model, batch, state = time_step("full", flagship())
    time_step("img32", flagship(image_size=32))
    time_step("layers1", flagship(num_layers=1))

    # fwd-only and grads-only on the flagship config.  A per-iteration
    # host readback would serialize the ~30 ms tunnel round trip into
    # every sample (the r5 first attempt measured fwd "31.5 ms" > the
    # 24.6 ms full step), so each variant runs K iterations INSIDE one
    # jit via lax.fori_loop with a loss→images data dependency (1e-12 ×
    # loss added to the images) that stops XLA from hoisting the
    # rng-independent compute out of the loop; the K=2 vs K=7 dispatch
    # slope then cancels the round trip exactly like the step loops.
    # NOTE: time_step's loop DONATED the original state buffers — rebuild.
    state = create_train_state(cfg, model, jax.random.key(0), batch)

    def fwd(params, st, b, rng):
        return _loss_fn(params, st, b, rng, cfg, True)[0]

    @jax.jit
    def fwd_k(params, st, b, k):
        def body(i, carry):
            img, acc = carry
            loss = fwd(params, st, dict(b, images=img),
                       jax.random.fold_in(jax.random.key(1), i))
            return img + (loss * 1e-12).astype(img.dtype), acc + loss
        img, acc = jax.lax.fori_loop(
            0, k, body, (b["images"], jnp.float32(0)))
        return acc

    def run_fwd(k):
        return float(fwd_k(state.params, state, batch, jnp.int32(k)))

    sec = _slope(run_fwd, 2, 7)
    out["fwd"] = {"ms": round(1000 * sec, 2)}
    log("fwd", out["fwd"])

    @jax.jit
    def grads_k(params, st, b, k):
        def body(i, carry):
            img, acc = carry
            g = jax.grad(fwd)(params, st, dict(b, images=img),
                              jax.random.fold_in(jax.random.key(1), i))
            gsum = sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))
            return img + (gsum * 1e-12).astype(img.dtype), acc + gsum
        img, acc = jax.lax.fori_loop(
            0, k, body, (b["images"], jnp.float32(0)))
        return acc

    def run_grads(k):
        return float(grads_k(state.params, state, batch, jnp.int32(k)))

    sec = _slope(run_grads, 2, 7)
    out["grads"] = {"ms": round(1000 * sec, 2)}
    log("grads", out["grads"])

    full, img32, l1 = out["full"]["ms"], out["img32"]["ms"], \
        out["layers1"]["ms"]
    out["attribution"] = {
        "resnet_ms": round(full - img32, 2),
        "per_layer_triple_ms": round((full - l1) / 5, 2),
        "optimizer_ms": round(full - out["grads"]["ms"], 2),
        "bwd_ms": round(out["grads"]["ms"] - out["fwd"]["ms"], 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
