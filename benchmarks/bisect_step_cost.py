"""Bisect the flagship step's time/traffic by compiling subparts.

The tunneled backend's profiler anonymizes op names, so attribution works
by compiling nested subsets of the computation and differencing their
cost_analysis and measured (readback-synchronized, two-point-slope) times:

  resnet_fwd      frozen EncoderCNN forward only
  model_fwd       full IQ forward + loss (no grad)
  grads           value_and_grad (the fwd+bwd block of the train step)
  full_step       fused train step (reference point)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bisect_step_cost.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

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


BATCH = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"gflop": round(ca.get("flops", 0) / 1e9, 1),
            "gbytes": round(ca.get("bytes accessed", 0) / 1e9, 3)}


def _slope(run_k, k1=5, k2=25, repeats=5):
    """Median-of-N slope (benchmarks/METHODOLOGY.md round-3 correction).

    CAVEAT for the sub-programs here: their run_k reads back EVERY call
    (each iteration pays the serialized tunnel round trip), so their "ms"
    overstates device time by a constant ~25-35 ms; the full_step loop
    pipelines and is accurate.  cost_analysis bytes are the primary
    signal of this script."""
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
    _enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import _loss_fn, make_train_step

    cfg = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    model = IQ(cfg, vocab_size)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(cfg, vocab_size, BATCH).items()}
    state = create_train_state(cfg, model, jax.random.key(0), batch)
    out = {}

    # ---- resnet forward only (frozen-eval mode; BN-stat math is trivial)
    def resnet_fwd(params, stats, images):
        feats = model.apply(
            {"params": params, "batch_stats": stats}, images,
            method=lambda m, im: m.encoder_cnn(im, train=False))
        return jnp.sum(feats.astype(jnp.float32))

    rf = jax.jit(resnet_fwd)
    rf_args = (state.params, state.batch_stats, batch["images"])
    out["resnet_fwd"] = _cost(rf, *rf_args)
    sec = _slope(lambda k: [float(rf(*rf_args)) for _ in range(k)][-1])
    out["resnet_fwd"]["ms"] = round(1000 * sec, 2)
    log("resnet_fwd:", out["resnet_fwd"])

    # ---- full forward + loss (no grad)
    def fwd(params, st, b, rng):
        return _loss_fn(params, st, b, rng, cfg, True)[0]

    f = jax.jit(fwd)
    args = (state.params, state, batch, jax.random.key(1))
    out["model_fwd"] = _cost(f, *args)
    sec = _slope(lambda k: [float(f(*args)) for _ in range(k)][-1])
    out["model_fwd"]["ms"] = round(1000 * sec, 2)
    log("model_fwd:", out["model_fwd"])

    # ---- grads (fwd + bwd)
    def grads(params, st, b, rng):
        g = jax.grad(fwd)(params, st, b, rng)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(g))

    gf = jax.jit(grads)
    out["grads"] = _cost(gf, *args)
    sec = _slope(lambda k: [float(gf(*args)) for _ in range(k)][-1])
    out["grads"]["ms"] = round(1000 * sec, 2)
    log("grads:", out["grads"])

    # ---- full fused step
    step = make_train_step(cfg, latent_mode=True)
    out["full_step"] = _cost(step, state, batch, jax.random.key(1))
    holder = {"s": state}

    def run_k(k):
        s = holder["s"]
        for i in range(k):
            s, mm = step(s, batch, jax.random.key(i))
        holder["s"] = s
        return float(mm["loss"])

    sec = _slope(run_k)
    out["full_step"]["ms"] = round(1000 * sec, 2)
    out["full_step"]["samples_per_sec"] = round(BATCH / sec, 1)
    log("full_step:", out["full_step"])

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
