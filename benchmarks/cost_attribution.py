"""Attribute the train step's HBM traffic: fwd+bwd vs optimizer update.

Compiles three flagship-config programs on the real chip and prints XLA's
own cost analysis (flops / bytes accessed) plus measured step time for:

  (a) grads-only (fwd+bwd, no update)
  (b) full step, optax chain      (cfg.fused_adam=False)
  (c) full step, fused clip+Adam  (cfg.fused_adam=True, the default)

This is the evidence artifact for the round-3 fused-optimizer work: the
round-2 step moved 27.1 GB/step against an ~9 GB ideal
(benchmarks/METHODOLOGY.md) because the optax chain materializes many
tree-wide passes; the fused pass collapses them to one read-modify-write
per tensor (train/fused_adam.py).

Run on an idle host: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/cost_attribution.py
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


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {"gflop": ca.get("flops", 0) / 1e9,
            "gbytes": ca.get("bytes accessed", 0) / 1e9}


def _slope_time(run_k, k1=5, k2=25, repeats=5):
    """Median-of-N slope (NOT min — see benchmarks/METHODOLOGY.md: jitter
    on the small run yields bogus-low slopes that min() cherry-picks)."""
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

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import _loss_fn, make_train_step

    base = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    out = {"platform": jax.devices()[0].platform,
           "device_kind": jax.devices()[0].device_kind}

    model = IQ(base, vocab_size)
    batch_np = _example_batch(base, vocab_size, BATCH)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    state = create_train_state(base, model, jax.random.key(0), batch)

    # (a) grads only
    def grads_only(params, st, b, rng):
        g = jax.grad(lambda p: _loss_fn(p, st, b, rng, base, True)[0])(params)
        return sum(jnp_sum(x) for x in jax.tree_util.tree_leaves(g))

    import jax.numpy as jnp
    def jnp_sum(x):
        return jnp.sum(x.astype(jnp.float32))

    gfn = jax.jit(grads_only, static_argnums=())
    lowered = gfn.lower(state.params, state, batch, jax.random.key(1))
    compiled = lowered.compile()
    out["grads_only"] = _cost(compiled)
    log("grads_only:", out["grads_only"])

    for name, fused in (("optax_chain", False), ("fused_adam", True)):
        cfg = base.replace(fused_adam=fused)
        m = IQ(cfg, vocab_size)
        st = create_train_state(cfg, m, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=True)
        lowered = step.lower(st, batch, jax.random.key(1))
        compiled = lowered.compile()
        out[name] = _cost(compiled)
        # measured steady-state step time (readback-synchronized slope)
        holder = {"s": st}

        def run_k(k):
            s = holder["s"]
            for i in range(k):
                s, mm = step(s, batch, jax.random.key(i))
            holder["s"] = s
            return float(mm["loss"])

        sec = _slope_time(run_k)
        out[name]["step_ms"] = 1000 * sec
        out[name]["samples_per_sec"] = BATCH / sec
        log(name, out[name])
        del holder, st

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
