"""TPU microbench: fused Pallas decode step vs the XLA KV-cache path.

Flagship shapes (run.sh big config): hidden 1024, 6 layers, 8 heads,
pwffn 2048, vocab 12k, batch 64, greedy serving decode (no probe).
Readback-synchronized two-point slope per benchmarks/METHODOLOGY.md.

Run ON THE TPU HOST (one TPU process at a time):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_decode_fused.py
"""

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_decode_step

    BATCH = 64
    cfg = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    batch_np = _example_batch(cfg, vocab_size, BATCH)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    tok_sum = jax.jit(lambda t: jnp.sum(t))

    results = {}
    for name, c in (("xla", cfg),
                    ("fused", cfg.replace(use_pallas_decode=True))):
        model = IQ(c, vocab_size)
        state = create_train_state(c, model, jax.random.key(0), batch)
        dec = make_decode_step(c, model, latent_mode=True, with_probe=False)
        log(f"{name}: compiling ...")
        t0 = time.time()
        out = dec(state, batch["images"], batch["context"], jax.random.key(0))
        _ = float(tok_sum(out["tokens"]))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")

        def run_k(k):
            for i in range(k):
                out = dec(state, batch["images"], batch["context"],
                          jax.random.key(i))
            return float(tok_sum(out["tokens"]))

        run_k(1)
        best = None
        for _ in range(3):
            t0 = time.time(); run_k(3); t1 = time.time() - t0
            t0 = time.time(); run_k(13); t2 = time.time() - t0
            cand = (t2 - t1) / 10
            best = cand if best is None else min(best, cand)
        qps = BATCH / best
        per_step_us = best / (cfg.max_decode_length + 1) * 1e6
        log(f"{name}: {qps:.1f} q/s, {per_step_us:.1f} us/decode-step")
        results[name] = {"qps": round(qps, 2),
                         "us_per_step": round(per_step_us, 2)}

    results["speedup"] = round(results["fused"]["qps"]
                               / results["xla"]["qps"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
