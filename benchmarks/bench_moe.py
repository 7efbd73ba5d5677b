"""On-chip MoE train-step cost vs the dense flagship.

Measures the flagship config (run.sh dims, batch 64) with MoE FFNs
(E experts, top-2, every other layer — the GShard-style scaled variant)
against the dense baseline, single chip.  The point is (1) the routing
einsums compile and run on real TPU hardware, (2) the step-time cost of
the capability at iso-token-FLOPs (top-2 of E experts ≈ 2× FFN compute;
the dispatch/combine einsums and the aux reductions are the overhead
being priced).

Methodology: readback-synchronized two-point slope, median of 5
(benchmarks/METHODOLOGY.md) — block_until_ready does not block on the
tunneled backend.

Usage (on the TPU):
    python benchmarks/bench_moe.py [--experts 8] [--every 2]
"""

from __future__ import annotations

import argparse
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


def slope(run_k, k1, k2, repeats=5):
    run_k(1)
    ests = []
    for _ in range(repeats):
        t0 = time.time(); run_k(k1); t1 = time.time() - t0
        t0 = time.time(); run_k(k2); t2 = time.time() - t0
        ests.append((t2 - t1) / (k2 - k1))
    ests.sort()
    return max(ests[len(ests) // 2], 1e-9)


def time_cfg(cfg, vocab_size=12000):
    import jax
    _enable_compile_cache()
    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_train_step

    model = IQ(cfg, vocab_size)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(cfg, vocab_size, BATCH).items()}
    state = create_train_state(cfg, model, jax.random.key(0), batch)
    step = make_train_step(cfg, latent_mode=True)
    state, m = step(state, batch, jax.random.key(1))
    loss0 = float(m["loss"])
    S = {"s": state}

    def run(k):
        s = S["s"]
        for i in range(k):
            s, mm = step(s, batch, jax.random.key(i))
        S["s"] = s
        return float(mm["loss"])

    sec = slope(run, 5, 25)
    extra = {k: float(m[k]) for k in ("moe_balance", "moe_router_z")
             if k in m}
    return sec, loss0, extra


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--every", type=int, default=2)
    args = ap.parse_args()

    from blt_vqg_tpu.core.config import Config
    base = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", log_grad_norm=False)

    sec_d, loss_d, _ = time_cfg(base)
    print(f"dense:  {1000 * sec_d:.1f} ms/step "
          f"({BATCH / sec_d:.1f} samples/s), loss {loss_d:.3f}",
          file=sys.stderr)

    moe = base.replace(moe_num_experts=args.experts, moe_top_k=2,
                       moe_every=args.every)
    sec_m, loss_m, extra = time_cfg(moe)
    print(f"moe E{args.experts}/k2/every{args.every}: "
          f"{1000 * sec_m:.1f} ms/step ({BATCH / sec_m:.1f} samples/s), "
          f"loss {loss_m:.3f}, {extra}", file=sys.stderr)

    print(json.dumps({
        "metric": "moe_train_step_ms",
        "dense_ms": round(1000 * sec_d, 2),
        "moe_ms": round(1000 * sec_m, 2),
        "experts": args.experts, "top_k": 2, "moe_every": args.every,
        "overhead_x": round(sec_m / sec_d, 3),
        "moe_balance": extra.get("moe_balance"),
    }))


if __name__ == "__main__":
    main()
