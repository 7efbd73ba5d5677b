"""Step-diet experiments: measure full-train-step variants on the chip.

Variants are numerics-preserving or documented knobs; each is timed with
the readback-synchronized two-point median slope (bench.py methodology)
plus XLA cost_analysis bytes, so wins/losses come with a byte attribution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/exp_step_diet.py [--variants base,remat,...]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,remat,remat_diet")
    ap.add_argument("--k", default="5,25")
    cli = ap.parse_args()
    k1, k2 = map(int, cli.k.split(","))

    import jax
    _enable_compile_cache()

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_train_step

    base = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    variants = {
        "base": base,
        "remat": base.replace(remat=True),
        "diet": base.replace(tie_output_z=True, adam_mu_dtype="bfloat16"),
        "remat_diet": base.replace(remat=True, tie_output_z=True,
                                   adam_mu_dtype="bfloat16"),
        "base_gbf16": base.replace(grad_dtype="bfloat16"),
        "diet_gbf16": base.replace(tie_output_z=True,
                                   adam_mu_dtype="bfloat16",
                                   grad_dtype="bfloat16"),
    }
    wanted = [v for v in cli.variants.split(",") if v in variants]

    vocab_size = 12000
    batch_np = _example_batch(base, vocab_size, BATCH)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    results = {}
    for name in wanted:
        cfg = variants[name]
        model = IQ(cfg, vocab_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=True)
        log(f"{name}: compiling ...")
        t0 = time.time()
        state, m = step(state, batch, jax.random.key(1))
        _ = float(m["loss"])
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        try:
            ca = step.lower(state, batch, jax.random.key(1)).compile(
            ).cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            gbytes = round(float(ca.get("bytes accessed", 0)) / 1e9, 3)
        except Exception:
            gbytes = None

        S = {"s": state}

        def run_k(k):
            s = S["s"]
            for i in range(k):
                s, mm = step(s, batch, jax.random.key(i))
            S["s"] = s
            return float(mm["loss"])

        run_k(1)
        ests = []
        for _ in range(5):
            t0 = time.time(); run_k(k1); t1 = time.time() - t0
            t0 = time.time(); run_k(k2); t2 = time.time() - t0
            ests.append((t2 - t1) / (k2 - k1))
        sec = float(np.median(ests))
        results[name] = {"ms": round(sec * 1e3, 2),
                         "samples_per_sec": round(BATCH / sec, 1),
                         "gbytes": gbytes}
        log(f"{name}: {results[name]}")
        del state, S

    print(json.dumps(results))


if __name__ == "__main__":
    main()
