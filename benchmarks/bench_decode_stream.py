"""TPU microbench: cross-layer streaming decode kernel vs the XLA path.

Flagship shapes (run.sh big config): hidden 1024, 6 layers, 8 heads,
pwffn 2048, vocab 12k, batch 64, greedy serving decode (no probe).
Variants: "xla" (KV-cache op stream), "fused" (2 Pallas ops/layer,
ops/pallas/decode_layer.py), "stream" (ONE kernel for the whole stack,
ops/pallas/decode_stream.py).  Readback-synchronized two-point slope per
benchmarks/METHODOLOGY.md.

Run ON THE TPU HOST (one TPU process at a time):
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_decode_stream.py
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="xla,fused,stream,stream_fh,stream_h8,"
                    "stream_int8,stream_int8_nofh",
                    help="comma list: xla,fused,stream,stream_fh,"
                    "stream_h8,stream_int8,stream_int8_nofh — stream_fh "
                    "forces the fused decode head at the stack dtype "
                    "(ops/pallas/decode_head.py), stream_h8 streams ONLY "
                    "the head in int8 (bf16 stack; auto-enables the fused "
                    "head), *_nofh forces it off (xla always runs first as "
                    "the ratio baseline)")
    ap.add_argument("--batch", type=int, default=64,
                    help="decode batch size (serving-throughput scaling: "
                    "the stream kernel is the latency play at b64; larger "
                    "batches amortize weight streaming per question)")
    cli = ap.parse_args()
    wanted = set(cli.variants.split(","))

    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_decode_step

    BATCH = cli.batch
    cfg = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    batch_np = _example_batch(cfg, vocab_size, BATCH)
    batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    tok_sum = jax.jit(lambda t: jnp.sum(t))

    results = {}
    variants = (("xla", cfg),
                ("fused", cfg.replace(use_pallas_decode=True)),
                ("stream", cfg.replace(use_stream_decode=True)),
                ("stream_fh", cfg.replace(use_stream_decode=True,
                                          stream_fused_head="on")),
                ("stream_h8", cfg.replace(use_stream_decode=True,
                                          stream_head_dtype="int8")),
                ("stream_int8", cfg.replace(use_stream_decode=True,
                                            stream_weight_dtype="int8")),
                ("stream_int8_nofh", cfg.replace(use_stream_decode=True,
                                                 stream_weight_dtype="int8",
                                                 stream_fused_head="off")))
    variants = [(n, c) for n, c in variants if n == "xla" or n in wanted]
    for name, c in variants:
        model = IQ(c, vocab_size)
        state = create_train_state(c, model, jax.random.key(0), batch)
        dec = make_decode_step(c, model, latent_mode=True, with_probe=False)
        log(f"{name}: compiling ...")
        t0 = time.time()
        out = dec(state, batch["images"], batch["context"], jax.random.key(0))
        first_toks = np.asarray(out["tokens"])
        _ = float(tok_sum(out["tokens"]))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        if name == "xla":
            ref_toks = first_toks
        else:
            # same greedy tokens as the XLA path on identical weights
            agree = float(np.mean(first_toks == ref_toks))
            results.setdefault("token_agreement", {})[name] = round(agree, 4)
            log(f"{name}: token agreement vs xla = {agree:.4f}")

        def run_k(k):
            for i in range(k):
                out = dec(state, batch["images"], batch["context"],
                          jax.random.key(i))
            return float(tok_sum(out["tokens"]))

        run_k(1)
        # median of 5 slope estimates (METHODOLOGY.md round-3 correction:
        # a min-estimator selects jitter-corrupted too-low slopes)
        cands = []
        for _ in range(5):
            t0 = time.time(); run_k(3); t1 = time.time() - t0
            t0 = time.time(); run_k(13); t2 = time.time() - t0
            cands.append((t2 - t1) / 10)
        best = float(np.median(cands))
        qps = BATCH / best
        per_step_us = best / (cfg.max_decode_length + 1) * 1e6
        log(f"{name}: {qps:.1f} q/s, {per_step_us:.1f} us/decode-step")
        results[name] = {"qps": round(qps, 2),
                         "us_per_step": round(per_step_us, 2)}

    for n in ("stream", "stream_fh", "stream_h8", "stream_int8",
              "stream_int8_nofh"):
        if n in results:
            results[f"{n}_vs_xla"] = round(results[n]["qps"]
                                           / results["xla"]["qps"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
