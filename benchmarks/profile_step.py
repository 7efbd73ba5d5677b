"""Profile the flagship train step on the TPU and rank ops by device time.

Runs N steps under jax.profiler, then parses the perfetto trace
(trace.json.gz) and prints the top ops by total duration — the evidence
base for attacking fwd+bwd HBM traffic (benchmarks/cost_attribution.py
showed grads-only already moves ~16.6 GB of the 26.7 GB step).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_step.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

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
STEPS = 12
TRACE_DIR = "/tmp/iq_step_trace"


def main():
    import jax
    _enable_compile_cache()

    from __graft_entry__ import _example_batch
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_train_step

    cfg = Config(
        emb_dim=300, hidden_dim=1024, latent_dim=1024, pwffn_dim=2048,
        num_layers=6, num_heads=8, batch_size=BATCH, input_mode="cat",
        dtype="bfloat16", image_size=224, log_grad_norm=False)
    vocab_size = 12000
    model = IQ(cfg, vocab_size)
    batch = {k: jax.device_put(v)
             for k, v in _example_batch(cfg, vocab_size, BATCH).items()}
    state = create_train_state(cfg, model, jax.random.key(0), batch)
    step = make_train_step(cfg, latent_mode=True)
    state, m = step(state, batch, jax.random.key(0))
    _ = float(m["loss"])  # compile + sync

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(STEPS):
        state, m = step(state, batch, jax.random.key(i))
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace.json.gz produced; files:",
              glob.glob(os.path.join(TRACE_DIR, "**", "*"), recursive=True))
        return
    with gzip.open(sorted(traces)[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events: name + dur (µs)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        tot[ev["name"]] += ev.get("dur", 0.0)
        cnt[ev["name"]] += 1
    if not tot:
        # fall back: all complete events
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "X":
                tot[ev["name"]] += ev.get("dur", 0.0)
                cnt[ev["name"]] += 1
    grand = sum(tot.values())
    print(f"process lanes: {sorted(set(pid_names.values()))}")
    print(f"total device-op time: {grand / 1e3:.1f} ms over {STEPS} steps "
          f"({grand / 1e3 / STEPS:.2f} ms/step)\n")
    print(f"{'op':<72} {'ms/step':>8} {'%':>6} {'count':>6}")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:72]:<72} {t / 1e3 / STEPS:>8.3f} "
              f"{100 * t / grand:>6.2f} {cnt[name]:>6}")


if __name__ == "__main__":
    main()
