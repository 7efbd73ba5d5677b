"""Input-pipeline throughput at flagship scale (VERDICT round-2 item 2).

Measures, separately:

  host    — PackedDataset (mmap + native gather/surgery) through
            make_loader's host path: samples/s of ready-to-ship batch-64
            dicts (the work the reference's 8 DataLoader workers did,
            reference utils/data_loader.py:178-206, train_iq.py:366-369)
  hdf5    — same through the IQDataset hdf5 path (the non-packed fallback)
  device  — host batches + device_put to the accelerator: the end-to-end
            ingest rate INCLUDING the host->device link.  On this box the
            TPU sits behind a tunnel (~130 MB/s host->device), which is the
            documented cap; on a co-located TPU host PCIe/DMA is >10 GB/s
            and the host path is the binding stage.

Usage:
  python benchmarks/bench_input_pipeline.py --root /root/data_flagship \
      [--mode host|hdf5|device|all] [--batches 100]
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


def bytes_per_batch(batch):
    return sum(np.asarray(v).nbytes for v in batch.values())


def time_host_iter(it, batches):
    # warmup (page in the mmap, warm the surgery kernels)
    for _ in range(5):
        b = next(it)
    t0 = time.time()
    nbytes = 0
    for _ in range(batches):
        b = next(it)
        nbytes += bytes_per_batch(b)
    dt = time.time() - t0
    return {"samples_per_sec": BATCH * batches / dt,
            "mb_per_sec": nbytes / dt / 1e6,
            "ms_per_batch": 1000 * dt / batches}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/root/data_flagship")
    p.add_argument("--mode", type=str, default="all",
                   choices=("host", "hdf5", "device", "all"))
    p.add_argument("--batches", type=int, default=100)
    args = p.parse_args()

    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.loader import make_loader
    from blt_vqg_tpu.data.packed import PackedDataset
    from blt_vqg_tpu.text.vocabulary import load_vocab

    vocab = load_vocab(os.path.join(args.root, "vocab_iq.json"))
    cat2name = os.path.join(args.root, "cat2name.json")
    out = {"batch": BATCH}

    if args.mode in ("host", "all", "device"):
        packed = PackedDataset(os.path.join(args.root, "packed_train"),
                               vocab, cat2name)
        out["dataset_qas"] = len(packed)

    if args.mode in ("host", "all"):
        it = make_loader(packed, BATCH, input_mode="cat", shuffle=True,
                         device=False)
        out["host_packed"] = time_host_iter(it, args.batches)
        log("host(packed):", out["host_packed"])

    if args.mode in ("hdf5", "all"):
        h5 = IQDataset(os.path.join(args.root, "iq_dataset.hdf5"),
                       vocab, cat2name)
        it = make_loader(h5, BATCH, input_mode="cat", shuffle=True,
                         device=False)
        out["host_hdf5"] = time_host_iter(it, args.batches)
        log("host(hdf5):", out["host_hdf5"])

    if args.mode in ("device", "all"):
        import jax
        _enable_compile_cache()
        out["platform"] = jax.devices()[0].platform

        # raw link bandwidth: device_put of one batch's image payload,
        # readback-synchronized (block_until_ready is unreliable here)
        img = np.random.randint(0, 255, (BATCH, 224, 224, 3), np.uint8)
        touch = jax.jit(lambda x: x.ravel()[::65536].astype(np.float32).sum())
        for _ in range(2):
            _ = float(touch(jax.device_put(img)))
        t0 = time.time()
        n = 10
        for _ in range(n):
            _ = float(touch(jax.device_put(img)))
        dt = time.time() - t0
        out["link_mb_per_sec"] = img.nbytes * n / dt / 1e6
        out["link_samples_per_sec"] = BATCH * n / dt
        log(f"host->device link: {out['link_mb_per_sec']:.1f} MB/s "
            f"({out['link_samples_per_sec']:.1f} uint8-224px samples/s)")

        # full ingest: loader -> Prefetcher(device_put, depth 2)
        it = make_loader(packed, BATCH, input_mode="cat", shuffle=True,
                         device=True, prefetch_depth=2)
        for _ in range(3):
            b = next(it)
        _ = float(touch(b["images"]))
        t0 = time.time()
        for _ in range(args.batches):
            b = next(it)
        _ = float(touch(b["images"]))  # sync on the last shipped batch
        dt = time.time() - t0
        out["device_ingest"] = {
            "samples_per_sec": BATCH * args.batches / dt,
            "ms_per_batch": 1000 * dt / args.batches}
        log("device ingest:", out["device_ingest"])

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
