"""Input-pipeline throughput: hdf5 vs packed(mmap+native) batch assembly.

    python benchmarks/bench_input.py [--batches 100] [--batch-size 64]

Measures host-side batches/sec for both dataset backends on an identical
synthetic dataset, plus the native-vs-numpy token-surgery delta.  The train
step consumes ~250 batches/s at the flagship config (bench.py step_ms≈4);
the packed path must comfortably exceed that to keep the TPU fed.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--questions", type=int, default=4096)
    ap.add_argument("--im-size", type=int, default=224)
    args = ap.parse_args()

    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.packed import PackedDataset, pack_hdf5
    from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
    from blt_vqg_tpu.data import native
    from blt_vqg_tpu.text.vocabulary import Vocabulary

    tmp = tempfile.mkdtemp()
    h5 = write_synthetic_hdf5(
        os.path.join(tmp, "d.hdf5"), num_questions=args.questions,
        num_images=args.images, im_size=args.im_size, vocab_size=1000,
        uint8_images=True)
    packed = pack_hdf5(h5, os.path.join(tmp, "packed"))
    vocab = Vocabulary()
    for i in range(1000 - len(vocab)):
        vocab.add_word(f"w{i}")

    rng = np.random.RandomState(0)
    batches = [rng.randint(0, args.questions, args.batch_size)
               for _ in range(args.batches)]

    results = {}
    for name, ds in (("hdf5", IQDataset(h5, vocab)),
                     ("packed", PackedDataset(packed, vocab))):
        ds.batch(batches[0])  # warm (lazy open, page cache)
        t0 = time.time()
        for idx in batches:
            ds.batch(idx)
        dt = time.time() - t0
        results[name] = args.batches / dt
        print(f"{name}: {results[name]:.1f} batches/s "
              f"({results[name] * args.batch_size:.0f} samples/s host-side)")

    print(f"packed speedup over hdf5: {results['packed']/results['hdf5']:.2f}x")
    print(f"native kernels active: {native.available()}")


if __name__ == "__main__":
    main()
