"""Minimal serving loop: trained model dir → batched question generation.

The serving-shaped counterpart of cli/evaluate_iq (which is a dataset
evaluator): restore once, then decode request batches repeatedly through
one jitted program — the pattern behind bench.py's
``decode_questions_per_sec_batch512`` serving metric.

What it demonstrates:
- args.json reload (the reference's Dict2Obj pattern,
  reference evaluate_iq.py:81-83) + checkpoint restore (any backend);
- `with_probe=False` serving decode (no per-step top-6 probe) with
  `decode_early_stop` (while-loop exit once every row emitted <end> —
  a trained model stops ~5x earlier than the fixed-length scan);
- batch-shaped requests: images [B, H, W, 3] + category ids [B].

Usage:
    python examples/serve_decode.py --model-dir runs/big \
        [--batch 64] [--rounds 3]
(on synthetic-trained dirs, random request images are fine.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--stream", action="store_true",
                        help="whole-stack streaming decode kernel "
                        "(ops/pallas/decode_stream.py; the small-batch "
                        "latency play, 1.07x the XLA path at b64)")
    parser.add_argument("--stream-weight-dtype", default="bfloat16",
                        choices=("bfloat16", "int8"),
                        help="with --stream: int8 streams the decoder "
                        "weights at half the HBM bytes (per-column scales, "
                        "in-kernel dequant) — a documented quantization-"
                        "accuracy tradeoff")
    args = parser.parse_args(argv)

    import jax

    from blt_vqg_tpu.core.checkpoint import CheckpointManager
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_decode_step

    cfg = Config.load(os.path.join(args.model_dir, "args.json"))
    cfg = cfg.replace(batch_size=args.batch, decode_early_stop=True,
                      use_stream_decode=args.stream,
                      stream_weight_dtype=args.stream_weight_dtype)
    vocab = load_vocab(cfg.vocab)
    model = IQ(cfg, len(vocab))

    # template init + restore (decode needs params/batch_stats only)
    rng = np.random.RandomState(0)
    init_batch = {
        "images": rng.rand(args.batch, cfg.image_size, cfg.image_size, 3
                           ).astype(np.float32),
        "context": np.ones((args.batch, cfg.max_context_len), np.int32),
        "posterior": np.ones((args.batch, cfg.max_posterior_len), np.int32),
        "target": np.ones((args.batch, cfg.max_q_length), np.int32),
    }
    state = create_train_state(cfg, model, jax.random.key(0), init_batch)
    ckpt = CheckpointManager(os.path.join(args.model_dir, "checkpoints"),
                             backend=cfg.checkpoint_backend)
    state = ckpt.restore(state)
    print(f"restored step {int(state.step)} "
          f"({cfg.checkpoint_backend} backend)")

    # >= matches the trainer's phase boundary (trainer.py: the latent phase
    # begins AT step num_pretraining_steps) — a checkpoint saved exactly at
    # the boundary serves in latent mode
    latent = int(state.step) >= cfg.num_pretraining_steps
    decode = make_decode_step(cfg, model, latent_mode=latent,
                              with_probe=False)

    num_cats = 8  # synthetic categories map to word ids 6+cat
    for r in range(args.rounds):
        images = rng.rand(args.batch, cfg.image_size, cfg.image_size, 3
                          ).astype(np.float32)
        cats = rng.randint(0, num_cats, (args.batch,))
        # category-conditioned context: [<start>, cat_word, <end>] padded
        context = np.zeros((args.batch, cfg.max_context_len), np.int32)
        context[:, 0] = 1
        context[:, 1] = 6 + cats
        context[:, 2] = 3
        t0 = time.time()
        out = decode(state, images, context,
                     jax.random.fold_in(jax.random.key(1), r))
        tokens = np.asarray(out["tokens"])  # host readback = sync point
        dt = time.time() - t0
        qs = [vocab.tokens_to_words(t) for t in tokens[:3]]
        print(f"round {r}: {args.batch} questions in {dt*1000:.0f} ms "
              f"({args.batch/dt:.0f} q/s incl. host round trip)")
        for c, q in zip(cats[:3], qs):
            print(f"  cat {c}: {q}")


if __name__ == "__main__":
    main()
