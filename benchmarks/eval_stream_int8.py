"""Serving-accuracy measurement for int8 weight streaming.

Restores the flagship learnable-run checkpoint (a TRAINED model, so
quantization error is measured where it matters — near-saturated decode
quality, benchmarks/flagship_learnable.md) and scores greedy decode on the
held-out val set three ways: XLA path, stream kernel (bf16), stream kernel
int8 (`--stream_weight_dtype int8`).  Reports NLG metrics + token
agreement so the int8 serving knob ships with a measured accuracy delta,
not a hand-wave.

Run ON THE TPU HOST:
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_compile_cache \
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/eval_stream_int8.py \
        --model-dir /root/runs/flagship_learnable \
        --val /root/data_flagship_learn/packed_val [--batches 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="/root/runs/flagship_learnable")
    ap.add_argument("--val", default="/root/data_flagship_learn/packed_val")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--batch", type=int, default=0,
                    help="override the decode batch size (0 = the "
                    "checkpoint config's batch_size) — use 128 to score "
                    "the b128 serving-headline config (VERDICT r4 #3)")
    ap.add_argument("--variants",
                    default="xla,stream,stream_h8,stream_int8",
                    help="xla | stream (bf16 kernel) | stream_h8 (bf16 "
                    "stack + int8 fused head) | stream_int8 (int8 stack + "
                    "int8 fused head) | stream_int8_nofh")
    args = ap.parse_args()

    import jax
    _enable_compile_cache()

    from blt_vqg_tpu.core.checkpoint import CheckpointManager
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.data.dataset import IQDataset, example_from_row
    from blt_vqg_tpu.data.packed import PackedDataset
    from blt_vqg_tpu.models.iq import IQ
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.nlg_metrics import NLGEval
    from blt_vqg_tpu.train.state import create_train_state
    from blt_vqg_tpu.train.step import make_decode_step
    from blt_vqg_tpu.train.trainer import filter_special_tokens

    cfg = Config.load(os.path.join(args.model_dir, "args.json"))
    if args.batch:
        cfg = cfg.replace(batch_size=args.batch)
    vocab = load_vocab(cfg.vocab)
    cat2name = cfg.cat2name if os.path.exists(cfg.cat2name) else None
    # packed dir or plain hdf5 (e.g. the latent-decay probe corpora)
    ds = (IQDataset(args.val, vocab, cat2name)
          if args.val.endswith((".hdf5", ".h5"))
          else PackedDataset(args.val, vocab, cat2name))
    # same eval-time resize/normalize the Trainer applies before decode
    # (train/trainer.py augment_eval) — packed images are raw pixels
    from blt_vqg_tpu.data.augment import make_augment_fn
    augment = make_augment_fn(cfg.image_size, train=False)
    b = cfg.batch_size
    batches = []
    for i in range(args.batches):
        raw = ds.batch(np.arange(i * b, (i + 1) * b) % len(ds))
        ex = example_from_row(raw, cfg.input_mode)
        ex["images"] = augment(ex["images"], jax.random.key(i))
        batches.append(ex)

    latent = True  # flagship run ends past num_pretraining_steps
    results = {}
    ref_tokens = None
    overrides = {
        "xla": {},
        "stream": {"use_stream_decode": True},
        "stream_h8": {"use_stream_decode": True,
                      "stream_head_dtype": "int8"},
        "stream_int8": {"use_stream_decode": True,
                        "stream_weight_dtype": "int8"},
        "stream_int8_nofh": {"use_stream_decode": True,
                             "stream_weight_dtype": "int8",
                             "stream_fused_head": "off"},
    }
    for name in args.variants.split(","):
        kw = {"use_stream_decode": False, "stream_weight_dtype": "bfloat16",
              "stream_head_dtype": "auto", "stream_fused_head": "auto"}
        kw.update(overrides[name])
        c = cfg.replace(**kw)
        model = IQ(c, len(vocab))
        state = create_train_state(c, model, jax.random.key(0), batches[0])
        state = CheckpointManager(
            os.path.join(args.model_dir, "checkpoints"),
            backend=c.checkpoint_backend).restore(state)
        # restore() returns host leaves: device_put once or every decode
        # call re-uploads the full state through the tunnel
        # (cli/evaluate_iq.py, same fix)
        state = state.replace(params=jax.device_put(state.params),
                              batch_stats=jax.device_put(state.batch_stats))
        step = int(state.step)
        dec = make_decode_step(c, model, latent_mode=latent,
                               with_probe=False)
        hyps, refs, toks = [], [], []
        for i, batch in enumerate(batches):
            out = dec(state, batch["images"], batch["context"],
                      jax.random.key(i))
            toks.append(np.asarray(out["tokens"]))
            for row, ref in zip(toks[-1], batch["target"]):
                hyps.append(" ".join(filter_special_tokens(
                    vocab.tokens_to_words(row))) or "<empty>")
                refs.append(" ".join(filter_special_tokens(
                    vocab.tokens_to_words(ref))) or "<empty>")
        toks = np.concatenate(toks)
        scores = NLGEval().compute_metrics([refs], hyps)
        entry = {k: round(v * 100, 2) for k, v in scores.items()}
        if ref_tokens is None:
            ref_tokens = toks
        else:
            entry["token_agreement_vs_first"] = round(
                float((toks == ref_tokens).mean()), 4)
        results[name] = entry
        print(f"{name}: {entry}", file=sys.stderr, flush=True)

    print(json.dumps({"step": step, "n": len(batches) * b, **results}))


if __name__ == "__main__":
    main()
