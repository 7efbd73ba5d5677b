"""Latent-phase decay probe (VERDICT r3 #2).

The flagship learnable run (benchmarks/flagship_learnable.md) showed
prior-sampled decode BLEU-4 decaying 97.0 → 77.3 over 1,500 latent-phase
steps while val kld fell 0.70 → 0.24.  This probe reproduces the dynamics
at small scale with full z-instrumentation, to separate the candidate
causes:

  (a) prior-VARIANCE growth — the KL term is cheapest to satisfy by
      widening the prior around the per-image posterior means, so PRIOR
      SAMPLES drift from the decodable region while the prior MEAN stays
      good.  Signature: bleu4_prior_mean stable, bleu4_prior_sample decays,
      z_prior_logvar rises.
  (b) posterior collapse — z stops carrying information.  Signature:
      active_dims → 0, ALL three decode variants converge downward.
  (c) decoder drift — the decoder forgets how to use prior-region z.
      Signature: bleu4_posterior_mean decays too.

Builds a small flagship-style learnable corpus (image-dependent 6-word
template questions; same generator as the flagship run, smaller sizes)
through the REAL ETL, trains the two-phase schedule with
``latent_diagnostics=True``, then prints the per-validation series parsed
from the run's metrics JSONL.

Findings + the fix land in benchmarks/latent_decay.md.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/latent_decay_probe.py \
      [--root /root/data_decay_probe] [--out /root/runs/decay_probe] \
      [--latent-steps 3000] [--decode-z-source prior_sample]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(root: str, im_size: int = 48, num_qa: int = 6000,
                 num_images: int = 576, val_qa: int = 512,
                 val_images: int = 144, num_cats: int = 4,
                 vocab_words: int = 400):
    """Small flagship-style learnable corpus through the real ETL."""
    if os.path.exists(os.path.join(root, "summary.json")):
        print(f"corpus exists at {root}, skipping build")
        return
    from benchmarks.make_flagship_dataset import (
        make_images_learnable, make_qa_json_learnable, make_word_list)
    os.makedirs(root, exist_ok=True)
    n_ans = num_cats * 8
    all_words = make_word_list(vocab_words + n_ans, seed=0)
    q_words = all_words[:vocab_words]
    a_words = all_words[vocab_words:]
    cats = [f"cat{i}" for i in range(num_cats)]
    answers_by_cat = {c: a_words[i * 8:(i + 1) * 8]
                      for i, c in enumerate(cats)}
    cat2ans_path = os.path.join(root, "cat2ans.json")
    with open(cat2ans_path, "w") as f:
        json.dump(answers_by_cat, f)
    img_dir = os.path.join(root, "images")
    make_images_learnable(img_dir, "train", num_images, im_size, seed=2)
    make_images_learnable(img_dir, "val", val_images, im_size, seed=3)
    qp, ap = make_qa_json_learnable(root, "train", num_qa, num_images,
                                    q_words, answers_by_cat, seed=1)
    vqp, vap = make_qa_json_learnable(root, "val", val_qa, val_images,
                                      q_words, answers_by_cat, seed=4)

    from blt_vqg_tpu.cli.store_dataset import main as store_main
    vocab_path = os.path.join(root, "vocab_iq.json")
    for questions, annotations, out, extra in (
            (qp, ap, os.path.join(root, "iq_dataset.hdf5"), []),
            (vqp, vap, os.path.join(root, "iq_val_dataset.hdf5"), ["--val"])):
        rc = store_main(["--image-dir", img_dir, "--questions", questions,
                         "--annotations", annotations, "--cat2ans",
                         cat2ans_path, "--vocab-path", vocab_path,
                         "--output", out, "--cat2name",
                         os.path.join(root, "cat2name.json"),
                         "--im_size", str(im_size), "--uint8"] + extra)
        assert rc == 0
    with open(os.path.join(root, "summary.json"), "w") as f:
        json.dump({"num_qa": num_qa, "num_images": num_images,
                   "im_size": im_size, "num_cats": num_cats}, f)


def run(args):
    from blt_vqg_tpu.core.config import Config
    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.loader import make_loader
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.trainer import Trainer

    root = args.root
    cfg = Config(
        emb_dim=64, hidden_dim=args.hidden, latent_dim=args.hidden,
        pwffn_dim=2 * args.hidden, num_layers=2, num_heads=4,
        batch_size=32, image_size=48, input_mode="cat",
        num_pretraining_steps=args.pretrain_steps,
        total_training_steps=args.pretrain_steps + args.latent_steps,
        full_kl_step=args.full_kl_step,
        kl_ceiling=args.kl_ceiling, kl_floor=args.kl_floor,
        aux_ceiling=args.aux_ceiling,
        val_check_interval=args.val_every, checkpoint_every=100_000,
        checkpoint_at_end=args.checkpoint_at_end, limit_val_batches=8,
        latent_diagnostics=True, decode_z_source=args.decode_z_source,
        dtype="float32", seed=args.seed,
        dataset=os.path.join(root, "iq_dataset.hdf5"),
        val_dataset=os.path.join(root, "iq_val_dataset.hdf5"),
        vocab=os.path.join(root, "vocab_iq.json"),
        cat2name=os.path.join(root, "cat2name.json"),
        output_dir=args.out)
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "args.json"))  # for downstream
    # evals (benchmarks/eval_stream_int8.py reloads the run config)
    vocab = load_vocab(cfg.vocab)
    ds = IQDataset(cfg.dataset, vocab, cfg.cat2name)
    val_ds = IQDataset(cfg.val_dataset, vocab, cfg.cat2name)
    trainer = Trainer(cfg, vocab)
    train_iter = make_loader(ds, cfg.batch_size, cfg.input_mode,
                             seed=cfg.seed)
    first = next(train_iter)
    state = trainer.init_state(
        {k: first[k] for k in ("images", "context", "posterior", "target")},
        resume=args.resume)
    state = trainer.fit(
        state, train_iter,
        lambda: make_loader(val_ds, cfg.batch_size, cfg.input_mode,
                            epochs=1, shuffle=False))
    return cfg


def report(out_dir: str):
    """Parse the metrics JSONL into a per-validation table."""
    import glob
    paths = glob.glob(os.path.join(out_dir, "*_metrics.jsonl"))
    rows = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                r = json.loads(line)
                if r.get("prefix") not in ("val", "zdiag", "nlg"):
                    continue
                rows.setdefault(r["step"], {}).update(
                    {k: v for k, v in r.items()
                     if k not in ("step", "wall_time", "prefix")})
    cols = ["nlg_Bleu_4", "val_kld_loss", "val_aux_acc",
            "zdiag_bleu4_prior_sample",
            "zdiag_bleu4_prior_mean", "zdiag_bleu4_posterior_mean",
            "zdiag_z_active_dims", "zdiag_z_prior_logvar",
            "zdiag_z_post_logvar", "zdiag_z_mean_gap",
            "zdiag_z_prior_mean_var"]
    hdr = ["step"] + [c.replace("zdiag_", "").replace("val_", "")
                      .replace("nlg_", "") for c in cols]
    print("\t".join(hdr))
    for step in sorted(rows):
        r = rows[step]
        vals = [f"{r[c]:.3f}" if c in r else "-" for c in cols]
        print("\t".join([str(step)] + vals))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/data_decay_probe")
    p.add_argument("--out", default="/root/runs/decay_probe")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--pretrain-steps", type=int, default=1500)
    p.add_argument("--latent-steps", type=int, default=3000)
    p.add_argument("--full-kl-step", type=int, default=500)
    p.add_argument("--kl-ceiling", type=float, default=0.5)
    p.add_argument("--kl-floor", type=float, default=0.0)
    p.add_argument("--aux-ceiling", type=float, default=1.0)
    p.add_argument("--val-every", type=int, default=250)
    p.add_argument("--decode-z-source", default="prior_sample",
                   choices=("prior_sample", "prior_mean"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--report-only", action="store_true")
    p.add_argument("--checkpoint-at-end", action="store_true",
                   help="save a final checkpoint (off by default: over the "
                   "tunnel device->host is ~0.4 MB/s; the h128 probe state "
                   "is small enough to save once for serving evals)")
    args = p.parse_args()
    if not args.report_only:
        build_corpus(args.root)
        run(args)
    report(args.out)


if __name__ == "__main__":
    main()
