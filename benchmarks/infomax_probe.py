"""Information-maximization DIVERSITY probe (the open half of VERDICT r3
#3).

The round-4 info-max eval measured consistency 1.0000 on the flagship
corpus — but that corpus is deterministic (ONE valid question per (image,
category)), so distinct-rate 1/k is the CORRECT behavior there and the
reference's actual research claim (reference models/iq.py:124-127: prior
z-draws generate VARIED questions; the CVPR-2019 IQ paper's
"information-maximizing" objective) stayed untested.

This probe builds the missing corpus and measures the claim end to end:

1. **Paraphrase corpus**: the factored learnable template prefixed by one
   of T per-template style words (make_flagship_dataset.paraphrase_question)
   — T equally-valid questions per (image, category), drawn uniformly.
   Template identity is a function of NOTHING the model observes, so the
   posterior (which reads the target question) is the only path that can
   carry it into z.
2. **Two-phase training** (real Trainer, real ETL) with a checkpoint at the
   pretrain/latent boundary and at the end.
3. **The A/B**: k prior-sampled decodes per val image on
   - the PRETRAIN checkpoint (latent_mode=False — deterministic decoder):
     distinct_rate must sit at 1/k (cannot vary),
   - the LATENT checkpoint with z_source=prior_mean (deterministic z):
     same — z exists but isn't sampled,
   - the LATENT checkpoint with prior_sample (the reference decode):
     distinct_rate ≫ 1/k with valid_rate ≈ 1 is the information-
     maximization evidence — z (and only z) turns one valid question
     into MANY valid questions.

   Every draw is scored for exact validity against the corpus ground
   truth (train/infomax.py template_validity) and category consistency.

Findings land in benchmarks/infomax_probe.md.

Usage:
  python benchmarks/infomax_probe.py \
      [--root /root/data_infomax_probe] [--out /root/runs/infomax_probe]
      [--num-templates 4] [--k 8] [--eval-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_corpus(root: str, im_size: int = 48, num_qa: int = 8000,
                 num_images: int = 576, val_qa: int = 512,
                 val_images: int = 144, num_cats: int = 4,
                 vocab_words: int = 400, num_templates: int = 4):
    """Paraphrase probe corpus through the real ETL (the latent_decay probe
    recipe + --num-templates)."""
    if os.path.exists(os.path.join(root, "summary.json")):
        print(f"corpus exists at {root}, skipping build")
        return
    from benchmarks.make_flagship_dataset import (
        factored_consistency_map, make_images_learnable,
        make_qa_json_learnable, make_word_list, valid_questions_map)
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
    with open(os.path.join(root, "valid_questions.json"), "w") as f:
        json.dump(valid_questions_map(num_cats, num_templates, q_words), f)
    with open(os.path.join(root, "consistency_map.json"), "w") as f:
        json.dump(factored_consistency_map(num_cats, q_words), f)
    img_dir = os.path.join(root, "images")
    make_images_learnable(img_dir, "train", num_images, im_size, seed=2)
    make_images_learnable(img_dir, "val", val_images, im_size, seed=3)
    kw = dict(template="factored", num_templates=num_templates)
    qp, ap = make_qa_json_learnable(root, "train", num_qa, num_images,
                                    q_words, answers_by_cat, seed=1, **kw)
    vqp, vap = make_qa_json_learnable(root, "val", val_qa, val_images,
                                      q_words, answers_by_cat, seed=4, **kw)

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
                   "im_size": im_size, "num_cats": num_cats,
                   "num_templates": num_templates}, f)


def make_cfg(args):
    from blt_vqg_tpu.core.config import Config
    root = args.root
    return Config(
        emb_dim=64, hidden_dim=args.hidden, latent_dim=args.hidden,
        pwffn_dim=2 * args.hidden, num_layers=2, num_heads=4,
        batch_size=args.batch, image_size=48, input_mode="cat",
        num_pretraining_steps=args.pretrain_steps,
        total_training_steps=args.pretrain_steps + args.latent_steps,
        full_kl_step=args.full_kl_step,
        kl_ceiling=args.kl_ceiling, kl_floor=args.kl_floor,
        target_word_dropout=args.word_dropout,
        # a checkpoint lands exactly on the pretrain/latent boundary —
        # the deterministic-decoder baseline the A/B needs
        checkpoint_every=args.pretrain_steps,
        val_check_interval=args.val_every, limit_val_batches=8,
        latent_diagnostics=True, dtype="float32", seed=args.seed,
        dataset=os.path.join(root, "iq_dataset.hdf5"),
        val_dataset=os.path.join(root, "iq_val_dataset.hdf5"),
        vocab=os.path.join(root, "vocab_iq.json"),
        cat2name=os.path.join(root, "cat2name.json"),
        output_dir=args.out)


def run(args):
    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.loader import make_loader
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.trainer import Trainer

    cfg = make_cfg(args)
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "args.json"))
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
    trainer.fit(
        state, train_iter,
        lambda: make_loader(val_ds, cfg.batch_size, cfg.input_mode,
                            epochs=1, shuffle=False))
    return cfg


def evaluate(args):
    """The three-way A/B over k prior draws per val image."""
    import jax

    from blt_vqg_tpu.core.checkpoint import CheckpointManager
    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.loader import make_loader
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.infomax import (diversity_metrics,
                                           mapped_word_consistency,
                                           multi_z_decode, template_validity)
    from blt_vqg_tpu.train.step import make_decode_step
    from blt_vqg_tpu.train.trainer import Trainer

    cfg = make_cfg(args)
    vocab = load_vocab(cfg.vocab)
    val_ds = IQDataset(cfg.val_dataset, vocab, cfg.cat2name)
    trainer = Trainer(cfg, vocab)
    ckpt = CheckpointManager(os.path.join(cfg.output_dir, "checkpoints"),
                             backend=cfg.checkpoint_backend)
    with open(os.path.join(args.root, "valid_questions.json")) as f:
        valid_fn = template_validity(json.load(f))
    with open(os.path.join(args.root, "consistency_map.json")) as f:
        consistent_fn = mapped_word_consistency(json.load(f),
                                                vocab.idx2word)

    first = next(make_loader(val_ds, cfg.batch_size, cfg.input_mode,
                             shuffle=False, epochs=1, device=False))
    state0 = trainer.init_state(
        {k: np.asarray(first[k]) for k in ("images", "context", "posterior",
                                           "target")}, resume=False)

    variants = [
        ("pretrain_ckpt", args.pretrain_steps,
         make_decode_step(cfg, trainer.model, latent_mode=False)),
        ("latent_prior_mean", None,
         make_decode_step(cfg.replace(decode_z_source="prior_mean"),
                          trainer.model, latent_mode=True)),
        ("latent_prior_sample", None,
         make_decode_step(cfg, trainer.model, latent_mode=True)),
    ]
    results = {}
    for name, step_no, decode in variants:
        state = ckpt.restore(state0, step=step_no)
        state = state.replace(params=jax.device_put(state.params),
                              batch_stats=jax.device_put(state.batch_stats))
        samples, contexts, refs = [[] for _ in range(args.k)], [], []
        loader = make_loader(val_ds, cfg.batch_size, cfg.input_mode,
                             shuffle=False, epochs=1)
        for bi, batch in enumerate(loader):
            if args.max_batches and bi >= args.max_batches:
                break
            images = trainer.augment_eval(batch["images"],
                                          trainer.rngs.key(0))
            context = np.asarray(batch["answer_types"])[:, None].astype(
                np.int32)
            draws = multi_z_decode(decode, state, images, context,
                                   jax.random.key(5_000_000 + bi), args.k)
            for j, toks in enumerate(draws):
                samples[j].extend(trainer._detok(r) for r in toks)
            contexts.extend(int(c) for c in np.asarray(batch["answer_types"]))
            refs.extend(trainer._detok(r) for r in
                        np.asarray(batch["target"]))
        m = diversity_metrics(samples, contexts=contexts,
                              consistent_fn=consistent_fn, refs=refs,
                              valid_fn=valid_fn)
        m["ckpt_step"] = int(state.step)
        results[name] = m
        print(f"--- {name} (ckpt step {int(state.step)}, "
              f"k={args.k}, n={len(refs)} images)")
        for k, v in m.items():
            print(f"  {k}\t{v:.4f}")

    out_path = os.path.join(cfg.output_dir, "infomax_probe.json")
    with open(out_path, "w") as f:
        json.dump({"k": args.k, "results": results}, f, indent=2)
    print(f"wrote {out_path}")
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/data_infomax_probe")
    p.add_argument("--out", default="/root/runs/infomax_probe")
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--pretrain-steps", type=int, default=1500)
    p.add_argument("--latent-steps", type=int, default=3000)
    p.add_argument("--full-kl-step", type=int, default=500)
    p.add_argument("--kl-ceiling", type=float, default=0.5)
    # free bits ≥ ln(T): the corpus NEEDS ~1.4 nats of z-information for
    # T=4 templates; the latent-decay fix showed kl_floor keeps the
    # posterior from being squeezed below what the decoder uses
    p.add_argument("--kl-floor", type=float, default=4.0)
    # latent-phase decoder-input word dropout (anti-collapse lever if
    # scale alone doesn't push the template bits into z)
    p.add_argument("--word-dropout", type=float, default=0.0)
    p.add_argument("--num-templates", type=int, default=4)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--val-every", type=int, default=250)
    p.add_argument("--max-batches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    args = p.parse_args()
    if not args.eval_only:
        build_corpus(args.root, num_templates=args.num_templates)
        run(args)
    evaluate(args)


if __name__ == "__main__":
    main()
