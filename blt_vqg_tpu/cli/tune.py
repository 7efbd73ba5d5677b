"""HPO entry point (reference train_iq_ray.py capability, Ray-free).

    python -m blt_vqg_tpu.cli.tune --dataset ... --num-samples 4

Runs ASHA successive halving over the reference's search space
(train_iq_ray.py:343-354), one trial at a time on the local accelerator,
each trial checkpoint-resumable.  Early stopping protocol mirrors the
reference: metric val_loss (min), grace period = pretraining steps.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    from blt_vqg_tpu.core.config import add_config_args, config_from_args
    add_config_args(parser)
    parser.add_argument("--num-samples", type=int, default=4)
    parser.add_argument("--tune-dir", type=str, default="runs/tune")
    parser.add_argument("--tune-seed", type=int, default=0)
    parser.add_argument("--tune-space", type=str, default="reference",
                        choices=("reference", "tiny"),
                        help="'tiny' smoke-tests the HPO loop itself")
    parser.add_argument("--max_examples", type=int, default=None)
    args = parser.parse_args(argv)
    base_cfg = config_from_args(args)
    logging.basicConfig(level=logging.INFO)

    from blt_vqg_tpu.data.dataset import IQDataset
    from blt_vqg_tpu.data.loader import make_loader
    from blt_vqg_tpu.text.vocabulary import load_vocab
    from blt_vqg_tpu.train.trainer import Trainer
    from blt_vqg_tpu.train.tune import (run_tune, default_search_space,
                                        tiny_search_space)

    vocab = load_vocab(base_cfg.vocab)
    cat2name = (base_cfg.cat2name if os.path.exists(base_cfg.cat2name)
                else None)

    def train_trial_fn(cfg, trial_dir, stop_at_step):
        train_ds = IQDataset(cfg.dataset, vocab, cat2name,
                             max_examples=args.max_examples)
        val_ds = IQDataset(cfg.val_dataset, vocab, cat2name,
                           max_examples=args.max_examples)
        trainer = Trainer(cfg, vocab)
        train_iter = make_loader(train_ds, cfg.batch_size, cfg.input_mode,
                                 shuffle=True, seed=cfg.seed)
        first = next(train_iter)
        state = trainer.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")},
            resume=True)  # promoted trials resume from their checkpoint
        # drop_remainder=False: a sampled batch size may exceed a small
        # eval split; a one-off recompile for the tail batch beats losing
        # the whole split
        def val_loader():
            return make_loader(val_ds, cfg.batch_size, cfg.input_mode,
                               shuffle=False, epochs=1,
                               drop_remainder=False)

        state = trainer.fit(state, train_iter, val_loader,
                            max_steps=stop_at_step)
        latent = int(state.step) >= cfg.num_pretraining_steps
        val = trainer.validate(state, val_loader(), latent, int(state.step),
                               print_samples=0)
        return float(val["loss"])

    space = (tiny_search_space() if args.tune_space == "tiny"
             else default_search_space())
    run_tune(base_cfg, train_trial_fn, num_samples=args.num_samples,
             space=space, seed=args.tune_seed, output_dir=args.tune_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
