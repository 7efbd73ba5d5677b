"""Hand-rolled training loop against the raw step API.

The modern counterpart of the reference's legacy manual loop
(reference old_train_iq.py:281-473 — dual optimizers, epoch loop,
WeightedRandomSampler, per-epoch torch.save; the file is broken upstream,
SURVEY.md §2.1 #5).  This example shows the same degrees of freedom on the
TPU-native API without the Trainer harness:

    python examples/manual_train_loop.py          # runs on synthetic data

- builds its own loaders (optionally class-rebalanced via sample_weights)
- drives make_train_step directly, switching phase by swapping the jitted fn
- pokes a custom LR by rebuilding the optimizer (the supported analog of the
  reference's param_groups poke, train_iq.py:252-257 — the Noam schedule is
  already inside the optimizer; shown here for API completeness)
- saves checkpoints whenever it likes
"""

import os
import tempfile

import jax
import numpy as np

from blt_vqg_tpu.core.checkpoint import CheckpointManager
from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.core.rng import RngStream
from blt_vqg_tpu.data.augment import make_augment_fn
from blt_vqg_tpu.data.dataset import IQDataset
from blt_vqg_tpu.data.loader import make_loader
from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.text.vocabulary import Vocabulary
from blt_vqg_tpu.train.schedule import ReduceLROnPlateau, noam_schedule
from blt_vqg_tpu.train.state import create_train_state
from blt_vqg_tpu.train.step import make_train_step


def main():
    cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                 num_layers=2, num_heads=4, batch_size=8, image_size=32,
                 num_pretraining_steps=3, total_training_steps=8,
                 full_kl_step=4, dtype="float32")

    tmp = tempfile.mkdtemp()
    h5 = write_synthetic_hdf5(os.path.join(tmp, "train.hdf5"),
                              num_questions=64, num_images=8, im_size=32,
                              vocab_size=50)
    vocab = Vocabulary()
    for i in range(50 - len(vocab)):
        vocab.add_word(f"w{i}")

    ds = IQDataset(h5, vocab)
    # class-rebalanced sampling, as the legacy loop did with
    # WeightedRandomSampler (old_train_iq.py:316-327)
    weights = np.ones(len(ds))
    loader = make_loader(ds, cfg.batch_size, "ans", sample_weights=weights)

    aug = make_augment_fn(cfg.image_size, train=True)
    rngs = RngStream(cfg.seed)
    model = IQ(cfg, len(vocab))

    first = next(loader)
    first = {k: first[k] for k in ("images", "context", "posterior", "target")}
    first["images"] = aug(first["images"], rngs.key(0))
    state = create_train_state(cfg, model, jax.random.key(0), first)

    steps = {False: make_train_step(cfg, latent_mode=False),
             True: make_train_step(cfg, latent_mode=True)}
    ckpt = CheckpointManager(os.path.join(tmp, "ckpt"))

    # metric-driven LR decay, as the legacy loop's ReduceLROnPlateau
    # (old_train_iq.py:360-362) — the scale folds into the state's lr_fn
    # (a static field: swapping it recompiles the step, which is the
    # correct price for a rare schedule change)
    sched = ReduceLROnPlateau(factor=0.1, patience=2)
    base_lr = noam_schedule(cfg.hidden_dim, cfg.warmup_steps)
    lr_scale = 1.0

    for i in range(cfg.total_training_steps):
        latent = i >= cfg.num_pretraining_steps
        if i == cfg.num_pretraining_steps:
            state = state.reset_optimizer()   # Adam restart at the boundary
        batch = next(loader)
        batch = {k: batch[k] for k in ("images", "context", "posterior",
                                       "target")}
        batch["images"] = aug(batch["images"], rngs.key(i + 1))
        state, metrics = steps[latent](state, batch, rngs.key(i))
        scale = sched.update(float(metrics["loss"]))
        if scale != lr_scale:
            lr_scale = scale
            state = state.replace(
                lr_fn=lambda s, sc=scale: base_lr(s) * sc)
            print(f"  plateau: LR scaled by {scale:g}")
        print(f"step {i} latent={latent} loss={float(metrics['loss']):.4f} "
              f"kld={float(metrics['kld']):.4f}")
        if (i + 1) % 4 == 0:
            ckpt.save(state, cfg)
    print("final checkpoint:", ckpt.latest_step())


if __name__ == "__main__":
    main()
