"""Separability probe: can a FROZEN RANDOM ResNet-18 recover the learnable
dataset's visual attributes?

The `make_flagship_dataset.py --learnable` corpus makes every question a
deterministic template of (background color a, square color b, category).
The model observes the image only through a frozen randomly-initialized
ResNet-18 (reference encoder_cnn.py:18-19 freezes a *pretrained* backbone;
no pretrained weights exist offline, so training runs use a frozen random
one).  This probe quantifies the information ceiling that choice imposes:
GAP features of held-out val images are classified by (i) nearest
class-centroid and (ii) a closed-form ridge linear probe, split across
noise-variant blocks so train/test share attributes but not nuisance.

Result recorded in benchmarks/flagship_learnable.md: the 144-way (a, b)
combo is ~91% linearly separable — the visual information survives the
frozen random backbone, so end-to-end BLEU is gated by optimization, not
by the encoder.

Usage: python benchmarks/probe_frozen_cnn.py [--root /root/data_flagship_learn]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NA = 12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/data_flagship_learn")
    p.add_argument("--num", type=int, default=576,
                   help="val images to use (multiple of 144)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from blt_vqg_tpu.data.augment import normalize_images
    from blt_vqg_tpu.ops.resnet import ResNet18Backbone

    img_dir = os.path.join(args.root, "images")
    paths = {}
    for path in glob.glob(os.path.join(img_dir, "COCO_val2014_*.jpg")):
        m = re.match(r"COCO_val2014_(\d+)\.jpg", os.path.basename(path))
        paths[int(m.group(1))] = path
    ids = sorted(paths)[:args.num]
    imgs = np.stack([np.asarray(Image.open(paths[i]).convert("RGB"),
                                dtype=np.float32) / 255.0 for i in ids])
    idx = np.array(ids) - 1
    ab = np.stack([idx % NA, (idx // NA) % NA], 1)
    combo = ab[:, 0] + NA * ab[:, 1]

    model = ResNet18Backbone()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1,) + imgs.shape[1:]), train=False)
    feat_fn = jax.jit(lambda x: model.apply(params, normalize_images(x),
                                            train=False))
    feats = [np.asarray(feat_fn(jnp.asarray(imgs[k:k + 64])))
             for k in range(0, len(imgs), 64)]
    F = np.concatenate(feats)

    # split across noise-variant blocks (image index // 144), so train and
    # test share the attribute scheme but no nuisance noise
    blocks = idx // (NA * NA)
    tr = blocks < (blocks.max() + 1) // 2
    te = ~tr

    mu, sd = F[tr].mean(0), F[tr].std(0) + 1e-6

    def centroid_acc(y):
        ks = np.unique(y)
        C = np.stack([F[tr & (y == k)].mean(0) for k in ks])
        d = (((F[te, None] - C[None]) / sd) ** 2).sum(-1)
        return float((ks[np.argmin(d, 1)] == y[te]).mean())

    def linear_acc(y, ridge=1e-2):
        ks = np.unique(y)
        Y = np.eye(len(ks))[np.searchsorted(ks, y)]
        Ftr = np.concatenate([(F[tr] - mu) / sd,
                              np.ones((tr.sum(), 1))], 1)
        Fte = np.concatenate([(F[te] - mu) / sd,
                              np.ones((te.sum(), 1))], 1)
        W = np.linalg.solve(Ftr.T @ Ftr + ridge * np.eye(Ftr.shape[1]),
                            Ftr.T @ Y[tr])
        return float((ks[np.argmax(Fte @ W, 1)] == y[te]).mean())

    out = {
        "n_train": int(tr.sum()), "n_test": int(te.sum()),
        "centroid_bg_a": centroid_acc(ab[:, 0]),
        "centroid_combo": centroid_acc(combo),
        "linear_bg_a": linear_acc(ab[:, 0]),
        "linear_sq_b": linear_acc(ab[:, 1]),
        "linear_combo": linear_acc(combo),
        "chance_combo": 1.0 / (NA * NA),
    }
    for k, v in out.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
