"""On-device image augmentation (fused, jitted).

The reference augments on the host with PIL/torchvision —
ToTensor→ToPILImage→RandomResizedCrop(224, scale=(1.0, 1.2),
ratio=(3/4, 4/3))→ToTensor→Normalize (reference train_iq.py:264-272) — one
Python round-trip per image per step.  Here the batch is shipped to HBM once
(uint8 or f32) and the crop/resize/normalize runs as one jitted XLA program:
per-example random crop geometry → ``jax.image.scale_and_translate``
(batched, MXU-friendly) → mean/std normalize, with per-example randomness
from an explicit folded key.

Note the reference quirk: torchvision's RandomResizedCrop ``scale`` is the
*area* fraction of the original image — scale (1.0, 1.2) with ratio jitter
asks for crops ≥ the full image, which torchvision silently rejects (10
tries) and falls back to a center crop; the *effective* reference behavior
is ≈ deterministic center-crop-resize.  We implement the sampling honestly:
area fraction and aspect ratio are sampled, the crop is clamped inside the
image, and scale ≤ 1.0 configs behave like standard RandomResizedCrop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,3] float in [0,1] → ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def _sample_crop_boxes(key: jax.Array, batch: int, in_size: int,
                       scale: Tuple[float, float],
                       ratio: Tuple[float, float]):
    """Per-example (y0, x0, h, w) in input pixels, clamped to the image."""
    k_area, k_ratio, k_y, k_x = jax.random.split(key, 4)
    area_frac = jax.random.uniform(k_area, (batch,),
                                   minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (batch,),
        minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    target_area = area_frac * (in_size * in_size)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    w = jnp.clip(w, 8.0, in_size)
    h = jnp.clip(h, 8.0, in_size)
    y0 = jax.random.uniform(k_y, (batch,)) * (in_size - h)
    x0 = jax.random.uniform(k_x, (batch,)) * (in_size - w)
    return y0, x0, h, w


def _batched_crop_resize(x, y0, x0, h, w, out_size: int):
    """Bilinear-resamples per-example crop boxes, fully batched.

    x [B, S, S, C] f32; y0/x0/h/w [B] crop geometry in input pixels.
    One fused program of 4 batched gathers + lerp — per-example
    ``jax.image.scale_and_translate`` under vmap compiles 64 separate
    resample convolutions and runs ~100× slower on TPU.
    """
    b, in_size = x.shape[0], x.shape[1]
    # sample centers in input coordinates: [B, out]
    u = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = y0[:, None] + u[None, :] * h[:, None] - 0.5
    xs = x0[:, None] + u[None, :] * w[:, None] - 0.5
    y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, in_size - 1)
    x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, in_size - 1)
    y1i = jnp.clip(y0i + 1, 0, in_size - 1)
    x1i = jnp.clip(x0i + 1, 0, in_size - 1)
    fy = jnp.clip(ys - y0i.astype(jnp.float32), 0.0, 1.0)[:, :, None, None]
    fx = jnp.clip(xs - x0i.astype(jnp.float32), 0.0, 1.0)[:, None, :, None]

    bi = jnp.arange(b)[:, None, None]

    def grab(yi, xi):  # [B, out, out, C]
        return x[bi, yi[:, :, None], xi[:, None, :], :]

    top = grab(y0i, x0i) * (1 - fx) + grab(y0i, x1i) * fx
    bot = grab(y1i, x0i) * (1 - fx) + grab(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def make_augment_fn(out_size: int = 224,
                    scale: Tuple[float, float] = (1.0, 1.2),
                    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
                    train: bool = True,
                    input_scale: float = 255.0):
    """Returns jitted ``augment(images_u8_or_f32 [B,S,S,3], key) -> [B,o,o,3]``.

    Input convention is explicit, never inferred from pixel values:
    uint8 inputs are always divided by 255; float inputs are divided by
    ``input_scale`` — the default 255.0 matches the reference's hdf5 schema
    of raw 0..255 float RGB (reference utils/store_dataset.py:81-82).  Pass
    ``input_scale=1.0`` for images already in [0, 1].

    Eval path (train=False) is a deterministic full-image resize+normalize.
    """

    @functools.partial(jax.jit, static_argnums=())
    def augment(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        if images.dtype == jnp.uint8:
            x = images.astype(jnp.float32) / 255.0
        else:
            x = images.astype(jnp.float32) / input_scale
        b, in_size = x.shape[0], x.shape[1]
        if train:
            y0, x0, h, w = _sample_crop_boxes(key, b, in_size, scale, ratio)
            x = _batched_crop_resize(x, y0, x0, h, w, out_size)
        elif in_size != out_size:
            zeros = jnp.zeros((b,))
            full = jnp.full((b,), float(in_size))
            x = _batched_crop_resize(x, zeros, zeros, full, full, out_size)
        return normalize_images(x)

    return augment
