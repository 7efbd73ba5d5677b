"""ResNet-18 image encoder, TPU-native.

Capability-parity with reference models/encoder_cnn.py: a frozen pretrained
ResNet-18 backbone whose final fc is replaced by a trainable
Linear(512→hidden) + BatchNorm1d(momentum 0.01).  Here the backbone is
written in flax (XLA lowers convs + fused BN onto the MXU), its parameters
are excluded from the optimizer by a path mask (train/optimizer.py) instead
of ``requires_grad=False``, and pretrained weights are imported offline from
a torchvision ``resnet18`` state_dict file (``import_torch_resnet18``) —
TPU pod workers never download.

Layout note: images are NHWC (TPU-preferred), not NCHW.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(1, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet18Backbone(nn.Module):
    """Conv stem + 4 stages of 2 BasicBlocks + global average pool → [B, 512]."""
    dtype: jnp.dtype = jnp.bfloat16
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_filters: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, filters) in enumerate(
                zip(self.stage_sizes, self.stage_filters)):
            for block in range(blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(filters, stride, self.dtype,
                               name=f"stage{stage}_block{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool → [B, 512]


class EncoderCNN(nn.Module):
    """Frozen backbone + trainable fc(512→hidden) + BatchNorm (momentum .01).

    (reference encoder_cnn.py:8-35; fc init N(0, 0.02), zero bias)
    """
    hidden_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ResNet18Backbone(self.dtype, name="backbone")(images, train)
        out = nn.Dense(
            self.hidden_dim, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="fc")(feats)
        # torch BatchNorm1d(momentum=0.01) ≡ flax momentum 0.99
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-5, dtype=self.dtype, name="feat_bn")(out)
        return out


# ----------------------------------------------------------------------
# torchvision state_dict import (offline; run once on a CPU host)

_STAGE_NAMES = ("layer1", "layer2", "layer3", "layer4")


def import_torch_resnet18(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Maps a torchvision resnet18 ``state_dict`` (tensors or ndarrays) onto
    the (params, batch_stats) pytrees of ``ResNet18Backbone``.

    Conv kernels transpose OIHW→HWIO; BN scale/bias/mean/var map 1:1.
    """
    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    def conv(prefix):
        return {"kernel": arr(state_dict[prefix + ".weight"]).transpose(2, 3, 1, 0)}

    def bn(prefix):
        p = {"scale": arr(state_dict[prefix + ".weight"]),
             "bias": arr(state_dict[prefix + ".bias"])}
        s = {"mean": arr(state_dict[prefix + ".running_mean"]),
             "var": arr(state_dict[prefix + ".running_var"])}
        return p, s

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem_conv"] = conv("conv1")
    params["stem_bn"], stats["stem_bn"] = bn("bn1")
    for si, layer in enumerate(_STAGE_NAMES):
        for bi in range(2):
            name = f"stage{si}_block{bi}"
            tprefix = f"{layer}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["conv1"] = conv(f"{tprefix}.conv1")
            bp["bn1"], bs["bn1"] = bn(f"{tprefix}.bn1")
            bp["conv2"] = conv(f"{tprefix}.conv2")
            bp["bn2"], bs["bn2"] = bn(f"{tprefix}.bn2")
            if f"{tprefix}.downsample.0.weight" in state_dict:
                bp["down_conv"] = conv(f"{tprefix}.downsample.0")
                bp["down_bn"], bs["down_bn"] = bn(f"{tprefix}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def load_resnet18_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Loads a torchvision resnet18 checkpoint file and maps it onto the
    backbone pytrees (``cfg.resnet_ckpt`` — the reference's
    ``models.resnet18(pretrained=True)``, encoder_cnn.py:17-21, as an
    offline file).  Accepts a torch ``.pth`` state_dict (torch is CPU-only
    in this image — fine, this is a host-side load) or an ``.npz`` with the
    same key names."""
    if path.endswith(".npz"):
        sd = dict(np.load(path).items())
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return import_torch_resnet18(sd)
