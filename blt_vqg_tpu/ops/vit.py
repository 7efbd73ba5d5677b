"""ViT-B/16 image encoder (model-family extension; BASELINE.json config 4).

An alternative to the ResNet-18 feature extractor (ops/resnet.py): 16×16
patch embedding via a strided conv (one big MXU matmul), a CLS token,
learned position embeddings, pre-LN GELU transformer blocks (reusing
ops/transformer.py EncoderLayer machinery), final LN, CLS → Dense(hidden).

The backbone lives under a ``backbone`` scope so the optimizer's
frozen-backbone mask (train/state.py) applies unchanged; the projection
head (``fc`` + ``feat_bn``) trains, mirroring the reference's frozen-CNN +
trainable-head recipe (reference encoder_cnn.py:8-35).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from blt_vqg_tpu.ops.transformer import EncoderLayer


class ViTBackbone(nn.Module):
    patch: int = 16
    depth: int = 12
    dim: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        """images [B, S, S, 3] → CLS feature [B, dim]."""
        b, s = images.shape[0], images.shape[1]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images)
        n = (s // self.patch) ** 2
        x = x.reshape(b, n, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n + 1, self.dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            layer = EncoderLayer(
                self.dim, self.heads, self.mlp_dim,
                attention_dropout=0.0, relu_dropout=0.0, layer_dropout=0.0,
                dtype=self.dtype, activation="gelu", name=f"block_{i}")
            x = layer(x, None, deterministic=True)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        return x[:, 0]


class ViTEncoder(nn.Module):
    """Frozen ViT backbone + trainable fc + BatchNorm head — drop-in for
    EncoderCNN (same output contract [B, hidden_dim])."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    patch: int = 16
    depth: int = 12
    dim: int = 768
    heads: int = 12
    mlp_dim: int = 3072

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = ViTBackbone(self.patch, self.depth, self.dim, self.heads,
                            self.mlp_dim, self.dtype,
                            name="backbone")(images, train)
        out = nn.Dense(self.hidden_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(stddev=0.02),
                       name="fc")(feats)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-5, dtype=self.dtype,
                           name="feat_bn")(out)
        return out
