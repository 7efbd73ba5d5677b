"""IQ-RNN: the seq2seq model family (original-IQ lineage).

The reference carries the pre-transformer IQ machinery — EncoderRNN /
DecoderRNN / BaseRNN (reference models/encoder_rnn.py, decoder_rnn.py,
base_rnn.py, still imported by iq.py:17-18) with an ``--rnn-cell`` surface.
This module is its working TPU-native counterpart: the same forward contract
as models/iq.py's IQ (drop-in for train/step.py), but the context/posterior
encoders and the decoder are ``lax.scan`` LSTM/GRU stacks (ops/rnn.py).

Latent path matches the transformer variant: prior/posterior nets over the
encoder summaries, reparameterized z, KL; decoder consumes image(+z)
features as its step-0 context injection; image features are reconstructed
from the context summary (MSE), z_logit from z+image.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.ops.latent import Latent
from blt_vqg_tpu.ops.mlp import MLP
from blt_vqg_tpu.ops.resnet import EncoderCNN
from blt_vqg_tpu.ops.rnn import RNNDecoder, RNNEncoder

PAD, START, END = 0, 1, 3


class IQRNN(nn.Module):
    cfg: Config
    vocab_size: int

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.encoder_cnn = EncoderCNN(cfg.hidden_dim, dtype,
                                      name="encoder_cnn")
        rnn_kw = dict(vocab_size=self.vocab_size, emb_dim=cfg.emb_dim,
                      hidden_size=cfg.hidden_dim, num_layers=cfg.num_layers,
                      rnn_cell=cfg.rnn_cell, dtype=dtype)
        self.context_encoder = RNNEncoder(**rnn_kw, name="context_encoder")
        self.posterior_encoder = RNNEncoder(**rnn_kw, name="posterior_encoder")
        self.latent = Latent(cfg.latent_dim, dtype=dtype, name="latent")
        self.latent_projection = nn.Dense(cfg.hidden_dim, dtype=dtype,
                                          name="latent_projection")
        self.decoder = RNNDecoder(**rnn_kw, name="decoder")
        self.z_classifier = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                     name="z_classifier")
        self.image_reconstructor = MLP(cfg.pwffn_dim, cfg.hidden_dim,
                                       num_layers=2, dtype=dtype,
                                       name="image_reconstructor")

    def __call__(self, images, context, posterior, target,
                 latent_mode: bool = False, train: bool = False):
        cfg = self.cfg
        det = not train
        image_features = self.encoder_cnn(images, train=train)
        _, ctx_summary = self.context_encoder(context, PAD)
        ctx_summary = ctx_summary + image_features.astype(ctx_summary.dtype)

        kld = jnp.zeros((), jnp.float32)
        z_proj = None
        z_logit = None
        if latent_mode:
            _, post_summary = self.posterior_encoder(posterior, PAD)
            kld, z, _ = self.latent(ctx_summary, post_summary,
                                    deterministic=det)
            z_proj = self.latent_projection(z)
            z_logit = self.z_classifier(
                (z_proj + image_features).astype(jnp.float32))

        inject = ctx_summary + (0 if z_proj is None else z_proj)
        b = target.shape[0]
        sos = jnp.full((b, 1), START, dtype=target.dtype)
        shifted = jnp.concatenate([sos, target[:, :-1]], axis=1)
        logits = self.decoder.teacher_forced(shifted, init_context=inject)

        recon_in = ctx_summary if z_proj is None else ctx_summary + z_proj
        recon = self.image_reconstructor(recon_in, deterministic=det)
        return logits, z_logit, kld, (image_features.astype(jnp.float32),
                                      recon.astype(jnp.float32))

    def decode_greedy(self, images, context, max_decode_length: int = 50,
                      latent_mode: bool = False) -> Dict[str, jnp.ndarray]:
        image_features = self.encoder_cnn(images, train=False)
        _, ctx_summary = self.context_encoder(context, PAD)
        ctx_summary = ctx_summary + image_features.astype(ctx_summary.dtype)
        z_proj = 0
        if latent_mode:
            _, z, _ = self.latent(ctx_summary, None, deterministic=True)
            z_proj = self.latent_projection(z)
        inject = ctx_summary + z_proj
        tokens = self.decoder.greedy(context.shape[0], max_decode_length + 1,
                                     START, init_context=inject)
        return {"tokens": tokens}
