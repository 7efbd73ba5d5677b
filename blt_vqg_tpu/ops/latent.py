"""Variational latent module (the VAE core).

Capability-parity with reference models/transformer_layers.py:15-59: a prior
network hidden→2·latent and a posterior network 2·hidden→2·latent (each a
3-Linear MLP with ReLUs), reparameterized sampling, and the
prior-vs-posterior Gaussian KL (reference transformer_layers.py:536-540).

TPU-native deltas: sampling noise comes from an explicit flax 'latent' RNG
stream (jit-safe, reproducible, per-device foldable) instead of global CUDA
RNG, and whether the posterior path runs is a *static* trace-time decision —
train and eval compile to separate programs, no data-dependent branching.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gaussian_kld(mu_q: jnp.ndarray, logvar_q: jnp.ndarray,
                 mu_p: jnp.ndarray, logvar_p: jnp.ndarray) -> jnp.ndarray:
    """KL(q || p) for diagonal Gaussians, summed over the latent dim.

    Same closed form as reference transformer_layers.py:536-540.
    """
    mu_q, logvar_q = mu_q.astype(jnp.float32), logvar_q.astype(jnp.float32)
    mu_p, logvar_p = mu_p.astype(jnp.float32), logvar_p.astype(jnp.float32)
    return -0.5 * jnp.sum(
        1.0 + (logvar_q - logvar_p)
        - jnp.square(mu_p - mu_q) / jnp.exp(logvar_p)
        - jnp.exp(logvar_q) / jnp.exp(logvar_p),
        axis=-1)


class _MeanLogvarNet(nn.Module):
    """Linear(in→2L) then 2×(ReLU→Dropout→Linear(2L→2L))."""
    latent_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(2 * self.latent_dim, dtype=self.dtype, name="in_proj")(x)
        for i in range(2):
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            h = nn.Dense(2 * self.latent_dim, dtype=self.dtype,
                         name=f"hidden_{i}")(h)
        return h


class Latent(nn.Module):
    latent_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.prior_net = _MeanLogvarNet(
            self.latent_dim, self.dropout_rate, self.dtype, name="prior")
        self.posterior_net = _MeanLogvarNet(
            self.latent_dim, self.dropout_rate, self.dtype, name="posterior")

    def __call__(self, x: jnp.ndarray, x_p: Optional[jnp.ndarray],
                 deterministic: bool = True, use_mean: bool = False,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray,
                            Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]]:
        """x: [B, H] context summary; x_p: [B, H] posterior summary or None.

        Returns (kld [B]→scalar-mean upstream, z [B, latent], posteriors).
        With x_p given (training), z is sampled from the posterior and kld is
        KL(posterior || prior); with x_p None (eval), z comes from the prior
        and kld is 0 (reference transformer_layers.py:41-59 contract).

        ``use_mean`` (static) returns the distribution MEAN instead of a
        reparameterized sample — the deterministic-decode diagnostic knob
        (cfg.decode_z_source="prior_mean"; benchmarks/latent_decay.md).  The
        'latent' RNG is still consumed so traces stay key-compatible.
        """
        ml_prior = self.prior_net(x, deterministic)
        mean_prior = ml_prior[:, :self.latent_dim]
        logvar_prior = ml_prior[:, self.latent_dim:]

        eps = jax.random.normal(
            self.make_rng("latent"), mean_prior.shape, dtype=jnp.float32)
        if use_mean:
            eps = jnp.zeros_like(eps)

        if x_p is None:
            std = jnp.exp(0.5 * logvar_prior.astype(jnp.float32))
            z = eps * std + mean_prior.astype(jnp.float32)
            kld = jnp.zeros((), dtype=jnp.float32)
            return kld, z.astype(self.dtype), (None, None)

        ml_post = self.posterior_net(
            jnp.concatenate([x_p, x], axis=-1), deterministic)
        mean_post = ml_post[:, :self.latent_dim]
        logvar_post = ml_post[:, self.latent_dim:]
        kld = jnp.mean(
            gaussian_kld(mean_post, logvar_post, mean_prior, logvar_prior))
        std = jnp.exp(0.5 * logvar_post.astype(jnp.float32))
        z = eps * std + mean_post.astype(jnp.float32)
        return kld, z.astype(self.dtype), (mean_post, logvar_post)

    def stats(self, x: jnp.ndarray, x_p: jnp.ndarray,
              deterministic: bool = True) -> dict:
        """Distribution diagnostics for the latent-decay instrumentation
        (VERDICT r3 #2): per-dim KL, prior/posterior spread, and how far
        prior samples land from the per-example posterior mean.

        Returns a dict of f32 arrays:
          kl_per_dim        [L]  batch-mean per-dim KL(q||p)
          prior_logvar      []   mean prior log-variance (sample noise scale)
          post_logvar       []   mean posterior log-variance
          prior_mean_var    []   variance of the prior mean ACROSS the batch
                                 (conditioning strength: ≈0 ⇒ unconditional)
          mean_gap          []   E[(mu_q − mu_p)²] (prior-decode bias)
        """
        ml_prior = self.prior_net(x, deterministic)
        mu_p = ml_prior[:, :self.latent_dim].astype(jnp.float32)
        lv_p = ml_prior[:, self.latent_dim:].astype(jnp.float32)
        ml_post = self.posterior_net(
            jnp.concatenate([x_p, x], axis=-1), deterministic)
        mu_q = ml_post[:, :self.latent_dim].astype(jnp.float32)
        lv_q = ml_post[:, self.latent_dim:].astype(jnp.float32)
        kl_dim = -0.5 * (1.0 + (lv_q - lv_p)
                         - jnp.square(mu_p - mu_q) / jnp.exp(lv_p)
                         - jnp.exp(lv_q) / jnp.exp(lv_p))   # [B, L]
        return {
            "kl_per_dim": jnp.mean(kl_dim, axis=0),
            "prior_logvar": jnp.mean(lv_p),
            "post_logvar": jnp.mean(lv_q),
            "prior_mean_var": jnp.mean(jnp.var(mu_p, axis=0)),
            "mean_gap": jnp.mean(jnp.square(mu_q - mu_p)),
        }
