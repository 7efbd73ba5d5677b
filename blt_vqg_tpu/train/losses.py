"""Loss assembly (reference train_iq.py:81-103 semantics, fully in-graph).

Phase 1 (pretrain):   loss = rec + image_recon_lambda · img
Phase 2 (latent):     loss = rec + kl_ceiling · kl_weight(kliter) · kld
                             + aux_ceiling · aux + image_recon_lambda · img
where rec is token cross-entropy ignoring <pad>, img is MSE between CNN
features and their reconstruction, aux is the z-classifier's CE broadcast
across all timesteps (reference train_iq.py:92-94), and kl_weight is the
tanh anneal ``min(tanh(6·kliter/full_kl_step − 3) + 1, 1)`` (reference
train_iq.py:96-97).  Perplexity is exp(min(rec, 100)).

Everything is a jnp expression of traced values — no .item() host syncs in
the step (the reference pulls 5 scalars to host every step).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

PAD_ID = 0


class LossOutputs(NamedTuple):
    loss: jnp.ndarray
    rec: jnp.ndarray
    img: jnp.ndarray
    ppl: jnp.ndarray
    kld: jnp.ndarray
    aux: jnp.ndarray
    elbo: jnp.ndarray

    def as_dict(self):
        return self._asdict()


def masked_token_ce(logits: jnp.ndarray, targets: jnp.ndarray,
                    pad_id: int = PAD_ID) -> jnp.ndarray:
    """Mean cross-entropy over non-pad target tokens
    (reference nn.CrossEntropyLoss(ignore_index=pad), train_iq.py:54-55)."""
    logits = logits.astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def broadcast_token_ce(z_logit: jnp.ndarray, targets: jnp.ndarray,
                       pad_id: int = PAD_ID) -> jnp.ndarray:
    """Mean CE of ONE logit row per example against every non-pad target
    token of that example — mathematically identical to broadcasting
    ``z_logit`` across T and calling ``masked_token_ce`` (the reference's
    ``z_logit.unsqueeze(1).repeat(1, T, 1)`` aux loss, train_iq.py:92-94),
    but without materializing the [B, T, V] tensor: the logsumexp is
    computed once per example and T gathers pick the label logits."""
    z = z_logit.astype(jnp.float32)
    # stabilized logsumexp, as optax does inside its CE
    zmax = jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    lse = jnp.log(jnp.sum(jnp.exp(z - zmax), axis=-1)) + zmax[:, 0]  # [B]
    picked = jnp.take_along_axis(z, targets, axis=1)                 # [B, T]
    ce = lse[:, None] - picked
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def gaussian_kl_to_unit(mus: jnp.ndarray, logvars: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """KL to the unit normal, normalized by batch size (capability parity
    with reference train_utils.py:148-168 ``gaussian_KL_loss``)."""
    mus = mus.astype(jnp.float32)
    logvars = logvars.astype(jnp.float32)
    kld = -0.5 * jnp.sum(1.0 + logvars - jnp.square(mus) - jnp.exp(logvars))
    return kld / (mus.shape[0] + eps)


def vae_loss(logits: jnp.ndarray, targets: jnp.ndarray, mus: jnp.ndarray,
             logvars: jnp.ndarray, pad_id: int = PAD_ID) -> jnp.ndarray:
    """CE + unit-normal KL (reference train_utils.py:171-184 capability)."""
    return masked_token_ce(logits, targets, pad_id) + gaussian_kl_to_unit(
        mus, logvars)


def sequence_lengths(tokens: jnp.ndarray, pad_id: int = PAD_ID) -> jnp.ndarray:
    """Non-pad lengths per row (reference train_utils.py:127-141)."""
    return jnp.sum(tokens != pad_id, axis=1)


def kl_weight_schedule(kliter: jnp.ndarray, full_kl_step: int) -> jnp.ndarray:
    """tanh KL anneal (reference train_iq.py:96-97)."""
    w = jnp.tanh(6.0 * kliter.astype(jnp.float32) / full_kl_step - 3.0) + 1.0
    return jnp.minimum(w, 1.0)


def compute_losses(
    logits: jnp.ndarray,                 # [B, T, V] f32
    targets: jnp.ndarray,                # [B, T] int
    image_recon: tuple,                  # (feat [B,H], recon [B,H])
    kld: jnp.ndarray,                    # scalar
    z_logit: Optional[jnp.ndarray],      # [B, V] or None (pretrain)
    kliter: jnp.ndarray,                 # scalar int — latent-phase step count
    latent_mode: bool,                   # static
    kl_ceiling: float,
    aux_ceiling: float,
    image_recon_lambda: float,
    full_kl_step: int,
    kl_floor: float = 0.0,
) -> LossOutputs:
    rec = masked_token_ce(logits, targets)
    feat, recon = image_recon
    img = jnp.mean(jnp.square(feat.astype(jnp.float32) -
                              recon.astype(jnp.float32)))
    ppl = jnp.exp(jnp.minimum(rec, 100.0))

    if not latent_mode:
        zero = jnp.zeros((), jnp.float32)
        loss = rec + image_recon_lambda * img
        return LossOutputs(loss=loss, rec=rec, img=img, ppl=ppl,
                           kld=zero, aux=zero, elbo=rec)

    # z-classifier CE broadcast across timesteps (reference train_iq.py:92-94).
    # The broadcast rows are identical per example, so CE(z_rep, targets)
    # factors as logsumexp(z)[b] − z[b, targets[b, t]]: O(B·V) instead of a
    # materialized [B, T, V] f32 tensor (61 MB at the flagship config, with
    # several more in its softmax backward) — same value, bandwidth-diet.
    aux = broadcast_token_ce(z_logit, targets)

    kl_w = kl_weight_schedule(kliter, full_kl_step)
    elbo = rec + kld
    # Free-information floor (free bits, Kingma et al. 2016 §C.8, applied
    # to the TOTAL KL): once the posterior is within ``kl_floor`` nats of
    # the prior, the KL term stops pulling — this is the round-4 fix for
    # the latent-phase decay, where the saturated tanh anneal kept
    # squeezing kld toward 0 until z collapsed and free-running decode
    # degenerated (benchmarks/latent_decay.md).  kl_floor=0 is the exact
    # reference objective (train_iq.py:96-101).
    kl_term = jnp.maximum(kld, kl_floor) if kl_floor > 0.0 else kld
    loss = (rec + kl_ceiling * kl_w * kl_term + aux_ceiling * aux
            + image_recon_lambda * img)
    return LossOutputs(loss=loss, rec=rec, img=img, ppl=ppl,
                       kld=kld, aux=aux, elbo=elbo)


def two_gaussian_kl(mu1: jnp.ndarray, logvar1: jnp.ndarray,
                    mu2: jnp.ndarray, logvar2: jnp.ndarray) -> jnp.ndarray:
    """KL between two diagonal Gaussians, batch-mean-reduced.

    The legacy manual loop's answer-space vs category-space information
    loss (reference old_train_iq.py:262-278 ``compute_two_gaussian_loss``),
    exact formula incl. its epsilons and the sum-then-divide-by-batch
    reduction:
        0.5 * sum(logvar2 - logvar1
                  + (exp(logvar1) + (mu1-mu2)^2) / (exp(logvar2)+1e-8) - 1)
        / (B + 1e-8)
    """
    num = jnp.exp(logvar1) + jnp.square(mu1 - mu2)
    frac = num / (jnp.exp(logvar2) + 1e-8)
    kl = 0.5 * jnp.sum(logvar2 - logvar1 + frac - 1.0)
    return kl / (mu1.shape[0] + 1e-8)
