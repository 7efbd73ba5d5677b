"""Token-sampling logit filters: temperature, top-k, nucleus (top-p).

Serving capability extension — the reference decodes greedily only
(reference iq.py:134-143 argmax loop).  Pure functions over a [B, V]
logit row, jit-safe (static shapes, no data-dependent control flow), used
by ``IQ.decode_greedy(sample=True, ...)`` per decode step.

Filter composition order follows the de-facto standard (HF generate):
temperature → top-k → top-p; masked entries become -inf so a categorical
draw over the result respects the truncated distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Scales logits by 1/T.  T→0 approaches greedy, T>1 flattens."""
    if temperature == 1.0:
        return logits
    return logits / jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-6)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keeps the k largest logits per row; the rest go to -inf.  k <= 0
    disables the filter."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]         # [B, 1]
    return jnp.where(logits < kth, NEG, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filter: keeps the smallest set of tokens whose cumulative
    probability reaches ``p`` (the top-1 token always survives).  p >= 1
    disables the filter."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]        # desc
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    # exclusive cumulative mass BEFORE each token: the token is kept while
    # the mass already accepted is < p (so top-1 is always kept)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_before < p                                 # [B, V]
    # threshold logit = smallest kept logit per row
    kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                  axis=-1, keepdims=True)
    return jnp.where(logits < kth, NEG, logits)


def filter_logits(logits: jnp.ndarray, temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    """temperature → top-k → top-p, ready for ``jax.random.categorical``."""
    logits = apply_temperature(logits, temperature)
    logits = apply_top_k(logits, top_k)
    return apply_top_p(logits, top_p)


def sample_token(key: jax.Array, logits: jnp.ndarray,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0) -> jnp.ndarray:
    """One categorical draw per row from the filtered distribution."""
    return jax.random.categorical(
        key, filter_logits(logits, temperature, top_k, top_p), axis=-1
    ).astype(jnp.int32)
