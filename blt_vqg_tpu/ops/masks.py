"""Attention masks.

Convention: boolean masks are True where attention is FORBIDDEN (matching the
reference's ``data.eq(pad)`` + masked_fill semantics, reference
transformer_layers.py:12-13, 504-506).  Masks are applied to f32 logits as an
additive -1e18 fill before softmax.  All shapes are static, so everything
here traces cleanly under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_FILL = -1e18


def pad_mask(tokens: jnp.ndarray, pad_idx: int = 0) -> jnp.ndarray:
    """[B, T] int tokens -> [B, 1, 1, T] bool, True at padding positions.

    Broadcasts over (heads, query_len) when applied to [B, H, Tq, Tk] logits.
    """
    return (tokens == pad_idx)[:, None, None, :]


def causal_mask(length: int) -> jnp.ndarray:
    """[1, 1, T, T] bool, True strictly above the diagonal (future)."""
    upper = jnp.triu(jnp.ones((length, length), dtype=bool), k=1)
    return upper[None, None]


def decoder_mask(target_tokens: jnp.ndarray, pad_idx: int = 0) -> jnp.ndarray:
    """Combined causal + key-padding mask for decoder self-attention.

    Equivalent to the reference's ``torch.gt(mask_trg + subsequent, 0)``
    combine (reference transformer_layers.py:205-207): position (i, j) is
    masked if j > i or token j is padding.
    """
    t = target_tokens.shape[1]
    return jnp.logical_or(pad_mask(target_tokens, pad_idx), causal_mask(t))


def apply_mask(logits: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return logits
    return jnp.where(mask, jnp.asarray(MASK_FILL, logits.dtype), logits)
