"""LSTM/GRU sequence encoder/decoder cells via ``lax.scan``.

Capability-parity with the reference's legacy RNN stack (reference
models/base_rnn.py, encoder_rnn.py, decoder_rnn.py — dead code kept
importable for the ``--rnn-cell`` flag surface): variable-length encoding
(pad-masked final state), teacher-forced decoding, and stepwise greedy
unrolling.  On TPU the recurrence is a ``lax.scan`` whose per-step matmuls
XLA fuses onto the MXU; no cuDNN equivalent needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTMCellStack(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cells = [nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                           name=f"cell_{i}")
                      for i in range(self.num_layers)]

    def init_carry(self, rng, batch: int):
        return [cell.initialize_carry(
                    jax.random.fold_in(rng, i), (batch, self.hidden_size))
                for i, cell in enumerate(self.cells)]

    def __call__(self, carry, x):
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c, x = cell(c, x)
            new_carry.append(c)
        return new_carry, x


class GRUCellStack(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.cells = [nn.GRUCell(self.hidden_size, dtype=self.dtype,
                                 name=f"cell_{i}")
                      for i in range(self.num_layers)]

    def init_carry(self, rng, batch: int):
        return [cell.initialize_carry(
                    jax.random.fold_in(rng, i), (batch, self.hidden_size))
                for i, cell in enumerate(self.cells)]

    def __call__(self, carry, x):
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c, x = cell(c, x)
            new_carry.append(c)
        return new_carry, x


def _stack_for(rnn_cell: str, hidden: int, layers: int, dtype, name: str):
    cell = rnn_cell.lower()
    if cell == "lstm":
        return LSTMCellStack(hidden, layers, dtype, name=name)
    if cell == "gru":
        return GRUCellStack(hidden, layers, dtype, name=name)
    raise ValueError(f"unknown rnn cell {rnn_cell!r} (lstm|gru)")


class RNNEncoder(nn.Module):
    """Embeds tokens and scans the cell stack; returns per-step outputs and
    the last *valid* (non-pad) hidden output per sequence (the lax.scan
    rendering of pack_padded_sequence, reference encoder_rnn.py:62-87)."""
    vocab_size: int
    emb_dim: int
    hidden_size: int
    num_layers: int = 1
    rnn_cell: str = "lstm"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.emb_dim, dtype=self.dtype,
                              name="embed")
        self.stack = _stack_for(self.rnn_cell, self.hidden_size,
                                self.num_layers, self.dtype, "stack")

    def __call__(self, tokens: jnp.ndarray, pad_id: int = 0):
        b, t = tokens.shape
        x = self.embed(tokens)                      # [B, T, E]
        carry = self.stack.init_carry(jax.random.key(0), b)

        def step(carry, x_t):
            carry, y = self.stack(carry, x_t)
            return carry, y

        _, ys = nn.scan(
            lambda mdl, c, xs: mdl(c, xs),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)(self.stack, carry, x)
        # last valid output per row
        lengths = jnp.sum(tokens != pad_id, axis=1)
        idx = jnp.clip(lengths - 1, 0, t - 1)
        final = jnp.take_along_axis(ys, idx[:, None, None], axis=1)[:, 0]
        return ys, final


class RNNDecoder(nn.Module):
    """Teacher-forced decoding and greedy unrolling over the cell stack
    (reference decoder_rnn.py:99-162 capability)."""
    vocab_size: int
    emb_dim: int
    hidden_size: int
    num_layers: int = 1
    rnn_cell: str = "lstm"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.emb_dim, dtype=self.dtype,
                              name="embed")
        self.in_proj = nn.Dense(self.hidden_size, dtype=self.dtype,
                                name="in_proj")
        self.stack = _stack_for(self.rnn_cell, self.hidden_size,
                                self.num_layers, self.dtype, "stack")
        self.out_proj = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                 name="out_proj")

    def teacher_forced(self, tokens: jnp.ndarray,
                       init_context: Optional[jnp.ndarray] = None):
        """tokens [B, T] (already shifted); returns logits [B, T, V]."""
        b = tokens.shape[0]
        x = self.in_proj(self.embed(tokens))
        if init_context is not None:
            x = x.at[:, 0].add(init_context.astype(x.dtype))
        carry = self.stack.init_carry(jax.random.key(0), b)
        _, ys = nn.scan(
            lambda mdl, c, xs: mdl(c, xs),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)(self.stack, carry, x)
        return self.out_proj(ys)

    def greedy(self, batch: int, max_len: int, start_id: int,
               init_context: Optional[jnp.ndarray] = None):
        """Greedy unroll; returns tokens [B, max_len]."""
        carry = self.stack.init_carry(jax.random.key(0), batch)
        token0 = jnp.full((batch,), start_id, jnp.int32)

        def body(mdl, state, i):
            carry, token = state
            x = mdl.in_proj(mdl.embed(token))
            if init_context is not None:
                x = jnp.where(i == 0, x + init_context.astype(x.dtype), x)
            carry, y = mdl.stack(carry, x)
            logits = mdl.out_proj(y)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (carry, nxt), nxt

        _, tokens = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            out_axes=1)(self, (carry, token0), jnp.arange(max_len))
        return tokens
