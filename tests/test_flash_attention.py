"""Flash-attention kernel parity vs the XLA einsum path (interpret mode on
CPU; the identical kernel compiles on TPU — see benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.ops.pallas.flash_attention import flash_attention


def reference_attention(q, k, v, kv_pad=None, causal=False):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if kv_pad is not None:
        logits = jnp.where(kv_pad[:, None, None, :], -1e30, logits)
    if causal:
        t_q, t_k = q.shape[1], k.shape[1]
        cm = jnp.triu(jnp.ones((t_k, t_k), bool), 1)[None, None, :t_q, :]
        logits = jnp.where(cm, -1e30, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)


def rand_qkv(b, tq, tk, h, d, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, tq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, tk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, tk, h, d), jnp.float32)
    return q, k, v


class TestFlashAttention:
    def test_unmasked_small(self):
        q, k, v = rand_qkv(2, 16, 16, 2, 8)
        out = flash_attention(q, k, v, block_q=8, block_k=8)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_unaligned_lengths_padded(self):
        """Tq=5, Tk=11 with block 8 — padding must not leak into output."""
        q, k, v = rand_qkv(2, 5, 11, 2, 8, seed=1)
        out = flash_attention(q, k, v, block_q=8, block_k=8)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_key_padding_mask(self):
        b, tq, tk, h, d = 2, 8, 12, 2, 8
        q, k, v = rand_qkv(b, tq, tk, h, d, seed=2)
        keep = 7
        kv_pad = jnp.broadcast_to(jnp.arange(tk)[None, :] >= keep, (b, tk))
        out = flash_attention(q, k, v, kv_pad, block_q=8, block_k=8)
        ref = reference_attention(q, k, v, kv_pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)
        # perturbing masked keys must not change the output
        k2 = k.at[:, keep:].set(99.0)
        v2 = v.at[:, keep:].set(-99.0)
        out2 = flash_attention(q, k2, v2, kv_pad, block_q=8, block_k=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   atol=2e-3)

    def test_causal(self):
        b, t, h, d = 1, 16, 2, 8
        q, k, v = rand_qkv(b, t, t, h, d, seed=3)
        out = flash_attention(q, k, v, causal=True, block_q=8, block_k=8)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_causal_plus_padding(self):
        b, t, h, d = 2, 12, 2, 8
        q, k, v = rand_qkv(b, t, t, h, d, seed=6)
        kv_pad = jnp.broadcast_to(jnp.arange(t)[None, :] >= 9, (b, t))
        out = flash_attention(q, k, v, kv_pad, causal=True,
                              block_q=8, block_k=8)
        ref = reference_attention(q, k, v, kv_pad, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_multi_kblock_online_softmax(self):
        """Tk spanning 4 key blocks exercises the running max/denominator."""
        q, k, v = rand_qkv(1, 8, 32, 1, 8, seed=4)
        out = flash_attention(q, k, v, block_q=8, block_k=8)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_bf16_inputs(self):
        q, k, v = rand_qkv(1, 8, 8, 2, 8, seed=5)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out = flash_attention(q, k, v, block_q=8, block_k=8)
        ref = reference_attention(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref, dtype=np.float32),
                                   atol=3e-2)

    def test_module_integration_pallas_vs_xla(self):
        """MultiHeadAttention(use_pallas=True) must match the XLA path,
        including causal + pad masking as the decoder uses it."""
        from blt_vqg_tpu.ops.attention import MultiHeadAttention
        b, t, dmodel = 2, 12, 16
        x = jax.random.normal(jax.random.key(0), (b, t, dmodel))
        pad = jnp.broadcast_to(jnp.arange(t)[None, :] >= 9, (b, t))
        mask = pad[:, None, None, :]
        for causal in (False, True):
            mha_x = MultiHeadAttention(dmodel, 4, 0.0, jnp.float32,
                                       use_pallas=False, causal=causal)
            mha_p = MultiHeadAttention(dmodel, 4, 0.0, jnp.float32,
                                       use_pallas=True, causal=causal)
            params = mha_x.init(jax.random.key(1), x, x, mask)
            ox = mha_x.apply(params, x, x, mask)
            op = mha_p.apply(params, x, x, mask)
            np.testing.assert_allclose(np.asarray(ox), np.asarray(op),
                                       atol=2e-3, err_msg=f"causal={causal}")
