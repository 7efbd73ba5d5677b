"""Flash-attention custom-VJP gradient parity vs the XLA autodiff path."""

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
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (b, tq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, tk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, tk, h, d), jnp.float32)
    co = jax.random.normal(ks[3], (b, tq, h, d), jnp.float32)
    return q, k, v, co


def grads(fn, q, k, v, cot):
    out, vjp = jax.vjp(fn, q, k, v)
    return out, vjp(cot)


class TestFlashBackward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_grad_parity(self, causal):
        b, t, h, d = 2, 16, 2, 8
        q, k, v, cot = rand_qkv(b, t, t, h, d, seed=causal)
        f_flash = lambda q, k, v: flash_attention(
            q, k, v, causal=causal, block_q=8, block_k=8)
        f_ref = lambda q, k, v: reference_attention(q, k, v, causal=causal)
        o1, (dq1, dk1, dv1) = grads(f_flash, q, k, v, cot)
        o2, (dq2, dk2, dv2) = grads(f_ref, q, k, v, cot)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dv1), np.asarray(dv2),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(dq1), np.asarray(dq2),
                                   atol=5e-3)

    def test_grad_parity_with_padding_and_unaligned(self):
        b, tq, tk, h, d = 2, 5, 11, 2, 8
        q, k, v, cot = rand_qkv(b, tq, tk, h, d, seed=7)
        kv_pad = jnp.broadcast_to(jnp.arange(tk)[None, :] >= 9, (b, tk))
        f_flash = lambda q, k, v: flash_attention(
            q, k, v, kv_pad, block_q=8, block_k=8)
        f_ref = lambda q, k, v: reference_attention(q, k, v, kv_pad)
        _, (dq1, dk1, dv1) = grads(f_flash, q, k, v, cot)
        _, (dq2, dk2, dv2) = grads(f_ref, q, k, v, cot)
        np.testing.assert_allclose(np.asarray(dq1), np.asarray(dq2),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(dv1), np.asarray(dv2),
                                   atol=5e-3)
        # masked keys receive zero gradient
        np.testing.assert_allclose(np.asarray(dk1[:, 9:]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv1[:, 9:]), 0.0, atol=1e-6)

    def test_multi_block_online_paths(self):
        """Tk spanning 4 key blocks exercises lse-based recompute."""
        b, tq, tk, h, d = 1, 16, 32, 1, 8
        q, k, v, cot = rand_qkv(b, tq, tk, h, d, seed=3)
        f_flash = lambda q, k, v: flash_attention(q, k, v,
                                                  block_q=8, block_k=8)
        f_ref = lambda q, k, v: reference_attention(q, k, v)
        _, g1 = grads(f_flash, q, k, v, cot)
        _, g2 = grads(f_ref, q, k, v, cot)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-3)

    def test_trains_through_module(self):
        """MultiHeadAttention(use_pallas=True) must be trainable end-to-end."""
        from blt_vqg_tpu.ops.attention import MultiHeadAttention
        b, t, dm = 2, 12, 16
        x = jax.random.normal(jax.random.key(0), (b, t, dm))
        mha = MultiHeadAttention(dm, 4, 0.0, jnp.float32, use_pallas=True,
                                 causal=True)
        params = mha.init(jax.random.key(1), x, x)

        def loss(p):
            return jnp.sum(jnp.square(mha.apply(p, x, x)))

        g = jax.grad(loss)(params)
        norm = sum(float(jnp.sum(jnp.abs(l)))
                   for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(norm) and norm > 0


class TestDeadRowGradients:
    def test_all_masked_row_matches_xla(self):
        """Causal row 0 with key 0 padded sees only masked keys.  The
        kernel's contract: such rows output ZERO with zero gradients
        (plain softmax degenerates to uniform-over-everything there,
        which a blockwise kernel cannot reproduce).  Regression for the
        (m, l)-residual fix: lse = m + log(l) loses log(l) to f32
        absorption at the fill, and ds/p need masked/dead zeroing
        (ops/pallas/flash_attention.py; same class of fix as the ring
        kernels)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from blt_vqg_tpu.ops.pallas.flash_attention import flash_attention

        b, t, h, d = 1, 16, 2, 8
        r = np.random.RandomState(3)
        q = jnp.asarray(r.randn(b, t, h, d), jnp.float32) * (d ** -0.5)
        k = jnp.asarray(r.randn(b, t, h, d), jnp.float32)
        v = jnp.asarray(r.randn(b, t, h, d), jnp.float32)
        pad = jnp.zeros((b, t), bool).at[:, 0].set(True)

        def xla_ref(q, k, v):
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            cm = jnp.triu(jnp.ones((t, t), bool), 1)[None, None]
            masked = cm | pad[:, None, None, :]
            s = jnp.where(masked, -1e30, s)
            w = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
            dead = jnp.all(masked, axis=-1)          # [B, H, Tq]
            return jnp.where(jnp.moveaxis(dead, 1, 2)[..., None], 0.0, out)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, pad, causal=True,
                                           block_q=8, block_k=8) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_ref(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b2 in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=5e-5)
