"""Unit tests for the ops layer: timing signal, masks, attention, latent.

Golden values come from the formulas the reference implements
(transformer_layers.py:542-557 timing, :536-540 KL, :63-85 masks) — computed
independently in numpy here, not copied.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.ops.timing import timing_signal
from blt_vqg_tpu.ops.masks import pad_mask, causal_mask, decoder_mask
from blt_vqg_tpu.ops.attention import MultiHeadAttention
from blt_vqg_tpu.ops.latent import Latent, gaussian_kld


class TestTimingSignal:
    def test_shape_and_range(self):
        sig = timing_signal(50, 32)
        assert sig.shape == (1, 50, 32)
        assert np.all(np.abs(np.asarray(sig)) <= 1.0 + 1e-6)

    def test_t2t_layout(self):
        """sin block then cos block (concatenated, not interleaved)."""
        length, channels = 8, 10
        sig = np.asarray(timing_signal(length, channels))[0]
        num_ts = channels // 2
        log_inc = np.log(1e4) / (num_ts - 1)
        inv = np.exp(np.arange(num_ts) * -log_inc)
        t = np.arange(length)[:, None] * inv[None, :]
        np.testing.assert_allclose(sig[:, :num_ts], np.sin(t), atol=1e-5)
        np.testing.assert_allclose(sig[:, num_ts:2 * num_ts], np.cos(t), atol=1e-5)

    def test_odd_channels_padded(self):
        sig = np.asarray(timing_signal(4, 7))
        assert sig.shape == (1, 4, 7)
        np.testing.assert_allclose(sig[0, :, -1], 0.0)

    def test_position_zero(self):
        sig = np.asarray(timing_signal(4, 8))[0]
        np.testing.assert_allclose(sig[0, :4], 0.0, atol=1e-7)  # sin(0)
        np.testing.assert_allclose(sig[0, 4:], 1.0, atol=1e-7)  # cos(0)


class TestMasks:
    def test_pad_mask(self):
        toks = jnp.array([[1, 2, 0, 0], [3, 0, 0, 0]])
        m = pad_mask(toks)
        assert m.shape == (2, 1, 1, 4)
        np.testing.assert_array_equal(
            np.asarray(m[:, 0, 0]),
            [[False, False, True, True], [False, True, True, True]])

    def test_causal_mask(self):
        m = np.asarray(causal_mask(3))[0, 0]
        np.testing.assert_array_equal(
            m, [[False, True, True], [False, False, True], [False, False, False]])

    def test_decoder_mask_combines(self):
        toks = jnp.array([[5, 6, 0]])
        m = np.asarray(decoder_mask(toks))[0, 0]
        # row i: future masked AND pad col masked
        np.testing.assert_array_equal(
            m, [[False, True, True], [False, False, True], [False, False, True]])


class TestAttentionTaps:
    def test_attn_weights_via_intermediates(self):
        """Interpretability tap (reference attn_dist returns,
        transformer_layers.py:514): attention maps are sown into the
        'intermediates' collection and only materialize when requested."""
        from blt_vqg_tpu.ops.attention import MultiHeadAttention
        mha = MultiHeadAttention(16, 2, dropout_rate=0.0, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (2, 5, 16))
        params = mha.init(jax.random.key(1), x, x)
        out, inter = mha.apply(params, x, x, mutable=["intermediates"])
        w = inter["intermediates"]["attn_weights"][0]
        assert w.shape == (2, 2, 5, 5)
        np.testing.assert_allclose(np.asarray(w.sum(-1)),
                                   np.ones((2, 2, 5)), atol=1e-5)
        # default apply: no intermediates, same output
        out2 = mha.apply(params, x, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


class TestAttention:
    def test_matches_naive_softmax_attention(self):
        b, t, d, h = 2, 5, 16, 4
        mha = MultiHeadAttention(d, h, dropout_rate=0.0, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (b, t, d))
        params = mha.init(jax.random.key(1), x, x)
        out = mha.apply(params, x, x)
        # naive recompute from the same params
        p = params["params"]
        q = (x @ p["q_proj"]["kernel"]).reshape(b, t, h, d // h) * ((d // h) ** -0.5)
        k = (x @ p["k_proj"]["kernel"]).reshape(b, t, h, d // h)
        v = (x @ p["v_proj"]["kernel"]).reshape(b, t, h, d // h)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k)
        w = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        ctx = np.einsum("bhqk,bkhd->bqhd", np.asarray(w), v).reshape(b, t, d)
        expected = ctx @ p["out_proj"]["kernel"]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)

    def test_masked_positions_ignored(self):
        b, t, d = 1, 4, 8
        mha = MultiHeadAttention(d, 2, dropout_rate=0.0, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (b, t, d))
        params = mha.init(jax.random.key(1), x, x)
        mask = jnp.zeros((b, 1, 1, t), dtype=bool).at[:, :, :, -1].set(True)
        out1 = mha.apply(params, x, x, mask)
        x2 = x.at[:, -1].set(999.0)  # perturb only the masked key position
        out2 = mha.apply(params, x2, x2, mask)
        # queries at non-masked positions see identical keys/values
        np.testing.assert_allclose(np.asarray(out1[:, :3]),
                                   np.asarray(out2[:, :3]), atol=1e-4)

    def test_step_matches_full_causal(self):
        """KV-cache decode must equal full causal attention, step by step."""
        b, t, d, h = 2, 6, 16, 4
        mha = MultiHeadAttention(d, h, dropout_rate=0.0, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (b, t, d))
        params = mha.init(jax.random.key(1), x, x)

        causal = jnp.triu(jnp.ones((t, t), dtype=bool), 1)[None, None]
        full = mha.apply(params, x, x, causal)

        ck = jnp.zeros((b, t, h, d // h))
        cv = jnp.zeros((b, t, h, d // h))
        outs = []
        for i in range(t):
            (o, ck, cv) = mha.apply(params, x[:, i:i + 1], ck, cv, i,
                                    method=MultiHeadAttention.step)
            outs.append(o)
        stepped = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                                   atol=1e-4)


class TestLatent:
    def test_gaussian_kld_zero_when_equal(self):
        mu = jnp.ones((3, 4)); lv = jnp.zeros((3, 4)) - 0.3
        np.testing.assert_allclose(np.asarray(gaussian_kld(mu, lv, mu, lv)),
                                   0.0, atol=1e-6)

    def test_gaussian_kld_formula(self):
        rng = np.random.RandomState(0)
        mq, lq, mp, lp = [rng.randn(2, 5).astype(np.float32) for _ in range(4)]
        got = np.asarray(gaussian_kld(*map(jnp.asarray, (mq, lq, mp, lp))))
        want = -0.5 * np.sum(
            1 + (lq - lp) - (mp - mq) ** 2 / np.exp(lp) - np.exp(lq) / np.exp(lp),
            axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_train_vs_eval_paths(self):
        lat = Latent(latent_dim=8, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (4, 16))
        xp = jax.random.normal(jax.random.key(1), (4, 16))
        params = lat.init({"params": jax.random.key(2),
                           "latent": jax.random.key(3)}, x, xp)
        kld, z, (mp, lp) = lat.apply(params, x, xp,
                                     rngs={"latent": jax.random.key(4)})
        assert kld.shape == () and float(kld) != 0.0
        assert z.shape == (4, 8) and mp is not None
        kld0, z0, (m0, _) = lat.apply(params, x, None,
                                      rngs={"latent": jax.random.key(4)})
        assert float(kld0) == 0.0 and m0 is None and z0.shape == (4, 8)

    def test_reparam_uses_rng(self):
        lat = Latent(latent_dim=8, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (4, 16))
        params = lat.init({"params": jax.random.key(2),
                           "latent": jax.random.key(3)}, x, None)
        _, z1, _ = lat.apply(params, x, None, rngs={"latent": jax.random.key(1)})
        _, z2, _ = lat.apply(params, x, None, rngs={"latent": jax.random.key(9)})
        assert not np.allclose(np.asarray(z1), np.asarray(z2))
