"""Sampled decoding: temperature / top-k / top-p filters (ops/sampling.py)
and the IQ decode integration.

Capability extension over the reference (greedy argmax only, reference
iq.py:134-143)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.ops.sampling import (apply_temperature, apply_top_k,
                                      apply_top_p, filter_logits,
                                      sample_token)


class TestFilters:
    LOGITS = jnp.asarray([[2.0, 1.0, 0.0, -1.0, -2.0]])

    def test_temperature_scales(self):
        out = apply_temperature(self.LOGITS, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.LOGITS) * 2)
        # T=1 is the identity object (no op inserted)
        assert apply_temperature(self.LOGITS, 1.0) is self.LOGITS

    def test_top_k_keeps_k(self):
        out = np.asarray(apply_top_k(self.LOGITS, 2))[0]
        assert np.isfinite(out[:2]).all()
        assert (out[2:] < -1e20).all()
        # k=0 and k>=V disable
        assert apply_top_k(self.LOGITS, 0) is self.LOGITS
        assert apply_top_k(self.LOGITS, 5) is self.LOGITS

    def test_top_p_nucleus(self):
        probs = np.asarray(jax.nn.softmax(self.LOGITS, -1))[0]
        # p just above the top-1 mass keeps exactly two tokens
        p = float(probs[0]) + 1e-4
        out = np.asarray(apply_top_p(self.LOGITS, p))[0]
        assert np.isfinite(out[:2]).all() and (out[2:] < -1e20).all()
        # tiny p still keeps the top-1 token
        out = np.asarray(apply_top_p(self.LOGITS, 1e-9))[0]
        assert np.isfinite(out[0]) and (out[1:] < -1e20).all()
        assert apply_top_p(self.LOGITS, 1.0) is self.LOGITS

    def test_top_p_unsorted_input(self):
        # the filter must work on unsorted rows (it sorts internally)
        logits = jnp.asarray([[0.0, 2.0, -2.0, 1.0, -1.0]])
        probs = np.asarray(jax.nn.softmax(logits, -1))[0]
        # p just UNDER the top-2 mass: the top-2 set already reaches p, so
        # exactly those two survive (the crossing token is kept, HF-style)
        p = float(probs[1] + probs[3]) - 1e-4
        out = np.asarray(apply_top_p(logits, p))[0]
        kept = np.isfinite(np.where(out < -1e20, -np.inf, out))
        assert kept.tolist() == [False, True, False, True, False]

    def test_sample_respects_truncation(self):
        # with top_k=1 the draw is deterministic argmax
        toks = np.asarray(sample_token(
            jax.random.key(0), jnp.tile(self.LOGITS, (64, 1)), top_k=1))
        assert (toks == 0).all()
        # with top_k=2, only tokens {0, 1} ever appear
        toks = np.asarray(jax.vmap(
            lambda k: sample_token(k, self.LOGITS, top_k=2)[0])(
                jax.random.split(jax.random.key(1), 256)))
        assert set(np.unique(toks)) <= {0, 1}
        assert len(set(np.unique(toks))) == 2  # both actually drawn

    def test_sample_frequency_matches_distribution(self):
        logits = jnp.asarray([[1.0, 0.0, -30.0]])
        keys = jax.random.split(jax.random.key(2), 4096)
        toks = np.asarray(jax.vmap(
            lambda k: sample_token(k, logits)[0])(keys))
        freq0 = (toks == 0).mean()
        want = float(jax.nn.softmax(logits, -1)[0, 0])
        assert abs(freq0 - want) < 0.03
        assert (toks != 2).all()

    def test_filter_composition(self):
        out = filter_logits(self.LOGITS, temperature=0.5, top_k=3, top_p=0.9)
        fin = np.isfinite(np.where(np.asarray(out) < -1e20, -np.inf,
                                   np.asarray(out)))[0]
        assert fin[0]  # top-1 always survives
        assert not fin[3:].any()  # top-k already cut these


class TestIQSampledDecode:
    CFG = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                 num_layers=2, num_heads=4, batch_size=8, image_size=32,
                 max_q_length=10, max_decode_length=8, dtype="float32",
                 full_kl_step=4, decode_sampling=True,
                 decode_temperature=1.0, decode_top_p=0.95)

    def _setup(self, cfg):
        from __graft_entry__ import _example_batch
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        model = IQ(cfg, 64)
        batch = _example_batch(cfg, 64, cfg.batch_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        return model, batch, state

    def test_sampled_decode_runs_and_varies(self):
        from blt_vqg_tpu.train.step import make_decode_step
        model, batch, state = self._setup(self.CFG)
        dec = make_decode_step(self.CFG, model, latent_mode=True,
                               with_probe=False)
        a = np.asarray(dec(state, batch["images"], batch["context"],
                           jax.random.key(1))["tokens"])
        b = np.asarray(dec(state, batch["images"], batch["context"],
                           jax.random.key(2))["tokens"])
        assert a.shape == (8, self.CFG.max_decode_length + 1)
        # an untrained near-uniform head must yield different draws
        assert (a != b).any()

    def test_sampling_is_reproducible_per_key(self):
        from blt_vqg_tpu.train.step import make_decode_step
        model, batch, state = self._setup(self.CFG)
        dec = make_decode_step(self.CFG, model, latent_mode=False,
                               with_probe=False)
        a = np.asarray(dec(state, batch["images"], batch["context"],
                           jax.random.key(3))["tokens"])
        b = np.asarray(dec(state, batch["images"], batch["context"],
                           jax.random.key(3))["tokens"])
        np.testing.assert_array_equal(a, b)

    def test_temperature_zero_limit_equals_greedy(self):
        """T→0 sampling must reproduce the greedy path exactly."""
        from blt_vqg_tpu.train.step import make_decode_step
        cfg_t0 = self.CFG.replace(decode_temperature=1e-6,
                                  decode_top_p=1.0)
        model, batch, state = self._setup(cfg_t0)
        dec_s = make_decode_step(cfg_t0, model, latent_mode=False,
                                 with_probe=False)
        cfg_g = cfg_t0.replace(decode_sampling=False)
        dec_g = make_decode_step(cfg_g, model, latent_mode=False,
                                 with_probe=False)
        a = np.asarray(dec_s(state, batch["images"], batch["context"],
                             jax.random.key(4))["tokens"])
        b = np.asarray(dec_g(state, batch["images"], batch["context"],
                             jax.random.key(4))["tokens"])
        np.testing.assert_array_equal(a, b)

    def test_greedy_default_unchanged(self):
        """decode_sampling=False keeps the original greedy program."""
        from blt_vqg_tpu.train.step import make_decode_step
        cfg = self.CFG.replace(decode_sampling=False)
        model, batch, state = self._setup(cfg)
        dec = make_decode_step(cfg, model, latent_mode=True)
        out = dec(state, batch["images"], batch["context"],
                  jax.random.key(0))
        assert "top_tokens" in out  # probe path intact
