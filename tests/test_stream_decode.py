"""Whole-stack streaming decode kernel vs the XLA KV-cache step path.

The single-kernel streaming step (ops/pallas/decode_stream.py) must
reproduce the XLA decode path (ops/transformer.py DecoderLayer.step over
the stack) — same caches, same outputs — over a multi-step greedy decode.
Runs in interpret mode on CPU (the kernel self-selects interpret off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.ops.pallas.decode_stream import pick_stages
from blt_vqg_tpu.ops.transformer import TransformerDecoder


@pytest.fixture(scope="module", params=[True, False],
                ids=["bucketed", "pipelined"])
def dec_setup(request):
    kw = dict(hidden_dim=32, num_layers=3, num_heads=4, pwffn_dim=64,
              attention_dropout=0.0, relu_dropout=0.0, dtype=jnp.float32,
              max_decode_len=8)
    plain = TransformerDecoder(**kw)
    stream = TransformerDecoder(**kw, use_stream_decode=True,
                                stream_bucketed_cache=request.param)
    b, tc, d = 2, 3, 32
    enc = jax.random.normal(jax.random.key(0), (b, tc, d), jnp.float32)
    x = jax.random.normal(jax.random.key(1), (b, 5, d), jnp.float32)
    params = plain.init(jax.random.key(2), x, enc)
    return plain, stream, params, enc, b, d


class TestPickStages:
    def test_divisor_selection(self):
        assert pick_stages(8, 2048) == (4, 4)
        assert pick_stages(4, 64) == (4, 4)
        assert pick_stages(6, 63) == (3, 3)
        assert pick_stages(1, 7) == (1, 1)

    def test_cache_buckets(self):
        from blt_vqg_tpu.ops.pallas.decode_stream import _cache_buckets
        step, sizes = _cache_buckets(51)
        assert step == 13 and sizes == (13, 26, 39, 51)
        # every pos maps to a bucket covering pos+1
        for pos in range(51):
            assert sizes[min(pos // step, len(sizes) - 1)] >= pos + 1
        step, sizes = _cache_buckets(6)
        assert sizes[-1] == 6 and sizes == tuple(sorted(set(sizes)))
        for pos in range(6):
            assert sizes[min(pos // step, len(sizes) - 1)] >= pos + 1


class TestStreamDecodeStep:
    def test_multi_step_matches_xla_path(self, dec_setup):
        plain, stream, params, enc, b, d = dec_setup
        steps = 6
        src_mask = jnp.zeros((b, 1, 1, enc.shape[1]), bool
                             ).at[:, :, :, 2:].set(True)

        def run(model):
            cross = model.apply(params, enc,
                                method=TransformerDecoder.precompute_cross)
            caches = model.apply(params, b, steps,
                                 method=TransformerDecoder.init_cache)
            outs = []
            for pos in range(steps):
                x_t = jax.random.normal(jax.random.fold_in(
                    jax.random.key(3), pos), (b, 1, d), jnp.float32)
                y, caches = model.apply(
                    params, x_t, caches, cross, jnp.asarray(pos, jnp.int32),
                    src_mask, method=TransformerDecoder.step)
                outs.append(np.asarray(y))
            return outs, caches

        ref_outs, ref_caches = run(plain)
        got_outs, got_caches = run(stream)
        for pos, (a, c) in enumerate(zip(ref_outs, got_outs)):
            np.testing.assert_allclose(a, c, atol=1e-4, err_msg=f"pos {pos}")
        # stream cache is ONE stacked pair [Layers,H,L,B,Dh]; XLA's is a
        # per-layer list of [B,L,H,Dh]
        k_all, v_all = got_caches[0]
        for li, (ka, va) in enumerate(ref_caches):
            np.testing.assert_allclose(
                np.asarray(ka),
                np.asarray(k_all[li]).transpose(2, 1, 0, 3), atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(va),
                np.asarray(v_all[li]).transpose(2, 1, 0, 3), atol=1e-4)

    def test_no_src_mask(self, dec_setup):
        plain, stream, params, enc, b, d = dec_setup
        cross_p = plain.apply(params, enc,
                              method=TransformerDecoder.precompute_cross)
        x_t = jax.random.normal(jax.random.key(7), (b, 1, d), jnp.float32)
        y_a, _ = plain.apply(params, x_t,
                             plain.apply(params, b, 4,
                                         method=TransformerDecoder.init_cache),
                             cross_p, jnp.asarray(0, jnp.int32), None,
                             method=TransformerDecoder.step)
        y_b, _ = stream.apply(params, x_t,
                              stream.apply(params, b, 4,
                                           method=TransformerDecoder.init_cache),
                              cross_p, jnp.asarray(0, jnp.int32), None,
                              method=TransformerDecoder.step)
        np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                                   atol=1e-4)

    def test_compat_pad_mask_rejected(self, dec_setup):
        plain, stream, params, enc, b, d = dec_setup
        cross_p = plain.apply(params, enc,
                              method=TransformerDecoder.precompute_cross)
        x_t = jnp.zeros((b, 1, d), jnp.float32)
        with pytest.raises(ValueError, match="stream"):
            stream.apply(params, x_t,
                         stream.apply(params, b, 4,
                                      method=TransformerDecoder.init_cache),
                         cross_p, jnp.asarray(0, jnp.int32), None,
                         jnp.zeros((b, 4), bool),
                         method=TransformerDecoder.step)


class TestStreamGreedyDecode:
    def test_iq_decode_greedy_and_beam_match(self, vocab_size):
        """Full-model decode: use_stream_decode must emit the same token
        sequences as the XLA path, greedy AND beam (the beam reorders the
        stacked cache along its batch axis 3)."""
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=8,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32)
        r = np.random.RandomState(0)
        b = 2
        images = r.rand(b, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (b, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (b, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (b, cfg.max_q_length)).astype(np.int32)

        plain = IQ(cfg, vocab_size)
        stream = IQ(cfg.replace(use_stream_decode=True), vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = plain.init(rngs, images, context, posterior, target,
                               latent_mode=True, train=False)
        out_a = plain.apply(variables, images, context,
                            max_decode_length=cfg.max_decode_length,
                            latent_mode=True, method=IQ.decode_greedy,
                            rngs={"latent": jax.random.key(3)})
        out_b = stream.apply(variables, images, context,
                             max_decode_length=cfg.max_decode_length,
                             latent_mode=True, method=IQ.decode_greedy,
                             rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(out_a["tokens"]),
                                      np.asarray(out_b["tokens"]))
        np.testing.assert_allclose(np.asarray(out_a["top_probs"]),
                                   np.asarray(out_b["top_probs"]),
                                   atol=1e-4)

        # early-stop (while_loop) serving decode composes with the stream
        # kernel and emits the same tokens as the fixed-length scan
        es = stream.apply(variables, images, context,
                          max_decode_length=cfg.max_decode_length,
                          latent_mode=True, early_stop=True,
                          with_probe=False, method=IQ.decode_greedy,
                          rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(es["tokens"]),
                                      np.asarray(out_a["tokens"]))

        beam_a = plain.apply(variables, images, context, beam_size=3,
                             max_decode_length=cfg.max_decode_length,
                             latent_mode=True, method=IQ.decode_beam,
                             rngs={"latent": jax.random.key(5)})
        beam_b = stream.apply(variables, images, context, beam_size=3,
                              max_decode_length=cfg.max_decode_length,
                              latent_mode=True, method=IQ.decode_beam,
                              rngs={"latent": jax.random.key(5)})
        np.testing.assert_array_equal(np.asarray(beam_a["tokens"]),
                                      np.asarray(beam_b["tokens"]))
        np.testing.assert_allclose(np.asarray(beam_a["scores"]),
                                   np.asarray(beam_b["scores"]), atol=1e-4)
