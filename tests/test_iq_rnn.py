"""IQ-RNN model family tests (legacy seq2seq lineage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.models.iq_rnn import IQRNN


@pytest.fixture(scope="module", params=["lstm", "gru"])
def rnn_model(request):
    cfg = request.getfixturevalue("tiny_cfg").replace(
        model_family="rnn", rnn_cell=request.param)
    vs = request.getfixturevalue("vocab_size")
    model = IQRNN(cfg, vs)
    b = 2
    images = jnp.zeros((b, cfg.image_size, cfg.image_size, 3))
    context = jnp.ones((b, cfg.max_context_len), jnp.int32)
    posterior = jnp.ones((b, cfg.max_posterior_len), jnp.int32)
    target = jnp.ones((b, cfg.max_q_length), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1),
         "dropout": jax.random.key(2)},
        images, context, posterior, target, latent_mode=True)
    return cfg, vs, model, variables, (images, context, posterior, target)


class TestIQRNN:
    def test_forward_contract_both_phases(self, rnn_model):
        cfg, vs, model, variables, (im, ctx, post, tgt) = rnn_model
        logits, z_logit, kld, (feat, recon) = model.apply(
            variables, im, ctx, post, tgt, latent_mode=False)
        assert logits.shape == (2, cfg.max_q_length, vs)
        assert z_logit is None and float(kld) == 0.0
        logits, z_logit, kld, _ = model.apply(
            variables, im, ctx, post, tgt, latent_mode=True,
            rngs={"latent": jax.random.key(3)})
        assert z_logit.shape == (2, vs)
        assert np.isfinite(float(kld))

    def test_decode_greedy(self, rnn_model):
        cfg, vs, model, variables, (im, ctx, _, _) = rnn_model
        out = model.apply(variables, im, ctx, max_decode_length=6,
                          latent_mode=True, method=IQRNN.decode_greedy,
                          rngs={"latent": jax.random.key(5)})
        assert out["tokens"].shape == (2, 7)
        assert out["tokens"].dtype == jnp.int32

    def test_trains_one_step(self, rnn_model):
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step
        cfg, vs, model, variables, (im, ctx, post, tgt) = rnn_model
        batch = {"images": im, "context": ctx, "posterior": post,
                 "target": tgt}
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=True)
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
