"""IQ model tests: init, forward contract in both phases, greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.models.iq import IQ, apply_glove_table


@pytest.fixture(scope="module")
def model_and_params(request):
    cfg = request.getfixturevalue("tiny_cfg")
    vocab_size = request.getfixturevalue("vocab_size")
    model = IQ(cfg, vocab_size)
    b = 2
    images = jnp.zeros((b, cfg.image_size, cfg.image_size, 3), jnp.float32)
    context = jnp.ones((b, cfg.max_context_len), jnp.int32)
    posterior = jnp.ones((b, cfg.max_posterior_len), jnp.int32)
    target = jnp.ones((b, cfg.max_q_length), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1),
         "dropout": jax.random.key(2)},
        images, context, posterior, target, latent_mode=True, train=False)
    return cfg, vocab_size, model, variables, (images, context, posterior, target)


class TestForward:
    def test_pretrain_phase_contract(self, model_and_params):
        cfg, vs, model, variables, (im, ctx, post, tgt) = model_and_params
        logits, z_logit, kld, (feat, recon) = model.apply(
            variables, im, ctx, post, tgt, latent_mode=False, train=False)
        b, tq = tgt.shape
        assert logits.shape == (b, tq, vs)
        assert z_logit is None
        assert float(kld) == 0.0
        assert feat.shape == (b, cfg.hidden_dim)
        assert recon.shape == (b, cfg.hidden_dim)

    def test_latent_phase_contract(self, model_and_params):
        cfg, vs, model, variables, (im, ctx, post, tgt) = model_and_params
        logits, z_logit, kld, _ = model.apply(
            variables, im, ctx, post, tgt, latent_mode=True, train=False,
            rngs={"latent": jax.random.key(3)})
        b, tq = tgt.shape
        assert logits.shape == (b, tq, vs)
        assert z_logit.shape == (b, vs)
        assert np.isfinite(float(kld))

    def test_train_mode_updates_batch_stats(self, model_and_params):
        cfg, vs, model, variables, (im, ctx, post, tgt) = model_and_params
        _, updates = model.apply(
            variables, im, ctx, post, tgt, latent_mode=True, train=True,
            rngs={"latent": jax.random.key(3), "dropout": jax.random.key(4)},
            mutable=["batch_stats"])
        assert "batch_stats" in updates

    def test_one_param_tree_for_both_phases(self, model_and_params):
        """Phase switch must not require param surgery: latent params exist
        from init and the pretrain phase simply doesn't touch them."""
        _, _, _, variables, _ = model_and_params
        p = variables["params"]
        assert "latent" in p and "posterior_encoder" in p
        assert "decoder" in p and "context_encoder" in p


class TestDecodeGreedy:
    def test_shapes_and_determinism(self, model_and_params):
        cfg, vs, model, variables, (im, ctx, _, _) = model_and_params
        out = model.apply(
            variables, im, ctx, max_decode_length=cfg.max_decode_length,
            latent_mode=True, method=IQ.decode_greedy,
            rngs={"latent": jax.random.key(5)})
        b = im.shape[0]
        steps = cfg.max_decode_length + 1
        assert out["tokens"].shape == (b, steps)
        assert out["top_tokens"].shape == (b, steps, 6)
        assert out["top_probs"].shape == (b, steps, 6)
        # greedy token must equal top-1 probe token
        np.testing.assert_array_equal(
            np.asarray(out["tokens"]), np.asarray(out["top_tokens"][:, :, 0]))
        # deterministic given same rng
        out2 = model.apply(
            variables, im, ctx, max_decode_length=cfg.max_decode_length,
            latent_mode=True, method=IQ.decode_greedy,
            rngs={"latent": jax.random.key(5)})
        np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                      np.asarray(out2["tokens"]))

    def test_cache_decode_matches_quadratic_reference_loop(self, model_and_params):
        """The O(T) scan+KV-cache decoder must emit exactly the tokens the
        reference's quadratic loop would: re-run the full decoder on the
        growing prefix each step (``inference_logits``) and compare argmaxes
        (reference iq.py:134-143 semantics)."""
        cfg, vs, model, variables, (im, ctx, _, _) = model_and_params
        out = model.apply(
            variables, im, ctx, max_decode_length=cfg.max_decode_length,
            latent_mode=False, method=IQ.decode_greedy)
        tokens = np.asarray(out["tokens"])  # [B, L]
        b = tokens.shape[0]
        seed = np.zeros((b, 1), np.int32)  # compat <pad> seed
        ys = seed
        # checking a prefix of steps is enough to catch cache/mask bugs and
        # keeps this test's trace-per-prefix-length cost bounded
        for i in range(min(6, cfg.max_decode_length + 1)):
            logits = model.apply(variables, im, ctx, jnp.asarray(ys),
                                 latent_mode=False,
                                 method=IQ.inference_logits)
            nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
            np.testing.assert_array_equal(
                nxt, tokens[:, i],
                err_msg=f"divergence at decode step {i}")
            ys = np.concatenate([ys, nxt[:, None].astype(np.int32)], axis=1)

    def test_glove_surgery(self, model_and_params):
        cfg, vs, model, variables, _ = model_and_params
        table = np.arange(vs * cfg.emb_dim, dtype=np.float32).reshape(vs, -1)
        new_params = apply_glove_table(variables["params"], table)
        np.testing.assert_array_equal(
            np.asarray(new_params["embed"]["embedding"]), table)
        # original untouched
        assert not np.array_equal(
            np.asarray(variables["params"]["embed"]["embedding"]), table)


class TestTiedHead:
    def test_tie_output_z_shares_params_and_trains(self, tiny_cfg,
                                                   vocab_size):
        """cfg.tie_output_z: one [hidden, vocab] head serves output_proj and
        z_classifier — the z_classifier param subtree disappears and a
        latent-phase train step still runs (both losses flow through the
        shared kernel)."""
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        cfg = tiny_cfg.replace(tie_output_z=True)
        model = IQ(cfg, vocab_size)
        b = 4
        r = np.random.RandomState(0)
        batch = {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size, (b, cfg.max_context_len)
                                 ).astype(np.int32),
            "posterior": r.randint(1, vocab_size, (b, cfg.max_posterior_len)
                                   ).astype(np.int32),
            "target": r.randint(1, vocab_size, (b, cfg.max_q_length)
                                ).astype(np.int32),
        }
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        assert "z_classifier" not in state.params
        assert "output_proj" in state.params

        # untied control has strictly more params
        untied = create_train_state(tiny_cfg, IQ(tiny_cfg, vocab_size),
                                    jax.random.key(0), batch)
        n_tied = sum(x.size for x in jax.tree.leaves(state.params))
        n_untied = sum(x.size for x in jax.tree.leaves(untied.params))
        assert n_untied - n_tied == (32 + 1) * vocab_size  # kernel + bias

        step = make_train_step(cfg, latent_mode=True)
        before = np.asarray(state.params["output_proj"]["kernel"]).copy()
        for i in range(2):
            state, m = step(state, batch,
                            jax.random.fold_in(jax.random.key(1), i))
        assert np.isfinite(float(m["loss"])) and float(m["aux"]) > 0
        after = np.asarray(state.params["output_proj"]["kernel"])
        assert np.abs(after - before).max() > 0  # the shared head moved


class TestConfigFlagSmoke:
    """End-to-end wiring for config flags whose feature tests exercise the
    op directly but never the cfg→model path."""

    def _batch(self, cfg, vocab_size, b=4):
        r = np.random.RandomState(0)
        return {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size, (b, cfg.max_context_len)
                                 ).astype(np.int32),
            "posterior": r.randint(1, vocab_size, (b, cfg.max_posterior_len)
                                   ).astype(np.int32),
            "target": r.randint(1, vocab_size, (b, cfg.max_q_length)
                                ).astype(np.int32),
        }

    def test_remat_matches_baseline(self, tiny_cfg, vocab_size):
        """cfg.remat (jax.checkpoint per transformer block) recomputes the
        SAME ops in the backward — the train step must match the
        non-remat step numerically, both phases."""
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        batch = self._batch(tiny_cfg, vocab_size)
        metrics = {}
        for remat in (False, True):
            cfg = tiny_cfg.replace(remat=remat)
            model = IQ(cfg, vocab_size)
            state = create_train_state(cfg, model, jax.random.key(0), batch)
            for latent in (False, True):
                step = make_train_step(cfg, latent_mode=latent)
                state, m = step(state, batch, jax.random.key(7))
                metrics[(remat, latent)] = {
                    k: float(m[k]) for k in ("loss", "rec", "img", "kld")}
        for latent in (False, True):
            for k, v in metrics[(False, latent)].items():
                np.testing.assert_allclose(
                    v, metrics[(True, latent)][k], rtol=1e-5, atol=1e-6,
                    err_msg=f"remat changed {k} (latent={latent})")

    def test_pallas_attention_trains(self, tiny_cfg, vocab_size):
        """cfg.use_pallas_attention routes training attention through the
        flash kernel (interpret mode off-TPU): step runs, loss finite.
        (Exact parity with the einsum path is the kernel suite's job —
        tests/test_flash_attention.py; the documented dead-row contract
        difference makes bitwise equality here intentionally out of scope.)"""
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        cfg = tiny_cfg.replace(use_pallas_attention=True)
        model = IQ(cfg, vocab_size)
        batch = self._batch(cfg, vocab_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        for latent in (False, True):
            step = make_train_step(cfg, latent_mode=latent)
            state, m = step(state, batch, jax.random.key(3))
            assert np.isfinite(float(m["loss"])), (latent, m)


class TestTargetWordDropout:
    """cfg.target_word_dropout: latent-phase decoder-input corruption
    (anti-posterior-collapse knob; no reference equivalent)."""

    def _setup(self, tiny_cfg, vocab_size, rate):
        # all stochastic layers off so the 'dropout' stream is consumed
        # ONLY by the word-dropout branch (flax Dropout(rate=0) never
        # calls make_rng) — makes logits comparable across configs
        cfg = tiny_cfg.replace(attention_dropout=0.0, relu_dropout=0.0,
                               input_dropout=0.0, target_word_dropout=rate)
        model = IQ(cfg, vocab_size)
        b = 4
        rng = np.random.RandomState(7)
        images = jnp.asarray(rng.rand(b, cfg.image_size, cfg.image_size, 3),
                             jnp.float32)
        context = jnp.asarray(rng.randint(6, vocab_size, (b, cfg.max_context_len)), jnp.int32)
        posterior = jnp.asarray(rng.randint(6, vocab_size, (b, cfg.max_posterior_len)), jnp.int32)
        target = jnp.asarray(rng.randint(6, vocab_size, (b, cfg.max_q_length)), jnp.int32)
        target = target.at[:, -3:].set(0)  # trailing pads
        variables = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1),
             "dropout": jax.random.key(2)},
            images, context, posterior, target, latent_mode=True, train=False)
        return cfg, model, variables, (images, context, posterior, target)

    def _logits(self, model, variables, batch, *, latent, train, dkey=4):
        out, _ = model.apply(
            variables, *batch, latent_mode=latent, train=train,
            rngs={"latent": jax.random.key(3), "dropout": jax.random.key(dkey)},
            mutable=["batch_stats"])
        return out[0]

    def test_rate_one_equals_manual_unk(self, tiny_cfg, vocab_size):
        """rate=1.0 corrupts every non-pad teacher-forced input (never the
        <start>/pos-0 slot): logits must equal a clean forward whose target
        inputs were UNK'd by hand."""
        cfg, model, variables, batch = self._setup(tiny_cfg, vocab_size, 1.0)
        images, context, posterior, target = batch
        logits_dropped = self._logits(model, variables, batch,
                                      latent=True, train=True)

        # hand-build the equivalent clean target: shifted[:,1:]=target[:,:-1]
        # all non-pad → UNK; final target column never enters the input
        t2 = target.at[:, :-1].set(
            jnp.where(target[:, :-1] != 0, 4, target[:, :-1]))
        cfg0 = cfg.replace(target_word_dropout=0.0)
        model0 = IQ(cfg0, vocab_size)
        logits_manual = self._logits(
            model0, variables, (images, context, posterior, t2),
            latent=True, train=True)
        np.testing.assert_allclose(np.asarray(logits_dropped),
                                   np.asarray(logits_manual),
                                   rtol=1e-6, atol=1e-6)

    def test_inactive_paths_untouched(self, tiny_cfg, vocab_size):
        """Eval mode and the pretrain phase must ignore the knob."""
        cfg, model, variables, batch = self._setup(tiny_cfg, vocab_size, 0.9)
        cfg0 = cfg.replace(target_word_dropout=0.0)
        model0 = IQ(cfg0, vocab_size)
        for latent, train in ((True, False), (False, True), (False, False)):
            a = self._logits(model, variables, batch, latent=latent, train=train)
            b = self._logits(model0, variables, batch, latent=latent, train=train)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"latent={latent} train={train}")

    def test_stochastic_across_keys(self, tiny_cfg, vocab_size):
        """Intermediate rate: different dropout keys → different logits."""
        cfg, model, variables, batch = self._setup(tiny_cfg, vocab_size, 0.5)
        a = self._logits(model, variables, batch, latent=True, train=True, dkey=10)
        b = self._logits(model, variables, batch, latent=True, train=True, dkey=11)
        assert not np.allclose(np.asarray(a), np.asarray(b))
