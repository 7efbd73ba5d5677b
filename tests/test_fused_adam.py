"""Fused clip+Adam update (train/fused_adam.py) vs the optax chain.

The fused pass must be numerically indistinguishable from
clip_by_global_norm(5) -> scale_by_adam -> scale(-1) -> lr -> apply_updates
(reference semantics: Adam + global clip 5 + per-step LR poke,
reference train_iq.py:259-261, 372, 252-257).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from blt_vqg_tpu.train.fused_adam import FusedAdamState, FusedClipAdam


def _tree_eq(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), atol=atol,
                                   rtol=0.0)


def _chain(clip, mu_dtype):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.scale_by_adam(mu_dtype=mu_dtype),
        optax.scale(-1.0),
    )


class TestSyntheticParity:
    """Direct update_params vs the optax chain on controlled trees —
    exercises BOTH clip branches (norm below and above the threshold)."""

    def _params(self, scale):
        r = np.random.RandomState(0)
        return {
            "dense": {"kernel": jnp.asarray(r.randn(16, 8), jnp.float32),
                      "bias": jnp.asarray(r.randn(8), jnp.float32)},
            "out": {"w": jnp.asarray(r.randn(8, 4), jnp.float32)},
        }, {
            "dense": {"kernel": jnp.asarray(scale * r.randn(16, 8),
                                            jnp.float32),
                      "bias": jnp.asarray(scale * r.randn(8), jnp.float32)},
            "out": {"w": jnp.asarray(scale * r.randn(8, 4), jnp.float32)},
        }

    @pytest.mark.parametrize("grad_scale", [0.01, 10.0])  # no-clip / clip
    @pytest.mark.parametrize("mu_dtype", ["float32", "bfloat16"])
    def test_steps_match_chain(self, grad_scale, mu_dtype):
        clip = 5.0
        params, grads = self._params(grad_scale)
        fused = FusedClipAdam(clip, lambda path: False,
                              mu_dtype=jnp.dtype(mu_dtype))
        chain = _chain(clip, jnp.dtype(mu_dtype))

        f_state = fused.init(params)
        c_state = chain.init(params)
        p_f, p_c = params, params
        for step in range(4):
            lr = jnp.asarray(0.1 / (step + 1), jnp.float32)
            g_f = jax.tree.map(lambda g: g * (step + 1), grads)
            p_f, f_state, gnorm = jax.jit(fused.update_params)(
                p_f, g_f, f_state, lr)

            def chain_step(p, g, s, lr):
                u, s = chain.update(g, s, p)
                u = jax.tree.map(
                    lambda x: (lr * x.astype(jnp.float32)).astype(x.dtype), u)
                return optax.apply_updates(p, u), s

            p_c, c_state = jax.jit(chain_step)(p_c, g_f, c_state, lr)
            _tree_eq(p_f, p_c)

        # moments match the chain's ScaleByAdamState too
        adam = c_state[1][0]  # chain: (clip_state, (adam, scale_state))
        if not isinstance(adam, optax.ScaleByAdamState):
            adam = next(s for s in jax.tree_util.tree_leaves(
                c_state, is_leaf=lambda x: isinstance(
                    x, optax.ScaleByAdamState))
                if isinstance(s, optax.ScaleByAdamState))
        _tree_eq(f_state.mu, adam.mu)
        _tree_eq(f_state.nu, adam.nu)
        assert int(f_state.count) == int(adam.count) == 4

    def test_grad_norm_byproduct(self):
        params, grads = self._params(1.0)
        fused = FusedClipAdam(5.0, lambda path: False)
        _, _, gnorm = fused.update_params(params, grads, fused.init(params),
                                          jnp.asarray(0.1))
        want = float(optax.global_norm(grads))
        np.testing.assert_allclose(float(gnorm), want, rtol=1e-6)

    def test_frozen_leaves_carry_no_moments(self):
        params, grads = self._params(1.0)
        frozen_fn = lambda path: any(
            getattr(p, "key", None) == "out" for p in path)
        fused = FusedClipAdam(5.0, frozen_fn)
        st = fused.init(params)
        assert isinstance(st.mu["out"]["w"], optax.MaskedNode)
        # frozen moments hold no arrays at all (zero HBM)
        assert len(jax.tree_util.tree_leaves(st.mu["out"])) == 0
        new_p, st2, _ = fused.update_params(params, grads, st,
                                            jnp.asarray(0.1))
        # frozen param bitwise untouched, trainable ones moved
        np.testing.assert_array_equal(np.asarray(new_p["out"]["w"]),
                                      np.asarray(params["out"]["w"]))
        assert np.abs(np.asarray(new_p["dense"]["kernel"])
                      - np.asarray(params["dense"]["kernel"])).max() > 0
        # frozen grads are also excluded from the clip norm (they are zero
        # in the real step via stop_gradient; here nonzero to prove masking)
        trainable_only = {"dense": grads["dense"]}
        _, _, gnorm = fused.update_params(params, grads, st,
                                          jnp.asarray(0.1))
        np.testing.assert_allclose(float(gnorm),
                                   float(optax.global_norm(trainable_only)),
                                   rtol=1e-6)


class TestLegacyState:
    def test_legacy_master_fallback_preserves_structure(self):
        """A pre-master checkpoint's opt_state (master = bare MaskedNode)
        must round-trip through update_params with the SAME pytree
        structure — expanding it to a params-shaped tree of MaskedNodes
        would mismatch a lax.scan carry (ADVICE r3 low)."""
        params = {"w": jnp.ones((4, 2)), "b": jnp.zeros((2,))}
        grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
        fused = FusedClipAdam(5.0, lambda path: False)
        st = fused.init(params)
        legacy = st._replace(master=optax.MaskedNode())  # bare, not a tree
        new_p, st2, _ = fused.update_params(params, grads, legacy,
                                            jnp.asarray(0.1))
        assert (jax.tree_util.tree_structure(st2)
                == jax.tree_util.tree_structure(legacy))
        assert isinstance(st2.master, optax.MaskedNode)
        # params still updated correctly (matches the non-legacy path)
        ref_p, _, _ = fused.update_params(params, grads, st,
                                          jnp.asarray(0.1))
        _tree_eq(new_p, ref_p)


class TestMixedPrecision:
    """cfg.param_dtype='bfloat16': bf16 parameter storage with f32 Adam
    masters (train/fused_adam.py).  The forward must be VALUE-IDENTICAL to
    f32 storage (compute was already bf16); only grad/update precision
    changes."""

    def _batch(self, cfg, vocab_size):
        r = np.random.RandomState(0)
        b = cfg.batch_size
        return {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size,
                                 (b, cfg.max_context_len)).astype(np.int32),
            "posterior": r.randint(1, vocab_size,
                                   (b, cfg.max_posterior_len)).astype(np.int32),
            "target": r.randint(1, vocab_size,
                                (b, cfg.max_q_length)).astype(np.int32),
        }

    def _states(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        batch = self._batch(tiny_cfg, vocab_size)
        out = {}
        for pd in ("float32", "bfloat16"):
            cfg = tiny_cfg.replace(param_dtype=pd, dtype="bfloat16")
            model = IQ(cfg, vocab_size)
            out[pd] = (cfg, model,
                       create_train_state(cfg, model, jax.random.key(0),
                                          batch))
        return batch, out

    def test_storage_dtypes_and_masters(self, tiny_cfg, vocab_size):
        _, states = self._states(tiny_cfg, vocab_size)
        cfg, _, st = states["bfloat16"]
        p = st.params
        assert p["decoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"].dtype \
            == jnp.bfloat16
        assert p["embed"]["embedding"].dtype == jnp.bfloat16
        # f32-consumed vocab heads keep f32 storage
        assert p["output_proj"]["kernel"].dtype == jnp.float32
        assert p["z_classifier"]["kernel"].dtype == jnp.float32
        # frozen backbone stored bf16, no master
        assert p["encoder_cnn"]["backbone"]["stem_conv"]["kernel"].dtype \
            == jnp.bfloat16
        import optax
        ms = st.opt_state.master
        assert isinstance(ms["encoder_cnn"]["backbone"]["stem_conv"]["kernel"],
                          optax.MaskedNode)
        assert isinstance(ms["output_proj"]["kernel"], optax.MaskedNode)
        emb_master = ms["embed"]["embedding"]
        assert emb_master.dtype == jnp.float32
        # params are the bf16 image of the master
        np.testing.assert_array_equal(
            np.asarray(p["embed"]["embedding"], np.float32),
            np.asarray(emb_master.astype(jnp.bfloat16), np.float32))

    def test_forward_value_identical(self, tiny_cfg, vocab_size):
        batch, states = self._states(tiny_cfg, vocab_size)
        outs = {}
        for pd, (cfg, model, st) in states.items():
            logits, _, _, _ = model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                batch["images"], batch["context"], batch["posterior"],
                batch["target"], latent_mode=True, train=False,
                rngs={"latent": jax.random.key(7)})
            outs[pd] = np.asarray(logits, np.float32)
        np.testing.assert_array_equal(outs["float32"], outs["bfloat16"])

    def test_training_tracks_f32_run(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.train.step import make_train_step
        batch, states = self._states(tiny_cfg, vocab_size)
        finals = {}
        for pd, (cfg, model, st) in states.items():
            step = make_train_step(cfg, latent_mode=True)
            for i in range(3):
                st, m = step(st, batch, jax.random.key(i))
            assert np.isfinite(float(m["loss"]))
            finals[pd] = (st, float(m["loss"]))
        np.testing.assert_allclose(finals["bfloat16"][1], finals["float32"][1],
                                   rtol=2e-2)
        st_mp = finals["bfloat16"][0]
        # master moved and params remain its bf16 image
        emb = np.asarray(st_mp.params["embed"]["embedding"], np.float32)
        ms = st_mp.opt_state.master["embed"]["embedding"]
        np.testing.assert_array_equal(
            emb, np.asarray(ms.astype(jnp.bfloat16), np.float32))

    def test_reset_preserves_master(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.train.step import make_train_step
        batch, states = self._states(tiny_cfg, vocab_size)
        cfg, model, st = states["bfloat16"]
        step = make_train_step(cfg, latent_mode=True)
        for i in range(2):
            st, _ = step(st, batch, jax.random.key(i))
        before = np.asarray(st.opt_state.master["embed"]["embedding"])
        reset = st.reset_optimizer()
        assert int(reset.opt_state.count) == 0
        np.testing.assert_array_equal(
            np.asarray(reset.opt_state.master["embed"]["embedding"]), before)

    def test_reset_then_step_carry_invariant(self, tiny_cfg, vocab_size):
        """Regression (ADVICE r3): reset_optimizer runs tx.init on the
        BF16-STORED params, which used to build bf16 nu leaves while
        update_params writes them back f32 — an opt_state dtype-structure
        change that breaks a steps_per_dispatch>1 lax.scan carry and forces
        a recompile at the phase switch.  The opt_state avals must be
        IDENTICAL across init → step → reset → step."""
        from blt_vqg_tpu.train.step import make_train_step
        batch, states = self._states(tiny_cfg, vocab_size)
        cfg, model, st = states["bfloat16"]
        step = make_train_step(cfg, latent_mode=True)
        st, _ = step(st, batch, jax.random.key(0))

        avals = lambda t: jax.tree.map(
            lambda x: (jnp.shape(x), jnp.result_type(x)), t)
        stepped = avals(st.opt_state)

        reset = st.reset_optimizer()
        assert avals(reset.opt_state) == stepped
        # mastered leaves carry f32 nu even though storage is bf16
        assert reset.opt_state.nu["embed"]["embedding"].dtype == jnp.float32
        # and a post-reset step leaves the structure unchanged again
        after, _ = step(reset, batch, jax.random.key(1))
        assert avals(after.opt_state) == stepped
        # scan-carry check: the update is shape-stable under jax.eval_shape
        out_aval = jax.eval_shape(
            lambda s: step(s, batch, jax.random.key(2))[0], reset)
        assert avals(out_aval.opt_state) == stepped

    def test_checkpoint_roundtrip_with_master(self, tmp_path, tiny_cfg,
                                              vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step
        cfg = tiny_cfg.replace(param_dtype="bfloat16", dtype="bfloat16")
        model = IQ(cfg, vocab_size)
        batch = self._batch(cfg, vocab_size)
        st = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=False)
        st, _ = step(st, batch, jax.random.key(0))
        mgr = CheckpointManager(str(tmp_path), keep=2)
        mgr.save(st, cfg)
        template = create_train_state(cfg, model, jax.random.key(0), batch)
        restored = mgr.restore(template)
        np.testing.assert_array_equal(
            np.asarray(restored.opt_state.master["embed"]["embedding"]),
            np.asarray(st.opt_state.master["embed"]["embedding"]))
        assert restored.params["embed"]["embedding"].dtype == jnp.bfloat16

    def test_requires_fused(self, tiny_cfg):
        from blt_vqg_tpu.train.state import make_optimizer
        with pytest.raises(ValueError, match="fused_adam"):
            make_optimizer(tiny_cfg.replace(param_dtype="bfloat16",
                                            fused_adam=False),
                           {"w": jnp.ones((2,))})

    def test_glove_masters_full_precision(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        cfg = tiny_cfg.replace(param_dtype="bfloat16", dtype="bfloat16")
        model = IQ(cfg, vocab_size)
        batch = self._batch(cfg, vocab_size)
        table = np.random.RandomState(3).randn(vocab_size, cfg.emb_dim
                                               ).astype(np.float32)
        st = create_train_state(cfg, model, jax.random.key(0), batch,
                                glove_table=table)
        # master snapshots the FULL-precision glove values
        np.testing.assert_array_equal(
            np.asarray(st.opt_state.master["embed"]["embedding"]), table)
        assert st.params["embed"]["embedding"].dtype == jnp.bfloat16


class TestModelParity:
    """End-to-end: the real train step with cfg.fused_adam on/off produces
    identical parameters, metrics, and grad-norm telemetry."""

    def _batch(self, cfg, vocab_size):
        r = np.random.RandomState(0)
        b = cfg.batch_size
        return {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size,
                                 (b, cfg.max_context_len)).astype(np.int32),
            "posterior": r.randint(1, vocab_size,
                                   (b, cfg.max_posterior_len)).astype(np.int32),
            "target": r.randint(1, vocab_size,
                                (b, cfg.max_q_length)).astype(np.int32),
        }

    @pytest.mark.parametrize("latent_mode", [False, True])
    def test_train_step_parity(self, tiny_cfg, vocab_size, latent_mode):
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        batch = self._batch(tiny_cfg, vocab_size)
        states, metrics = {}, {}
        for fused in (True, False):
            cfg = tiny_cfg.replace(fused_adam=fused, log_grad_norm=True)
            model = IQ(cfg, vocab_size)
            state = create_train_state(cfg, model, jax.random.key(0), batch)
            step = make_train_step(cfg, latent_mode=latent_mode)
            for i in range(3):
                state, m = step(state, batch,
                                jax.random.fold_in(jax.random.key(1), i))
            states[fused], metrics[fused] = state, m

        _tree_eq(states[True].params, states[False].params, atol=1e-7)
        np.testing.assert_allclose(float(metrics[True]["loss"]),
                                   float(metrics[False]["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(metrics[True]["grad_norm"]),
                                   float(metrics[False]["grad_norm"]),
                                   rtol=1e-6)
        assert int(states[True].step) == 3

    def test_reset_and_checkpoint_roundtrip(self, tmp_path, tiny_cfg,
                                            vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        cfg = tiny_cfg.replace(fused_adam=True)
        model = IQ(cfg, vocab_size)
        batch = self._batch(cfg, vocab_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        assert isinstance(state.opt_state, FusedAdamState)
        step = make_train_step(cfg, latent_mode=False)
        for i in range(2):
            state, _ = step(state, batch, jax.random.key(i))

        # phase-boundary Adam restart zeroes moments, keeps params
        reset = state.reset_optimizer()
        assert int(reset.opt_state.count) == 0
        assert all(float(jnp.abs(l).max()) == 0.0
                   for l in jax.tree_util.tree_leaves(reset.opt_state.mu))

        mgr = CheckpointManager(str(tmp_path), keep=2)
        mgr.save(state, cfg)
        template = create_train_state(cfg, model, jax.random.key(0), batch)
        restored = mgr.restore(template)
        _tree_eq(restored.params, state.params)
        _tree_eq(restored.opt_state.mu, state.opt_state.mu)
        _tree_eq(restored.opt_state.nu, state.opt_state.nu)
        assert int(restored.opt_state.count) == int(state.opt_state.count)


class TestFactoredNu:
    """Round-5 optimizer diet (cfg.adam_factored_nu): Adafactor-style
    factored second moment for >=2-D trainable leaves
    (train/fused_adam.py FactoredNu)."""

    def _opt(self, factored=True):
        return FusedClipAdam(5.0, lambda path: "frozen" in str(path),
                             factored_nu=factored)

    def test_state_structure(self):
        from blt_vqg_tpu.train.fused_adam import FactoredNu
        params = {"w": jnp.ones((4, 6)), "b": jnp.ones((6,)),
                  "stack": jnp.ones((3, 4, 6)),
                  "frozen_k": jnp.ones((4, 6))}
        st = self._opt().init(params)
        assert isinstance(st.nu["w"], FactoredNu)
        assert st.nu["w"].r.shape == (4,) and st.nu["w"].c.shape == (6,)
        # leading (layer-stack) dims batch through
        assert isinstance(st.nu["stack"], FactoredNu)
        assert st.nu["stack"].r.shape == (3, 4)
        assert st.nu["stack"].c.shape == (3, 6)
        # 1-D leaves keep full nu; frozen leaves stay masked
        assert st.nu["b"].shape == (6,)
        assert isinstance(st.nu["frozen_k"], optax.MaskedNode)
        assert isinstance(st.mu["w"], jnp.ndarray)  # mu untouched

    def test_rank1_grad_exact_vs_full_adam(self):
        """The rank-1 reconstruction is EXACT when g**2 is rank-1, so a
        single step on an outer-product gradient must equal full Adam."""
        params = {"w": jnp.zeros((5, 7), jnp.float32)}
        g = {"w": jnp.outer(jnp.array([.1, .2, .3, .4, .5]),
                            jnp.array([.7, .6, .5, .4, .3, .2, .1]))}
        full = self._opt(factored=False)
        fact = self._opt(factored=True)
        p_full, _, _ = full.update_params(params, g, full.init(params), 0.01)
        p_fact, _, _ = fact.update_params(params, g, fact.init(params), 0.01)
        _tree_eq(p_full, p_fact, atol=1e-7)

    def test_general_grad_close_but_not_equal(self):
        """On a non-rank-1 gradient the factored update is an
        approximation — close in scale, not bitwise."""
        rng = np.random.RandomState(0)
        params = {"w": jnp.zeros((8, 8), jnp.float32)}
        g = {"w": jnp.asarray(rng.randn(8, 8), jnp.float32)}
        full = self._opt(factored=False)
        fact = self._opt(factored=True)
        p_full, _, _ = full.update_params(params, g, full.init(params), 0.01)
        p_fact, _, _ = fact.update_params(params, g, fact.init(params), 0.01)
        a = np.asarray(p_full["w"]); b = np.asarray(p_fact["w"])
        assert not np.array_equal(a, b)
        # same sign everywhere (the factored nu_hat is positive), and the
        # OVERALL update scale matches full Adam (per-element ratios
        # spread — rank-1 reconstruction of a random g² — but the mean
        # magnitude must stay lr-sized)
        assert (np.sign(a) == np.sign(b)).all()
        assert 0.5 < np.abs(b).mean() / np.abs(a).mean() < 2.0

    def test_e2e_train_steps_and_reset(self):
        """Tiny IQ model: steps run, loss finite, multi-step scan carry
        holds the FactoredNu structure, and the phase-boundary
        reset_optimizer rebuilds the same structure."""
        from blt_vqg_tpu.core.config import Config
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.fused_adam import FactoredNu
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_multi_step, make_train_step
        from __graft_entry__ import _example_batch

        cfg = Config(emb_dim=8, hidden_dim=16, latent_dim=12, pwffn_dim=32,
                     num_layers=1, num_heads=2, batch_size=4, image_size=24,
                     max_q_length=8, dtype="float32", full_kl_step=2,
                     adam_factored_nu=True)
        model = IQ(cfg, 32)
        batch = _example_batch(cfg, 32, cfg.batch_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        n_fact = sum(isinstance(x, FactoredNu)
                     for x in jax.tree_util.tree_leaves(
                         state.opt_state.nu,
                         is_leaf=lambda y: isinstance(y, FactoredNu)))
        assert n_fact > 10
        step = make_train_step(cfg, latent_mode=False)
        for i in range(2):
            state, m = step(state, batch, jax.random.key(i))
            assert np.isfinite(float(m["loss"]))
        state = state.reset_optimizer()
        lat = make_train_step(cfg, latent_mode=True)
        state, m = lat(state, batch, jax.random.key(5))
        assert np.isfinite(float(m["loss"]))
        # steps_per_dispatch>1: the scan carry must keep the structure
        multi = make_multi_step(cfg, latent_mode=True)
        stacked = {k: np.stack([v, v]) for k, v in batch.items()}
        state, m = multi(state, stacked, jax.random.key(6))
        assert np.isfinite(float(m["loss"]))
