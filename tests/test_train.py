"""Train-layer tests: loss goldens, schedules, optimizer masking,
checkpoint round-trip, NLG metrics sanity."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.train.losses import (
    LossOutputs, compute_losses, kl_weight_schedule, masked_token_ce)
from blt_vqg_tpu.train.schedule import noam_schedule
from blt_vqg_tpu.train.nlg_metrics import NLGEval, corpus_bleu, rouge_l


class TestLosses:
    def test_masked_ce_ignores_pad(self):
        logits = jnp.zeros((1, 3, 4))
        # uniform logits → CE = log(4) at each non-pad position
        t_all = jnp.array([[1, 2, 3]])
        t_pad = jnp.array([[1, 2, 0]])
        np.testing.assert_allclose(float(masked_token_ce(logits, t_all)),
                                   math.log(4), rtol=1e-6)
        np.testing.assert_allclose(float(masked_token_ce(logits, t_pad)),
                                   math.log(4), rtol=1e-6)
        # gradient must not flow from pad positions
        g = jax.grad(lambda lg: masked_token_ce(lg, t_pad))(logits)
        np.testing.assert_allclose(np.asarray(g[0, 2]), 0.0, atol=1e-9)

    def test_kl_weight_matches_reference_formula(self):
        """min(tanh(6·k/full − 3) + 1, 1) (reference train_iq.py:96-97)."""
        full = 15000
        for k in [0, 1000, 7500, 14999, 15000, 30000]:
            want = min(math.tanh(6 * k / full - 3) + 1, 1)
            got = float(kl_weight_schedule(jnp.asarray(k), full))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_pretrain_vs_latent_assembly(self):
        b, t, v = 2, 4, 8
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(b, t, v), jnp.float32)
        targets = jnp.asarray(rng.randint(1, v, (b, t)))
        feat = jnp.asarray(rng.randn(b, 6), jnp.float32)
        recon = jnp.asarray(rng.randn(b, 6), jnp.float32)
        kld = jnp.asarray(2.0)
        z_logit = jnp.asarray(rng.randn(b, v), jnp.float32)

        pre = compute_losses(logits, targets, (feat, recon), kld, None,
                             jnp.asarray(0), False, 0.5, 1.0, 0.1, 100)
        assert float(pre.kld) == 0.0 and float(pre.aux) == 0.0
        np.testing.assert_allclose(
            float(pre.loss), float(pre.rec) + 0.1 * float(pre.img), rtol=1e-5)

        lat = compute_losses(logits, targets, (feat, recon), kld, z_logit,
                             jnp.asarray(50), True, 0.5, 1.0, 0.1, 100)
        klw = min(math.tanh(6 * 50 / 100 - 3) + 1, 1)
        np.testing.assert_allclose(
            float(lat.loss),
            float(lat.rec) + 0.5 * klw * 2.0 + float(lat.aux)
            + 0.1 * float(lat.img), rtol=1e-5)
        np.testing.assert_allclose(float(lat.elbo),
                                   float(lat.rec) + 2.0, rtol=1e-5)

    def test_kl_floor_free_bits(self):
        """kl_floor (free bits on the total KL): below the floor the KL term
        contributes a CONSTANT (zero gradient w.r.t. kld — the anneal stops
        squeezing the posterior); above it the objective is unchanged from
        the reference assembly (train_iq.py:96-101)."""
        import jax
        b, t, v = 2, 4, 8
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(b, t, v), jnp.float32)
        targets = jnp.asarray(rng.randint(1, v, (b, t)))
        feat = jnp.asarray(rng.randn(b, 6), jnp.float32)
        recon = jnp.asarray(rng.randn(b, 6), jnp.float32)
        z_logit = jnp.asarray(rng.randn(b, v), jnp.float32)

        def loss_of(kld, floor):
            return compute_losses(
                logits, targets, (feat, recon), jnp.asarray(kld), z_logit,
                jnp.asarray(50), True, 0.5, 1.0, 0.1, 100,
                kl_floor=floor).loss

        # above the floor: identical to the floorless objective
        np.testing.assert_allclose(float(loss_of(5.0, 3.0)),
                                   float(loss_of(5.0, 0.0)), rtol=1e-6)
        # below the floor: gradient w.r.t. kld vanishes...
        g_below = jax.grad(loss_of)(1.0, 3.0)
        assert float(g_below) == 0.0
        # ...while the floorless objective still pulls
        g_free = jax.grad(loss_of)(1.0, 0.0)
        assert float(g_free) > 0.0
        # elbo/kld REPORTING stays the true kld, not the floored term
        out = compute_losses(logits, targets, (feat, recon),
                             jnp.asarray(1.0), z_logit, jnp.asarray(50),
                             True, 0.5, 1.0, 0.1, 100, kl_floor=3.0)
        np.testing.assert_allclose(float(out.kld), 1.0, rtol=1e-6)

    def test_broadcast_ce_equals_materialized(self):
        """broadcast_token_ce (O(B·V), no [B,T,V] tensor) must equal the
        reference's broadcast-then-CE form in value AND gradient."""
        from blt_vqg_tpu.train.losses import broadcast_token_ce
        b, t, v = 4, 6, 32
        r = np.random.RandomState(0)
        z = jnp.asarray(r.randn(b, v) * 3, jnp.float32)
        targets = jnp.asarray(r.randint(0, v, (b, t)))
        targets = targets.at[0, -2:].set(0)  # pad positions

        def materialized(z):
            z_rep = jnp.broadcast_to(z[:, None, :], (b, t, v))
            return masked_token_ce(z_rep, targets)

        want, gwant = jax.value_and_grad(materialized)(z)
        got, ggot = jax.value_and_grad(
            lambda z: broadcast_token_ce(z, targets))(z)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ggot), np.asarray(gwant),
                                   atol=1e-6)

    def test_ppl_capped(self):
        out = compute_losses(
            jnp.full((1, 2, 4), 0.0), jnp.array([[1, 2]]),
            (jnp.zeros((1, 2)), jnp.full((1, 2), 1e6)),  # huge img loss
            jnp.asarray(0.0), None, jnp.asarray(0), False, 0.5, 1.0, 0.1, 10)
        assert np.isfinite(float(out.ppl))


class TestNoamSchedule:
    def test_matches_reference_formula(self):
        """lr = sqrt(1/H)·min(sqrt(1/(s+1)), s·wu^-1.5)
        (reference train_iq.py:252-257)."""
        sched = noam_schedule(hidden_dim=512, warmup_steps=4000)
        for s in [0, 1, 100, 3999, 4000, 10000, 35000]:
            want = math.sqrt(1 / 512) * min(math.sqrt(1 / (s + 1)),
                                            s * 4000 ** -1.5)
            np.testing.assert_allclose(float(sched(s)), want, rtol=1e-5)

    def test_peak_near_warmup(self):
        sched = noam_schedule(512, 4000)
        lrs = [float(sched(s)) for s in range(0, 20000, 500)]
        assert np.argmax(lrs) == pytest.approx(8, abs=1)


class TestOptimizerMasking:
    def test_backbone_frozen(self, tiny_cfg):
        import optax
        from blt_vqg_tpu.train.state import make_optimizer
        params = {
            "encoder_cnn": {
                "backbone": {"stem_conv": {"kernel": jnp.ones((3, 3))}},
                "fc": {"kernel": jnp.ones((4, 4))}},
            "decoder": {"layer_0": {"w": jnp.ones((2, 2))}},
        }
        grads = jax.tree.map(jnp.ones_like, params)

        # fused path (default): frozen backbone bitwise untouched
        tx = make_optimizer(tiny_cfg, params)
        st = tx.init(params)
        new_p, _, _ = tx.update_params(params, grads, st,
                                       jnp.asarray(0.1, jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(new_p["encoder_cnn"]["backbone"]["stem_conv"]["kernel"]),
            np.asarray(params["encoder_cnn"]["backbone"]["stem_conv"]["kernel"]))
        assert np.abs(np.asarray(new_p["encoder_cnn"]["fc"]["kernel"])
                      - np.asarray(params["encoder_cnn"]["fc"]["kernel"])
                      ).max() > 0
        assert np.abs(np.asarray(new_p["decoder"]["layer_0"]["w"])
                      - np.asarray(params["decoder"]["layer_0"]["w"])
                      ).max() > 0

        # optax-chain path (fused_adam=False): zero update on the backbone
        tx = make_optimizer(tiny_cfg.replace(fused_adam=False), params)
        st = tx.init(params)
        # Noam lr(0) == 0 (reference formula) — take two steps and check the
        # second, where lr > 0
        updates, st = tx.update(grads, st, params)
        updates, _ = tx.update(grads, st, params)
        # frozen backbone gets exactly zero update
        np.testing.assert_allclose(
            np.asarray(updates["encoder_cnn"]["backbone"]["stem_conv"]["kernel"]),
            0.0)
        # trainable parts move
        assert np.abs(np.asarray(
            updates["encoder_cnn"]["fc"]["kernel"])).max() > 0
        assert np.abs(np.asarray(
            updates["decoder"]["layer_0"]["w"])).max() > 0


class TestAdamMuDtype:
    def test_bf16_moments_train_and_checkpoint(self, tmp_path, tiny_cfg,
                                               vocab_size):
        """adam_mu_dtype='bfloat16' stores Adam's first moment in bf16 (the
        HBM-diet option, NEXT.md #2), second moment stays f32, training still
        steps, and a checkpoint round-trip preserves the moment dtype."""
        import optax
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        cfg = tiny_cfg.replace(adam_mu_dtype="bfloat16")
        model = IQ(cfg, vocab_size)
        r = np.random.RandomState(0)
        b = cfg.batch_size
        batch = {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size,
                                 (b, cfg.max_context_len)).astype(np.int32),
            "posterior": r.randint(1, vocab_size,
                                   (b, cfg.max_posterior_len)).astype(np.int32),
            "target": r.randint(1, vocab_size,
                                (b, cfg.max_q_length)).astype(np.int32),
        }
        state = create_train_state(cfg, model, jax.random.key(0), batch)

        def find_adam(opt_state):
            # default optimizer is the fused pass (FusedAdamState); the
            # optax chain (ScaleByAdamState) remains via fused_adam=False
            from blt_vqg_tpu.train.fused_adam import FusedAdamState
            is_adam = lambda x: isinstance(
                x, (optax.ScaleByAdamState, FusedAdamState))
            return next(s for s in jax.tree_util.tree_leaves(
                opt_state, is_leaf=is_adam) if is_adam(s))

        adam = find_adam(state.opt_state)
        mu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(adam.mu)}
        nu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(adam.nu)}
        assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}
        assert nu_dtypes == {jnp.dtype(jnp.float32)}

        step = make_train_step(cfg, latent_mode=False)
        for i in range(2):
            state, metrics = step(state, batch,
                                  jax.random.fold_in(jax.random.key(1), i))
        assert np.isfinite(float(metrics["loss"]))

        mgr = CheckpointManager(str(tmp_path), keep=2)
        mgr.save(state, cfg)
        template = create_train_state(cfg, model, jax.random.key(0), batch)
        restored = mgr.restore(template)
        adam_r = find_adam(restored.opt_state)
        assert {l.dtype for l in jax.tree_util.tree_leaves(adam_r.mu)} == \
            {jnp.dtype(jnp.bfloat16)}


class TestGradDtype:
    def test_bf16_grads_track_f32_run(self, tiny_cfg, vocab_size):
        """grad_dtype='bfloat16' (diet knob): gradients are stored bf16 on
        the way into the optimizer — training must step finitely on BOTH
        optimizer impls and track the f32-grad run to bf16 tolerance over a
        few steps (moments/params stay f32: only the grad leaves lose
        mantissa)."""
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        r = np.random.RandomState(0)
        b = tiny_cfg.batch_size
        batch = {
            "images": r.rand(b, tiny_cfg.image_size, tiny_cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, vocab_size,
                                 (b, tiny_cfg.max_context_len)
                                 ).astype(np.int32),
            "posterior": r.randint(1, vocab_size,
                                   (b, tiny_cfg.max_posterior_len)
                                   ).astype(np.int32),
            "target": r.randint(1, vocab_size,
                                (b, tiny_cfg.max_q_length)).astype(np.int32),
        }

        def run(cfg, steps=3):
            model = IQ(cfg, vocab_size)
            state = create_train_state(cfg, model, jax.random.key(0), batch)
            step = make_train_step(cfg, latent_mode=False)
            for i in range(steps):
                state, m = step(state, batch,
                                jax.random.fold_in(jax.random.key(1), i))
                assert np.isfinite(float(m["loss"])), m
            return state, float(m["loss"])

        for fused in (True, False):
            base_cfg = tiny_cfg.replace(fused_adam=fused)
            s32, l32 = run(base_cfg)
            s16, l16 = run(base_cfg.replace(grad_dtype="bfloat16"))
            # params stay f32 storage
            dts = {l.dtype for l in jax.tree_util.tree_leaves(s16.params)}
            assert dts == {jnp.dtype(jnp.float32)}
            assert abs(l16 - l32) < 5e-2, (fused, l16, l32)
            # per-leaf drift bounded by bf16 grad resolution over 3 steps
            for a, c in zip(jax.tree_util.tree_leaves(s32.params),
                            jax.tree_util.tree_leaves(s16.params)):
                np.testing.assert_allclose(np.asarray(a, np.float32),
                                           np.asarray(c, np.float32),
                                           atol=2e-2)


class TestEarlyStopping:
    def test_gated_to_post_pretraining(self):
        from blt_vqg_tpu.train.trainer import EarlyStopping
        es = EarlyStopping(patience=2, active_from=100)
        # pre-gate validations never count, however bad
        for step in (10, 50, 100):
            assert es.update(step, 99.0) is False
        assert es.stale == 0
        # post-gate: first value becomes best, then two stale → stop
        assert es.update(150, 5.0) is False
        assert es.update(200, 5.0) is False   # no improvement (min_delta 0)
        assert es.update(250, 5.1) is True

    def test_improvement_resets_patience(self):
        from blt_vqg_tpu.train.trainer import EarlyStopping
        es = EarlyStopping(patience=2, min_delta=0.1, active_from=0)
        assert es.update(1, 10.0) is False
        assert es.update(2, 9.95) is False    # < min_delta → stale
        assert es.update(3, 9.0) is False     # real improvement → reset
        assert es.update(4, 9.0) is False
        assert es.update(5, 9.0) is True

    def test_disabled_by_default(self):
        from blt_vqg_tpu.train.trainer import EarlyStopping
        es = EarlyStopping(patience=0)
        assert all(not es.update(s, 1.0) for s in range(1, 20))


class TestMultiStep:
    def test_matches_g_single_steps(self, tiny_cfg, vocab_size):
        """make_multi_step (G steps in one lax.scan dispatch) must produce
        exactly the same state as G single-step calls with the same
        fold_in(rng, i) keys."""
        import jax
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_multi_step, make_train_step

        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        rng = np.random.RandomState(0)
        g, b = 3, cfg.batch_size

        def one_batch(i):
            r = np.random.RandomState(100 + i)
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

        batches = [one_batch(i) for i in range(g)]
        state_a = create_train_state(cfg, model, jax.random.key(0),
                                     batches[0])
        state_b = create_train_state(cfg, model, jax.random.key(0),
                                     batches[0])
        base = jax.random.key(7)

        step = make_train_step(cfg, latent_mode=True)
        for i in range(g):
            state_a, m_a = step(state_a, batches[i],
                                jax.random.fold_in(base, i))

        multi = make_multi_step(cfg, latent_mode=True)
        stacked = {k: np.stack([bt[k] for bt in batches])
                   for k in batches[0]}
        state_b, m_b = multi(state_b, stacked, base)

        assert int(state_b.step) == int(state_a.step) == g
        assert int(state_b.kliter) == g
        for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                          jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       atol=1e-6)
        # returned metrics are the LAST inner step's
        np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                                   rtol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, tiny_cfg, vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = {
            "images": jnp.zeros((2, cfg.image_size, cfg.image_size, 3)),
            "context": jnp.ones((2, cfg.max_context_len), jnp.int32),
            "posterior": jnp.ones((2, cfg.max_posterior_len), jnp.int32),
            "target": jnp.ones((2, cfg.max_q_length), jnp.int32),
        }
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        state = state.replace(step=jnp.asarray(7, jnp.int32),
                              kliter=jnp.asarray(3, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        mgr.save(state, cfg)
        assert mgr.latest_step() == 7

        # restore into a fresh template
        fresh = create_train_state(cfg, model, jax.random.key(1), batch)
        restored = mgr.restore(fresh)
        assert int(restored.step) == 7 and int(restored.kliter) == 3
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_retention_gc(self, tmp_path, tiny_cfg, vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = {
            "images": jnp.zeros((2, cfg.image_size, cfg.image_size, 3)),
            "context": jnp.ones((2, cfg.max_context_len), jnp.int32),
            "posterior": jnp.ones((2, cfg.max_posterior_len), jnp.int32),
            "target": jnp.ones((2, cfg.max_q_length), jnp.int32),
        }
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(state.replace(step=jnp.asarray(s, jnp.int32)), cfg)
        assert mgr.all_steps() == [3, 4]

    def _toy_state(self, params, opt_state):
        from blt_vqg_tpu.train.state import TrainState
        return TrainState(
            step=jnp.asarray(5, jnp.int32), kliter=jnp.asarray(2, jnp.int32),
            params=params, batch_stats={}, opt_state=opt_state,
            tx=None, apply_fn=None, lr_fn=None)

    def test_sharded_save_restore(self, tmp_path, eight_devices):
        """save_sharded writes only addressable, slice-deduplicated shards;
        restore_sharded reassembles the global state (multihost checkpoint
        path — here one process addresses the whole 4x2 mesh)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.parallel.mesh import build_mesh

        mesh = build_mesh((4, 2))
        kernel = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
        bias = jnp.arange(8, dtype=jnp.float32)
        params = {
            "dense": {
                "kernel": jax.device_put(
                    kernel, NamedSharding(mesh, P(None, "model"))),
                "bias": jax.device_put(bias, NamedSharding(mesh, P())),
            }}
        mu = {"dense": {"kernel": kernel.astype(jnp.bfloat16),
                        "bias": bias.astype(jnp.bfloat16)}}
        opt = {"count": jnp.asarray(5, jnp.int32), "mu": mu}
        state = self._toy_state(params, opt)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        path = mgr.save_sharded(state)
        files = [f for f in os.listdir(path) if f.startswith("shard_h")]
        assert files == ["shard_h0.npz"]
        with np.load(os.path.join(path, files[0])) as z:
            kernel_shards = [k for k in z.files
                             if k.startswith("params/dense/kernel@")]
            bias_shards = [k for k in z.files
                           if k.startswith("params/dense/bias@")]
        # model axis splits the kernel in 2; replicated bias dedups to 1
        assert len(kernel_shards) == 2
        assert len(bias_shards) == 1

        template = self._toy_state(
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, opt))
        restored = mgr.restore_sharded(template)
        assert int(restored.step) == 5 and int(restored.kliter) == 2
        np.testing.assert_array_equal(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(kernel))
        np.testing.assert_array_equal(
            np.asarray(restored.opt_state["mu"]["dense"]["kernel"]),
            np.asarray(mu["dense"]["kernel"]))
        assert restored.opt_state["mu"]["dense"]["kernel"].dtype == \
            jnp.dtype(jnp.bfloat16)
        assert int(restored.opt_state["count"]) == 5

    def test_sharded_save_restore_orbax(self, tmp_path, eight_devices):
        """backend='orbax' sharded round-trip: collective StandardSave
        into one tensorstore; restore reads shard-locally through the
        template's NamedShardings (single process addressing the whole
        4x2 mesh here; the true cross-process case runs in
        tests/test_multiprocess.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.parallel.mesh import build_mesh
        from blt_vqg_tpu.train.state import TrainState

        mesh = build_mesh((4, 2))
        kernel = jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8)
        bias = jnp.arange(8, dtype=jnp.float32)
        sharded = lambda a, spec: jax.device_put(
            a, NamedSharding(mesh, spec))
        make = lambda fill: TrainState(
            step=jnp.asarray(5, jnp.int32), kliter=jnp.asarray(2, jnp.int32),
            params={"dense": {
                "kernel": sharded(kernel * fill, P(None, "model")),
                "bias": sharded(bias * fill, P())}},
            batch_stats={"bn": {"mean": sharded(bias * fill, P())}},
            opt_state={"count": jnp.asarray(5, jnp.int32),
                       "mu": {"kernel": sharded(
                           (kernel * fill).astype(jnp.bfloat16),
                           P(None, "model"))}},
            tx=None, apply_fn=None, lr_fn=None)

        mgr = CheckpointManager(str(tmp_path / "ckpt"), backend="orbax")
        path = mgr.save_sharded(make(1.0))
        assert os.path.isdir(os.path.join(path, "orbax"))
        restored = mgr.restore_sharded(make(0.0))
        assert int(restored.step) == 5 and int(restored.kliter) == 2
        np.testing.assert_array_equal(
            np.asarray(restored.params["dense"]["kernel"]),
            np.asarray(kernel))
        got = restored.opt_state["mu"]["kernel"]
        assert got.dtype == jnp.dtype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)), np.asarray(kernel))
        # the restored kernel keeps the template's model-axis sharding
        assert restored.params["dense"]["kernel"].sharding.is_equivalent_to(
            NamedSharding(mesh, P(None, "model")), 2)

    def test_sharded_restore_detects_missing_coverage(self, tmp_path,
                                                      eight_devices):
        """A missing host's shard file must fail loudly, not restore
        zeros."""
        import os as _os
        from jax.sharding import NamedSharding, PartitionSpec as P
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.parallel.mesh import build_mesh

        mesh = build_mesh((4, 2))
        kernel = jax.device_put(
            jnp.ones((8, 8)), NamedSharding(mesh, P(None, "model")))
        state = self._toy_state({"w": kernel}, {})
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        path = mgr.save_sharded(state)
        # simulate a lost host file by dropping one kernel shard
        f = _os.path.join(path, "shard_h0.npz")
        with np.load(f) as z:
            kept = {k: z[k] for k in z.files if k != "params/w@1"}
        np.savez(f, **kept)
        with pytest.raises(ValueError, match="cover"):
            mgr.restore_sharded(self._toy_state(
                {"w": jnp.zeros((8, 8))}, {}))

    def test_sharded_restore_overlap_detection(self, tmp_path,
                                               eight_devices):
        """Overlapping-but-unequal shard slices (e.g. a leaf saved under
        two different layouts) must error, not double-count coverage or
        silently last-wins; identical overlapping slices still restore
        (replicated-shard dedup).  ADVICE r3 low, core/checkpoint.py."""
        import os as _os
        from jax.sharding import NamedSharding, PartitionSpec as P
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.parallel.mesh import build_mesh

        mesh = build_mesh((4, 2))
        w = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
        state = self._toy_state(
            {"w": jax.device_put(w, NamedSharding(mesh, P(None, "model")))},
            {})
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        path = mgr.save_sharded(state)
        f = _os.path.join(path, "shard_h0.npz")
        with np.load(f) as z:
            kept = {k: z[k] for k in z.files}
        # a second host's file whose chunk spans the WHOLE leaf (different
        # layout), conflicting with shard 0's data on the overlap
        np.savez(_os.path.join(path, "shard_h1.npz"),
                 **{"params/w@0": np.asarray(w) + 1.0,
                    "__idx__/params/w@0": np.asarray([[0, 8], [0, 8]],
                                                     np.int64)})
        with pytest.raises(ValueError, match="conflicting"):
            mgr.restore_sharded(self._toy_state({"w": jnp.zeros((8, 8))},
                                                {}))
        # identical overlap (true replication) restores cleanly
        np.savez(_os.path.join(path, "shard_h1.npz"),
                 **{"params/w@0": np.asarray(w),
                    "__idx__/params/w@0": np.asarray([[0, 8], [0, 8]],
                                                     np.int64)})
        restored = mgr.restore_sharded(self._toy_state(
            {"w": jnp.zeros((8, 8))}, {}))
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(w))

    def test_bf16_on_disk_params(self, tmp_path):
        """on_disk_param_dtype='bfloat16' halves param bytes; restore casts
        back to the template dtype (precision loss bounded by bf16 eps)."""
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        params = {"w": jnp.linspace(-3.0, 3.0, 64).reshape(8, 8)}
        state = self._toy_state(params, {})
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        path = mgr.save(state, on_disk_param_dtype="bfloat16")
        with np.load(os.path.join(path, "state.npz")) as z:
            assert z["params/w"].dtype.itemsize == 2
        restored = mgr.restore(self._toy_state(
            {"w": jnp.zeros((8, 8))}, {}))
        assert restored.params["w"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.asarray(params["w"]),
                                   rtol=1e-2, atol=1e-2)


class TestNLGMetrics:
    def test_perfect_match_scores_one(self):
        refs = ["what color is the cat", "how many dogs are there"]
        scores = NLGEval().compute_metrics(ref_list=[refs], hyp_list=refs)
        for k in ("Bleu_1", "Bleu_4", "ROUGE_L"):
            np.testing.assert_allclose(scores[k], 1.0, atol=1e-6)
        # METEOR's fragmentation penalty is nonzero even for an exact match
        # (one chunk): 1 - 0.5·(1/m)³
        assert scores["METEOR"] > 0.99
        assert scores["CIDEr"] > 0

    def test_disjoint_scores_zero(self):
        scores = NLGEval().compute_metrics(
            ref_list=[["aa bb cc"]], hyp_list=["xx yy zz"])
        assert scores["Bleu_1"] < 1e-6
        assert scores["ROUGE_L"] == 0.0
        assert scores["METEOR"] == 0.0

    def test_bleu_brevity_penalty(self):
        # hypothesis = half the reference: unigram precision 1, bp = e^{1-2}
        b = corpus_bleu([[["a", "b", "c", "d"]]], [["a", "b"]], 1)
        np.testing.assert_allclose(b[0], math.exp(1 - 2), rtol=1e-6)

    def test_rouge_prefers_longer_lcs(self):
        refs = [[["a", "b", "c", "d"]]] * 2
        hyp_good = [["a", "b", "c", "d"]]
        hyp_bad = [["a", "x", "c", "y"]]
        assert rouge_l([refs[0]], hyp_good) > rouge_l([refs[1]], hyp_bad)

    def test_ordering_quality(self):
        """Better hypotheses must score higher across all metrics."""
        ref = ["what color is the small cat"]
        good = ["what color is the cat"]
        bad = ["how many dogs"]
        s_good = NLGEval().compute_metrics(ref_list=[ref], hyp_list=good)
        s_bad = NLGEval().compute_metrics(ref_list=[ref], hyp_list=bad)
        for k in s_good:
            assert s_good[k] >= s_bad[k], k


class TestOrbaxBackend:
    """backend="orbax": same manager API over an Orbax
    StandardCheckpointHandler store per step (core/checkpoint.py)."""

    def _state(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = {
            "images": jnp.zeros((2, cfg.image_size, cfg.image_size, 3)),
            "context": jnp.ones((2, cfg.max_context_len), jnp.int32),
            "posterior": jnp.ones((2, cfg.max_posterior_len), jnp.int32),
            "target": jnp.ones((2, cfg.max_q_length), jnp.int32),
        }
        return cfg, model, batch, create_train_state(
            cfg, model, jax.random.key(0), batch)

    def test_roundtrip_and_sidecar(self, tmp_path, tiny_cfg, vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.core.config import Config
        from blt_vqg_tpu.train.state import create_train_state
        cfg, model, batch, state = self._state(tiny_cfg, vocab_size)
        state = state.replace(step=jnp.asarray(7, jnp.int32),
                              kliter=jnp.asarray(3, jnp.int32))
        mgr = CheckpointManager(str(tmp_path / "ckpt"), backend="orbax")
        path = mgr.save(state, cfg)
        assert mgr.latest_step() == 7
        # args.json sidecar round-trips across backends
        assert Config.load(f"{path}/args.json").hidden_dim == cfg.hidden_dim

        fresh = create_train_state(cfg, model, jax.random.key(1), batch)
        restored = mgr.restore(fresh)
        assert int(restored.step) == 7 and int(restored.kliter) == 3
        for x, y in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # optimizer state (Adam moments + counts) round-trips too
        for x, y in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_same_step_resave_overwrites(self, tmp_path, tiny_cfg,
                                         vocab_size):
        """Trainer.fit re-saves the final step at fit end — the orbax
        backend must overwrite like npz does (found by a real TPU run:
        Orbax itself refuses an existing destination)."""
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        cfg, model, batch, state = self._state(tiny_cfg, vocab_size)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), backend="orbax")
        mgr.save(state, cfg)
        mgr.save(state, cfg)  # same step again
        assert mgr.all_steps() == [0]
        restored = mgr.restore(state)
        assert int(restored.step) == 0

    def test_async_save_retention_and_bf16(self, tmp_path, tiny_cfg,
                                           vocab_size):
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.train.state import create_train_state
        cfg, model, batch, state = self._state(tiny_cfg, vocab_size)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2,
                                backend="orbax")
        for s in (1, 2, 3):
            mgr.save(state.replace(step=jnp.asarray(s, jnp.int32)), cfg,
                     block=False)
        mgr.wait()
        assert mgr.all_steps() == [2, 3]  # retention GC across backends

        # bf16-on-disk: restore casts back to the f32 template within
        # bf16 quantization error
        mgr2 = CheckpointManager(str(tmp_path / "ckpt16"), backend="orbax")
        mgr2.save(state, cfg, on_disk_param_dtype="bfloat16")
        fresh = create_train_state(cfg, model, jax.random.key(1), batch)
        restored = mgr2.restore(fresh)
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        assert b.dtype == a.dtype
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-2)


class TestLegacyLoopUtilities:
    def test_two_gaussian_kl_formula(self):
        """Exact formula of the legacy loop's compute_two_gaussian_loss
        (reference old_train_iq.py:262-278), incl. its epsilons and
        sum-then-divide-by-batch reduction."""
        from blt_vqg_tpu.train.losses import two_gaussian_kl
        r = np.random.RandomState(0)
        mu1, lv1, mu2, lv2 = [r.randn(4, 6).astype(np.float32)
                              for _ in range(4)]
        got = float(two_gaussian_kl(*map(jnp.asarray, (mu1, lv1, mu2, lv2))))
        num = np.exp(lv1) + (mu1 - mu2) ** 2
        frac = num / (np.exp(lv2) + 1e-8)
        want = 0.5 * np.sum(lv2 - lv1 + frac - 1.0) / (4 + 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # identical gaussians -> 0
        z = float(two_gaussian_kl(jnp.asarray(mu1), jnp.asarray(lv1),
                                  jnp.asarray(mu1), jnp.asarray(lv1)))
        assert abs(z) < 1e-5

    def test_reduce_lr_on_plateau(self):
        """torch-ReduceLROnPlateau semantics (reference
        old_train_iq.py:360-362): decay by `factor` after `patience`
        non-improving updates, floor at min_scale, reset on improvement."""
        from blt_vqg_tpu.train.schedule import ReduceLROnPlateau
        s = ReduceLROnPlateau(factor=0.1, patience=2, min_lr=1e-3)
        assert s.update(1.0) == 1.0          # first value = best
        assert s.update(0.5) == 1.0          # improvement
        assert s.update(0.6) == 1.0          # bad 1
        assert s.update(0.6) == 1.0          # bad 2 (= patience)
        assert s.update(0.6) == 0.1          # bad 3 > patience -> decay
        assert s.update(0.4) == 0.1          # improvement: scale sticks
        for _ in range(3):
            last = s.update(0.41)
        assert last == pytest.approx(0.01)   # second decay
        for _ in range(20):
            last = s.update(0.41)
        assert last == 1e-3                  # floored (max() returns min_scale exactly)
        # torch min_lr floors the ABSOLUTE lr: with base_lr the returned
        # multiplier floors at min_lr/base_lr (ADVICE round-2 fix)
        s2 = ReduceLROnPlateau(factor=0.1, patience=0, min_lr=1e-3,
                               base_lr=0.1)
        s2.update(1.0)
        for _ in range(20):
            last = s2.update(2.0)
        assert last == pytest.approx(1e-2)   # 1e-3 absolute / 0.1 base


class TestFactoredNuCheckpoint:
    @pytest.mark.parametrize("backend", ["npz", "orbax"])
    def test_round_trip_preserves_factored_state(self, tiny_cfg, vocab_size,
                                                 tmp_path, backend):
        """--adam_factored_nu survives a checkpoint save/restore on BOTH
        backends: FactoredNu leaves (r/c EMAs) round-trip bit-exact and
        training resumes finitely from the restored state."""
        from blt_vqg_tpu.core.checkpoint import CheckpointManager
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.fused_adam import FactoredNu
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step
        from __graft_entry__ import _example_batch

        cfg = tiny_cfg.replace(adam_factored_nu=True)
        model = IQ(cfg, vocab_size)
        batch = _example_batch(cfg, vocab_size, cfg.batch_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=False)
        for i in range(2):
            state, m = step(state, batch, jax.random.key(i))
        assert np.isfinite(float(m["loss"]))

        mgr = CheckpointManager(str(tmp_path / "ckpt"), backend=backend)
        mgr.save(state, cfg)
        template = create_train_state(cfg, model, jax.random.key(1), batch)
        restored = mgr.restore(template)

        def fact_leaves(tree):
            return [x for x in jax.tree_util.tree_leaves(
                tree, is_leaf=lambda y: isinstance(y, FactoredNu))
                if isinstance(x, FactoredNu)]

        orig, rest = fact_leaves(state.opt_state.nu), \
            fact_leaves(restored.opt_state.nu)
        assert len(orig) == len(rest) and len(orig) > 10
        for a, b in zip(orig, rest):
            np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))
            np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))
        restored, m2 = step(restored, batch, jax.random.key(9))
        assert np.isfinite(float(m2["loss"]))
