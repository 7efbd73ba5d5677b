"""Distributed-correctness tests on the 8-virtual-device CPU mesh.

The key property: sharding is a layout annotation, not a semantic change —
a TP×DP-sharded train step must produce the same numbers as the
single-device program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.parallel.mesh import build_mesh, local_mesh
from blt_vqg_tpu.parallel.sharding import (
    batch_sharding, param_sharding_rules, replicate, shard_batch,
    shard_params, spec_for_param)
from blt_vqg_tpu.train.state import create_train_state
from blt_vqg_tpu.train.step import make_train_step


class TestMesh:
    def test_build_shapes(self, eight_devices):
        mesh = build_mesh((4, 2))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_local_mesh_fills_data(self, eight_devices):
        mesh = local_mesh(model=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            build_mesh((64, 2))


class TestShardingRules:
    def test_spec_selection(self):
        from jax.sharding import PartitionSpec as P
        assert spec_for_param("decoder/layer_0/self_attn/q_proj/kernel", 2) \
            == P(None, "model")
        assert spec_for_param("decoder/layer_0/self_attn/out_proj/kernel", 2) \
            == P("model", None)
        assert spec_for_param("encoder/layer_1/ffn/ffn_in/kernel", 2) \
            == P(None, "model")
        assert spec_for_param("encoder/layer_1/ffn/ffn_out/kernel", 2) \
            == P("model", None)
        assert spec_for_param("output_proj/kernel", 2) == P(None, "model")
        assert spec_for_param("embed/embedding", 2) == P()
        # biases under sharded scopes stay replicated (ndim guard)
        assert spec_for_param("ffn/ffn_in/bias", 1) == P()

    def test_params_actually_sharded(self, tiny_cfg, vocab_size,
                                     eight_devices):
        mesh = build_mesh((4, 2))
        model = IQ(tiny_cfg, vocab_size)
        batch = _tiny_batch(tiny_cfg, 8)
        state = create_train_state(tiny_cfg, model, jax.random.key(0), batch)
        sharded = shard_params(state.params, mesh)
        qk = sharded["decoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
        # column-parallel: second dim split over 'model' (2 shards)
        shard_shapes = {s.data.shape for s in qk.addressable_shards}
        assert shard_shapes == {(qk.shape[0], qk.shape[1] // 2)}


def _tiny_batch(cfg, b):
    rng = np.random.RandomState(0)
    return {
        "images": rng.rand(b, cfg.image_size, cfg.image_size, 3
                           ).astype(np.float32),
        "context": rng.randint(1, 40, (b, cfg.max_context_len)
                               ).astype(np.int32),
        "posterior": rng.randint(1, 40, (b, cfg.max_posterior_len)
                                 ).astype(np.int32),
        "target": rng.randint(1, 40, (b, cfg.max_q_length)).astype(np.int32),
    }


class TestShardedStepParity:
    @pytest.mark.parametrize("latent_mode", [False, True])
    def test_dp_tp_matches_single_device(self, tiny_cfg, vocab_size,
                                         eight_devices, latent_mode):
        """One train step on a (4 data × 2 model) mesh must equal the
        unsharded step numerically (sharding = layout only)."""
        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = _tiny_batch(cfg, 8)

        # single-device baseline
        state0 = create_train_state(cfg, model, jax.random.key(0), batch)
        step0 = make_train_step(cfg, latent_mode=latent_mode)
        new0, m0 = step0(state0, batch, jax.random.key(7))

        # sharded run from identical init
        mesh = build_mesh((4, 2))
        state1 = create_train_state(cfg, model, jax.random.key(0), batch)
        state1 = state1.replace(
            params=shard_params(state1.params, mesh),
            batch_stats=replicate(state1.batch_stats, mesh),
            opt_state=replicate(state1.opt_state, mesh))
        step1 = make_train_step(cfg, latent_mode=latent_mode, mesh=mesh)
        new1, m1 = step1(state1, shard_batch(batch, mesh), jax.random.key(7))

        for key in ("loss", "rec", "img", "kld"):
            np.testing.assert_allclose(
                float(m0[key]), float(m1[key]), rtol=2e-4, atol=1e-5,
                err_msg=f"{key} diverged under sharding "
                        f"(latent={latent_mode})")

        # sync-BN by construction: the frozen backbone's BatchNorm batch
        # statistics are means over the GLOBAL batch (jit inserts the
        # cross-shard reduction), so the updated running stats must equal
        # the single-device run's — the DP answer to the reference's
        # cross-replica-BN hazard (SURVEY.md §7 hard parts)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            new0.batch_stats, new1.batch_stats)

    @pytest.mark.parametrize("fused", [True, False], ids=["fused", "optax"])
    def test_zero1_opt_state_matches_replicated(self, tiny_cfg, vocab_size,
                                                eight_devices, fused):
        """ZeRO-1 (--shard_opt_state): Adam moments sharded over the data
        axis must produce the same step as replicated moments (sharding =
        layout only; XLA inserts the reduce/all-gather), and the moments
        must be PHYSICALLY sharded (per-device shard < full leaf).  Both
        optimizer impls: the fused clip+Adam pass and the optax chain
        (whose state paths carry the same param suffixes)."""
        from blt_vqg_tpu.parallel.sharding import shard_opt_state

        cfg = tiny_cfg.replace(fused_adam=fused)
        model = IQ(cfg, vocab_size)
        batch = _tiny_batch(cfg, 8)
        mesh = build_mesh((4, 2))

        def one_step(zero1):
            state = create_train_state(cfg, model, jax.random.key(0), batch)
            opt = (shard_opt_state(state.opt_state, mesh) if zero1
                   else replicate(state.opt_state, mesh))
            state = state.replace(
                params=shard_params(state.params, mesh),
                batch_stats=replicate(state.batch_stats, mesh),
                opt_state=opt)
            step = make_train_step(cfg, latent_mode=True, mesh=mesh)
            for i in range(2):
                state, m = step(state, shard_batch(batch, mesh),
                                jax.random.key(7 + i))
            return state, m

        s0, m0 = one_step(zero1=False)
        s1, m1 = one_step(zero1=True)
        for key in ("loss", "rec", "img", "kld"):
            np.testing.assert_allclose(float(m0[key]), float(m1[key]),
                                       rtol=2e-4, atol=1e-5, err_msg=key)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            s0.params, s1.params)

        # the moments really are distributed: some leaf's addressable
        # shard is a strict slice of the full array (generic walk — the
        # optax chain nests its moments inside multi_transform state)
        mu_leaves = [x for x in jax.tree_util.tree_leaves(s1.opt_state)
                     if hasattr(x, "addressable_shards")
                     and getattr(x, "ndim", 0) >= 1]
        assert any(s.data.shape != x.shape
                   for x in mu_leaves for s in x.addressable_shards), \
            "no optimizer-state leaf is physically sharded"

    def test_fsdp_matches_replicated(self, tiny_cfg, vocab_size,
                                     eight_devices):
        """FSDP (--fsdp): params sharded over the data axis (on top of TP)
        must train identically to replicated params — XLA's per-use
        all-gathers and grad reduce-scatters are layout, not math — and the
        params must be PHYSICALLY sharded."""
        from blt_vqg_tpu.parallel.sharding import shard_opt_state

        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = _tiny_batch(cfg, 8)
        mesh = build_mesh((4, 2))

        def one_step(fsdp):
            state = create_train_state(cfg, model, jax.random.key(0), batch)
            state = state.replace(
                params=shard_params(state.params, mesh, fsdp=fsdp),
                batch_stats=replicate(state.batch_stats, mesh),
                opt_state=(shard_opt_state(state.opt_state, mesh) if fsdp
                           else replicate(state.opt_state, mesh)))
            step = make_train_step(cfg, latent_mode=True, mesh=mesh)
            for i in range(2):
                state, m = step(state, shard_batch(batch, mesh),
                                jax.random.key(11 + i))
            return state, m

        s0, m0 = one_step(fsdp=False)
        s1, m1 = one_step(fsdp=True)
        for key in ("loss", "rec", "img", "kld"):
            np.testing.assert_allclose(float(m0[key]), float(m1[key]),
                                       rtol=2e-4, atol=1e-5, err_msg=key)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            s0.params, s1.params)
        p_leaves = [x for x in jax.tree_util.tree_leaves(s1.params)
                    if hasattr(x, "addressable_shards") and x.ndim >= 1]
        assert any(len({s.data.shape for s in x.addressable_shards})
                   == 1 and x.addressable_shards[0].data.shape != x.shape
                   for x in p_leaves), "no param leaf is physically sharded"

    def test_hybrid_mesh_matches_single_device(self, tiny_cfg, vocab_size,
                                               eight_devices):
        """Slice-aware layout: a (2 dcn_data × 2 data × 2 model) hybrid mesh
        shards the batch over BOTH data axes (4-way) and matches the
        unsharded step numerically."""
        from blt_vqg_tpu.parallel.mesh import build_hybrid_mesh
        from blt_vqg_tpu.parallel.sharding import batch_sharding
        from jax.sharding import PartitionSpec as P

        cfg = tiny_cfg
        model = IQ(cfg, vocab_size)
        batch = _tiny_batch(cfg, 8)

        state0 = create_train_state(cfg, model, jax.random.key(0), batch)
        step0 = make_train_step(cfg, latent_mode=True)
        _, m0 = step0(state0, batch, jax.random.key(7))

        mesh = build_hybrid_mesh(dcn_data=2, model=2)
        assert dict(mesh.shape) == {"dcn_data": 2, "data": 2, "model": 2}
        assert batch_sharding(mesh).spec == P(("dcn_data", "data"), None)
        state1 = create_train_state(cfg, model, jax.random.key(0), batch)
        state1 = state1.replace(
            params=shard_params(state1.params, mesh),
            batch_stats=replicate(state1.batch_stats, mesh),
            opt_state=replicate(state1.opt_state, mesh))
        step1 = make_train_step(cfg, latent_mode=True, mesh=mesh)
        sharded = shard_batch(batch, mesh)
        # the batch is physically split 4 ways (2 dcn_data × 2 data)
        assert len({s.index for s in sharded["images"].addressable_shards
                    }) == 4
        _, m1 = step1(state1, sharded, jax.random.key(7))
        for key in ("loss", "rec", "img", "kld"):
            np.testing.assert_allclose(
                float(m0[key]), float(m1[key]), rtol=2e-4, atol=1e-5,
                err_msg=f"{key} diverged on the hybrid mesh")


class TestFactoredNuComposition:
    def test_zero1_shards_factored_nu_state(self, tiny_cfg, vocab_size,
                                            eight_devices):
        """ZeRO-1 × --adam_factored_nu (round 5): sharding the optimizer
        state must compose with FactoredNu leaves — the step runs, the loss
        is finite, mu leaves are physically sharded, and the nu tree holds
        FactoredNu pairs for the >=2-D trainable leaves."""
        from blt_vqg_tpu.parallel.sharding import shard_opt_state
        from blt_vqg_tpu.train.fused_adam import FactoredNu

        cfg = tiny_cfg.replace(adam_factored_nu=True)
        model = IQ(cfg, vocab_size)
        batch = _tiny_batch(cfg, 8)
        mesh = build_mesh((4, 2))
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        state = state.replace(
            params=shard_params(state.params, mesh),
            batch_stats=replicate(state.batch_stats, mesh),
            opt_state=shard_opt_state(state.opt_state, mesh))
        step = make_train_step(cfg, latent_mode=True, mesh=mesh)
        state, m = step(state, shard_batch(batch, mesh), jax.random.key(7))
        assert np.isfinite(float(m["loss"]))
        n_sh = sum(1 for x in jax.tree_util.tree_leaves(state.opt_state.mu)
                   if hasattr(x, "addressable_shards") and x.ndim >= 1
                   and any(s.data.shape != x.shape
                           for s in x.addressable_shards))
        assert n_sh > 0, "no mu leaf physically sharded"
        n_fact = sum(isinstance(x, FactoredNu)
                     for x in jax.tree_util.tree_leaves(
                         state.opt_state.nu,
                         is_leaf=lambda y: isinstance(y, FactoredNu)))
        assert n_fact > 10, "expected FactoredNu leaves in the nu tree"
