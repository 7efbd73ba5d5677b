"""Mixture-of-experts FFN + expert parallelism (ops/moe.py).

Capability extension over the reference (no MoE anywhere in
nihirv/blt-vqg, SURVEY.md §2.4 "EP: no MoE"), so there is no reference
oracle: correctness is pinned against a per-token numpy loop and
routing-contract properties instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.ops.moe import (MoEFeedForward, balance_loss,
                                 expert_capacity, route_tokens)


def _probs(key, s, e):
    return jax.nn.softmax(jax.random.normal(key, (s, e)), -1)


class TestRouting:
    def test_capacity_formula(self):
        # ceil(cf · k · S / E), clamped to [1, S]
        assert expert_capacity(16, 4, 1, 1.0) == 4
        assert expert_capacity(16, 4, 2, 1.0) == 8
        assert expert_capacity(16, 4, 2, 1.25) == 10
        assert expert_capacity(3, 8, 1, 1.0) == 1      # clamp low
        assert expert_capacity(4, 2, 2, 100.0) == 4    # clamp to S

    def test_dispatch_contract(self):
        probs = _probs(jax.random.key(0), 32, 4)
        cap = 8
        d, c = route_tokens(probs, 2, cap)
        d = np.asarray(d)
        # every token holds at most top_k slots, every expert at most C
        assert (d.sum(axis=(1, 2)) <= 2).all()
        assert (d.sum(axis=(0, 2)) <= cap).all()
        # each (expert, slot) pair is claimed by at most one token
        assert (d.sum(axis=0) <= 1).all()
        # combine is gate-weighted dispatch: zero exactly where d is zero
        assert (np.asarray(c)[d == 0] == 0).all()

    def test_no_drops_at_large_capacity(self):
        s, e, k = 16, 4, 2
        probs = _probs(jax.random.key(1), s, e)
        d, c = route_tokens(probs, k, capacity=s)
        assert np.asarray(d).sum() == s * k
        # with k>1 gates renormalize over the selected experts → sum to 1
        np.testing.assert_allclose(np.asarray(c).sum(axis=(1, 2)),
                                   np.ones(s), rtol=1e-5)

    def test_top1_gate_is_raw_probability(self):
        # Switch convention: the k=1 gate is the top-1 softmax prob itself,
        # NOT renormalized to 1 — that path carries the router gradient
        probs = _probs(jax.random.key(2), 8, 4)
        _, c = route_tokens(probs, 1, capacity=8)
        np.testing.assert_allclose(np.asarray(c).sum(axis=(1, 2)),
                                   np.asarray(probs.max(axis=-1)), rtol=1e-5)

    def test_priority_first_choices_win(self):
        # one expert everyone wants first: capacity goes to first choices
        # in token order, later tokens are dropped
        probs = jnp.tile(jnp.asarray([[0.7, 0.1, 0.1, 0.1]]), (6, 1))
        d, _ = route_tokens(probs, 1, capacity=2)
        load = np.asarray(d).sum(axis=(0, 2))
        assert load[0] == 2 and load[1:].sum() == 0
        # tokens 0 and 1 got the slots
        assert np.asarray(d).sum(axis=(1, 2))[:2].all()
        assert not np.asarray(d).sum(axis=(1, 2))[2:].any()

    def test_balance_loss_uniform_is_one(self):
        e = 4
        probs = jnp.full((8, e), 1.0 / e)
        top1 = jnp.arange(8) % e
        assert float(balance_loss(probs, top1)) == pytest.approx(1.0)
        # fully collapsed routing → loss = E
        probs = jnp.zeros((8, e)).at[:, 0].set(1.0)
        assert float(balance_loss(probs, jnp.zeros(8, jnp.int32))
                     ) == pytest.approx(e)


class TestMoEModule:
    def _module(self, **kw):
        base = dict(hidden_dim=16, pwffn_dim=32, num_experts=4, top_k=2,
                    capacity_factor=4.0, dropout_rate=0.0,
                    dtype=jnp.float32)
        base.update(kw)
        return MoEFeedForward(**base)

    def test_matches_per_token_oracle(self):
        """At drop-free capacity, y[s] = Σ_k gate_k · FFN_{e_k}(x[s])."""
        m = self._module()
        x = jax.random.normal(jax.random.key(0), (3, 5, 16))
        p = m.init({"params": jax.random.key(1)}, x)["params"]
        y = np.asarray(m.apply({"params": p}, x)).reshape(-1, 16)

        toks = np.asarray(x, np.float32).reshape(-1, 16)
        logits = toks @ np.asarray(p["router"])
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
        w_in, b_in = np.asarray(p["expert_in"]), np.asarray(p["expert_in_bias"])
        w_out, b_out = (np.asarray(p["expert_out"]),
                        np.asarray(p["expert_out_bias"]))
        want = np.zeros_like(toks)
        for s in range(toks.shape[0]):
            top2 = np.argsort(-probs[s])[:2]
            g = probs[s][top2] / probs[s][top2].sum()
            for gk, ek in zip(g, top2):
                h = np.maximum(toks[s] @ w_in[ek] + b_in[ek], 0)
                want[s] += gk * (h @ w_out[ek] + b_out[ek])
        np.testing.assert_allclose(y, want, atol=1e-5)

    def test_sows_aux_losses(self):
        m = self._module()
        x = jax.random.normal(jax.random.key(0), (2, 4, 16))
        p = m.init({"params": jax.random.key(1)}, x)["params"]
        _, moe = m.apply({"params": p}, x, mutable=["moe"])
        (bal,) = jax.tree_util.tree_leaves(moe["moe"]["balance"])
        (rz,) = jax.tree_util.tree_leaves(moe["moe"]["router_z"])
        # ≈1 near-uniform routing at init (f·p can dip slightly under 1/E²
        # when argmax fractions and softmax means diverge), ≤E always
        assert 0.8 <= float(bal) <= 4.0
        assert float(rz) > 0.0

    def test_router_and_experts_get_gradient(self):
        m = self._module()
        x = jax.random.normal(jax.random.key(0), (2, 8, 16))
        p = m.init({"params": jax.random.key(1)}, x)["params"]
        g = jax.grad(lambda pp: jnp.sum(m.apply({"params": pp}, x) ** 2))(p)
        for name in ("router", "expert_in", "expert_out"):
            assert float(jnp.abs(g[name]).max()) > 0, name

    def test_dropped_tokens_contribute_zero(self):
        # capacity 1 with concentrated routing: overflowing tokens emit 0
        m = self._module(top_k=1, capacity_factor=1e-9)  # cap clamps to 1
        x = jnp.ones((1, 6, 16))  # identical tokens → identical routing
        p = m.init({"params": jax.random.key(1)}, x)["params"]
        y = np.asarray(m.apply({"params": p}, x))[0]
        # exactly one token got a slot; the rest are zero rows
        nonzero = (np.abs(y).max(axis=-1) > 1e-7).sum()
        assert nonzero == 1


class TestIQIntegration:
    CFG = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                 num_layers=2, num_heads=4, batch_size=8, image_size=32,
                 max_q_length=10, max_decode_length=8, dtype="float32",
                 full_kl_step=4, moe_num_experts=4, moe_top_k=2,
                 moe_capacity_factor=2.0)

    def _setup(self, cfg=None):
        from __graft_entry__ import _example_batch
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        cfg = cfg or self.CFG
        model = IQ(cfg, 64)
        batch = _example_batch(cfg, 64, cfg.batch_size)
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        return cfg, model, batch, state

    def test_train_step_both_phases(self):
        from blt_vqg_tpu.train.step import make_train_step
        cfg, _, batch, state = self._setup()
        for lm in (False, True):
            step = make_train_step(cfg, latent_mode=lm)
            state, m = step(state, batch, jax.random.key(1))
            assert np.isfinite(float(m["loss"]))
            assert float(m["moe_balance"]) >= 0.8
            assert float(m["moe_router_z"]) > 0.0

    def test_aux_weight_reaches_router_grad(self):
        """With ONLY the aux losses weighted (token path detached by a
        zero output), the router still gets gradient through p_e."""
        from blt_vqg_tpu.train.step import _loss_fn
        cfg, _, batch, state = self._setup()
        g = jax.grad(lambda p: _loss_fn(p, state, batch, jax.random.key(2),
                                        cfg, True)[0])(state.params)
        r = g["decoder"]["layer_0"]["ffn"]["router"]
        assert float(jnp.abs(r).max()) > 0

    def test_moe_every_staggers_layers(self):
        cfg, _, batch, state = self._setup(self.CFG.replace(moe_every=2))
        p = state.params["decoder"]
        assert "router" not in p["layer_0"]["ffn"]      # dense
        assert "router" in p["layer_1"]["ffn"]          # MoE

    def test_greedy_decode_runs(self):
        from blt_vqg_tpu.train.step import make_decode_step
        cfg, model, batch, state = self._setup()
        dec = make_decode_step(cfg, model, latent_mode=True)
        out = dec(state, batch["images"], batch["context"],
                  jax.random.key(0))
        assert out["tokens"].shape == (cfg.batch_size,
                                       cfg.max_decode_length + 1)

    def test_stream_decode_rejected(self):
        from blt_vqg_tpu.models.iq import IQ
        cfg = self.CFG.replace(use_stream_decode=True)
        model = IQ(cfg, 64)
        from __graft_entry__ import _example_batch
        batch = _example_batch(cfg, 64, cfg.batch_size)
        with pytest.raises(ValueError, match="streaming decode"):
            model.init({"params": jax.random.key(0),
                        "latent": jax.random.key(1),
                        "dropout": jax.random.key(2)},
                       batch["images"], batch["context"],
                       batch["posterior"], batch["target"],
                       latent_mode=True, train=False)

    def test_multi_step_scan_carries_moe(self):
        """steps_per_dispatch>1: the lax.scan carry must be structure-stable
        with MoE metrics present."""
        from blt_vqg_tpu.train.step import make_multi_step
        cfg, _, batch, state = self._setup()
        multi = make_multi_step(cfg, latent_mode=True)
        stacked = jax.tree.map(
            lambda x: jnp.stack([x, x]), batch)
        state, m = multi(state, stacked, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))
        assert "moe_balance" in m


class TestExpertParallel:
    """EP over the virtual 8-device mesh (conftest forces 8 CPU devices)."""

    def test_sharded_matches_single_device(self):
        from __graft_entry__ import _example_batch
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.parallel.mesh import build_mesh
        from blt_vqg_tpu.parallel.sharding import (replicate, shard_batch,
                                                   shard_params,
                                                   spec_for_param)
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step

        # the EP rules resolve as written
        assert spec_for_param("decoder/layer_0/ffn/expert_in", 3
                              ) == jax.sharding.PartitionSpec(
                                  "expert", None, "model")

        cfg = TestIQIntegration.CFG.replace(
            mesh_shape=(2, 2, 2),
            mesh_axis_names=("data", "model", "expert"))
        model = IQ(cfg, 64)
        batch = _example_batch(cfg, 64, cfg.batch_size)

        solo = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=True)
        _, m_solo = step(solo, batch, jax.random.key(1))

        mesh = build_mesh((2, 2, 2), ("data", "model", "expert"))
        st = create_train_state(cfg, model, jax.random.key(0), batch)
        st = st.replace(params=shard_params(st.params, mesh),
                        batch_stats=replicate(st.batch_stats, mesh))
        step_ep = make_train_step(cfg, latent_mode=True, mesh=mesh)
        st, m_ep = step_ep(st, shard_batch(batch, mesh), jax.random.key(1))

        assert float(m_ep["loss"]) == pytest.approx(float(m_solo["loss"]),
                                                    abs=1e-4)
        # expert kernels are PHYSICALLY sharded on their expert dim
        ek = st.params["decoder"]["layer_0"]["ffn"]["expert_in"]
        assert any(s.data.shape[0] != ek.shape[0]
                   for s in ek.addressable_shards)

    def test_expert_spec_filtered_on_plain_mesh(self):
        """MoE params placed on a DP×TP mesh (no 'expert' axis) replicate
        their expert dim instead of erroring."""
        from blt_vqg_tpu.parallel.mesh import build_mesh
        from blt_vqg_tpu.parallel.sharding import param_sharding_rules
        mesh = build_mesh((4, 2), ("data", "model"))
        params = {"ffn": {"expert_in": jnp.zeros((4, 8, 16))}}
        sh = param_sharding_rules(params, mesh)
        assert sh["ffn"]["expert_in"].spec == jax.sharding.PartitionSpec(
            None, None, "model")
