"""Ring attention vs full attention on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.ops.ring_attention import ring_attention
from blt_vqg_tpu.parallel.mesh import build_mesh


def full_attention(q, k, v, causal=False):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if causal:
        t = q.shape[1]
        cm = jnp.triu(jnp.ones((t, t), bool), 1)[None, None]
        logits = jnp.where(cm, -1e30, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)


@pytest.fixture(scope="module")
def seq_mesh(request):
    request.getfixturevalue("eight_devices")
    return build_mesh((8,), ("seq",))


def rand_qkv(b, t, h, d, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return (jax.random.normal(ks[0], (b, t, h, d), jnp.float32),
            jax.random.normal(ks[1], (b, t, h, d), jnp.float32),
            jax.random.normal(ks[2], (b, t, h, d), jnp.float32))


class TestRingAttention:
    def test_matches_full_attention(self, seq_mesh):
        q, k, v = rand_qkv(2, 64, 2, 8)
        out = ring_attention(q, k, v, seq_mesh, axis="seq")
        ref = full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_causal_matches_full(self, seq_mesh):
        q, k, v = rand_qkv(2, 64, 2, 8, seed=1)
        out = ring_attention(q, k, v, seq_mesh, axis="seq", causal=True)
        ref = full_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_sharded_inputs_sharded_outputs(self, seq_mesh):
        """With T actually sharded over the mesh, each device should hold
        only T/8 of the sequence before and after."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        q, k, v = rand_qkv(1, 64, 2, 8, seed=2)
        sh = NamedSharding(seq_mesh, P(None, "seq", None, None))
        q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
        out = ring_attention(q, k, v, seq_mesh, axis="seq")
        assert out.sharding.spec == P(None, "seq", None, None)
        shard_t = {s.data.shape[1] for s in out.addressable_shards}
        assert shard_t == {8}  # 64 / 8 devices
        ref = full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_indivisible_length_raises(self, seq_mesh):
        q, k, v = rand_qkv(1, 60, 2, 8)
        with pytest.raises(AssertionError):
            ring_attention(q, k, v, seq_mesh, axis="seq")

    def test_kv_pad_mask_matches_full(self, seq_mesh):
        """Key-padding mask shards rotate with K/V around the ring."""
        q, k, v = rand_qkv(2, 64, 2, 8, seed=3)
        pad = jnp.zeros((2, 64), bool).at[:, 40:].set(True)
        out = ring_attention(q, k, v, seq_mesh, axis="seq", kv_pad=pad)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(pad[:, None, None, :], -1e30, logits)
        w = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_causal_plus_pad(self, seq_mesh):
        q, k, v = rand_qkv(1, 32, 2, 8, seed=4)
        pad = jnp.zeros((1, 32), bool).at[:, 20:].set(True)
        out = ring_attention(q, k, v, seq_mesh, axis="seq", causal=True,
                             kv_pad=pad)
        t = 32
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        cm = jnp.triu(jnp.ones((t, t), bool), 1)[None, None]
        logits = jnp.where(cm | pad[:, None, None, :], -1e30, logits)
        w = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)


class TestPallasRingRDMA:
    """impl="pallas": the RDMA inner-loop kernel
    (ops/pallas/ring_attention.py) — K/V hops via make_async_remote_copy
    with credit flow control, run here under the TPU interpreter, which
    simulates the remote DMAs/semaphores on the 8-virtual-device mesh and
    validates they drain to zero."""

    def test_matches_full_attention(self, seq_mesh):
        q, k, v = rand_qkv(2, 32, 2, 8, seed=5)
        out = ring_attention(q, k, v, seq_mesh, axis="seq", impl="pallas")
        ref = full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_causal_plus_pad_matches_full(self, seq_mesh):
        q, k, v = rand_qkv(1, 32, 2, 8, seed=6)
        pad = jnp.zeros((1, 32), bool).at[:, 20:].set(True)
        out = ring_attention(q, k, v, seq_mesh, axis="seq", causal=True,
                             kv_pad=pad, impl="pallas")
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        cm = jnp.triu(jnp.ones((32, 32), bool), 1)[None, None]
        logits = jnp.where(cm | pad[:, None, None, :], -1e30, logits)
        w = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grad_matches_xla_ring(self, seq_mesh, causal):
        """The custom VJP runs a SECOND ring kernel (FlashAttention-2
        recurrence from the saved lse; dK/dV partials ride the rotation and
        land home after n hops) — gradients must match the XLA ring's
        autodiff up to f32 accumulation-order roundoff."""
        q, k, v = rand_qkv(1, 16, 2, 8, seed=7)
        pad = jnp.zeros((1, 16), bool).at[:, 12:].set(True)

        def loss(impl):
            def f(q, k, v):
                o = ring_attention(q, k, v, seq_mesh, axis="seq",
                                   causal=causal, kv_pad=pad, impl=impl)
                return jnp.sum(o ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        gp, gx = loss("pallas"), loss("xla")
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_unidirectional_kernels_direct(self, seq_mesh):
        """The single-direction fwd/bwd kernels (the simpler schedule the
        module documents first; the bidirectional pair built on it is what
        ring_attention(impl='pallas') installs) stay correct when driven
        directly: forward vs full attention, backward vs the XLA ring's
        VJP with the same cotangent."""
        import functools
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from blt_vqg_tpu.ops.pallas.ring_attention import (
            ring_attention_bwd_shard, ring_attention_fwd_shard)

        q, k, v = rand_qkv(1, 16, 2, 8, seed=13)
        q = q * (8 ** -0.5)
        pad = jnp.zeros((1, 16), bool).at[:, 12:].set(True)
        spec = P(None, "seq", None, None)
        pad_spec = P(None, "seq")
        res_spec = P(None, "seq", None)

        fwd = shard_map(
            functools.partial(ring_attention_fwd_shard, axis="seq", n=8,
                              causal=True, return_lse=True),
            mesh=seq_mesh, in_specs=(spec, spec, spec, pad_spec),
            out_specs=(spec, res_spec, res_spec), check_vma=False)
        o, m, l = fwd(q, k, v, pad)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        cm = jnp.triu(jnp.ones((16, 16), bool), 1)[None, None]
        logits = jnp.where(cm | pad[:, None, None, :], -1e30, logits)
        ref = jnp.einsum("bhqk,bkhd->bqhd",
                         jax.nn.softmax(logits, axis=-1), v)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-3)

        do = 2.0 * o  # cotangent of sum(o**2)
        bwd = shard_map(
            functools.partial(ring_attention_bwd_shard, axis="seq", n=8,
                              causal=True),
            mesh=seq_mesh,
            in_specs=(spec, spec, spec, pad_spec, spec, res_spec, res_spec,
                      spec),
            out_specs=(spec, spec, spec), check_vma=False)
        dq, dk, dv = bwd(q, k, v, pad, o, m, l, do)

        def xla_loss(q, k, v):
            out = ring_attention(q, k, v, seq_mesh, axis="seq", causal=True,
                                 kv_pad=pad, impl="xla")
            return jnp.sum(out ** 2)

        gx = jax.grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip((dq, dk, dv), gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_dead_row_gradients_match_xla(self, seq_mesh):
        """A row whose EVERY visible key is masked (causal + pad on key 0)
        degenerates to uniform attention (reference fill semantics); the
        backward must still match XLA autodiff.  Regression for two real
        bugs: lse = m + log(l) loses log(l) to f32 absorption at the -1e30
        fill (residuals are now (m, l)), and the FA ds-formula needs
        masked logits zeroed where p is nonzero (the dead row)."""
        q, k, v = rand_qkv(1, 32, 2, 8, seed=12)
        # key 0 padded => causal row 0 sees only masked keys (dead row)
        pad = jnp.zeros((1, 32), bool).at[:, 0].set(True).at[:, 28:].set(True)

        def grads(impl):
            def f(q, k, v):
                o = ring_attention(q, k, v, seq_mesh, axis="seq",
                                   causal=True, kv_pad=pad, impl=impl)
                return jnp.sum(o ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(grads("pallas"), grads("xla")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

    def test_composes_with_data_axis(self, request):
        """On a data=2 x seq=4 mesh the RDMA hops ride only the seq axis;
        batch rows stay independent (dict-MESH device addressing)."""
        request.getfixturevalue("eight_devices")
        mesh = build_mesh((2, 4), ("data", "seq"))
        q, k, v = rand_qkv(2, 16, 2, 8, seed=8)
        out = ring_attention(q, k, v, mesh, axis="seq", batch_axis="data",
                             impl="pallas")
        ref = full_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_composes_with_model_axis(self, request):
        """TP composition: heads sharded over 'model' stay put while the
        RDMA hops ride the seq axis — no cross-head traffic."""
        request.getfixturevalue("eight_devices")
        mesh = build_mesh((2, 4), ("model", "seq"))
        q, k, v = rand_qkv(1, 16, 4, 8, seed=11)
        out = ring_attention(q, k, v, mesh, axis="seq", head_axis="model",
                             causal=True, impl="pallas")
        ref = full_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_two_device_ring(self, request):
        """n=2 edge of the bidirectional schedule: the CCW stream's only
        visiting block coincides with the CW one and must compute once."""
        request.getfixturevalue("eight_devices")
        mesh = build_mesh((4, 2), ("data", "seq"))
        q, k, v = rand_qkv(2, 16, 2, 8, seed=10)
        out = ring_attention(q, k, v, mesh, axis="seq", causal=True,
                             impl="pallas")
        ref = full_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_encoder_integration(self, seq_mesh):
        """ring_impl="pallas" threads cfg -> stacks -> MHA: encoder output
        matches the plain (full-attention) model on the same params."""
        from blt_vqg_tpu.ops.transformer import TransformerEncoder
        kw = dict(hidden_dim=32, num_layers=2, num_heads=4, pwffn_dim=64,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32)
        plain = TransformerEncoder(**kw)
        ringd = TransformerEncoder(**kw, ring_mesh=seq_mesh,
                                   ring_impl="pallas")
        x = jax.random.normal(jax.random.key(9), (2, 16, 32), jnp.float32)
        mask = jnp.zeros((2, 1, 1, 16), bool).at[:, :, :, 12:].set(True)
        params = plain.init(jax.random.key(1), x, mask)
        a = plain.apply(params, x, mask)
        b = ringd.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestSequenceParallelIntegration:
    """sequence_parallel config routes encoder/decoder self-attention
    through ring attention; outputs must match the plain model bit-for-bit
    up to f32 tolerance (same params)."""

    def test_encoder_matches_plain(self, seq_mesh):
        from blt_vqg_tpu.ops.transformer import TransformerEncoder
        kw = dict(hidden_dim=32, num_layers=2, num_heads=4, pwffn_dim=64,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32)
        plain = TransformerEncoder(**kw)
        ringd = TransformerEncoder(**kw, ring_mesh=seq_mesh)
        x = jax.random.normal(jax.random.key(0), (2, 16, 32), jnp.float32)
        mask = jnp.zeros((2, 1, 1, 16), bool).at[:, :, :, 12:].set(True)
        params = plain.init(jax.random.key(1), x, mask)
        a = plain.apply(params, x, mask)
        b = ringd.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_iq_forward_matches_plain(self, seq_mesh, vocab_size):
        """Full IQ forward with cfg.sequence_parallel: self-attention whose
        length divides the seq axis rings; the rest falls back — logits
        must match the plain model."""
        from blt_vqg_tpu.core.config import Config
        from blt_vqg_tpu.models.iq import IQ

        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=16,
                     max_a_length=4, max_decode_length=12,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32)
        r = np.random.RandomState(0)
        b = 2
        batch = dict(
            images=r.rand(b, 32, 32, 3).astype(np.float32),
            context=r.randint(1, vocab_size, (b, cfg.max_context_len)
                              ).astype(np.int32),
            posterior=r.randint(1, vocab_size, (b, cfg.max_posterior_len)
                                ).astype(np.int32),
            target=r.randint(1, vocab_size, (b, cfg.max_q_length)
                             ).astype(np.int32))
        plain = IQ(cfg, vocab_size)
        sp = IQ(cfg.replace(sequence_parallel=True), vocab_size,
                mesh=seq_mesh)
        rngs = {"params": jax.random.key(0),
                "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = plain.init(rngs, batch["images"], batch["context"],
                               batch["posterior"], batch["target"],
                               latent_mode=True, train=False)
        out_a = plain.apply(variables, batch["images"], batch["context"],
                            batch["posterior"], batch["target"],
                            latent_mode=True, train=False,
                            rngs={"latent": jax.random.key(3)})
        out_b = sp.apply(variables, batch["images"], batch["context"],
                         batch["posterior"], batch["target"],
                         latent_mode=True, train=False,
                         rngs={"latent": jax.random.key(3)})
        np.testing.assert_allclose(np.asarray(out_a[0]),
                                   np.asarray(out_b[0]), atol=2e-3)
        np.testing.assert_allclose(float(out_a[2]), float(out_b[2]),
                                   rtol=1e-5)
