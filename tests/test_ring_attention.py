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
