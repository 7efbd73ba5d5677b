"""Int8-weight Pallas matmul (ops/pallas/int8_matmul.py) — interpret-mode
parity on CPU; the real-TPU parity check lives in the kernel's docstring
protocol and was verified on hardware (max|diff| = 1 bf16 ulp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blt_vqg_tpu.ops.pallas.int8_matmul import (
    int8_matmul, int8_matmul_ref, quantize_int8)


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
        w8, s = quantize_int8(w)
        assert w8.dtype == jnp.int8
        deq = w8.astype(jnp.float32) * s[None, :]
        # symmetric per-channel: error ≤ scale/2 per element
        err = np.asarray(jnp.abs(deq - w))
        bound = np.asarray(s)[None, :] * 0.5 + 1e-6
        assert (err <= bound).all()

    def test_zero_column_safe(self):
        w = jnp.zeros((16, 128), jnp.float32)
        w8, s = quantize_int8(w)
        assert np.isfinite(np.asarray(s)).all()
        np.testing.assert_array_equal(np.asarray(w8), 0)


class TestInt8Matmul:
    @pytest.mark.parametrize("m,k,n", [(64, 256, 512), (8, 128, 384),
                                       (64, 1024, 12000)])  # 12000 % 128 != 0
    def test_matches_reference(self, m, k, n):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
        w8, s = quantize_int8(jnp.asarray(
            rng.randn(k, n).astype(np.float32) * 0.02))
        ref = int8_matmul_ref(x, w8, s)
        out = int8_matmul(x, w8, s, tile_n=128, interpret=True)
        assert out.shape == (m, n)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_quantized_gemm_close_to_f32(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(32, 256).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.randn(256, 256).astype(np.float32) * 0.05)
        w8, s = quantize_int8(w)
        out = int8_matmul(x, w8, s, tile_n=128, interpret=True)
        true = jnp.dot(x.astype(jnp.float32), w)
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - true))
                    / jnp.max(jnp.abs(true)))
        assert rel < 0.05, rel


class TestQuantizeStack:
    def test_roundtrip_error_bound(self):
        """Symmetric per-column int8: |dequant - w| <= scale/2 elementwise
        (round-to-nearest), scales positive, int8 range respected."""
        from blt_vqg_tpu.ops.pallas.decode_stream import quantize_stack
        r = np.random.RandomState(0)
        w = jnp.asarray(r.randn(3, 2, 64, 48).astype(np.float32))
        w8, s = quantize_stack(w)
        assert w8.dtype == jnp.int8 and s.shape == (3, 2, 1, 48)
        assert int(jnp.max(jnp.abs(w8.astype(jnp.int32)))) <= 127
        deq = w8.astype(jnp.float32) * s
        err = np.asarray(jnp.abs(deq - w))
        bound = np.asarray(s) / 2 + 1e-7
        assert (err <= bound).all(), float((err - bound).max())
        # columns scale independently: zero column quantizes exactly
        w2 = w.at[..., 0].set(0.0)
        w8b, sb = quantize_stack(w2)
        np.testing.assert_array_equal(np.asarray(w8b[..., 0]), 0)
