"""Fused decode head (ops/pallas/decode_head.py) vs the XLA f32 head.

The kernel fuses final-LN + vocab projection + argmax with the [D, V]
head weights streamed in the decode dtype (or int8).  These tests pin:

- exact parity vs a same-dtype oracle (LN → cast → f32-accumulated GEMM →
  bias → argmax), f32 / bf16 / int8, including non-128-multiple vocabs
  (pad_head) and multi-chunk grids;
- XLA-matching argmax tie-breaking (first maximal index, within and
  across chunks);
- the full-model serving wiring: IQ.decode_greedy(with_probe=False) with
  use_stream_decode emits identical tokens with the fused head on and
  off at f32.

Runs in interpret mode on CPU (the kernel self-selects interpret
off-TPU).  reference models/iq.py:136-137 (per-step argmax head).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.ops.pallas.decode_head import (PAD_BIAS, head_argmax,
                                                head_chunk, pad_head)
from blt_vqg_tpu.ops.pallas.decode_stream import quantize_stack


def _oracle_tokens(x, scale, bias, w, b, dtype, scales=None):
    """Same math as the kernel, in plain jnp: f32 LN, cast, f32-accumulated
    GEMM in ``dtype``, bias add, first-index argmax."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    xn = ((x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias).astype(dtype)
    logits = jax.lax.dot_general(xn, w.astype(dtype), (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    if scales is not None:
        logits = logits * scales
    return jnp.argmax(logits + b, axis=-1).astype(jnp.int32)


def _mk(v, d=32, bsz=4, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(bsz, d).astype(np.float32)) * 3.0
    scale = jnp.asarray(1.0 + 0.1 * r.randn(d).astype(np.float32))
    bias = jnp.asarray(0.1 * r.randn(d).astype(np.float32))
    w = jnp.asarray(r.randn(d, v).astype(np.float32))
    b = jnp.asarray(r.randn(v).astype(np.float32))
    return x, scale, bias, w, b


class TestHeadChunkPad:
    def test_chunk_sizes(self):
        assert head_chunk(12000) == 1024
        assert head_chunk(50) == 128
        assert head_chunk(300) == 384
        assert head_chunk(4096) == 1024

    def test_pad_head(self):
        w = jnp.ones((8, 300))
        b = jnp.zeros((300,))
        wp, bp = pad_head(w, b, 128)
        assert wp.shape == (8, 384) and bp.shape == (384,)
        np.testing.assert_array_equal(np.asarray(wp[:, 300:]), 0.0)
        np.testing.assert_array_equal(np.asarray(bp[300:]),
                                      np.float32(PAD_BIAS))
        # already aligned: no-op
        w2, b2 = pad_head(wp, bp, 128)
        assert w2 is wp and b2 is bp


class TestHeadArgmax:
    @pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
    @pytest.mark.parametrize("v", [50, 300, 1024, 2500])
    def test_matches_oracle(self, dtype, v):
        dt = jnp.dtype(dtype)
        x, scale, bias, w, b = _mk(v, seed=v)
        chunk = head_chunk(v, target=256)   # force multi-chunk at v>=300
        wp, bp = pad_head(w.astype(dt), b, chunk)
        got = head_argmax(x.astype(dt), scale, bias, wp, bp, chunk=chunk)
        # oracle sees the same dtype-rounded inputs as the kernel
        want = _oracle_tokens(x.astype(dt), scale, bias, w.astype(dt), b, dt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert got.dtype == jnp.int32 and got.shape == (x.shape[0],)

    def test_int8_matches_dequant_oracle(self):
        v = 700
        x, scale, bias, w, b = _mk(v, seed=7)
        w8, s = quantize_stack(w)            # [D,V] int8, [1,V] f32
        chunk = head_chunk(v, target=256)
        wp, bp = pad_head(w8, b, chunk)
        sp = jnp.pad(s, ((0, 0), (0, wp.shape[1] - v)), constant_values=1.0)
        got = head_argmax(x, scale, bias, wp, bp, chunk=chunk, scales=sp)
        want = _oracle_tokens(x, scale, bias, w8, b, jnp.float32, scales=s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_tie_breaking_first_index(self):
        """Duplicate columns (exact logit ties) within AND across chunks:
        the kernel must pick the FIRST maximal index like jnp.argmax."""
        d, v, chunk = 16, 512, 128
        r = np.random.RandomState(3)
        w = r.randn(d, v).astype(np.float32)
        # column 5 == column 40 (same chunk), column 9 == column 200
        # (different chunk); make those the max by a large shared bias
        w[:, 40] = w[:, 5]
        w[:, 200] = w[:, 9]
        b = np.full((v,), -10.0, np.float32)
        b[[5, 40]] = 50.0
        b[[9, 200]] = 60.0
        x = jnp.asarray(r.randn(2, d).astype(np.float32))
        scale, bias = jnp.ones((d,)), jnp.zeros((d,))
        wp, bp = pad_head(jnp.asarray(w), jnp.asarray(b), chunk)
        got = head_argmax(x, scale, bias, wp, bp, chunk=chunk)
        want = _oracle_tokens(x, scale, bias, jnp.asarray(w), jnp.asarray(b),
                              jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the winning pair is (9, 200): first index 9 must win its tie
        np.testing.assert_array_equal(np.asarray(got), 9)

    def test_padded_columns_never_win(self):
        v = 130                              # pads to 256
        x, scale, bias, w, b = _mk(v, seed=11)
        b = b - 1e6                          # real logits hugely negative...
        wp, bp = pad_head(w, b, 256)
        got = head_argmax(x, scale, bias, wp, bp, chunk=256)
        assert np.asarray(got).max() < v     # ...pad bias must still lose


class TestFusedHeadServing:
    def test_decode_greedy_tokens_match(self, vocab_size):
        """use_stream_decode serving decode: fused head on vs off must emit
        identical tokens at f32 (scan AND early-stop while_loop paths)."""
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=8,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32,
                     use_stream_decode=True)
        r = np.random.RandomState(0)
        b = 2
        images = r.rand(b, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (b, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (b, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (b, cfg.max_q_length)).astype(np.int32)

        fused = IQ(cfg.replace(stream_fused_head="on"), vocab_size)
        plain = IQ(cfg.replace(stream_fused_head="off"), vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = plain.init(rngs, images, context, posterior, target,
                               latent_mode=True, train=False)
        kw = dict(max_decode_length=cfg.max_decode_length, latent_mode=True,
                  with_probe=False, method=IQ.decode_greedy)
        out_p = plain.apply(variables, images, context, **kw,
                            rngs={"latent": jax.random.key(3)})
        out_f = fused.apply(variables, images, context, **kw,
                            rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(out_p["tokens"]),
                                      np.asarray(out_f["tokens"]))
        es = fused.apply(variables, images, context, **kw, early_stop=True,
                         rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(es["tokens"]),
                                      np.asarray(out_p["tokens"]))

    def test_auto_gating(self, vocab_size, monkeypatch):
        """stream_fused_head="auto" enables the fused head exactly when the
        head streams int8 (the measured-win regime, METHODOLOGY round-4)."""
        import blt_vqg_tpu.ops.pallas.decode_head as dh

        calls = []
        real = dh.head_argmax
        monkeypatch.setattr(dh, "head_argmax",
                            lambda *a, **k: calls.append(1) or real(*a, **k))
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=1, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=4,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32, use_stream_decode=True)
        assert cfg.stream_fused_head == "auto"
        r = np.random.RandomState(5)
        images = r.rand(1, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (1, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (1, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (1, cfg.max_q_length)).astype(np.int32)
        model = IQ(cfg, vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = model.init(rngs, images, context, posterior, target,
                               latent_mode=False, train=False)
        kw = dict(max_decode_length=cfg.max_decode_length, latent_mode=False,
                  with_probe=False, method=IQ.decode_greedy)
        model.apply(variables, images, context, **kw)
        assert not calls  # auto + non-int8 head: XLA head, no kernel

        m8 = IQ(cfg.replace(stream_head_dtype="int8"), vocab_size)
        m8.apply(variables, images, context, **kw)
        assert calls      # auto + int8 head: fused kernel engaged

    def test_int8_head_on_f32_stack(self, vocab_size):
        """stream_head_dtype=int8 quantizes ONLY the head (stack stays at
        the compute dtype): decode runs and the tokens match an oracle
        decode whose output head is quantize->dequantized the same way."""
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=8,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32,
                     use_stream_decode=True, stream_head_dtype="int8")
        r = np.random.RandomState(2)
        b = 2
        images = r.rand(b, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (b, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (b, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (b, cfg.max_q_length)).astype(np.int32)
        model = IQ(cfg, vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = model.init(rngs, images, context, posterior, target,
                               latent_mode=True, train=False)
        kw = dict(max_decode_length=cfg.max_decode_length, latent_mode=True,
                  with_probe=False, method=IQ.decode_greedy)
        got = model.apply(variables, images, context, **kw,
                          rngs={"latent": jax.random.key(3)})

        # oracle: same model, XLA head, but with the head params replaced by
        # their int8 quantize->dequantize image (what the kernel computes)
        w = variables["params"]["output_proj"]["kernel"]
        w8, s = quantize_stack(w)
        deq = jax.tree_util.tree_map(lambda x: x, variables)
        deq["params"]["output_proj"] = dict(
            variables["params"]["output_proj"],
            kernel=(w8.astype(jnp.float32) * s).astype(w.dtype))
        plain = IQ(cfg.replace(stream_fused_head="off"), vocab_size)
        want = plain.apply(deq, images, context, **kw,
                           rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                      np.asarray(want["tokens"]))

    def test_probe_path_keeps_xla_head(self, vocab_size):
        """with_probe=True needs full logits: the fused-head flag must not
        change the probe outputs (they come from the XLA head)."""
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=6,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32,
                     use_stream_decode=True, stream_fused_head="on")
        r = np.random.RandomState(1)
        images = r.rand(1, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (1, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (1, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (1, cfg.max_q_length)).astype(np.int32)
        model = IQ(cfg, vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = model.init(rngs, images, context, posterior, target,
                               latent_mode=False, train=False)
        out = model.apply(variables, images, context,
                          max_decode_length=cfg.max_decode_length,
                          method=IQ.decode_greedy)
        assert "top_probs" in out and out["top_probs"].shape[-1] == 6
        # probe tokens are argmax of the same (XLA) logits
        np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                      np.asarray(out["top_tokens"][..., 0]))
