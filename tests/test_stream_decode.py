"""Whole-stack streaming decode kernel vs the XLA KV-cache step path.

The single-kernel streaming step (ops/pallas/decode_stream.py) must
reproduce the XLA decode path (ops/transformer.py DecoderLayer.step over
the stack) — same caches, same outputs — over a multi-step greedy decode.
Runs in interpret mode on CPU (the kernel self-selects interpret off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.ops.pallas.decode_stream import pick_stages
from blt_vqg_tpu.ops.transformer import TransformerDecoder


@pytest.fixture(scope="module", params=[True, False],
                ids=["bucketed", "pipelined"])
def dec_setup(request):
    kw = dict(hidden_dim=32, num_layers=3, num_heads=4, pwffn_dim=64,
              attention_dropout=0.0, relu_dropout=0.0, dtype=jnp.float32,
              max_decode_len=8)
    plain = TransformerDecoder(**kw)
    stream = TransformerDecoder(**kw, use_stream_decode=True,
                                stream_bucketed_cache=request.param)
    b, tc, d = 2, 3, 32
    enc = jax.random.normal(jax.random.key(0), (b, tc, d), jnp.float32)
    x = jax.random.normal(jax.random.key(1), (b, 5, d), jnp.float32)
    params = plain.init(jax.random.key(2), x, enc)
    return plain, stream, params, enc, b, d


class TestPickStages:
    def test_divisor_selection(self):
        assert pick_stages(8, 2048) == (4, 4)
        assert pick_stages(4, 64) == (4, 4)
        assert pick_stages(6, 63) == (3, 3)
        assert pick_stages(1, 7) == (1, 1)

    def test_cache_buckets(self):
        from blt_vqg_tpu.ops.pallas.decode_stream import _cache_buckets
        step, sizes = _cache_buckets(51)
        assert step == 13 and sizes == (13, 26, 39, 51)
        # every pos maps to a bucket covering pos+1
        for pos in range(51):
            assert sizes[min(pos // step, len(sizes) - 1)] >= pos + 1
        step, sizes = _cache_buckets(6)
        assert sizes[-1] == 6 and sizes == tuple(sorted(set(sizes)))
        for pos in range(6):
            assert sizes[min(pos // step, len(sizes) - 1)] >= pos + 1


class TestStreamDecodeStep:
    def test_multi_step_matches_xla_path(self, dec_setup):
        plain, stream, params, enc, b, d = dec_setup
        steps = 6
        src_mask = jnp.zeros((b, 1, 1, enc.shape[1]), bool
                             ).at[:, :, :, 2:].set(True)

        def run(model):
            cross = model.apply(params, enc,
                                method=TransformerDecoder.precompute_cross)
            caches = model.apply(params, b, steps,
                                 method=TransformerDecoder.init_cache)
            outs = []
            for pos in range(steps):
                x_t = jax.random.normal(jax.random.fold_in(
                    jax.random.key(3), pos), (b, 1, d), jnp.float32)
                y, caches = model.apply(
                    params, x_t, caches, cross, jnp.asarray(pos, jnp.int32),
                    src_mask, method=TransformerDecoder.step)
                outs.append(np.asarray(y))
            return outs, caches

        ref_outs, ref_caches = run(plain)
        got_outs, got_caches = run(stream)
        for pos, (a, c) in enumerate(zip(ref_outs, got_outs)):
            np.testing.assert_allclose(a, c, atol=1e-4, err_msg=f"pos {pos}")
        # stream cache is ONE stacked pair [Layers,H,L,B,Dh]; XLA's is a
        # per-layer list of [B,L,H,Dh]
        k_all, v_all = got_caches[0]
        for li, (ka, va) in enumerate(ref_caches):
            np.testing.assert_allclose(
                np.asarray(ka),
                np.asarray(k_all[li]).transpose(2, 1, 0, 3), atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(va),
                np.asarray(v_all[li]).transpose(2, 1, 0, 3), atol=1e-4)

    def test_no_src_mask(self, dec_setup):
        plain, stream, params, enc, b, d = dec_setup
        cross_p = plain.apply(params, enc,
                              method=TransformerDecoder.precompute_cross)
        x_t = jax.random.normal(jax.random.key(7), (b, 1, d), jnp.float32)
        y_a, _ = plain.apply(params, x_t,
                             plain.apply(params, b, 4,
                                         method=TransformerDecoder.init_cache),
                             cross_p, jnp.asarray(0, jnp.int32), None,
                             method=TransformerDecoder.step)
        y_b, _ = stream.apply(params, x_t,
                              stream.apply(params, b, 4,
                                           method=TransformerDecoder.init_cache),
                              cross_p, jnp.asarray(0, jnp.int32), None,
                              method=TransformerDecoder.step)
        np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                                   atol=1e-4)

    def test_misaligned_head_dim_rejected_on_hardware(self, dec_setup,
                                                      monkeypatch):
        """head_dim % 128 != 0 must raise a clear error when NOT in
        interpret mode (Mosaic rejects the bucketed-cache DMA slice on
        real TPUs; found on a head_dim-32 probe model)."""
        import blt_vqg_tpu.ops.pallas.decode_stream as dsm
        plain, stream, params, enc, b, d = dec_setup
        monkeypatch.setattr(dsm, "_interpret", lambda: False)
        cross_p = plain.apply(params, enc,
                              method=TransformerDecoder.precompute_cross)
        x_t = jnp.zeros((b, 1, d), jnp.float32)
        with pytest.raises(ValueError, match="head_dim % 128"):
            stream.apply(params, x_t,
                         stream.apply(params, b, 4,
                                      method=TransformerDecoder.init_cache),
                         cross_p, jnp.asarray(0, jnp.int32), None,
                         method=TransformerDecoder.step)

    def test_compat_pad_mask_matches_plain_path(self, dec_setup):
        """key_pad (compat_decode_pad_mask) on the stream kernel: a decode
        sequence with pad-masked keys must match the XLA KV-cache path step
        for step (cached rows via the [Lmax, B] mask, the in-flight
        current key via its own [1, B] row)."""
        plain, stream, params, enc, b, d = dec_setup
        cross_p = plain.apply(params, enc,
                              method=TransformerDecoder.precompute_cross)
        steps = 4
        # pad pattern exercising all cases: a pad seed at pos 0 (every row),
        # plus a mid-sequence pad on row 1
        key_pad = np.zeros((b, steps), bool)
        key_pad[:, 0] = True
        key_pad[1, 2] = True
        caches_p = plain.apply(params, b, steps,
                               method=TransformerDecoder.init_cache)
        caches_s = stream.apply(params, b, steps,
                                method=TransformerDecoder.init_cache)
        r = np.random.RandomState(3)
        for pos in range(steps):
            x_t = jnp.asarray(r.randn(b, 1, d), jnp.float32)
            # the decode loop grows the mask one row per step — marks never
            # exist at positions > pos (models/iq.py one_step)
            kp_np = key_pad.copy()
            kp_np[:, pos + 1:] = False
            kp = jnp.asarray(kp_np)
            y_p, caches_p = plain.apply(
                params, x_t, caches_p, cross_p,
                jnp.asarray(pos, jnp.int32), None, kp,
                method=TransformerDecoder.step)
            y_s, caches_s = stream.apply(
                params, x_t, caches_s, cross_p,
                jnp.asarray(pos, jnp.int32), None, kp,
                method=TransformerDecoder.step)
            np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_p),
                                       atol=2e-5, rtol=2e-5,
                                       err_msg=f"pos={pos}")


class TestStreamInt8Weights:
    """stream_weight_dtype="int8": the kernel streams int8 weight stacks and
    dequantizes per stage in VMEM.  The effective weights are the
    quantize→dequantize image of the originals under the STACK slicing
    (quantize_stack: per-column scales over each slice's contraction rows),
    so the int8 stream path must match the plain XLA path run with params
    replaced by that image to float roundoff.  (Round 4: the kernel applies
    the per-column scale to each GEMM's f32 OUTPUT rather than to the
    weight block — mathematically identical since scales are constant per
    column, but summation now happens before the scale multiply, so the
    match is to f32 rounding, not bit-exact.)"""

    def _qdq_params(self, params, num_heads, hc, fc):
        from blt_vqg_tpu.ops.pallas.decode_stream import quantize_stack

        def qdq(w):                       # per-column over all K rows
            w8, s = quantize_stack(w)
            return (w8.astype(jnp.float32) * s).astype(w.dtype)

        def qdq_rows(w, n):               # per-column within n row slices
            k, m = w.shape
            w8, s = quantize_stack(w.reshape(n, k // n, m))
            return ((w8.astype(jnp.float32) * s)
                    .reshape(k, m).astype(w.dtype))

        new = jax.tree_util.tree_map(lambda x: x, params)  # deep-ish copy
        p = new["params"]
        for name, layer in p.items():
            if not name.startswith("layer_"):
                continue
            sa, ca = layer["self_attn"], layer["cross_attn"]
            for proj in ("q_proj", "k_proj", "v_proj"):
                sa[proj]["kernel"] = qdq(sa[proj]["kernel"])
                ca[proj]["kernel"] = (qdq(ca[proj]["kernel"])
                                      if proj == "q_proj"
                                      else ca[proj]["kernel"])
            sa["out_proj"]["kernel"] = qdq_rows(sa["out_proj"]["kernel"],
                                                num_heads)
            ca["out_proj"]["kernel"] = qdq_rows(ca["out_proj"]["kernel"], hc)
            ffn = layer["ffn"]
            ffn["ffn_in"]["kernel"] = qdq(ffn["ffn_in"]["kernel"])
            ffn["ffn_out"]["kernel"] = qdq_rows(ffn["ffn_out"]["kernel"], fc)
        return new

    @pytest.mark.parametrize("bucketed", [True, False])
    def test_matches_dequantized_xla_path(self, bucketed):
        kw = dict(hidden_dim=32, num_layers=2, num_heads=4, pwffn_dim=64,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32, max_decode_len=8)
        plain = TransformerDecoder(**kw)
        stream = TransformerDecoder(**kw, use_stream_decode=True,
                                    stream_bucketed_cache=bucketed,
                                    stream_weight_dtype="int8")
        b, tc, d = 2, 3, 32
        enc = jax.random.normal(jax.random.key(0), (b, tc, d), jnp.float32)
        x = jax.random.normal(jax.random.key(1), (b, 5, d), jnp.float32)
        params = plain.init(jax.random.key(2), x, enc)
        hc, fc = pick_stages(kw["num_heads"], kw["pwffn_dim"])
        qdq_params = self._qdq_params(
            jax.tree_util.tree_map(np.asarray, params),
            kw["num_heads"], hc, fc)

        steps = 5

        def run(model, prm):
            cross = model.apply(prm, enc,
                                method=TransformerDecoder.precompute_cross)
            caches = model.apply(prm, b, steps,
                                 method=TransformerDecoder.init_cache)
            outs = []
            for pos in range(steps):
                x_t = jax.random.normal(jax.random.fold_in(
                    jax.random.key(3), pos), (b, 1, d), jnp.float32)
                y, caches = model.apply(
                    prm, x_t, caches, cross, jnp.asarray(pos, jnp.int32),
                    None, method=TransformerDecoder.step)
                outs.append(np.asarray(y))
            return outs

        # cross K/V are precomputed activations (never quantized), so the
        # oracle uses qdq params only for the streamed projections —
        # cross k/v kernels are untouched by _qdq_params above
        ref = run(plain, qdq_params)
        got = run(stream, params)
        for pos, (a, c) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(a, c, atol=1e-4, err_msg=f"pos {pos}")

    def test_quantization_error_bounded(self):
        """Same random decoder, int8 vs bf16-weights stream path: outputs
        stay close (weight-only int8 with per-column scales)."""
        kw = dict(hidden_dim=32, num_layers=2, num_heads=4, pwffn_dim=64,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32, max_decode_len=8)
        base = TransformerDecoder(**kw, use_stream_decode=True)
        quant = TransformerDecoder(**kw, use_stream_decode=True,
                                   stream_weight_dtype="int8")
        b, tc, d = 2, 3, 32
        enc = jax.random.normal(jax.random.key(0), (b, tc, d), jnp.float32)
        x = jax.random.normal(jax.random.key(1), (b, 5, d), jnp.float32)
        params = base.init(jax.random.key(2), x, enc)
        x_t = jax.random.normal(jax.random.key(7), (b, 1, d), jnp.float32)

        def one(model):
            cross = model.apply(params, enc,
                                method=TransformerDecoder.precompute_cross)
            caches = model.apply(params, b, 4,
                                 method=TransformerDecoder.init_cache)
            y, _ = model.apply(params, x_t, caches, cross,
                               jnp.asarray(0, jnp.int32), None,
                               method=TransformerDecoder.step)
            return np.asarray(y)

        y0, y1 = one(base), one(quant)
        rel = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-9)
        assert np.isfinite(y1).all() and rel < 0.05, rel


class TestPerKindQuantization:
    """decode_stack_step's per-kind ``weight_scales`` (entries may be None):
    quantizing ONE kind must equal the all-bf16 kernel run with that kind's
    weights replaced by their quantize→dequantize image (the bisection /
    mixed-precision surface behind probe_stream_int8_micro.py)."""

    KINDS = ("qkv", "out", "qc", "oc", "w1", "w2")

    @pytest.mark.parametrize("kind", KINDS)
    def test_one_kind_matches_dequantized_oracle(self, kind):
        from blt_vqg_tpu.ops.pallas.decode_stream import (decode_stack_step,
                                                          quantize_stack)
        b, d, h, nl, f = 2, 32, 4, 2, 64
        dh = d // h
        hc, fc = pick_stages(h, f)
        hpc, fchunk = h // hc, f // fc
        rng = np.random.RandomState(3)
        shapes = {"qkv": (nl, h, d, 3 * dh), "out": (nl, h, dh, d),
                  "qc": (nl, hc, d, hpc * dh), "oc": (nl, hc, hpc * dh, d),
                  "w1": (nl, fc, d, fchunk), "w2": (nl, fc, fchunk, d)}
        w = {k: jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)
             for k, s in shapes.items()}
        lmax, tc, pos = 6, 3, 2
        x = jnp.asarray(rng.randn(b, d) * 0.5, jnp.float32)
        lns = jnp.asarray(
            np.stack([np.ones((nl, d)) if i % 2 == 0 else np.zeros((nl, d))
                      for i in range(6)], axis=1), jnp.float32)
        ck = jnp.asarray(rng.randn(nl, h, lmax, b, dh) * 0.3, jnp.float32)
        cv = jnp.asarray(rng.randn(nl, h, lmax, b, dh) * 0.3, jnp.float32)
        ckc = jnp.asarray(rng.randn(nl, hc, tc, b, hpc * dh) * 0.3,
                          jnp.float32)
        cvc = jnp.asarray(rng.randn(nl, hc, tc, b, hpc * dh) * 0.3,
                          jnp.float32)
        smask = jnp.zeros((tc, b), jnp.int32)
        b1 = jnp.zeros((nl, fc, 1, fchunk), jnp.float32)
        b2 = jnp.zeros((nl, 1, d), jnp.float32)

        def run(weights, weight_scales):
            return decode_stack_step(
                x, pos, lns, weights["qkv"], weights["out"], ck, cv,
                weights["qc"], weights["oc"], ckc, cvc, smask,
                weights["w1"], b1, weights["w2"], b2,
                num_heads=h, cross_stages=hc, ffn_stages=fc,
                bucketed_cache=False, weight_scales=weight_scales)

        w8, s = quantize_stack(w[kind])
        ki = self.KINDS.index(kind)
        scales = tuple(s if i == ki else None for i in range(6))
        got = run({**w, kind: w8}, scales)

        qdq = (w8.astype(jnp.float32) * s).astype(jnp.float32)
        want = run({**w, kind: qdq}, None)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       atol=1e-5)


class TestStreamGreedyDecode:
    def test_iq_decode_greedy_and_beam_match(self, vocab_size):
        """Full-model decode: use_stream_decode must emit the same token
        sequences as the XLA path, greedy AND beam (the beam reorders the
        stacked cache along its batch axis 3)."""
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
                     num_layers=2, num_heads=4, max_q_length=10,
                     max_a_length=4, max_decode_length=8,
                     attention_dropout=0.0, relu_dropout=0.0,
                     dtype="float32", image_size=32)
        r = np.random.RandomState(0)
        b = 2
        images = r.rand(b, 32, 32, 3).astype(np.float32)
        context = r.randint(1, vocab_size,
                            (b, cfg.max_context_len)).astype(np.int32)
        posterior = r.randint(1, vocab_size,
                              (b, cfg.max_posterior_len)).astype(np.int32)
        target = r.randint(1, vocab_size,
                           (b, cfg.max_q_length)).astype(np.int32)

        plain = IQ(cfg, vocab_size)
        stream = IQ(cfg.replace(use_stream_decode=True), vocab_size)
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        variables = plain.init(rngs, images, context, posterior, target,
                               latent_mode=True, train=False)
        out_a = plain.apply(variables, images, context,
                            max_decode_length=cfg.max_decode_length,
                            latent_mode=True, method=IQ.decode_greedy,
                            rngs={"latent": jax.random.key(3)})
        out_b = stream.apply(variables, images, context,
                             max_decode_length=cfg.max_decode_length,
                             latent_mode=True, method=IQ.decode_greedy,
                             rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(out_a["tokens"]),
                                      np.asarray(out_b["tokens"]))
        np.testing.assert_allclose(np.asarray(out_a["top_probs"]),
                                   np.asarray(out_b["top_probs"]),
                                   atol=1e-4)

        # early-stop (while_loop) serving decode composes with the stream
        # kernel and emits the same tokens as the fixed-length scan
        es = stream.apply(variables, images, context,
                          max_decode_length=cfg.max_decode_length,
                          latent_mode=True, early_stop=True,
                          with_probe=False, method=IQ.decode_greedy,
                          rngs={"latent": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(es["tokens"]),
                                      np.asarray(out_a["tokens"]))

        beam_a = plain.apply(variables, images, context, beam_size=3,
                             max_decode_length=cfg.max_decode_length,
                             latent_mode=True, method=IQ.decode_beam,
                             rngs={"latent": jax.random.key(5)})
        beam_b = stream.apply(variables, images, context, beam_size=3,
                              max_decode_length=cfg.max_decode_length,
                              latent_mode=True, method=IQ.decode_beam,
                              rngs={"latent": jax.random.key(5)})
        np.testing.assert_array_equal(np.asarray(beam_a["tokens"]),
                                      np.asarray(beam_b["tokens"]))
        np.testing.assert_allclose(np.asarray(beam_a["scores"]),
                                   np.asarray(beam_b["scores"]), atol=1e-4)
