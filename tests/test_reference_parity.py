"""Numerical golden-parity against the actual reference implementation.

These tests import the reference's pure-torch modules (no torchvision
needed) from /root/reference at test time, map their randomly-initialized
weights onto our flax modules, and compare outputs elementwise.  They prove
the TPU-native ops compute the same math, not merely similar shapes.

Coverage: timing signal, gaussian KLD, pad mask, MultiHeadAttention, the
Latent prior/posterior nets, the Noam LR formula, and FULL encoder/decoder
stacks (timing + pre-LN layers + final LN, causal+pad masking) — the latter
via ``compat_trailing_relu=True``, which reproduces the reference FFN's
trailing-ReLU quirk (reference transformer_layers.py:400-408; a bug per
SURVEY.md §2.7, off by default in production).

Skipped automatically when /root/reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

import jax
import jax.numpy as jnp


def _load_ref_transformer_layers():
    """Loads reference models/transformer_layers.py directly — the models
    package __init__ pulls in torchvision (absent here)."""
    import importlib.util
    # the reference targets numpy<1.24 (`np.float`, reference
    # transformer_layers.py:551); restore the alias for its benefit
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    path = os.path.join(REF, "models", "transformer_layers.py")
    spec = importlib.util.spec_from_file_location("ref_transformer_layers",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_tl = _load_ref_transformer_layers() if os.path.isdir(REF) else None


def t2n(t):
    return t.detach().cpu().numpy()


class TestTimingSignalParity:
    def test_matches_reference(self):
        _gen_timing_signal = ref_tl._gen_timing_signal
        from blt_vqg_tpu.ops.timing import timing_signal
        for length, channels in [(23, 300), (51, 1024), (10, 7)]:
            ref = t2n(_gen_timing_signal(length, channels))
            ours = np.asarray(timing_signal(length, channels))
            np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestGaussianKLDParity:
    def test_matches_reference(self):
        ref_kld = ref_tl.gaussian_kld
        from blt_vqg_tpu.ops.latent import gaussian_kld
        rng = np.random.RandomState(0)
        args_np = [rng.randn(4, 16).astype(np.float32) for _ in range(4)]
        ref = t2n(ref_kld(*[torch.from_numpy(a) for a in args_np]))
        ours = np.asarray(gaussian_kld(*[jnp.asarray(a) for a in args_np]))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


class TestPadMaskParity:
    def test_matches_reference(self):
        generate_pad_mask = ref_tl.generate_pad_mask
        from blt_vqg_tpu.ops.masks import pad_mask
        toks = np.array([[1, 2, 0, 0], [5, 0, 0, 0]])
        ref = t2n(generate_pad_mask(torch.from_numpy(toks)))  # [B, 1, T]
        ours = np.asarray(pad_mask(jnp.asarray(toks)))        # [B, 1, 1, T]
        np.testing.assert_array_equal(ours[:, 0], ref[:, None][:, 0])


class TestMHAParity:
    def test_output_matches_reference(self):
        """Reference MultiHeadAttention vs ours, weights mapped, pad mask."""
        RefMHA = ref_tl.MultiHeadAttention
        from blt_vqg_tpu.ops.attention import MultiHeadAttention
        torch.manual_seed(0)
        h, heads, b, t = 32, 4, 2, 6
        ref = RefMHA(h, h, h, h, heads, bias_mask=None, dropout=0.0).eval()

        mha = MultiHeadAttention(h, heads, dropout_rate=0.0,
                                 dtype=jnp.float32)
        x_np = np.random.RandomState(1).randn(b, t, h).astype(np.float32)
        x = jnp.asarray(x_np)
        params = mha.init(jax.random.key(0), x, x)
        # torch Linear stores weight [out, in]; flax kernel is [in, out]
        mapped = {"params": {
            "q_proj": {"kernel": t2n(ref.query_linear.weight).T},
            "k_proj": {"kernel": t2n(ref.key_linear.weight).T},
            "v_proj": {"kernel": t2n(ref.value_linear.weight).T},
            "out_proj": {"kernel": t2n(ref.output_linear.weight).T},
        }}
        toks = np.array([[1, 2, 3, 4, 0, 0], [1, 2, 0, 0, 0, 0]])
        ref_mask = torch.from_numpy(toks).eq(0).unsqueeze(1)     # [B,1,T]
        with torch.no_grad():
            ref_out, _ = ref(*( [torch.from_numpy(x_np)] * 3 ), ref_mask)
        our_mask = jnp.asarray(toks == 0)[:, None, None, :]      # [B,1,1,T]
        our_out = mha.apply(mapped, x, x, our_mask)
        np.testing.assert_allclose(np.asarray(our_out), t2n(ref_out),
                                   atol=1e-4)


class TestLatentNetParity:
    def test_mean_logvar_and_kld_match(self):
        """Reference Latent prior/posterior nets vs ours (weights mapped);
        compares mean/logvar and the kld (z differs: independent eps)."""
        from types import SimpleNamespace
        RefLatent = ref_tl.Latent
        from blt_vqg_tpu.ops.latent import Latent, gaussian_kld
        torch.manual_seed(0)
        H, L, b = 16, 12, 3
        args = SimpleNamespace(hidden_dim=H, latent_dim=L, device="cpu")
        ref = RefLatent(args, dropout=0).eval()

        lat = Latent(latent_dim=L, dropout_rate=0.0, dtype=jnp.float32)
        x_np = np.random.RandomState(2).randn(b, H).astype(np.float32)
        xp_np = np.random.RandomState(3).randn(b, H).astype(np.float32)
        params = lat.init({"params": jax.random.key(0),
                           "latent": jax.random.key(1)},
                          jnp.asarray(x_np), jnp.asarray(xp_np))

        def seq_map(seq):  # torch Sequential(Linear,ReLU,Drop,Linear,ReLU,Drop,Linear)
            linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
            return {
                "in_proj": {"kernel": t2n(linears[0].weight).T,
                            "bias": t2n(linears[0].bias)},
                "hidden_0": {"kernel": t2n(linears[1].weight).T,
                             "bias": t2n(linears[1].bias)},
                "hidden_1": {"kernel": t2n(linears[2].weight).T,
                             "bias": t2n(linears[2].bias)},
            }

        mapped = {"params": {"prior": seq_map(ref.mean_logvar_prior),
                             "posterior": seq_map(ref.mean_logvar_posterior)}}
        with torch.no_grad():
            ref_kld, _, (ref_mp, ref_lp) = ref(torch.from_numpy(x_np),
                                               torch.from_numpy(xp_np))
        our_kld, _, (our_mp, our_lp) = lat.apply(
            mapped, jnp.asarray(x_np), jnp.asarray(xp_np),
            rngs={"latent": jax.random.key(2)})
        np.testing.assert_allclose(np.asarray(our_mp), t2n(ref_mp), atol=1e-4)
        np.testing.assert_allclose(np.asarray(our_lp), t2n(ref_lp), atol=1e-4)
        np.testing.assert_allclose(float(our_kld), float(ref_kld), rtol=1e-4)


class TestNoamParity:
    def test_matches_reference_custom_optimizer(self):
        """train/schedule.py vs the reference's custom_optimizer formula
        (reference train_iq.py:252-257), evaluated independently here."""
        import math
        from blt_vqg_tpu.train.schedule import noam_schedule
        hidden = 300
        sched = noam_schedule(hidden, 4000)
        for step in [0, 1, 500, 4000, 12000, 35000]:
            min_arg1 = math.sqrt(1 / (step + 1))
            min_arg2 = step * (4000 ** -1.5)
            ref_lr = math.sqrt(1 / hidden) * min(min_arg1, min_arg2)
            np.testing.assert_allclose(float(sched(step)), ref_lr, rtol=1e-5)


def _map_mha(ref_mha):
    return {
        "q_proj": {"kernel": t2n(ref_mha.query_linear.weight).T},
        "k_proj": {"kernel": t2n(ref_mha.key_linear.weight).T},
        "v_proj": {"kernel": t2n(ref_mha.value_linear.weight).T},
        "out_proj": {"kernel": t2n(ref_mha.output_linear.weight).T},
    }


def _map_ln(ref_ln):
    return {"scale": t2n(ref_ln.weight), "bias": t2n(ref_ln.bias)}


def _map_ffn(ref_ffn):
    lin = list(ref_ffn.layers)
    return {"ffn_in": {"kernel": t2n(lin[0].weight).T,
                       "bias": t2n(lin[0].bias)},
            "ffn_out": {"kernel": t2n(lin[1].weight).T,
                        "bias": t2n(lin[1].bias)}}


class TestFullEncoderParity:
    def test_encoder_stack_matches_reference(self):
        """Full 2-layer Encoder (timing + pre-LN MHA/FFN + final LN) vs the
        actual reference Encoder, weights mapped, compat FFN quirk on."""
        import jax
        import jax.numpy as jnp
        from blt_vqg_tpu.ops.transformer import TransformerEncoder
        torch.manual_seed(0)
        H, heads, layers, ffdim, b, t = 32, 4, 2, 64, 2, 7
        ref = ref_tl.Encoder(
            H, H, num_layers=layers, num_heads=heads, total_key_depth=H,
            total_value_depth=H, filter_size=ffdim, attention_dropout=0.0,
            relu_dropout=0.0, layer_dropout=0.0, input_dropout=0.0).eval()

        ours = TransformerEncoder(
            hidden_dim=H, num_layers=layers, num_heads=heads, pwffn_dim=ffdim,
            attention_dropout=0.0, relu_dropout=0.0, layer_dropout=0.0,
            input_dropout=0.0, dtype=jnp.float32, compat_trailing_relu=True)
        x_np = np.random.RandomState(0).randn(b, t, H).astype(np.float32)
        params = ours.init(jax.random.key(0), jnp.asarray(x_np))

        mapped = {}
        for i in range(layers):
            rl = ref.enc[i]
            mapped[f"layer_{i}"] = {
                "mha": _map_mha(rl.multi_head_attention),
                "ln_mha": _map_ln(rl.layer_norm_mha),
                "ln_ffn": _map_ln(rl.layer_norm_ffn),
                "ffn": _map_ffn(rl.positionwise_feed_forward),
            }
        mapped["final_ln"] = _map_ln(ref.layer_norm)

        toks = np.array([[1, 2, 3, 0, 0, 0, 0], [1, 2, 3, 4, 5, 0, 0]])
        ref_mask = torch.from_numpy(toks).eq(0).unsqueeze(1)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x_np.copy()), ref_mask)
        our_mask = jnp.asarray(toks == 0)[:, None, None, :]
        our_out = ours.apply({"params": mapped}, jnp.asarray(x_np), our_mask)
        np.testing.assert_allclose(np.asarray(our_out), t2n(ref_out),
                                   atol=2e-4)


class TestFullDecoderParity:
    def test_decoder_stack_matches_reference(self):
        """Full 2-layer Decoder (self+cross attention + FFN) vs the actual
        reference Decoder: causal+pad masking equivalence included."""
        import jax
        import jax.numpy as jnp
        from blt_vqg_tpu.ops.transformer import TransformerDecoder
        torch.manual_seed(1)
        H, heads, layers, ffdim, b, t, s = 32, 4, 2, 64, 2, 6, 5
        ref = ref_tl.Decoder(
            H, H, num_layers=layers, num_heads=heads, total_key_depth=H,
            total_value_depth=H, filter_size=ffdim, attention_dropout=0.0,
            relu_dropout=0.0, layer_dropout=0.0, input_dropout=0.0).eval()

        ours = TransformerDecoder(
            hidden_dim=H, num_layers=layers, num_heads=heads, pwffn_dim=ffdim,
            attention_dropout=0.0, relu_dropout=0.0, layer_dropout=0.0,
            input_dropout=0.0, dtype=jnp.float32, compat_trailing_relu=True)
        rng = np.random.RandomState(1)
        x_np = rng.randn(b, t, H).astype(np.float32)
        enc_np = rng.randn(b, s, H).astype(np.float32)
        params = ours.init(jax.random.key(0), jnp.asarray(x_np),
                           jnp.asarray(enc_np))

        mapped = {}
        for i in range(layers):
            rl = ref.dec[i]
            mapped[f"layer_{i}"] = {
                "self_attn": _map_mha(rl.multi_head_attention_dec),
                "cross_attn": _map_mha(rl.multi_head_attention_enc_dec),
                "ln_self": _map_ln(rl.layer_norm_mha_dec),
                "ln_cross": _map_ln(rl.layer_norm_mha_enc),
                "ln_ffn": _map_ln(rl.layer_norm_ffn),
                "ffn": _map_ffn(rl.positionwise_feed_forward),
            }
        mapped["final_ln"] = _map_ln(ref.layer_norm)

        trg = np.array([[1, 5, 6, 7, 0, 0], [1, 5, 0, 0, 0, 0]])
        src = np.array([[1, 2, 3, 0, 0], [1, 2, 3, 4, 5]])
        ref_src_mask = torch.from_numpy(src).eq(0).unsqueeze(1)
        ref_trg_mask = torch.from_numpy(trg).eq(0).unsqueeze(1)
        with torch.no_grad():
            ref_out, _ = ref(torch.from_numpy(x_np.copy()),
                             torch.from_numpy(enc_np),
                             (ref_src_mask, ref_trg_mask))
        our_out = ours.apply(
            {"params": mapped}, jnp.asarray(x_np), jnp.asarray(enc_np),
            jnp.asarray(src == 0)[:, None, None, :],
            jnp.asarray(trg == 0)[:, None, None, :])
        np.testing.assert_allclose(np.asarray(our_out), t2n(ref_out),
                                   atol=2e-4)


class TestGreedyDecodeTokenParity:
    def test_tokens_match_reference_inference_loop(self):
        """TOKEN-level greedy-decode parity: the reference's O(T²) inference
        loop (re-embed the grown prefix, pad-mask it, full Decoder pass,
        argmax of the last row — reference iq.py:129-143 +
        decoder_transformer.py:43-48) vs our KV-cache step decode with
        ``key_pad`` tracking (the compat_decode_pad_mask semantics,
        ops/attention.py step).  Same mapped weights, identical token ids at
        every step — including the pad-seed quirk, where the seed is a
        masked key."""
        import jax
        import jax.numpy as jnp
        from blt_vqg_tpu.ops.transformer import TransformerDecoder

        torch.manual_seed(7)
        H, heads, layers, ffdim, b, s, V = 32, 4, 2, 64, 3, 5, 50
        steps = 9
        ref_dec = ref_tl.Decoder(
            H, H, num_layers=layers, num_heads=heads, total_key_depth=H,
            total_value_depth=H, filter_size=ffdim, attention_dropout=0.0,
            relu_dropout=0.0, layer_dropout=0.0, input_dropout=0.0).eval()
        ref_emb = torch.nn.Embedding(V, H)
        ref_out_lin = torch.nn.Linear(H, V)
        with torch.no_grad():
            # keep argmax off <pad>: an EMITTED pad is a never-attended key
            # whose representation legitimately drifts between the re-encode
            # and cached formulations (degenerate even in the reference)
            ref_out_lin.bias[0] -= 100.0

        ours = TransformerDecoder(
            hidden_dim=H, num_layers=layers, num_heads=heads, pwffn_dim=ffdim,
            attention_dropout=0.0, relu_dropout=0.0, layer_dropout=0.0,
            input_dropout=0.0, dtype=jnp.float32, compat_trailing_relu=True,
            max_decode_len=steps)

        rng = np.random.RandomState(7)
        enc_np = rng.randn(b, s, H).astype(np.float32)
        src = np.array([[1, 2, 3, 0, 0], [1, 2, 3, 4, 5], [1, 2, 0, 0, 0]])
        inject_np = rng.randn(b, H).astype(np.float32)  # image(+z) features

        mapped = {}
        for i in range(layers):
            rl = ref_dec.dec[i]
            mapped[f"layer_{i}"] = {
                "self_attn": _map_mha(rl.multi_head_attention_dec),
                "cross_attn": _map_mha(rl.multi_head_attention_enc_dec),
                "ln_self": _map_ln(rl.layer_norm_mha_dec),
                "ln_cross": _map_ln(rl.layer_norm_mha_enc),
                "ln_ffn": _map_ln(rl.layer_norm_ffn),
                "ffn": _map_ffn(rl.positionwise_feed_forward),
            }
        mapped["final_ln"] = _map_ln(ref_dec.layer_norm)
        emb_np = t2n(ref_emb.weight)              # [V, H]
        w_out = t2n(ref_out_lin.weight).T         # [H, V]
        b_out = t2n(ref_out_lin.bias)

        PAD = 0

        # ---- reference loop: full prefix re-decode each step ----
        ref_src_mask = torch.from_numpy(src).eq(0).unsqueeze(1)
        ys = torch.full((b, 1), PAD, dtype=torch.long)
        ref_tokens = []
        with torch.no_grad():
            for _ in range(steps):
                trg_mask = ys.eq(0).unsqueeze(1)
                emb = ref_emb(ys)
                emb[:, 0] = emb[:, 0] + torch.from_numpy(inject_np)
                out, _ = ref_dec(emb, torch.from_numpy(enc_np),
                                 (ref_src_mask, trg_mask))
                logits = ref_out_lin(out[:, -1])
                nxt = torch.argmax(logits, dim=1)
                ref_tokens.append(nxt.numpy().copy())
                ys = torch.cat([ys, nxt.unsqueeze(1)], dim=1)

        # ---- ours: KV-cache step decode with key_pad tracking ----
        variables = {"params": mapped}
        enc = jnp.asarray(enc_np)
        src_mask = jnp.asarray(src == 0)[:, None, None, :]
        bound = ours.bind(variables)
        cross_kvs = bound.precompute_cross(enc)
        caches = bound.init_cache(b, steps)
        key_pad = jnp.zeros((b, steps), bool)
        token = jnp.full((b,), PAD, jnp.int32)
        our_tokens = []
        table = jnp.asarray(emb_np)
        for pos in range(steps):
            x_t = table[token][:, None, :]
            if pos == 0:
                x_t = x_t + jnp.asarray(inject_np)[:, None, :]
            key_pad = key_pad.at[:, pos].set(token == PAD)
            y_t, caches = bound.step(x_t, caches, cross_kvs,
                                     jnp.asarray(pos), src_mask, key_pad)
            logits = y_t[:, 0] @ jnp.asarray(w_out) + jnp.asarray(b_out)
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            our_tokens.append(np.asarray(token))

        np.testing.assert_array_equal(np.stack(our_tokens),
                                      np.stack(ref_tokens))
