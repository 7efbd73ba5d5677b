"""Numerical golden-parity against the actual reference implementation.

These tests import the reference's pure-torch modules (no torchvision
needed) from /root/reference at test time, map their randomly-initialized
weights onto our flax modules, and compare outputs elementwise.  They prove
the TPU-native ops compute the same math, not merely similar shapes.

Component-level by design: the full reference EncoderLayer is NOT compared
because its FFN applies ReLU+dropout after the final linear (reference
transformer_layers.py:400-408) — a bug SURVEY.md §2.7 directs us not to
reproduce; the MHA, timing-signal, KL, and latent-net parities below cover
every other piece of the layer.

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
