"""GPipe pipeline transform (parallel/pipeline.py): forward AND gradient
parity with sequential layer application, on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.parallel.mesh import build_mesh
from blt_vqg_tpu.parallel.pipeline import pipeline_apply


def _layer_fn(p, x, bargs, key):
    del key
    out = jnp.tanh(x @ p["w"] + p["b"])
    if bargs:
        out = out + bargs[0]  # batch-aligned side input (bias per example)
    return out


def _stacked(n_layers, d, seed=0):
    r = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(r.randn(n_layers, d, d).astype(np.float32) * 0.3),
        "b": jnp.asarray(r.randn(n_layers, d).astype(np.float32) * 0.1),
    }


def _sequential(params, x, bargs=()):
    for i in range(params["w"].shape[0]):
        x = _layer_fn(jax.tree.map(lambda p: p[i], params), x, bargs, None)
    return x


class TestPipelineParity:
    @pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4), (2, 4)])
    def test_forward_matches_sequential(self, eight_devices, stages,
                                        microbatches):
        mesh = build_mesh((stages,), ("pipe",),
                          devices=jax.devices()[:stages])
        d, b, n_layers = 16, 8, 8
        params = _stacked(n_layers, d)
        x = jnp.asarray(np.random.RandomState(1).randn(b, 4, d)
                        .astype(np.float32))
        want = _sequential(params, x)
        got = pipeline_apply(_layer_fn, params, x, mesh,
                             microbatches=microbatches)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_gradient_matches_sequential(self, eight_devices):
        """jax.grad through the schedule == grad of the sequential stack —
        the backward pass is the reverse pipeline, no hand-written AD."""
        mesh = build_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        d, b, n_layers = 8, 4, 4
        params = _stacked(n_layers, d, seed=2)
        x = jnp.asarray(np.random.RandomState(3).randn(b, 2, d)
                        .astype(np.float32))

        def loss_pipe(p):
            return jnp.sum(pipeline_apply(_layer_fn, p, x, mesh,
                                          microbatches=2) ** 2)

        def loss_seq(p):
            return jnp.sum(_sequential(p, x) ** 2)

        g_pipe = jax.grad(loss_pipe)(params)
        g_seq = jax.grad(loss_seq)(params)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5),
            g_pipe, g_seq)

    def test_composes_with_data_axis(self, eight_devices):
        """(2 data × 2 pipe) mesh: the batch stays data-sharded through the
        pipeline; result equals sequential."""
        mesh = build_mesh((2, 2), ("data", "pipe"),
                          devices=jax.devices()[:4])
        d, b, n_layers = 8, 8, 4
        params = _stacked(n_layers, d, seed=4)
        x = jnp.asarray(np.random.RandomState(5).randn(b, 2, d)
                        .astype(np.float32))
        want = _sequential(params, x)
        got = pipeline_apply(_layer_fn, params, x, mesh, microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_batch_args_ride_the_schedule(self, eight_devices):
        """Batch-aligned side inputs (cross-attention memories, per-example
        masks) are microbatched WITH x — each stage sees the slice matching
        its in-flight microbatch."""
        mesh = build_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        d, b, n_layers = 8, 8, 4
        params = _stacked(n_layers, d, seed=7)
        r = np.random.RandomState(8)
        x = jnp.asarray(r.randn(b, 2, d).astype(np.float32))
        side = jnp.asarray(r.randn(b, 2, d).astype(np.float32))
        want = _sequential(params, x, (side,))
        got = pipeline_apply(_layer_fn, params, x, mesh, microbatches=4,
                             batch_args=(side,))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_rng_streams_are_stage_count_invariant(self, eight_devices):
        """Per-(layer, microbatch) dropout keys fold from the global layer
        index, so 2-stage and 4-stage pipelines draw identical noise."""
        def noisy_layer(p, x, bargs, key):
            del bargs
            return x @ p["w"] + jax.random.normal(key, x.shape) * 0.01

        d, b, n_layers = 8, 8, 4
        params = {"w": jnp.asarray(
            np.random.RandomState(6).randn(n_layers, d, d)
            .astype(np.float32) * 0.2)}
        x = jnp.ones((b, 2, d), jnp.float32)
        outs = []
        for stages in (2, 4):
            mesh = build_mesh((stages,), ("pipe",),
                              devices=jax.devices()[:stages])
            outs.append(np.asarray(pipeline_apply(
                noisy_layer, params, x, mesh, microbatches=2,
                rng=jax.random.key(9))))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)

    def test_validation_errors(self, eight_devices):
        mesh = build_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        params = _stacked(3, 8)  # 3 layers % 2 stages
        x = jnp.zeros((4, 2, 8), jnp.float32)
        with pytest.raises(ValueError, match="divisible"):
            pipeline_apply(_layer_fn, params, x, mesh, microbatches=2)
        with pytest.raises(ValueError, match="microbatch"):
            pipeline_apply(_layer_fn, _stacked(4, 8), x, mesh,
                           microbatches=3)
        with pytest.raises(ValueError, match="axis"):
            pipeline_apply(_layer_fn, _stacked(4, 8), x,
                           build_mesh((2,), ("data",),
                                      devices=jax.devices()[:2]),
                           microbatches=2)


class TestDecoderPipeline:
    def test_decoder_forward_matches_sequential(self, eight_devices):
        """TransformerDecoder(pipeline_stages=2) == the sequential stack on
        identical params (deterministic — the pipelined dropout stream is
        intentionally a different valid stream)."""
        from blt_vqg_tpu.ops.transformer import TransformerDecoder

        mesh = build_mesh((2, 2), ("data", "pipe"),
                          devices=jax.devices()[:4])
        kw = dict(hidden_dim=32, num_layers=4, num_heads=4, pwffn_dim=64,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32, max_decode_len=8)
        plain = TransformerDecoder(**kw)
        piped = TransformerDecoder(**kw, pipeline_stages=2,
                                   pipeline_microbatches=2,
                                   pipeline_mesh=mesh)
        b, t, tc, d = 8, 6, 3, 32
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(b, t, d).astype(np.float32))
        enc = jnp.asarray(r.randn(b, tc, d).astype(np.float32))
        src_mask = jnp.zeros((b, 1, 1, tc), bool).at[:, :, :, 2:].set(True)
        params = plain.init(jax.random.key(1), x, enc)
        want = plain.apply(params, x, enc, src_mask, None, True)
        got = piped.apply(params, x, enc, src_mask, None, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_decoder_pipeline_grads_flow(self, eight_devices):
        """Gradient through the pipelined decoder matches the sequential
        decoder's gradient (same params; the backward rides the reverse
        schedule)."""
        from blt_vqg_tpu.ops.transformer import TransformerDecoder

        mesh = build_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        kw = dict(hidden_dim=16, num_layers=2, num_heads=2, pwffn_dim=32,
                  attention_dropout=0.0, relu_dropout=0.0,
                  dtype=jnp.float32, max_decode_len=8)
        plain = TransformerDecoder(**kw)
        piped = TransformerDecoder(**kw, pipeline_stages=2,
                                   pipeline_microbatches=2,
                                   pipeline_mesh=mesh)
        b, t, tc, d = 4, 5, 3, 16
        r = np.random.RandomState(2)
        x = jnp.asarray(r.randn(b, t, d).astype(np.float32))
        enc = jnp.asarray(r.randn(b, tc, d).astype(np.float32))
        params = plain.init(jax.random.key(3), x, enc)

        def loss(p, model):
            return jnp.sum(model.apply(p, x, enc, None, None, True) ** 2)

        g_plain = jax.grad(loss)(params, plain)
        g_piped = jax.grad(loss)(params, piped)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4),
            g_plain, g_piped)
