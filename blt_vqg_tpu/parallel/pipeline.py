"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipelining (its only parallelism is implicit DDP,
reference train_iq.py:373), and SURVEY.md §2.4 rightly notes a 6-layer
model gains no *memory* from PP — so this transform exists as first-class
scaling capability for deeper variants, not as a parity need: the layer
stack is split into ``pipe`` contiguous stages, the batch into
microbatches, and the classic GPipe schedule fills the pipe —
stage ``s`` processes microbatch ``t - s`` at tick ``t``, activations hop
stage→stage over ICI via ``lax.ppermute``.

Idiomatic-TPU notes (this is the scaling-book recipe, hand-scheduled only
where XLA cannot infer it — the schedule itself):

- SPMD: ONE program runs on every pipe stage inside ``shard_map``; stage
  identity comes from ``lax.axis_index``.  Bubble ticks compute on
  garbage and are masked — uniform control flow is what keeps the
  schedule a single compiled program.
- The tick loop is a ``lax.scan``, so ``jax.grad`` differentiates straight
  through the schedule: the backward pass IS the reverse pipeline (grads
  hop backwards via the transposed ppermute).  No hand-written backward.
- Per-(layer, microbatch) dropout keys are folded from a single key, so
  the pipelined forward is bit-reproducible regardless of stage count.

Scope: activation pipelining of a uniform layer stack.  Stacked layer
params may be passed replicated (this model: 6 layers fit everywhere
thousands of times over) or pre-sharded on their leading axis over
``pipe`` for models where per-stage weight residency matters — the
transform is indifferent (`in_specs=P("pipe")` either way; XLA moves
nothing when the layout already matches).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(layer_fn: Callable, stacked_params: Any, x: jnp.ndarray,
                   mesh: Mesh, *, microbatches: int, axis: str = "pipe",
                   batch_args: Any = (), rng: jax.Array | None = None
                   ) -> jnp.ndarray:
    """Applies ``L`` stacked layers to ``x`` as a ``pipe``-staged pipeline.

    ``layer_fn(params_i, x_mb, batch_args_mb, key_i) -> x_mb`` — ONE layer
    on one microbatch.  ``batch_args`` is a pytree of arrays whose leading
    dim is the batch (encoder outputs, per-example masks): each is sliced
    into the SAME microbatches as ``x`` and handed to every stage —
    batch-aligned side inputs must ride the schedule, not a closure.
    ``key_i`` is a PRNGKey folded per (global layer index, microbatch), or
    None when ``rng`` is None.  Non-batch constants (the deterministic
    flag) should be closed over.  ``stacked_params``: pytree whose leaves
    have leading dim L (``L % stages == 0``).

    Output equals the sequential application of the L layers (parity
    tested, fwd + grad: tests/test_pipeline.py).
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no '{axis}' axis: {dict(mesh.shape)}")
    stages = dict(mesh.shape)[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{stages} pipeline stages")
    data_size = dict(mesh.shape).get("data", 1)
    b_local = x.shape[0] // data_size
    if b_local % microbatches:
        raise ValueError(f"per-data-shard batch {b_local} not divisible by "
                         f"{microbatches} microbatches")
    local_layers = n_layers // stages
    use_rng = rng is not None
    key = rng if use_rng else jax.random.key(0)

    def staged(params_local, x_full, bargs, key_in):
        s = jax.lax.axis_index(axis)
        m = microbatches

        def mb_split(a):
            return a.reshape((m, a.shape[0] // m) + a.shape[1:])

        xm = mb_split(x_full)
        bargs_m = jax.tree.map(mb_split, bargs)

        def apply_stage(x_mb, bargs_mb, mb_idx):
            """This stage's local_layers layers on one microbatch."""
            def body(carry, i):
                # global layer index for the dropout stream: layers of
                # stage s are [s*local_layers, (s+1)*local_layers)
                gi = s * local_layers + i
                k = (jax.random.fold_in(jax.random.fold_in(key_in, gi),
                                        mb_idx) if use_rng else None)
                p_i = jax.tree.map(lambda p: p[i], params_local)
                return layer_fn(p_i, carry, bargs_mb, k), None

            out, _ = jax.lax.scan(body, x_mb, jnp.arange(local_layers))
            return out

        def tick(carry, t):
            buf, out = carry
            mb = t - s                       # this stage's microbatch index
            idx = jnp.clip(mb, 0, m - 1)
            inp = jnp.where(s == 0, xm[jnp.clip(t, 0, m - 1)], buf)
            bargs_mb = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0,
                                                       keepdims=False),
                bargs_m)
            y = apply_stage(inp, bargs_mb, idx)
            valid = (mb >= 0) & (mb < m)
            # last stage banks its finished microbatch
            write = (valid & (s == stages - 1)).astype(y.dtype)
            out = jax.lax.dynamic_update_index_in_dim(
                out, write * y + (1.0 - write)
                * jax.lax.dynamic_index_in_dim(out, idx, 0, keepdims=False),
                idx, 0)
            # activations hop to the next stage (ring; the wraparound edge
            # carries garbage that stage 0 never reads)
            buf = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % stages) for i in range(stages)])
            return (buf, out), None

        out0 = jnp.zeros_like(xm)
        (_, out), _ = jax.lax.scan(
            tick, (xm[0] * 0, out0), jnp.arange(m + stages - 1))
        # everyone needs the result (loss is computed replicated): sum the
        # one real copy across stages
        mask = (s == stages - 1).astype(out.dtype)
        out = jax.lax.psum(out * mask, axis)
        return out.reshape(x_full.shape)

    # DP composes: the batch keeps its data sharding through the stage
    # boundary; params/keys are replicated over data, sharded over pipe
    x_spec = P("data") if "data" in mesh.shape else P()
    bspecs = jax.tree.map(lambda _: x_spec, batch_args)
    fn = shard_map(
        staged, mesh=mesh,
        in_specs=(P(axis), x_spec, bspecs, P()),
        out_specs=x_spec,
        check_vma=False)
    return fn(stacked_params, x, batch_args, key)
