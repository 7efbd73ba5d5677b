"""Device-mesh construction.

The reference scales only via Lightning-DDP-over-NCCL, implicitly
(reference train_iq.py:373, ``gpus=args.num_gpus``).  Here parallelism is
first-class and explicit: a named ``jax.sharding.Mesh`` with a ``data`` axis
(batch/data parallelism — gradients all-reduced by XLA over ICI) and a
``model`` axis (tensor parallelism of attention heads and FFN width).  All
collectives are emitted by XLA from sharding annotations; there is no
hand-written communication layer to maintain.

Strategy coverage (SURVEY.md §2.4):
- DP: first-class (``data`` axis; per-host loading via core/distributed.py).
- TP: first-class (``model`` axis, Megatron pattern in sharding.py).
- Trial parallelism: train/tune.py (ASHA) — one accelerator per trial.
- PP: first-class capability (parallel/pipeline.py): GPipe microbatch
  schedule over a ``pipe`` axis for the decoder stack
  (``cfg.pipeline_stages``), activations hopping via ppermute, backward =
  jax.grad through the schedule.  At the flagship's 6 layers it adds
  bubbles for no memory win (SURVEY §2.4's point stands) — it exists for
  deeper variants and is parity-tested fwd+grad on the virtual mesh.
- SP/CP: first-class for long-context variants — ``cfg.sequence_parallel``
  routes encoder/decoder self-attention through ring attention
  (ops/ring_attention.py) over a ``seq`` mesh axis, composing with DP/TP
  (batch and head dims keep their shardings across the shard_map boundary).
  Not needed for reference parity (sequences ≤ 23 tokens).
- EP: first-class capability for MoE variants — ``cfg.moe_num_experts > 1``
  replaces FFNs with a mixture of experts (ops/moe.py, static-shape einsum
  dispatch) whose expert-stacked kernels shard over an ``expert`` mesh axis
  (parallel/sharding.py rules); GSPMD emits the token all-to-alls.  The
  reference model family has no MoE — this exists for scaled variants and
  is certified in the 8-device dryrun (EP loss == single-device oracle).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def build_mesh(
    mesh_shape: Tuple[int, ...] = (1, 1),
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a Mesh of `prod(mesh_shape)` devices.

    ``mesh_shape=(D, M)`` lays devices out so that the ``model`` axis is
    innermost (fastest-varying) — TP collectives (all-gather/reduce-scatter of
    activations) ride the shortest ICI hops, while DP's once-per-step gradient
    all-reduce takes the outer axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = int(np.prod(mesh_shape))
    if need > len(devices):
        raise ValueError(
            f"mesh_shape {mesh_shape} needs {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(mesh_shape)
    return Mesh(grid, axis_names)


def build_hybrid_mesh(dcn_data: int = 1, ici_data: int = -1,
                      model: int = 1) -> Mesh:
    """Multi-slice mesh: DCN-connected slices × ICI-connected chips.

    Axis order puts ``dcn_data`` outermost so only the once-per-step
    gradient all-reduce crosses slice boundaries (DCN); TP activations and
    intra-slice DP stay on ICI.  Uses mesh_utils' topology-aware device
    ordering when multiple slices are present.
    """
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if ici_data == -1:
        per_slice = n // dcn_data
        if per_slice % model:
            raise ValueError(
                f"{per_slice} per-slice devices not divisible by model={model}")
        ici_data = per_slice // model
    shape = (dcn_data, ici_data, model)
    devices = jax.devices()
    if dcn_data > 1 and hasattr(devices[0], "slice_index"):
        grid = mesh_utils.create_hybrid_device_mesh(
            (ici_data, model), dcn_mesh_shape=(dcn_data, 1),
            devices=devices)
        grid = np.asarray(grid).reshape(shape)
    else:
        # no slice topology info (single slice, or virtual CPU devices):
        # plain row-major layout — correct semantics, no topology hint
        need = int(np.prod(shape))
        if need > len(devices):
            raise ValueError(f"need {need} devices, have {len(devices)}")
        grid = np.asarray(devices[:need]).reshape(shape)
    return Mesh(grid, ("dcn_data", "data", "model"))


def local_mesh(data: int = -1, model: int = 1) -> Mesh:
    """Mesh over all local devices; data axis fills what model doesn't use."""
    n = len(jax.devices())
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    return build_mesh((data, model))
