"""Sharding rules: parameter and batch PartitionSpecs.

Design (scaling-book recipe): pick a mesh, annotate shardings on the inputs
and params of one jitted train step, and let XLA insert the collectives.

- Batch tensors shard their leading dim over ``data``.
- With ``model`` > 1, the transformer is tensor-parallel in the Megatron
  pattern: QKV / FFN-in projections split their *output* features over
  ``model`` (parallel heads / parallel FFN columns), output / FFN-out
  projections split their *input* features, so each block needs exactly one
  psum (emitted automatically by XLA from these specs) on its way out.
- Everything else (norms, biases, embeddings, small latent MLPs) is
  replicated — they are tiny relative to ICI bandwidth.
"""

from __future__ import annotations

import re
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over '/'-joined param path, spec) — first match wins.
# Kernel shapes are (in_features, out_features) per flax convention.
_RULES: Tuple[Tuple[str, P], ...] = (
    # attention projections: q/k/v split heads over 'model'; out merges them
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"out_proj/kernel$",               P("model", None)),
    # positionwise FFN: column-parallel in, row-parallel out
    (r"ffn_in/kernel$",                 P(None, "model")),
    (r"ffn_out/kernel$",                P("model", None)),
    # MoE expert-stacked kernels (ops/moe.py): experts over 'expert',
    # per-expert FFN width over 'model' (EP × TP compose); the router and
    # the [E, ...] biases stay with the experts / replicated
    (r"ffn/expert_in$",                 P("expert", None, "model")),
    (r"ffn/expert_out$",                P("expert", "model", None)),
    (r"ffn/expert_(in|out)_bias$",      P("expert", None)),
    # output vocab projection: split vocab over 'model'
    (r"(output_proj|z_classifier)/kernel$", P(None, "model")),
    # everything else replicated
    (r".*", P()),
)


def _mesh_filtered(spec: P, mesh: Mesh) -> P:
    """Drops axis names the mesh doesn't carry (e.g. 'expert' specs on a
    plain DP×TP mesh) — the dimension falls back to replicated."""
    axes = set(mesh.shape)
    return P(*[(a if a in axes else None) for a in spec])


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_param(path_str: str, ndim: int) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path_str):
            if len(spec) > ndim:  # e.g. biases under an ffn_in scope
                return P()
            return spec
    return P()


def param_sharding_rules(params: Any, mesh: Mesh,
                         fsdp: bool = False) -> Any:
    """Pytree of NamedShardings matching ``params``' structure.

    ``fsdp=True`` (ZeRO-3 style) additionally shards every leaf's first
    free dim over the ICI ``data`` axis, on top of its tensor-parallel
    spec — per-device param (and, since gradients inherit param
    shardings, grad) bytes drop ~|data|×.  Annotation-only: XLA inserts
    the per-use all-gathers in forward/backward and reduce-scatters the
    gradients.  Leaves with no evenly divisible free dim stay replicated
    over data (norms, biases).
    """
    data_size = dict(mesh.shape).get("data", 1)

    def leaf(path, x):
        spec = _mesh_filtered(spec_for_param(_path_str(path), x.ndim), mesh)
        if fsdp and x.ndim >= 1 and data_size > 1:
            spec = _zero1_spec(spec, x.shape, data_size)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Places ``params`` on the mesh according to the rules.

    Single bulk ``device_put`` (per-leaf puts issue one transfer RPC each —
    minutes over a tunneled TPU); a 1-device mesh is a no-op since the
    params already live on that device.
    """
    if mesh.size == 1:
        return params
    shardings = param_sharding_rules(params, mesh, fsdp=fsdp)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Leading-axis data sharding for a batch tensor of rank ``ndim``.

    Slice-aware: on a hybrid DCN×ICI mesh (build_hybrid_mesh's
    ``dcn_data`` outer axis) the batch shards over BOTH data axes, so each
    slice loads its own data and the only cross-slice traffic is the
    once-per-step gradient all-reduce XLA emits over ``dcn_data``."""
    axes = tuple(a for a in ("dcn_data", "data") if a in mesh.shape)
    return NamedSharding(mesh, P(axes, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    if mesh.size == 1:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(
        tree, jax.tree.map(lambda _: sharding, tree))


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------

def _zero1_spec(base: P, shape, data_size: int) -> P:
    """Adds ``data`` to the first unsharded dim divisible by the data-axis
    size (on top of the leaf's tensor-parallel spec); replicates if no dim
    qualifies.  Divisibility keeps every shard an even block — uneven
    GSPMD padding buys nothing here."""
    specs = list(base) + [None] * (len(shape) - len(base))
    for i, (s, dim) in enumerate(zip(specs, shape)):
        if s is None and dim >= data_size and dim % data_size == 0:
            specs[i] = "data"
            return P(*specs)
    return P(*specs)


def opt_state_sharding_rules(opt_state: Any, mesh: Mesh) -> Any:
    """ZeRO-1 shardings for an optimizer-state pytree (scaling-book style:
    annotate, let XLA insert the collectives).

    Adam moments (and mixed-precision f32 masters) mirror the param tree,
    so each leaf's path carries its param's name — the tensor-parallel
    rules apply via the same regexes, and ZeRO adds a ``data``-axis shard
    on the first free dim.  Per-device optimizer bytes drop ~|data|×
    (the dominant HBM term of a bandwidth-bound Adam step,
    benchmarks/METHODOLOGY.md cost attribution).  Scalars (step counts)
    and ``optax.MaskedNode`` frozen leaves stay replicated.  Scope: the
    ICI ``data`` axis only — sharding the update over DCN would put the
    per-step delta all-gather on the slow cross-slice links.
    """
    data_size = dict(mesh.shape).get("data", 1)

    def leaf(path, x):
        if getattr(x, "ndim", 0) == 0 or data_size == 1:
            return NamedSharding(mesh, P())
        base = _mesh_filtered(spec_for_param(_path_str(path), x.ndim), mesh)
        return NamedSharding(mesh, _zero1_spec(base, x.shape, data_size))

    return jax.tree_util.tree_map_with_path(leaf, opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Places optimizer state with ZeRO-1 shardings (one bulk device_put)."""
    if mesh.size == 1:
        return opt_state
    return jax.device_put(opt_state, opt_state_sharding_rules(opt_state, mesh))
