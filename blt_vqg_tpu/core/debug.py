"""Numerical-hazard guards (SURVEY.md §5 "race detection / sanitizers").

jit purity + explicit PRNG keys already remove the reference's implicit-
state hazards (CUDA RNG, loader shm).  What remains on TPU is numerical:
NaN/Inf from bf16 overflow or KL blow-ups.  Two tools:

- ``enable_nan_checks()``: flips ``jax_debug_nans`` — XLA re-runs the
  offending computation un-jitted and raises at the producing op.
- ``guarded_update``: a jit-safe rail for production — if this step's
  loss/grad-norm is non-finite, keep the previous state (skip the update)
  and count the skip, instead of poisoning the parameters.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def enable_nan_checks(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


def is_finite_tree(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return ok


def guarded_update(old_state: Any, new_state: Any,
                   metrics: Dict[str, jnp.ndarray]
                   ) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Selects new_state only when its loss is finite (jit-safe)."""
    ok = jnp.isfinite(metrics["loss"])
    picked = jax.tree.map(
        lambda new, old: jnp.where(ok, new, old), new_state, old_state)
    metrics = dict(metrics)
    metrics["skipped_nonfinite"] = jnp.logical_not(ok).astype(jnp.float32)
    return picked, metrics
