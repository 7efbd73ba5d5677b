"""Learning-rate schedule.

The reference pokes a Noam-ish LR directly into the optimizer's param_groups
every step (reference train_iq.py:130, 252-257):

    lr(step) = sqrt(1/hidden_dim) · min(sqrt(1/(step+1)), step · warmup^-1.5)

Here it is an optax schedule — pure, serialized with the optimizer state,
and exactly the same curve (golden-tested against the formula).
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(hidden_dim: int, warmup_steps: int = 4000):
    scale = (1.0 / hidden_dim) ** 0.5
    wu = float(warmup_steps) ** -1.5

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return scale * jnp.minimum(jnp.sqrt(1.0 / (step + 1.0)), step * wu)

    return schedule
