"""Generic MLP (reference models/mlp.py capability).

Used as the image-feature reconstructor (hidden→pwffn→hidden, 2 layers,
reference iq.py:46-48) trained with MSE against the CNN features.  He-style
normal init on kernels, zero biases, matching the reference's
N(0, sqrt(2/fan_in)) (reference mlp.py:38-40).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _he_normal():
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MLP(nn.Module):
    hidden_size: int
    out_size: int
    num_layers: int = 1
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            odim = self.out_size if i == self.num_layers - 1 else self.hidden_size
            x = nn.Dense(odim, dtype=self.dtype, kernel_init=_he_normal(),
                         name=f"fc{i}")(x)
            if i != self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
