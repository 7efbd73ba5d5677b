"""Pallas int8-weight matmul for the decode hot path.

Greedy decode at the flagship config is HBM-bandwidth-bound on WEIGHT
streaming: every KV-cache decode step re-reads the decoder stack + output
projection (~130 MB bf16), 51 times per batch (benchmarks/METHODOLOGY.md).
Storing those weights int8 with per-output-channel scales halves the bytes
per step — but only if the dequantization happens INSIDE the kernel, in
VMEM, per tile.  A jnp-level ``(w8 * scale) @ x`` dequant is loop-invariant
and XLA hoists it out of the decode scan, materializing a bf16 copy and
streaming THAT per step (measured: zero win).  This kernel reads int8 from
HBM and dequantizes in VMEM, so the scan truly streams int8.

Kernel: ``y[M,N] = x[M,K] @ (w8[K,N] * scale[N])`` — grid over N tiles,
x resident in VMEM across the grid, one (K, TILE_N) int8 block per program
(auto double-buffered by the Pallas pipeline), f32 MXU accumulation.

Quantization is symmetric per output channel: scale = max|w|/127
(``quantize_int8``).  reference counterpart: none — the reference serves
from f32 torch (models/iq.py:117-152); this is the TPU serving path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel (last-dim) int8 quantization.

    w [K, N] float → (w8 [K, N] int8, scale [N] f32) with
    w ≈ w8 * scale.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w8, scale


def _kernel(x_ref, w8_ref, scale_ref, out_ref):
    # x [M, K] bf16 (VMEM-resident across the whole grid);
    # w8 [K, TILE_N] int8 block; scale [1, TILE_N] f32; out [M, TILE_N]
    w = w8_ref[:].astype(jnp.float32)
    acc = jnp.dot(x_ref[:].astype(jnp.float32), w,
                  preferred_element_type=jnp.float32)
    out_ref[:] = (acc * scale_ref[0, :][None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int8_matmul(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray,
                tile_n: int = 512, interpret: bool = False) -> jnp.ndarray:
    """``x [M, K] @ dequant(w8 [K, N], scale [N]) -> [M, N]`` (x.dtype out).

    Any N: it is zero-padded to a lane multiple (128) and tiled by the
    largest 128-multiple divisor ≤ ``tile_n``.
    """
    from jax.experimental import pallas as pl

    m, k = x.shape
    k2, n = w8.shape
    assert k == k2, (x.shape, w8.shape)
    n_pad = -n % 128
    if n_pad:
        w8 = jnp.pad(w8, ((0, 0), (0, n_pad)))
        scale = jnp.pad(scale, (0, n_pad))
    np_ = n + n_pad
    tile_n = min(tile_n, np_)
    while np_ % tile_n:
        tile_n -= 128
    scale2d = scale.reshape(1, np_).astype(jnp.float32)

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
        kwargs = {}
    except ImportError:  # pragma: no cover
        vmem = None
        kwargs = {}

    def spec(block, index_map):
        if vmem is None:
            return pl.BlockSpec(block, index_map)
        return pl.BlockSpec(block, index_map, memory_space=vmem)

    out = pl.pallas_call(
        _kernel,
        grid=(np_ // tile_n,),
        in_specs=[
            spec((m, k), lambda j: (0, 0)),           # x: same block ∀ j
            spec((k, tile_n), lambda j: (0, j)),      # w8: stream per tile
            spec((1, tile_n), lambda j: (0, j)),      # scale
        ],
        out_specs=spec((m, tile_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, np_), x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, w8, scale2d)
    return out[:, :n] if n_pad else out


def int8_matmul_ref(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray
                    ) -> jnp.ndarray:
    """jnp reference for parity tests (identical math, no Pallas)."""
    w = w8.astype(jnp.float32) * scale.astype(jnp.float32)[None, :]
    return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)
