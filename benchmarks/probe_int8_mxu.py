"""Probe: does Mosaic support native int8 MXU matmuls on this chip?

NEXT.md #10: the int8 weight stream loses to bf16 because the int8→bf16
convert sits on the DMA→MXU critical path (METHODOLOGY round-4).  The
clean fix is feeding the MXU int8 operands directly — int8×int8→int32
dot_general — which removes the convert AND (v5e MXU) doubles peak
throughput.  This probe compiles three candidate kernels remotely and
checks numerics, so the decode_stream surgery only happens if the
hardware path exists:

  1. s8 × s8 → s32 dot_general (preferred_element_type=int32)
  2. s8 × s8 → f32 dot_general (preferred_element_type=float32)
  3. mixed s8 × bf16 → f32 (unlikely; for completeness)

Usage: python benchmarks/probe_int8_mxu.py
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, out_dtype):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_dtype)


def try_case(name, xdt, wdt, odt, m=64, k=1024, n=1024, frac_x=False):
    rng = np.random.RandomState(0)
    if frac_x:  # non-integral activations (the real stream-kernel LHS)
        x = (rng.randint(-127, 128, (m, k)) / 4.0).astype(np.float32)
    else:
        x = rng.randint(-127, 128, (m, k)).astype(np.int32)
    w = rng.randint(-127, 128, (k, n)).astype(np.int32)
    xj = jnp.asarray(x, xdt)
    wj = jnp.asarray(w, wdt)
    # ground truth from the CAST operands (bf16 may round fractional x)
    want = (np.asarray(xj, np.float64) @ np.asarray(wj, np.float64))
    if odt == jnp.int32:
        want = want.astype(np.int64)
    fn = pl.pallas_call(
        functools.partial(_kernel, out_dtype=odt),
        out_shape=jax.ShapeDtypeStruct((m, n), odt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        got = np.asarray(jax.jit(fn)(xj, wj))
    except Exception as e:  # noqa: BLE001 — report and move on
        print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:300]}")
        return False
    # bf16 operands lose precision; int paths must be exact
    if odt == jnp.int32:
        ok = np.array_equal(got, want)
    else:
        ok = np.allclose(got, want.astype(np.float64), rtol=2e-2, atol=64)
    print(f"{name}: compiles; exact={np.array_equal(got, want)} "
          f"close={ok} max_err={np.abs(got.astype(np.float64) - want).max()}")
    return ok


def main():
    print("backend:", jax.default_backend(), jax.devices())
    try_case("s8 x s8 -> s32", jnp.int8, jnp.int8, jnp.int32)
    try_case("s8 x s8 -> f32", jnp.int8, jnp.int8, jnp.float32)
    try_case("s8 x bf16 -> f32", jnp.int8, jnp.bfloat16, jnp.float32)
    # the stream kernel's real shape: bf16/f32 ACTIVATION (LHS, fractional)
    # x int8 WEIGHT (RHS) — the case that deletes the in-kernel convert
    try_case("bf16 x s8 -> f32", jnp.bfloat16, jnp.int8, jnp.float32,
             frac_x=True)
    try_case("f32 x s8 -> f32", jnp.float32, jnp.int8, jnp.float32,
             frac_x=True)


if __name__ == "__main__":
    main()
