"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import.

This is how multi-chip sharding is tested without real multi-chip hardware
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices, and the
same Mesh/pjit code paths that run on a TPU slice run here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# this image pins jax_platforms to "axon,cpu" regardless of the env var;
# force the CPU backend so tests never grab (or race for) the TPU tunnel
jax.config.update("jax_platforms", "cpu")

# The XLA host platform mimics TPU matmul precision (bf16 passes) by default;
# parity-vs-numpy tests need exact f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from blt_vqg_tpu.core.config import Config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    """Small-but-structured config: exercises multi-head, multi-layer paths."""
    return Config(
        emb_dim=16, hidden_dim=32, latent_dim=24, pwffn_dim=64,
        num_layers=2, num_heads=4, batch_size=8,
        max_q_length=10, max_a_length=4, max_decode_length=12,
        num_pretraining_steps=4, total_training_steps=12, full_kl_step=6,
        dtype="float32", image_size=32,
    )


@pytest.fixture(scope="session")
def vocab_size() -> int:
    return 50


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8, "conftest should have forced 8 CPU devices"
    return jax.devices()
