"""Multihost worker: one PROCESS of a two-process jax.distributed job.

Launched by tests/test_multiprocess.py (never imported by pytest itself):
``python tests/mp_worker.py <process_id> <num_processes> <port>``.

Each process gets 4 virtual CPU devices; together they form one 8-device
``data``-axis mesh.  The worker exercises the real multi-host path —
`initialize_distributed` → per-host batch shard →
`host_local_batch_to_global` (`jax.make_array_from_process_local_data`) →
the sharded jitted train step — and prints the global loss, which the
launcher compares across processes and against a single-process oracle.
reference counterpart: Lightning DDP over NCCL (reference train_iq.py:373),
never exercised upstream.
"""
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blt_vqg_tpu.core.distributed import (host_local_batch_to_global,
                                          initialize_distributed)

initialize_distributed(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs
assert jax.device_count() == 4 * nprocs
assert jax.local_device_count() == 4

from blt_vqg_tpu.parallel.mesh import build_mesh

mesh = build_mesh((4 * nprocs, 1))

# --- stitch check: each host contributes distinct rows; the global sum
# must include BOTH hosts' data on every host
local = {"x": np.full((4, 3), pid + 1.0, np.float32)}
gb = host_local_batch_to_global(local, mesh)
assert gb["x"].shape == (4 * nprocs, 3)
total = float(jax.jit(jnp.sum)(gb["x"]))
assert total == 36.0, total
print(f"[p{pid}] MP STITCH OK", flush=True)

# --- full sharded train step: params replicated, batch sharded per host
from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.parallel.sharding import replicate, shard_params
from blt_vqg_tpu.train.state import create_train_state
from blt_vqg_tpu.train.step import make_train_step

cfg = Config(emb_dim=8, hidden_dim=16, latent_dim=12, pwffn_dim=32,
             num_layers=1, num_heads=2, batch_size=8, image_size=24,
             max_q_length=8, dtype="float32")
vocab_size = 32
model = IQ(cfg, vocab_size)

r = np.random.RandomState(0)  # same template everywhere
tmpl = {
    "images": r.rand(8, 24, 24, 3).astype(np.float32),
    "context": r.randint(1, vocab_size,
                         (8, cfg.max_context_len)).astype(np.int32),
    "posterior": r.randint(1, vocab_size,
                           (8, cfg.max_posterior_len)).astype(np.int32),
    "target": r.randint(1, vocab_size,
                        (8, cfg.max_q_length)).astype(np.int32),
}
state = create_train_state(cfg, model, jax.random.key(0), tmpl)
state = state.replace(params=shard_params(state.params, mesh),
                      batch_stats=replicate(state.batch_stats, mesh),
                      opt_state=replicate(state.opt_state, mesh))

# this process's HALF of the global batch (seeded per host — the launcher
# rebuilds the same halves for the single-process oracle)
rb = np.random.RandomState(100 + pid)
local_batch = {
    "images": rb.rand(4, 24, 24, 3).astype(np.float32),
    "context": rb.randint(1, vocab_size,
                          (4, cfg.max_context_len)).astype(np.int32),
    "posterior": rb.randint(1, vocab_size,
                            (4, cfg.max_posterior_len)).astype(np.int32),
    "target": rb.randint(1, vocab_size,
                         (4, cfg.max_q_length)).astype(np.int32),
}
gbatch = host_local_batch_to_global(local_batch, mesh)
step = make_train_step(cfg, latent_mode=True, mesh=mesh)
state, m = step(state, gbatch, jax.random.key(1))
print(f"[p{pid}] MP TRAIN STEP loss = {float(m['loss']):.6f}", flush=True)
