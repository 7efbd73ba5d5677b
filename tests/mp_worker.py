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

# --- sharded checkpoint round-trip across the process boundary ---------
# A mesh whose MODEL axis spans the two processes: column j is process
# j's devices, so a P(None, "model") kernel has one half on each host and
# save_sharded genuinely needs both hosts' writes (npz: union of
# shard_h{j}.npz files; orbax: collective StandardSave into one store).
if len(sys.argv) > 4:
    ckroot = sys.argv[4]
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from blt_vqg_tpu.core.checkpoint import CheckpointManager
    from blt_vqg_tpu.train.state import TrainState

    devs = sorted(jax.devices(), key=lambda d: d.id)
    perproc = [[d for d in devs if d.process_index == j]
               for j in range(nprocs)]
    cross = Mesh(np.array([[perproc[j][i] for j in range(nprocs)]
                           for i in range(4)]), ("data", "model"))

    def put(arr, spec):
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(cross, spec), lambda idx: arr[idx])

    kernel = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
    bias = np.arange(8, dtype=np.float32)

    def make_state(fill):
        return TrainState(
            step=jnp.asarray(7, jnp.int32), kliter=jnp.asarray(3, jnp.int32),
            params={"dense": {"kernel": put(kernel * fill, P(None, "model")),
                              "bias": put(bias * fill, P())}},
            batch_stats={"bn": {"mean": put(bias * fill, P())}},
            opt_state={"count": put(np.asarray(5, np.int32), P()),
                       "mu": {"kernel": put(
                           (kernel * fill).astype(jnp.bfloat16),
                           P(None, "model"))}},
            tx=None, apply_fn=None, lr_fn=None)

    for backend in ("npz", "orbax"):
        mgr = CheckpointManager(os.path.join(ckroot, backend),
                                backend=backend)
        mgr.save_sharded(make_state(1.0))
        mgr._barrier(f"{backend}_saved")  # npz: all shard files on disk
        restored = mgr.restore_sharded(make_state(0.0))
        assert int(restored.step) == 7 and int(restored.kliter) == 3
        flat_want = jax.tree_util.tree_leaves_with_path(
            {"params": make_state(1.0).params,
             "opt": make_state(1.0).opt_state,
             "bn": make_state(1.0).batch_stats})
        flat_got = jax.tree_util.tree_leaves_with_path(
            {"params": restored.params, "opt": restored.opt_state,
             "bn": restored.batch_stats})
        for (pw, want), (pg, got) in zip(flat_want, flat_got):
            assert got.dtype == want.dtype, (pw, got.dtype, want.dtype)
            gots = {tuple(str(s) for s in sh.index): np.asarray(sh.data)
                    for sh in got.addressable_shards}
            for sh in want.addressable_shards:
                np.testing.assert_array_equal(
                    gots[tuple(str(s) for s in sh.index)],
                    np.asarray(sh.data), err_msg=str(pw))
        print(f"[p{pid}] MP SHARDED CKPT {backend} OK", flush=True)
