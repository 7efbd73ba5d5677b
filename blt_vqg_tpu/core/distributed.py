"""Multi-host initialization and cross-host data placement.

The reference's multi-process story is Lightning-DDP-over-NCCL plus torch
multiprocessing shm for loader workers (reference train_iq.py:25, 373).  The
TPU-native story: ``jax.distributed.initialize`` connects the hosts of a
slice/pod (ICI within a slice, DCN across), after which the single-program
pjit code in train/step.py runs unchanged — XLA routes collectives.  Data
loading is per-host: each host feeds its local shard of the global batch via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Connects this host to the job.  No-ops for single-process runs.

    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU metadata when present.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        log.info("single-process run; jax.distributed not initialized")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    log.info("jax.distributed initialized: process %d/%d, %d local / %d "
             "global devices", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh,
                               ) -> Dict[str, jax.Array]:
    """Assembles per-host numpy shards into global sharded jax.Arrays.

    Each host loads ``global_batch / process_count`` examples; this stitches
    them into one logical array sharded over the mesh's ``data`` axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return {k: put(np.asarray(v)) for k, v in batch.items()}
