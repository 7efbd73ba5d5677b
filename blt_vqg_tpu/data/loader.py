"""Host→HBM input pipeline with double-buffered prefetch.

The reference feeds the GPU from 8 torch DataLoader worker processes with
``.cuda()`` copies inside the training step (reference train_iq.py:25,
366-369, 68-70).  TPU-native replacement: a background thread assembles
numpy batches from hdf5 (token surgery vectorized, data/dataset.py), ships
them to device memory with ``jax.device_put`` against the mesh's data
sharding, and keeps ``prefetch_depth`` batches in flight so the host never
blocks the TPU step.  Augmentation runs on device (data/augment.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blt_vqg_tpu.data.dataset import IQDataset, example_from_row


class Prefetcher:
    """Wraps a host-batch iterator; overlaps device_put with compute.

    ``multihost=True`` (default: auto, when ``jax.process_count() > 1``)
    assembles each host's local shard into one global jax.Array via
    ``jax.make_array_from_process_local_data`` (core/distributed.py) — the
    TPU-native counterpart of the reference's DDP per-rank loaders
    (reference train_iq.py:366-373)."""

    def __init__(self, it: Iterator[Dict[str, np.ndarray]],
                 mesh: Optional[Mesh] = None, depth: int = 2,
                 multihost: Optional[bool] = None):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._mesh = mesh
        self._multihost = (jax.process_count() > 1 if multihost is None
                           else multihost)
        self._thread = threading.Thread(
            target=self._run, args=(it,), daemon=True)
        self._thread.start()

    def _put_device(self, batch: Dict[str, np.ndarray]):
        if self._mesh is None:
            return jax.tree.map(jax.device_put, batch)
        if self._multihost:
            from blt_vqg_tpu.core.distributed import host_local_batch_to_global
            return host_local_batch_to_global(batch, self._mesh)
        def put(x):
            spec = P("data", *([None] * (np.ndim(x) - 1)))
            return jax.device_put(x, NamedSharding(self._mesh, spec))
        return jax.tree.map(put, batch)

    def _run(self, it):
        try:
            for batch in it:
                self._q.put(self._put_device(batch))
            self._q.put(None)
        except BaseException as e:  # surface worker failures to the consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


def _host_batches(dataset: IQDataset, batch_size: int, input_mode: str,
                  shuffle: bool, seed: int, drop_remainder: bool,
                  epochs: Optional[int],
                  sample_weights: Optional[np.ndarray] = None,
                  process_index: int = 0, process_count: int = 1
                  ) -> Iterator[Dict[str, np.ndarray]]:
    """Yields batches of ``batch_size`` examples.  In a multihost job
    (``process_count > 1``) every host draws the identical global permutation
    (same seed) and loads only its ``batch_size / process_count`` slice of
    each global batch — the Prefetcher reassembles the global array."""
    n = len(dataset)
    local_bs = batch_size // max(process_count, 1)
    lo = process_index * local_bs
    epoch = 0
    while epochs is None or epoch < epochs:
        if sample_weights is not None:
            # weighted sampling with replacement (the lax equivalent of the
            # reference's WeightedRandomSampler, old_train_iq.py:316-327)
            p = np.asarray(sample_weights, np.float64)
            p = p / p.sum()
            order = np.random.RandomState(seed + epoch).choice(
                n, size=n, replace=True, p=p)
        else:
            order = np.arange(n)
            if shuffle:
                np.random.RandomState(seed + epoch).shuffle(order)
        stop = n - (n % batch_size) if drop_remainder else n
        for start in range(0, stop, batch_size):
            idx = order[start:start + batch_size][lo:lo + local_bs]
            raw = dataset.batch(idx)
            batch = example_from_row(raw, input_mode)
            batch["image_ids"] = raw["image_ids"]
            batch["answer_types"] = raw["answer_types"]
            yield batch
        epoch += 1


def make_loader(dataset: IQDataset, batch_size: int, input_mode: str = "ans",
                shuffle: bool = True, seed: int = 0,
                drop_remainder: bool = True, epochs: Optional[int] = None,
                mesh: Optional[Mesh] = None, prefetch_depth: int = 2,
                device: bool = True,
                sample_weights: Optional[np.ndarray] = None,
                multihost: Optional[bool] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (epochs=None) or bounded stream of model-ready batches.

    ``sample_weights`` enables weighted sampling with replacement (per-class
    rebalancing — reference WeightedRandomSampler capability).

    ``batch_size`` is always the GLOBAL batch.  In a multihost job each host
    loads its ``batch_size / process_count`` slice and the batches yielded
    are globally-sharded jax.Arrays (see Prefetcher).  ``multihost`` forces
    the assembly path on/off (default: auto from ``jax.process_count()``).
    """
    multihost_on = (jax.process_count() > 1 if multihost is None
                    else multihost)
    it = _host_batches(dataset, batch_size, input_mode, shuffle, seed,
                       drop_remainder, epochs, sample_weights,
                       process_index=jax.process_index() if multihost_on else 0,
                       process_count=jax.process_count() if multihost_on else 1)
    if not device:
        return it
    return Prefetcher(it, mesh=mesh, depth=prefetch_depth,
                      multihost=multihost_on)
