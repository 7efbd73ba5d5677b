"""Step-based checkpointing (save/restore of the full TrainState).

Capability-parity with the reference's ``CheckpointEveryNSteps`` Lightning
callback (reference train_iq.py:275-309: full checkpoint every N steps named
``{prefix}_epoch_global_step.ckpt``) plus resume.  Storage is a flat
numpy-npz archive per step (dependency-free, byte-stable across JAX
versions; an Orbax backend is deliberately not used — the state is a small
flat pytree and npz keeps restore template-driven and sharding-agnostic):

- saves params + batch_stats + opt_state + step + kliter + the Config JSON
  sidecar (the reference's args.json, old_train_iq.py:287-288);
- step-numbered directories, ``latest_step`` discovery, retention of the
  most recent K checkpoints;
- restore onto an existing TrainState template (shardings preserved by
  device_put after restore).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np

from blt_vqg_tpu.core.config import Config

_STEP_RE = re.compile(r"^step_(\d+)$")


def _flatten(tree: Any, prefix: str = ""):
    """Flattens a pytree of arrays into {path: ndarray}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[prefix + key] = np.asarray(leaf)
    return flat


def _unflatten_into(template: Any, flat: dict, prefix: str = ""):
    """Fills a pytree shaped like ``template`` from {path: ndarray}."""
    paths = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths[0]:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = flat[key]
        leaves.append(np.asarray(arr).astype(leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(paths[1], leaves)


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = directory
        self.keep = keep
        self._writer = None  # in-flight async write thread
        os.makedirs(directory, exist_ok=True)

    # -- paths ----------------------------------------------------------
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and os.path.exists(
                    os.path.join(self.directory, name, "state.npz")):
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save / restore -------------------------------------------------
    def save(self, state, cfg: Optional[Config] = None,
             extra: Optional[dict] = None, block: bool = True) -> str:
        """Saves a checkpoint.  With ``block=False`` the device→host
        snapshot happens now (donation-safe: buffers may be reused the
        moment this returns) but file IO runs on a background thread —
        the train loop resumes while bytes hit disk."""
        self.wait()  # one async write in flight at a time
        step = int(state.step)
        path = self._step_dir(step)
        flat = {}
        flat.update(_flatten(state.params, "params/"))
        flat.update(_flatten(state.batch_stats, "batch_stats/"))
        flat.update(_flatten(state.opt_state, "opt_state/"))
        flat["__step__"] = np.asarray(int(state.step))
        flat["__kliter__"] = np.asarray(int(state.kliter))
        cfg_json = cfg.to_json() if cfg is not None else None
        extra_json = json.dumps(extra) if extra else None

        def write():
            tmp = path + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            np.savez(os.path.join(tmp, "state.npz"), **flat)
            if cfg_json is not None:
                with open(os.path.join(tmp, "args.json"), "w") as f:
                    f.write(cfg_json)
            if extra_json is not None:
                with open(os.path.join(tmp, "extra.json"), "w") as f:
                    f.write(extra_json)
            if os.path.exists(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
            self._gc()

        if block:
            write()
        else:
            import threading
            self._writer = threading.Thread(target=write, daemon=False)
            self._writer.start()
        return path

    def wait(self) -> None:
        """Joins any in-flight async write."""
        if self._writer is not None:
            self._writer.join()
            self._writer = None

    def restore(self, state, step: Optional[int] = None):
        """Returns a new TrainState filled from disk (template = ``state``)."""
        self.wait()
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        with np.load(os.path.join(self._step_dir(step), "state.npz"),
                     allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
        params = _unflatten_into(state.params, flat, "params/")
        batch_stats = _unflatten_into(state.batch_stats, flat, "batch_stats/")
        opt_state = _unflatten_into(state.opt_state, flat, "opt_state/")
        return state.replace(
            step=jax.numpy.asarray(int(flat["__step__"]), jax.numpy.int32),
            kliter=jax.numpy.asarray(int(flat["__kliter__"]), jax.numpy.int32),
            params=params, batch_stats=batch_stats, opt_state=opt_state)

    def _gc(self):
        steps = self.all_steps()
        for step in steps[:-self.keep]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)
