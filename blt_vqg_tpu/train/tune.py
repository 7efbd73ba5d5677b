"""Hyperparameter search with ASHA successive halving.

Replaces the reference's Ray Tune setup (reference train_iq_ray.py:309-384:
ASHAScheduler(max_t=total_steps, grace_period=pretrain_steps), 4 samples,
metric=val_loss/min, search over dims/layers/heads/lr/batch) with a
dependency-free scheduler that runs trials sequentially on this host's
accelerator or fans them out one-per-TPU-slice via a subprocess launcher.

ASHA here: rungs at grace·eta^k steps; when a trial reaches a rung, it
continues only if its metric is within the top 1/eta of completed metrics at
that rung.  Trials checkpoint through the normal CheckpointManager, so a
promoted trial resumes rather than restarts.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
import os
import random
from typing import Callable, Dict, List, Optional, Sequence

log = logging.getLogger(__name__)


# --------------------------------------------------------------- search space
@dataclasses.dataclass
class Choice:
    name: str
    values: Sequence


@dataclasses.dataclass
class LogUniform:
    name: str
    low: float
    high: float


def default_search_space():
    """The reference's space (train_iq_ray.py:343-354)."""
    return [
        Choice("hidden_dim", [256, 512, 1024]),
        Choice("latent_dim", [256, 512, 1024]),
        Choice("pwffn_dim", [512, 1024, 2048]),
        Choice("num_layers", [4, 6]),
        Choice("num_heads", [4, 8]),
        LogUniform("lr", 1e-5, 1e-3),
        Choice("batch_size", [32, 64, 128]),
    ]


def tiny_search_space():
    """Smoke-test space: same dimensions, toy sizes."""
    return [
        Choice("hidden_dim", [16, 32]),
        Choice("latent_dim", [8, 16]),
        Choice("pwffn_dim", [16, 32]),
        Choice("num_layers", [1]),
        Choice("num_heads", [2]),
        LogUniform("lr", 1e-4, 1e-3),
        Choice("batch_size", [8]),
    ]


def sample_config(base_cfg, space, rng: random.Random):
    overrides = {}
    for dim in space:
        if isinstance(dim, Choice):
            overrides[dim.name] = rng.choice(list(dim.values))
        else:
            lo, hi = math.log(dim.low), math.log(dim.high)
            overrides[dim.name] = math.exp(rng.uniform(lo, hi))
    return base_cfg.replace(**overrides), overrides


# --------------------------------------------------------------------- ASHA
class ASHAScheduler:
    """Asynchronous successive halving over (trial, rung) reports."""

    def __init__(self, grace_period: int, max_t: int, eta: int = 3,
                 mode: str = "min"):
        self.eta = eta
        self.mode = mode
        self.rungs: List[int] = []
        t = grace_period
        while t < max_t:
            self.rungs.append(int(t))
            t *= eta
        self.rungs.append(int(max_t))
        self._results: Dict[int, List[float]] = {r: [] for r in self.rungs}

    def next_rung(self, step: int) -> Optional[int]:
        for r in self.rungs:
            if step < r:
                return r
        return None

    def report(self, rung: int, value: float) -> bool:
        """Records value at rung; returns True if the trial should continue."""
        sign = 1.0 if self.mode == "min" else -1.0
        self._results[rung].append(sign * value)
        scores = sorted(self._results[rung])
        k = max(1, len(scores) // self.eta)
        return sign * value <= scores[k - 1]


# -------------------------------------------------------------------- runner
def run_tune(base_cfg, train_trial_fn: Callable, num_samples: int = 4,
             space=None, seed: int = 0, output_dir: str = "runs/tune",
             eta: int = 3) -> Dict:
    """Sequential ASHA driver.

    ``train_trial_fn(cfg, trial_dir, stop_at_step) -> val_loss`` trains (or
    resumes) one trial up to ``stop_at_step`` and returns its current metric
    — the caller wires this to Trainer.fit + validate.
    """
    space = space or default_search_space()
    rng = random.Random(seed)
    os.makedirs(output_dir, exist_ok=True)
    sched = ASHAScheduler(grace_period=base_cfg.num_pretraining_steps,
                          max_t=base_cfg.total_training_steps, eta=eta)

    trials = []
    for t in range(num_samples):
        cfg, overrides = sample_config(base_cfg, space, rng)
        trial_dir = os.path.join(output_dir, f"trial_{t}")
        cfg = cfg.replace(output_dir=trial_dir)
        trials.append({"id": t, "cfg": cfg, "overrides": overrides,
                       "step": 0, "alive": True, "metric": None})
        with open(os.path.join(output_dir, f"trial_{t}.json"), "w") as f:
            json.dump(overrides, f, indent=2, default=str)

    # round-robin trials through rungs (async halving, sequential execution)
    progressing = True
    while progressing:
        progressing = False
        for tr in trials:
            if not tr["alive"]:
                continue
            rung = sched.next_rung(tr["step"])
            if rung is None:
                tr["alive"] = False
                continue
            log.info("trial %d: training to rung %d (%s)", tr["id"], rung,
                     tr["overrides"])
            metric = train_trial_fn(tr["cfg"],
                                    os.path.join(output_dir,
                                                 f"trial_{tr['id']}"),
                                    stop_at_step=rung)
            tr["step"] = rung
            tr["metric"] = metric
            progressing = True
            if not sched.report(rung, metric):
                log.info("trial %d stopped at rung %d (metric %.4f)",
                         tr["id"], rung, metric)
                tr["alive"] = False

    best = min((t for t in trials if t["metric"] is not None),
               key=lambda t: t["metric"])
    result = {"best_trial": best["id"], "best_metric": best["metric"],
              "best_config": best["overrides"],
              "trials": [{k: t[k] for k in ("id", "overrides", "step",
                                            "metric")} for t in trials]}
    with open(os.path.join(output_dir, "analysis.json"), "w") as f:
        json.dump(result, f, indent=2, default=str)
    log.info("best config: %s", best["overrides"])
    return result
