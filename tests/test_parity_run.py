"""Regression test over the reference-vs-rebuild parity harness
(benchmarks/parity_run.py): trains the actual reference torch stack and
this stack in lockstep for a few steps with mapped weights and shared
batches, and asserts the pretrain loss curves coincide.

This is the system-level counterpart of tests/test_reference_parity.py's
module goldens: it pins forward + loss assembly + LR schedule + Adam +
clipping + BN-stats updates of the WHOLE training step against the
reference implementation.  The full 500-step report lives in
benchmarks/parity_run.md.
"""

import json
import os
import sys

import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.e2e
class TestTrainingSystemParity:
    def test_lockstep_losses_match(self, tmp_path):
        from benchmarks.parity_run import main as parity_main
        out_json = str(tmp_path / "parity.json")
        parity_main(["--pretrain-steps", "6", "--latent-steps", "4",
                     "--batch", "8", "--hidden", "32",
                     "--out", str(tmp_path / "parity.md"),
                     "--json-out", out_json])
        with open(out_json) as f:
            r = json.load(f)
        # deterministic phase: per-step losses equal to float tolerance
        assert r["pretrain_max_abs_loss_delta"] < 1e-3, r
        # latent phase runs and produces finite, same-scale losses
        t = r["curves"]["torch"][-1]["loss"]
        j = r["curves"]["jax"][-1]["loss"]
        assert abs(t - j) / max(abs(t), 1.0) < 0.25, (t, j)
        # first latent step: same params, kld independent of eps → equal
        t0 = r["curves"]["torch"][6]["kld"]
        j0 = r["curves"]["jax"][6]["kld"]
        assert abs(t0 - j0) < 1e-4, (t0, j0)
