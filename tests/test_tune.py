"""ASHA tune-runner tests with a fake trial function (no model)."""

import json
import os

import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.train.tune import (ASHAScheduler, default_search_space,
                                    run_tune, sample_config)


class TestASHAScheduler:
    def test_rungs_geometric(self):
        s = ASHAScheduler(grace_period=100, max_t=1000, eta=3)
        assert s.rungs == [100, 300, 900, 1000]

    def test_top_third_survives(self):
        s = ASHAScheduler(grace_period=10, max_t=100, eta=3)
        # nine results at rung 10: only values in the best third continue
        outcomes = [s.report(10, float(v)) for v in range(9)]
        # the k-th best threshold moves as results stream in (async ASHA):
        # the first result always continues; late bad results don't
        assert outcomes[0] is True
        assert outcomes[-1] is False

    def test_next_rung(self):
        s = ASHAScheduler(grace_period=10, max_t=100, eta=3)
        assert s.next_rung(0) == 10
        assert s.next_rung(10) == 30
        assert s.next_rung(95) == 100
        assert s.next_rung(100) is None


class TestSampleConfig:
    def test_overrides_within_space(self):
        import random
        cfg, overrides = sample_config(Config(), default_search_space(),
                                       random.Random(0))
        assert cfg.hidden_dim in (256, 512, 1024)
        assert 1e-5 <= cfg.lr <= 1e-3
        assert set(overrides) == {"hidden_dim", "latent_dim", "pwffn_dim",
                                  "num_layers", "num_heads", "lr",
                                  "batch_size"}


class TestRunTune:
    def test_best_trial_selected_and_resumable(self, tmp_path):
        base = Config(num_pretraining_steps=10, total_training_steps=30)
        calls = []

        def fake_trial(cfg, trial_dir, stop_at_step):
            calls.append((trial_dir, stop_at_step))
            # trial quality keyed off the sampled lr: lower lr -> lower loss
            return float(cfg.lr)

        result = run_tune(base, fake_trial, num_samples=3, seed=0,
                          output_dir=str(tmp_path), eta=3)
        assert result["best_trial"] in (0, 1, 2)
        # every trial got at least its grace-period run
        assert len({c[0] for c in calls}) == 3
        # trials resume (stop_at_step grows monotonically per trial)
        per_trial = {}
        for d, s in calls:
            per_trial.setdefault(d, []).append(s)
        for steps in per_trial.values():
            assert steps == sorted(steps)
        # artifacts
        assert os.path.exists(os.path.join(str(tmp_path), "analysis.json"))
        best = json.load(open(os.path.join(str(tmp_path), "analysis.json")))
        assert best["best_metric"] == min(
            t["metric"] for t in best["trials"] if t["metric"] is not None)


class TestRunTuneParallel:
    """Concurrent launcher driven by a fake trial *binary* (no model, no
    JAX in children): asserts real process overlap and that promotions
    match the sequential oracle (reference train_iq_ray.py:365-382 runs 4
    concurrent Ray actors)."""

    FAKE_TRIAL = r"""
import json, os, sys, time
trial_dir, rung = sys.argv[1], int(sys.argv[2])
tid = int(trial_dir.rstrip("/").split("_")[-1])
with open(os.path.join(trial_dir, f"start_{rung}"), "w") as f:
    f.write(repr(time.time()))
time.sleep(0.3 + 0.15 * tid)   # id-staggered: deterministic arrival order
with open(os.path.join(trial_dir, f"result_{rung}.json"), "w") as f:
    json.dump({"metric": float(tid), "step": rung}, f)
with open(os.path.join(trial_dir, f"end_{rung}"), "w") as f:
    f.write(repr(time.time()))
"""

    def _parallel_run(self, tmp_path, num_samples=4, max_concurrent=4):
        import sys
        from blt_vqg_tpu.train.tune import run_tune_parallel
        script = tmp_path / "fake_trial.py"
        script.write_text(self.FAKE_TRIAL)
        base = Config(num_pretraining_steps=2, total_training_steps=18)

        def trial_argv_fn(cfg, trial_dir, stop_at_step):
            return [sys.executable, "-S", str(script), trial_dir,
                    str(stop_at_step)]

        out_dir = str(tmp_path / "tune")
        result = run_tune_parallel(base, trial_argv_fn,
                                   num_samples=num_samples,
                                   max_concurrent=max_concurrent,
                                   seed=0, output_dir=out_dir,
                                   poll_interval=0.05)
        return result, out_dir

    def test_trials_overlap_and_match_sequential_oracle(self, tmp_path):
        result, out_dir = self._parallel_run(tmp_path)

        # --- ≥2 children genuinely ran concurrently
        intervals = []
        for t in range(4):
            tdir = os.path.join(out_dir, f"trial_{t}")
            for name in os.listdir(tdir):
                if name.startswith("start_"):
                    rung = name.split("_")[1]
                    start = float(open(os.path.join(tdir, name)).read())
                    end = float(open(os.path.join(tdir, f"end_{rung}")).read())
                    intervals.append((start, end))
        overlaps = sum(1 for i, (s1, e1) in enumerate(intervals)
                       for (s2, e2) in intervals[i + 1:]
                       if s1 < e2 and s2 < e1)
        assert overlaps >= 1, intervals

        # --- promotions match the sequential oracle (same seed, same
        # metric function, id-ordered arrivals)
        oracle = run_tune(Config(num_pretraining_steps=2,
                                 total_training_steps=18),
                          lambda cfg, trial_dir, stop_at_step:
                          float(trial_dir.rstrip("/").split("_")[-1]),
                          num_samples=4, seed=0,
                          output_dir=str(tmp_path / "oracle"))
        assert result["best_trial"] == oracle["best_trial"]
        par = {t["id"]: (t["step"], t["metric"]) for t in result["trials"]}
        seq = {t["id"]: (t["step"], t["metric"]) for t in oracle["trials"]}
        assert par == seq

    def test_slot_envs_route_children(self, tmp_path):
        """Each concurrent slot's env overrides reach its children — the
        per-slot TPU-slice routing used by `cli.tune --slot-env`."""
        import sys
        from blt_vqg_tpu.train.tune import run_tune_parallel
        script = tmp_path / "env_trial.py"
        script.write_text(self.FAKE_TRIAL.replace(
            'json.dump({"metric": float(tid), "step": rung}, f)',
            'json.dump({"metric": float(tid), "step": rung, '
            '"slice": os.environ.get("FAKE_SLICE")}, f)'))
        base = Config(num_pretraining_steps=2, total_training_steps=6)

        def trial_argv_fn(cfg, trial_dir, stop_at_step):
            return [sys.executable, "-S", str(script), trial_dir,
                    str(stop_at_step)]

        out_dir = str(tmp_path / "tune")
        run_tune_parallel(
            base, trial_argv_fn, num_samples=2, max_concurrent=2, seed=0,
            output_dir=out_dir, poll_interval=0.05,
            slot_envs=[{"FAKE_SLICE": "s0"}, {"FAKE_SLICE": "s1"}])
        seen = set()
        for t in range(2):
            tdir = os.path.join(out_dir, f"trial_{t}")
            for name in os.listdir(tdir):
                if name.startswith("result_"):
                    with open(os.path.join(tdir, name)) as f:
                        seen.add(json.load(f)["slice"])
        assert seen == {"s0", "s1"}

    def test_slot_env_out_of_range_rejected(self):
        """A typo'd --slot-env slot index (>= --parallel) is a parse error,
        not a silent modulo-wrap onto another slot (ADVICE round-2 fix)."""
        import pytest
        from blt_vqg_tpu.cli.tune import main
        with pytest.raises(SystemExit) as e:
            main(["--parallel", "2", "--slot-env", "4:FAKE=x",
                  "--tune-space", "tiny"])
        assert e.value.code == 2  # argparse parser.error

    def test_failed_child_kills_trial(self, tmp_path):
        import sys
        from blt_vqg_tpu.train.tune import run_tune_parallel
        script = tmp_path / "fail_trial.py"
        script.write_text(self.FAKE_TRIAL.replace(
            "time.sleep(0.3 + 0.15 * tid)",
            "time.sleep(0.1)\nif tid == 1: sys.exit(3)"))
        base = Config(num_pretraining_steps=2, total_training_steps=6)

        def trial_argv_fn(cfg, trial_dir, stop_at_step):
            return [sys.executable, "-S", str(script), trial_dir,
                    str(stop_at_step)]

        result = run_tune_parallel(
            base, trial_argv_fn, num_samples=3, max_concurrent=3, seed=0,
            output_dir=str(tmp_path / "tune"), poll_interval=0.05)
        by_id = {t["id"]: t for t in result["trials"]}
        assert by_id[1]["metric"] is None       # crashed before reporting
        assert by_id[0]["metric"] is not None   # others unaffected


class TestRngStream:
    def test_deterministic_across_instances(self):
        import numpy as np
        import jax
        from blt_vqg_tpu.core.rng import RngStream
        a = RngStream(7).key(42)
        b = RngStream(7).key(42)
        np.testing.assert_array_equal(jax.random.key_data(a),
                                      jax.random.key_data(b))

    def test_named_streams_independent(self):
        import jax
        import numpy as np
        from blt_vqg_tpu.core.rng import RngStream
        keys = RngStream(0).step_keys(3, "dropout", "latent")
        assert set(keys) == {"dropout", "latent"}
        assert not np.array_equal(jax.random.key_data(keys["dropout"]),
                                  jax.random.key_data(keys["latent"]))

    def test_step_separation(self):
        import jax
        import numpy as np
        from blt_vqg_tpu.core.rng import RngStream
        s = RngStream(0)
        assert not np.array_equal(jax.random.key_data(s.key(1)),
                                  jax.random.key_data(s.key(2)))


class TestOpenDataset:
    def test_sniffs_packed_dir_and_hdf5_file(self, tmp_path):
        """cli.tune trials accept BOTH dataset formats (same sniffing as
        cli.train_iq): a packed directory and a reference-schema hdf5."""
        import numpy as np

        from blt_vqg_tpu.cli.tune import open_dataset
        from blt_vqg_tpu.data.dataset import IQDataset
        from blt_vqg_tpu.data.packed import PackedDataset, pack_hdf5
        from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
        from blt_vqg_tpu.text.vocabulary import Vocabulary

        vocab = Vocabulary()
        for i in range(40 - len(vocab)):
            vocab.add_word(f"w{i}")
        h5 = str(tmp_path / "d.hdf5")
        write_synthetic_hdf5(h5, num_questions=16, num_images=4, im_size=16,
                             vocab_size=40, uint8_images=True)
        packed_dir = pack_hdf5(h5, str(tmp_path / "packed"))

        ds_h5 = open_dataset(h5, vocab, max_examples=8)
        ds_pk = open_dataset(packed_dir, vocab, max_examples=8)
        assert isinstance(ds_h5, IQDataset)
        assert isinstance(ds_pk, PackedDataset)
        assert len(ds_h5) == len(ds_pk) == 8
        a, b = ds_h5.batch(np.arange(4)), ds_pk.batch(np.arange(4))
        np.testing.assert_array_equal(a["questions"], b["questions"])
