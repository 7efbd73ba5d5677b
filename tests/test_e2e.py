"""End-to-end train smoke on CPU devices (SURVEY.md §4 plan): synthetic
hdf5 → Trainer.fit across the phase boundary → checkpoint → resume."""

import os

import jax
import numpy as np
import pytest

from blt_vqg_tpu.core.config import Config
from blt_vqg_tpu.data.dataset import IQDataset
from blt_vqg_tpu.data.loader import make_loader
from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
from blt_vqg_tpu.text.vocabulary import Vocabulary
from blt_vqg_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    h5 = write_synthetic_hdf5(str(root / "train.hdf5"), num_questions=32,
                              num_images=4, im_size=24, vocab_size=40)
    vocab = Vocabulary()
    for i in range(40 - len(vocab)):
        vocab.add_word(f"w{i}")
    cfg = Config(
        emb_dim=8, hidden_dim=16, latent_dim=12, pwffn_dim=32,
        num_layers=1, num_heads=2, batch_size=8, image_size=24,
        max_q_length=10, max_decode_length=6,
        num_pretraining_steps=2, total_training_steps=6, full_kl_step=3,
        val_check_interval=100, checkpoint_every=3,
        dtype="float32", output_dir=str(root / "run"))
    return cfg, vocab, h5


@pytest.mark.e2e
class TestEndToEnd:
    def test_fit_across_phase_boundary_and_resume(self, setup):
        cfg, vocab, h5 = setup
        ds = IQDataset(h5, vocab)
        trainer = Trainer(cfg, vocab)
        train_iter = make_loader(ds, cfg.batch_size, "ans", seed=0)
        first = next(train_iter)
        state = trainer.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=False)
        state = trainer.fit(
            state, train_iter,
            lambda: make_loader(ds, cfg.batch_size, "ans", epochs=1,
                                shuffle=False))
        assert int(state.step) == cfg.total_training_steps
        assert int(state.kliter) == (cfg.total_training_steps
                                     - cfg.num_pretraining_steps)
        # checkpoints written
        assert trainer.ckpt.latest_step() == cfg.total_training_steps

        # resume restores counters and params exactly
        trainer2 = Trainer(cfg, vocab)
        state2 = trainer2.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=True)
        assert int(state2.step) == cfg.total_training_steps
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_with_multi_step_dispatch(self, setup, tmp_path):
        """steps_per_dispatch=2: chunks align to the phase boundary and
        checkpoint cadence; counters land exactly on total_training_steps."""
        cfg, vocab, h5 = setup
        cfg = cfg.replace(steps_per_dispatch=2,
                          output_dir=str(tmp_path / "multi"))
        ds = IQDataset(h5, vocab)
        trainer = Trainer(cfg, vocab)
        assert trainer._multi_steps is not None
        train_iter = make_loader(ds, cfg.batch_size, "ans", seed=0)
        first = next(train_iter)
        state = trainer.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=False)
        state = trainer.fit(
            state, train_iter,
            lambda: make_loader(ds, cfg.batch_size, "ans", epochs=1,
                                shuffle=False))
        assert int(state.step) == cfg.total_training_steps
        assert int(state.kliter) == (cfg.total_training_steps
                                     - cfg.num_pretraining_steps)
        assert trainer.ckpt.latest_step() == cfg.total_training_steps

    def test_validate_produces_metrics_and_decode(self, setup, capsys):
        cfg, vocab, h5 = setup
        ds = IQDataset(h5, vocab)
        trainer = Trainer(cfg, vocab)
        val_iter = make_loader(ds, cfg.batch_size, "ans", epochs=1,
                               shuffle=False)
        first = next(make_loader(ds, cfg.batch_size, "ans", epochs=1,
                                 device=False))
        state = trainer.init_state(
            {k: np.asarray(first[k]) for k in
             ("images", "context", "posterior", "target")}, resume=True)
        out = trainer.validate(state, val_iter, latent=True,
                               step=int(state.step), print_samples=2)
        assert np.isfinite(out["loss"])
        assert any(k.startswith("nlg_") for k in out)
        printed = capsys.readouterr().out
        assert "Generated:" in printed and "Reference:" in printed


@pytest.mark.e2e
class TestProfiler:
    def test_profile_dir_produces_trace(self, setup, tmp_path):
        """Trainer(profile_dir=...) wraps fit in jax.profiler
        start/stop_trace (SURVEY.md §5 tracing plan — the reference has no
        profiler at all): trace artifacts must land in the directory."""
        cfg, vocab, h5 = setup
        cfg = cfg.replace(output_dir=str(tmp_path / "run"),
                          total_training_steps=3, num_pretraining_steps=2,
                          checkpoint_every=100, checkpoint_at_end=False)
        ds = IQDataset(h5, vocab)
        prof = tmp_path / "trace"
        trainer = Trainer(cfg, vocab, profile_dir=str(prof))
        train_iter = make_loader(ds, cfg.batch_size, "ans", seed=0)
        first = next(train_iter)
        state = trainer.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=False)
        trainer.fit(state, train_iter,
                    lambda: make_loader(ds, cfg.batch_size, "ans", epochs=1,
                                        shuffle=False))
        traced = [os.path.join(r, f) for r, _, fs in os.walk(prof)
                  for f in fs]
        assert traced, "no profiler artifacts written"


class TestCheckpointDtypeWiring:
    def test_checkpoint_param_dtype_cfg_wiring(self, setup, tmp_path):
        """cfg.checkpoint_param_dtype='bfloat16' flows through the Trainer's
        save path (_disk_dtype → ckpt.save on_disk_param_dtype): the on-disk
        float params are bf16, restore upcasts to the template dtype, and a
        resumed Trainer trains on."""
        cfg, vocab, h5 = setup
        cfg = cfg.replace(output_dir=str(tmp_path / "run_bf16ckpt"),
                          checkpoint_param_dtype="bfloat16",
                          total_training_steps=3,
                          num_pretraining_steps=2, checkpoint_every=100)
        ds = IQDataset(h5, vocab)
        trainer = Trainer(cfg, vocab)
        it = make_loader(ds, cfg.batch_size, "ans", seed=0)
        first = next(it)
        state = trainer.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=False)
        state = trainer.fit(state, it, None)

        # on-disk float params are bf16: npz stores non-native dtypes as
        # void bytes with their true dtype under __dtype__/<key>
        import glob as _glob
        stores = sorted(_glob.glob(os.path.join(
            cfg.output_dir, "checkpoints", "*", "*.npz")))
        assert stores, "no checkpoint store written"
        with np.load(stores[-1]) as z:
            recorded = {str(z[k]) for k in z.files
                        if k.startswith("__dtype__/")
                        and "/params/" in k}
        assert recorded == {"bfloat16"}, recorded

        # restore upcasts to the template dtype and training continues
        trainer2 = Trainer(cfg.replace(total_training_steps=4), vocab)
        state2 = trainer2.init_state(
            {k: first[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=True)
        assert int(state2.step) == 3
        leaf = jax.tree_util.tree_leaves(state2.params)[0]
        assert leaf.dtype.name == "float32", leaf.dtype
        state2 = trainer2.fit(state2, it, None)
        assert int(state2.step) == 4
