"""Data-layer tests: token surgery, hdf5 round-trip, loader, augmentation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blt_vqg_tpu.data.dataset import (
    IQDataset, _drop_first_token, _insert_at_1, example_from_row)
from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
from blt_vqg_tpu.data.loader import make_loader
from blt_vqg_tpu.data.augment import make_augment_fn, normalize_images
from blt_vqg_tpu.text.vocabulary import Vocabulary


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "synth.hdf5"
    write_synthetic_hdf5(str(p), num_questions=32, num_images=6, im_size=32,
                         vocab_size=40)
    vocab = Vocabulary()
    for i in range(40 - len(vocab)):
        vocab.add_word(f"w{i}")
    return str(p), vocab


class TestSurgery:
    def test_drop_first_token(self):
        rows = np.array([[1, 7, 3, 0], [1, 3, 3, 0], [1, 7, 8, 9]])
        out = _drop_first_token(rows, 3)
        np.testing.assert_array_equal(
            out, [[1, 7, 0, 0], [1, 3, 0, 0], [1, 7, 8, 9]])

    def test_insert_at_1(self):
        rows = np.array([[1, 7, 3]])
        out = _insert_at_1(rows, np.array([42]))
        np.testing.assert_array_equal(out, [[1, 42, 7, 3]])


class TestIQDataset:
    def test_batch_schema(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        b = ds.batch(np.arange(8))
        assert b["questions"].shape == (8, 20)
        assert b["posteriors"].shape == (8, 21)   # +1 for inserted type
        assert b["answers"].shape == (8, 5)       # 4 + 1
        assert b["answer_types_for_input"].shape == (8, 3)
        assert b["images"].shape[0] == 8
        # posterior starts with <pos>
        assert np.all(b["posteriors"][:, 0] == 5)
        # answer_type_for_input = [<start>, cat, <end>]
        assert np.all(b["answer_types_for_input"][:, 0] == 1)
        assert np.all(b["answer_types_for_input"][:, 2] == 3)

    def test_posterior_drops_end_token(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        b = ds.batch(np.arange(16))
        assert not np.any(b["posteriors"] == 3), "<end> must be removed"

    def test_example_mapping(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        raw = ds.batch(np.arange(4))
        m_ans = example_from_row(raw, "ans")
        np.testing.assert_array_equal(m_ans["context"], raw["answers"])
        m_cat = example_from_row(raw, "cat")
        np.testing.assert_array_equal(m_cat["context"],
                                      raw["answer_types_for_input"])
        np.testing.assert_array_equal(m_cat["target"], raw["questions"])


class TestLoader:
    def test_epoch_boundaries_and_shapes(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        batches = list(make_loader(ds, 8, "ans", shuffle=True, epochs=2,
                                   device=False))
        assert len(batches) == 8  # 32/8 * 2 epochs
        for b in batches:
            assert b["context"].shape == (8, 5)

    def test_shuffle_is_seeded(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        a = next(iter(make_loader(ds, 8, "ans", seed=1, epochs=1,
                                  device=False)))
        b = next(iter(make_loader(ds, 8, "ans", seed=1, epochs=1,
                                  device=False)))
        np.testing.assert_array_equal(a["target"], b["target"])

    def test_prefetcher_delivers_device_arrays(self, synth):
        path, vocab = synth
        ds = IQDataset(path, vocab)
        it = make_loader(ds, 8, "ans", epochs=1)
        batch = next(it)
        assert isinstance(batch["target"], jax.Array)


class TestAugment:
    def test_train_shapes_and_normalization(self):
        aug = make_augment_fn(out_size=16, train=True)
        imgs = jnp.full((4, 24, 24, 3), 128.0)  # raw 0..255 floats
        out = aug(imgs, jax.random.key(0))
        assert out.shape == (4, 16, 16, 3)
        # 128/255 ≈ 0.502 → normalized ≈ (0.502-mean)/std, channel 0 ≈ 0.073
        np.testing.assert_allclose(np.asarray(out[..., 0]).mean(), 0.073,
                                   atol=0.05)

    def test_uint8_input(self):
        aug = make_augment_fn(out_size=16, train=False)
        imgs = jnp.full((2, 16, 16, 3), 255, dtype=jnp.uint8)
        out = aug(imgs, jax.random.key(0))
        np.testing.assert_allclose(
            np.asarray(out[..., 0]), (1.0 - 0.485) / 0.229, atol=1e-3)

    def test_eval_is_deterministic(self):
        aug = make_augment_fn(out_size=16, train=False)
        imgs = jax.random.uniform(jax.random.key(1), (2, 20, 20, 3)) * 255
        a = aug(imgs, jax.random.key(0))
        b = aug(imgs, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_identity_box_reproduces_image(self):
        """A full-image crop box at equal in/out size must be (near-)identity
        — catches off-by-half-pixel errors in the bilinear sampler."""
        from blt_vqg_tpu.data.augment import _batched_crop_resize
        img = jax.random.uniform(jax.random.key(3), (2, 16, 16, 3))
        out = _batched_crop_resize(
            img, jnp.zeros((2,)), jnp.zeros((2,)),
            jnp.full((2,), 16.0), jnp.full((2,), 16.0), 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)

    def test_crop_box_selects_region(self):
        """Cropping the left half then comparing against a manual resize."""
        from blt_vqg_tpu.data.augment import _batched_crop_resize
        img = jnp.broadcast_to(
            jnp.arange(16, dtype=jnp.float32)[None, None, :, None],
            (1, 16, 16, 3))  # columns 0..15
        out = _batched_crop_resize(
            img, jnp.zeros((1,)), jnp.zeros((1,)),
            jnp.full((1,), 16.0), jnp.full((1,), 8.0), 8)
        # sample centers of an 8-wide crop of columns [0, 8): 0, 1, ..., 7
        np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]),
                                   np.arange(8) * 1.0, atol=0.51)

    def test_train_crops_vary_with_key(self):
        aug = make_augment_fn(out_size=16, train=True, scale=(0.3, 0.8))
        imgs = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
        a = aug(imgs, jax.random.key(0))
        b = aug(imgs, jax.random.key(7))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestEvalDatasetDispatch:
    def test_open_eval_dataset_file_vs_dir(self, synth, tmp_path):
        """cli.evaluate_iq must open packed DIRECTORIES with PackedDataset
        and hdf5 FILES with IQDataset (same dispatch as cli/train_iq.py) —
        regression for the round-4 infomax eval run, which crashed trying
        to h5py-open a packed dir (reference evaluate_iq.py:150-156 only
        ever sees hdf5)."""
        from blt_vqg_tpu.cli.evaluate_iq import open_eval_dataset
        from blt_vqg_tpu.data.packed import PackedDataset, pack_hdf5
        h5, vocab = synth
        ds_file = open_eval_dataset(h5, vocab)
        assert isinstance(ds_file, IQDataset)
        packed_dir = pack_hdf5(h5, str(tmp_path / "packed"))
        ds_dir = open_eval_dataset(packed_dir, vocab)
        assert isinstance(ds_dir, PackedDataset)
        assert len(ds_dir) == len(ds_file)
