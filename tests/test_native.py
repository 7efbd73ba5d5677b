"""Native IO library tests: build, parity with numpy fallbacks, packed
dataset equivalence with the hdf5 dataset."""

import numpy as np
import pytest

from blt_vqg_tpu.data import native
from blt_vqg_tpu.data.dataset import (IQDataset, _drop_first_token,
                                      _insert_at_1)
from blt_vqg_tpu.data.packed import PackedDataset, pack_hdf5
from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
from blt_vqg_tpu.text.vocabulary import Vocabulary


@pytest.fixture(scope="module")
def vocab40():
    v = Vocabulary()
    for i in range(40 - len(v)):
        v.add_word(f"w{i}")
    return v


class TestNativeKernels:
    def test_library_builds(self):
        assert native.available(), "g++ build of native/vqg_io.cc failed"

    def test_gather_rows_matches_numpy(self):
        rng = np.random.RandomState(0)
        src = rng.randint(0, 255, (50, 8, 8, 3)).astype(np.uint8)
        idx = rng.randint(0, 50, 17)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])

    def test_gather_rows_float(self):
        rng = np.random.RandomState(1)
        src = rng.rand(20, 33).astype(np.float32)
        idx = np.array([3, 3, 0, 19])
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])

    def test_u8_to_f32(self):
        src = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = native.u8_to_f32(src, scale=1.0 / 255.0)
        np.testing.assert_allclose(out, src.astype(np.float32) / 255.0,
                                   rtol=1e-6)

    def test_token_surgery_matches_python(self):
        rng = np.random.RandomState(2)
        rows = rng.randint(0, 10, (40, 21)).astype(np.int32)
        ins = rng.randint(6, 30, 40).astype(np.int32)
        want = _insert_at_1(_drop_first_token(rows, 3), ins)
        got = native.token_surgery(rows, 3, 0, ins)
        np.testing.assert_array_equal(got, want)

    def test_make_posterior_matches_python(self):
        rng = np.random.RandomState(3)
        q = rng.randint(0, 10, (25, 20)).astype(np.int32)
        ins = rng.randint(6, 30, 25).astype(np.int32)
        p = q.copy(); p[:, 0] = 5
        want = _insert_at_1(_drop_first_token(p, 3), ins)
        got = native.make_posterior(q, 5, 3, 0, ins)
        np.testing.assert_array_equal(got, want)


class TestPackedDataset:
    def test_matches_hdf5_dataset(self, tmp_path, vocab40):
        h5 = str(tmp_path / "d.hdf5")
        write_synthetic_hdf5(h5, num_questions=32, num_images=6, im_size=16,
                             vocab_size=40, uint8_images=True)
        packed_dir = pack_hdf5(h5, str(tmp_path / "packed"))

        ds_h5 = IQDataset(h5, vocab40)
        ds_pk = PackedDataset(packed_dir, vocab40)
        assert len(ds_h5) == len(ds_pk)
        idx = np.arange(16)
        a = ds_h5.batch(idx)
        b = ds_pk.batch(idx)
        for key in ("questions", "posteriors", "answers", "answer_types",
                    "answer_types_for_input", "image_ids"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
        np.testing.assert_array_equal(np.asarray(a["images"], np.uint8),
                                      b["images"])

    def test_float_hdf5_packs_to_uint8(self, tmp_path, vocab40):
        h5 = str(tmp_path / "f.hdf5")
        write_synthetic_hdf5(h5, num_questions=8, num_images=2, im_size=8,
                             vocab_size=40, uint8_images=False)
        packed = pack_hdf5(h5, str(tmp_path / "packed_f"))
        ds = PackedDataset(packed, vocab40)
        b = ds.batch(np.arange(4))
        assert b["images"].dtype == np.uint8
