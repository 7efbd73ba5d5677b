"""End-to-end tests for the offline ETL (cli/store_dataset.py), driven on a
fake-COCO fixture: JPEG images in both COCO filename formats, VQA-style
question/annotation JSON, vocab build (train) vs load (val), missing-image
skip, hdf5 schema, and the --uint8 variant.

Exercises the same surface as reference utils/store_dataset.py:45-211.
"""

import json
import os

import h5py
import numpy as np
import pytest

from blt_vqg_tpu.cli.store_dataset import main as store_main
from blt_vqg_tpu.text.vocabulary import load_vocab

PIL = pytest.importorskip("PIL.Image")


def _write_jpeg(path, color, size=32):
    arr = np.full((size, size, 3), color, dtype=np.uint8)
    PIL.fromarray(arr).save(path, "JPEG")


@pytest.fixture()
def fake_coco(tmp_path):
    """3 train images (ids 1, 2 plain+padded name formats; id 3 missing),
    questions/annotations covering 2 categories, plus a val split."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    # image 1: plain filename format; image 2: zero-padded format
    _write_jpeg(img_dir / "COCO_train2014_1.jpg", 200)
    _write_jpeg(img_dir / "COCO_train2014_000000000002.jpg", 60)
    _write_jpeg(img_dir / "COCO_val2014_1.jpg", 120)
    # image 3 deliberately absent → its QA must be skipped

    questions = {"questions": [
        {"image_id": 1, "question_id": 10,
         "question": "what color is the cat"},
        {"image_id": 2, "question_id": 20,
         "question": "how many dogs are there"},
        {"image_id": 3, "question_id": 30,
         "question": "what color is the sky"},
        {"image_id": 1, "question_id": 40,
         "question": "what animal is shown"},  # answer outside cat set
    ]}
    annotations = {"annotations": [
        {"image_id": 1, "question_id": 10, "multiple_choice_answer": "red"},
        {"image_id": 2, "question_id": 20, "multiple_choice_answer": "two"},
        {"image_id": 3, "question_id": 30, "multiple_choice_answer": "blue"},
        {"image_id": 1, "question_id": 40, "multiple_choice_answer": "cat"},
    ]}
    cat2ans = {"count": ["two", "three"], "color": ["red", "blue"]}

    paths = {
        "img_dir": str(img_dir),
        "questions": str(tmp_path / "questions.json"),
        "annotations": str(tmp_path / "annotations.json"),
        "cat2ans": str(tmp_path / "cat2ans.json"),
        "vocab": str(tmp_path / "vocab.json"),
        "cat2name": str(tmp_path / "cat2name.json"),
        "output": str(tmp_path / "train.hdf5"),
        "output_val": str(tmp_path / "val.hdf5"),
    }
    with open(paths["questions"], "w") as f:
        json.dump(questions, f)
    with open(paths["annotations"], "w") as f:
        json.dump(annotations, f)
    with open(paths["cat2ans"], "w") as f:
        json.dump(cat2ans, f)
    return paths


def _run(paths, extra=()):
    argv = ["--image-dir", paths["img_dir"],
            "--questions", paths["questions"],
            "--annotations", paths["annotations"],
            "--cat2ans", paths["cat2ans"],
            "--vocab-path", paths["vocab"],
            "--cat2name", paths["cat2name"],
            "--output", paths["output"],
            "--im_size", "16", "--max-q-length", "8", "--max-a-length", "4",
            *extra]
    assert store_main(argv) == 0


class TestStoreDataset:
    def test_train_split_schema_and_content(self, fake_coco):
        _run(fake_coco)

        # vocab was built and saved; categories + answers are in it
        vocab = load_vocab(fake_coco["vocab"])
        for w in ("count", "color", "two", "three", "red", "blue"):
            assert w in vocab.word2idx, w

        # cat2name written sorted (reference store_dataset.py:186-188)
        with open(fake_coco["cat2name"]) as f:
            assert json.load(f) == ["color", "count"]

        with h5py.File(fake_coco["output"], "r") as h5:
            assert set(h5.keys()) == {"questions", "answers", "answer_types",
                                      "image_indices", "image_ids", "images"}
            # qid 30's image is missing and qid 40's answer is uncategorized:
            # both rows beyond index 2 stay zero; images beyond 2 stay zero
            qs = h5["questions"][:]
            assert h5["questions"].shape == (3, 8)  # 3 QAs pass the filter
            assert h5["images"].shape[1:] == (16, 16, 3)
            assert h5["images"].dtype == np.float32

            # rows 0/1 are qids 10/20 (question order); row 2 is all padding
            assert qs[0, 0] == vocab.word2idx["<start>"]
            assert (qs[2] == 0).all()
            ids = h5["image_ids"][:]
            assert list(ids[:2]) == [1, 2]
            # both filename formats resolved: two distinct stored images
            idx = h5["image_indices"][:]
            assert list(idx[:2]) == [0, 1]
            np.testing.assert_allclose(h5["images"][0].mean(), 200, atol=3)
            np.testing.assert_allclose(h5["images"][1].mean(), 60, atol=3)
            # answer_types: red→color(0), two→count(1) with sorted cats
            assert list(h5["answer_types"][:2]) == [0, 1]

    def test_val_split_loads_train_vocab(self, fake_coco):
        _run(fake_coco)  # builds vocab
        with open(fake_coco["vocab"]) as f:
            vocab_before = f.read()
        val = dict(fake_coco, output=fake_coco["output_val"])
        # val image dir only has COCO_val2014_1.jpg → image 2's QA skipped
        _run(val, extra=("--val",))
        with open(fake_coco["vocab"]) as f:
            assert f.read() == vocab_before  # vocab loaded, not rebuilt
        with h5py.File(val["output"], "r") as h5:
            assert list(h5["image_ids"][:1]) == [1]
            assert (h5["questions"][1] == 0).all()  # image 2 missing in val

    def test_uint8_variant(self, fake_coco):
        _run(fake_coco, extra=("--uint8",))
        with h5py.File(fake_coco["output"], "r") as h5:
            assert h5["images"].dtype == np.uint8
            np.testing.assert_allclose(
                h5["images"][0].astype(np.float32).mean(), 200, atol=3)

    def test_bpe_tokenizer_etl_end_to_end(self, fake_coco):
        """--tokenizer bpe (VERDICT round-1 #9): trains a BPE tokenizer on
        the corpus, writes BPE-id hdf5, val split loads the same tokenizer
        via the sniffing load_vocab, and the stored ids decode back to the
        source question text (open vocabulary: no <unk>)."""
        _run(fake_coco, extra=("--tokenizer", "bpe",
                               "--bpe-vocab-size", "300"))
        vocab = load_vocab(fake_coco["vocab"])
        from blt_vqg_tpu.text.bpe import BPETokenizer
        assert isinstance(vocab, BPETokenizer)
        with h5py.File(fake_coco["output"], "r") as h5:
            text = vocab.tokens_to_words(h5["questions"][0])
            assert text == "what color is the cat"
            assert (h5["answer_types"][:2] == [0, 1]).all()

        # val split loads the trained tokenizer instead of retraining
        val = dict(fake_coco, output=fake_coco["output_val"])
        _run(val, extra=("--val",))
        with h5py.File(val["output"], "r") as h5:
            assert vocab.tokens_to_words(h5["questions"][0]) == \
                "what color is the cat"

    def test_bpe_dataset_feeds_loader(self, fake_coco):
        """A BPE-built hdf5 drives IQDataset + make_loader end-to-end: the
        category id used by the posterior surgery is the category name's
        first BPE piece (single-token contract)."""
        import numpy as np
        _run(fake_coco, extra=("--tokenizer", "bpe",
                               "--bpe-vocab-size", "300"))
        vocab = load_vocab(fake_coco["vocab"])
        from blt_vqg_tpu.data.dataset import IQDataset
        from blt_vqg_tpu.data.loader import make_loader
        ds = IQDataset(fake_coco["output"], vocab, fake_coco["cat2name"])
        batch = next(make_loader(ds, 3, "cat", shuffle=False, device=False,
                                 drop_remainder=False, epochs=1))
        assert batch["target"].shape[1] == 8
        # context = [<start>, first-BPE-piece-of-category, <end>]
        assert batch["context"].shape[1] == 3
        cats = ["color", "count"]
        for row, cat_idx in zip(batch["context"], (0, 1)):
            assert row[1] == vocab(cats[cat_idx])
        assert int(batch["posterior"][0, 1]) == vocab("color")
        assert np.all(batch["posterior"][:, 0] == 5)  # <pos>

    def test_shard_partition(self, fake_coco):
        """--shard I/N: shards are disjoint and union to the unsharded QA
        set (multihost ETL, each host writes one shard)."""
        _run(fake_coco)  # builds vocab + unsharded reference output
        with h5py.File(fake_coco["output"], "r") as h5:
            full_qids = [tuple(q) for q in h5["questions"][:]
                         if q.any()]

        shard_qids = []
        for i in range(2):
            out = dict(fake_coco,
                       output=fake_coco["output"] + f".shard{i}")
            _run(out, extra=("--shard", f"{i}/2"))
            with h5py.File(out["output"], "r") as h5:
                rows = [tuple(q) for q in h5["questions"][:] if q.any()]
                # shard-local image_indices stay in range of this shard's
                # images table
                n_img = h5["images"].shape[0]
                assert all(0 <= ix < n_img
                           for ix in h5["image_indices"][:len(rows)])
                shard_qids.append(rows)

        assert not set(shard_qids[0]) & set(shard_qids[1])
        assert sorted(shard_qids[0] + shard_qids[1]) == sorted(full_qids)

    def test_shard_flag_validation(self, fake_coco):
        with pytest.raises(SystemExit):
            _run(fake_coco, extra=("--shard", "2/2"))

    def test_question_tokens_roundtrip(self, fake_coco):
        """Stored question ids detokenize per the vocab rules: category and
        answer words are always in-vocab; question-only words below the
        count threshold (4) become <unk> (reference vocab.py:71-113)."""
        _run(fake_coco)
        vocab = load_vocab(fake_coco["vocab"])
        with h5py.File(fake_coco["output"], "r") as h5:
            words = vocab.tokens_to_words(h5["questions"][0]).split()
        assert "color" in words          # category name → unconditional
        assert "cat" not in words        # sub-threshold question word
        assert "<unk>" in words
