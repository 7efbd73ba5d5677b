"""Tests for the flagship synthetic-dataset generator's --learnable mode
(benchmarks/make_flagship_dataset.py).

The learnable corpus is the stand-in for real VQA v2 (unreachable offline):
questions must be a DETERMINISTIC template of exactly the inputs the model
observes under input_mode=cat — the image's two color attributes and the
answer category — so end-to-end BLEU measures learning, not plumbing.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GEN = os.path.join(REPO, "benchmarks", "make_flagship_dataset.py")
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import make_flagship_dataset as gen  # noqa: E402


def test_learnable_question_deterministic_and_distinct():
    words = gen.make_word_list(500, seed=0)
    q1 = gen.learnable_question(3, 7, 11, words)
    q2 = gen.learnable_question(3, 7, 11, words)
    assert q1 == q2
    # distinct combos give distinct questions (spot check a grid)
    qs = {gen.learnable_question(a, b, c, words)
          for a in range(4) for b in range(4) for c in range(4)}
    assert len(qs) == 64
    # pure-alpha words + '?' — survives the reference tokenizer untouched
    assert q1.endswith("?") and q1[:-1].replace(" ", "").isalpha()


def test_factored_template_composes_from_single_factors():
    """The generalization template (round 4): each word position depends on
    ONE factor, all factor words are distinct, and — the property the
    per-combo hash template lacked — every word of a HELD-OUT combo's
    question already occurs in some training combo's question, so val is
    never OOV."""
    num_cats = 6
    words = gen.make_word_list(500, seed=0)
    q1 = gen.factored_question(3, 7, 5, num_cats, words)
    assert q1 == gen.factored_question(3, 7, 5, num_cats, words)
    toks = q1[:-1].split()
    assert len(toks) == 6 and q1.endswith("?")
    # position i changes iff its factor changes
    qa = gen.factored_question(4, 7, 5, num_cats, words)[:-1].split()
    qb = gen.factored_question(3, 8, 5, num_cats, words)[:-1].split()
    qc = gen.factored_question(3, 7, 2, num_cats, words)[:-1].split()
    assert [i for i in range(6) if qa[i] != toks[i]] == [0, 3]
    assert [i for i in range(6) if qb[i] != toks[i]] == [1, 4]
    assert [i for i in range(6) if qc[i] != toks[i]] == [2, 5]
    # injective word assignment across all factor values
    all_words = set()
    for a in range(gen.NA):
        all_words.update(
            gen.factored_question(a, 0, 0, num_cats, words)[:-1].split())
    for b in range(gen.NB):
        all_words.update(
            gen.factored_question(0, b, 0, num_cats, words)[:-1].split())
    for c in range(num_cats):
        all_words.update(
            gen.factored_question(0, 0, c, num_cats, words)[:-1].split())
    assert len(all_words) == 2 * (gen.NA + gen.NB + num_cats)
    # no-OOV under any combo_split holdout: train covers every factor
    # value, so the union of train-question words covers every val word
    train, heldout = gen.combo_split(num_cats, 0.2)
    seen = set()
    for combo in train:
        a, bc = combo % gen.NA, combo // gen.NA
        b, c = bc % gen.NB, bc // gen.NB
        seen.update(
            gen.factored_question(a, b, c, num_cats, words)[:-1].split())
    for combo in heldout:
        a, bc = combo % gen.NA, combo // gen.NA
        b, c = bc % gen.NB, bc // gen.NB
        val_words = set(
            gen.factored_question(a, b, c, num_cats, words)[:-1].split())
        assert val_words <= seen, (combo, val_words - seen)


def test_paraphrase_templates_distinct_and_valid_map():
    """Paraphrase corpus (info-max diversity): each combo has T distinct
    valid questions differing ONLY in the style prefix; style words never
    collide with factor words; valid_questions_map is the exact ground
    truth the generator draws from."""
    num_cats, T = 4, 4
    words = gen.make_word_list(500, seed=0)
    qs = [gen.paraphrase_question(3, 7, 2, num_cats, t, words)
          for t in range(T)]
    assert len(set(qs)) == T
    bodies = {q.split(" ", 1)[1] for q in qs}
    assert bodies == {gen.factored_question(3, 7, 2, num_cats, words)}
    styles = {q.split(" ", 1)[0] for q in qs}
    assert len(styles) == T
    # style words are disjoint from every factor word
    factor_words = set()
    for a in range(gen.NA):
        for c in range(num_cats):
            factor_words.update(
                gen.factored_question(a, a % gen.NB, c, num_cats,
                                      words)[:-1].split())
    assert not (styles & factor_words)
    # ground-truth map regenerates exactly these questions
    vmap = gen.valid_questions_map(num_cats, T, words)
    combo = 3 + gen.NA * (7 + gen.NB * 2)
    assert vmap[str(combo)] == qs
    assert len(vmap) == gen.NA * gen.NB * num_cats


def test_qa_generation_draws_all_templates(tmp_path):
    words = gen.make_word_list(610, seed=0)
    q_words = words[:601]
    answers_by_cat = {f"cat{i}": [words[601 + i]] for i in range(4)}
    T = 3
    qp, _ = gen.make_qa_json_learnable(
        str(tmp_path), "train", 400, gen.NA * gen.NB, q_words,
        answers_by_cat, seed=1, template="factored", num_templates=T)
    with open(qp) as f:
        qs = [q["question"] for q in json.load(f)["questions"]]
    vmap = gen.valid_questions_map(4, T, q_words)
    valid = {q: int(c) for c, lst in vmap.items() for q in lst}
    # every drawn question is a valid paraphrase, and all T styles occur
    styles = set()
    for q in qs:
        assert q in valid
        styles.add(q.split(" ", 1)[0])
    assert len(styles) == T


def test_attrs_cycle_covers_all_combos():
    combos = {gen._attrs(i) for i in range(gen.NA * gen.NB)}
    assert len(combos) == gen.NA * gen.NB


def test_combo_split_disjoint_and_balanced():
    """Compositional-generalization split (VERDICT r3 #4): held-out combos
    are disjoint from training, every (a, b) keeps ≥1 train category, and
    the held-out fraction lands near the requested value."""
    num_cats = 8
    train, heldout = gen.combo_split(num_cats, 0.12)
    total = gen.NA * gen.NB * num_cats
    assert train | heldout == set(range(total))
    assert not (train & heldout)
    frac = len(heldout) / total
    assert 0.05 < frac < 0.25
    # per (a, b): at least one category trainable
    for a in range(gen.NA):
        for b in range(gen.NB):
            ids = {a + gen.NA * (b + gen.NB * c) for c in range(num_cats)}
            assert ids & train
    # deterministic (same seed)
    t2, h2 = gen.combo_split(num_cats, 0.12)
    assert t2 == train and h2 == heldout


def test_qa_generation_respects_allowed_combos(tmp_path):
    # >576 template words: combo → question is then injective (the word at
    # position j is (combo·p_j + j) mod nw with p_j coprime to nw), so the
    # reverse map below is well-defined
    words = gen.make_word_list(610, seed=0)
    q_words = words[:601]
    answers_by_cat = {f"cat{i}": [words[601 + i]] for i in range(4)}
    train, heldout = gen.combo_split(4, 0.2)
    qp, _ = gen.make_qa_json_learnable(
        str(tmp_path), "train", 300, gen.NA * gen.NB, q_words,
        answers_by_cat, seed=1, allowed_combos=train)
    with open(qp) as f:
        qs = json.load(f)["questions"]
    assert len(qs) == 300
    # reverse-map each question to its combo: regenerate per-combo template
    q2combo = {}
    for combo in range(gen.NA * gen.NB * 4):
        a = combo % gen.NA
        b = (combo // gen.NA) % gen.NB
        c = combo // (gen.NA * gen.NB)
        q2combo[gen.learnable_question(a, b, c, q_words)] = combo
    assert len(q2combo) == gen.NA * gen.NB * 4  # injective
    for q in qs:
        assert q2combo[q["question"]] in train


@pytest.fixture(scope="module")
def tiny_learnable(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("learnable"))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    subprocess.run(
        [sys.executable, GEN, "--root", root, "--learnable",
         # dense draw: each of the 400 template words appears ~30× so the
         # count>=4 vocab threshold keeps them all (the flagship run's
         # 110k-QA corpus has the same property at ~48 draws per combo)
         "--num-qa", "2000", "--num-images", "288", "--val-qa", "128",
         "--val-images", "144", "--im-size", "64", "--vocab-words", "400"],
        check=True, env=env, capture_output=True, text=True)
    return root


def test_learnable_end_to_end_etl(tiny_learnable):
    import h5py
    from blt_vqg_tpu.text.vocabulary import load_vocab

    root = tiny_learnable
    vocab = load_vocab(os.path.join(root, "vocab_iq.json"))

    # every VAL question token is in the TRAIN-built vocabulary (the val
    # split re-uses the deterministic template, so nothing falls to <unk>)
    unk = vocab("<unk>")
    with h5py.File(os.path.join(root, "iq_val_dataset.hdf5")) as f:
        val_q = f["questions"][:]
        assert not (val_q == unk).any()

    # question determinism survives the real ETL: rows sharing
    # (image attrs, category) hold identical token sequences
    with h5py.File(os.path.join(root, "iq_dataset.hdf5")) as f:
        q = f["questions"][:]
        cats = f["answer_types"][:]
        ids = f["image_ids"][:]  # per-QA COCO image id
    attrs = np.array([gen._attrs(int(i) - 1) for i in ids])
    key = attrs[:, 0] + gen.NA * (
        attrs[:, 1] + gen.NB * cats.astype(np.int64))
    by_key = {}
    for k, row in zip(key, q):
        if k in by_key:
            np.testing.assert_array_equal(by_key[k], row)
        else:
            by_key[k] = row
    assert len(by_key) > 100  # many distinct combos in 600 draws


def test_learnable_images_carry_attributes(tiny_learnable):
    """Background/square mean colors recover (a, b) — the visual signal a
    frozen random CNN must separate actually exists in the JPEGs."""
    from PIL import Image
    root = tiny_learnable
    img_dir = os.path.join(root, "images")
    bg = np.array(gen._BG, np.float32)
    sq = np.array(gen._SQ, np.float32)
    for i in range(24):
        a, b = gen._attrs(i)
        name = (f"COCO_train2014_{i + 1}.jpg" if i % 2 == 0
                else f"COCO_train2014_{i + 1:012d}.jpg")
        arr = np.asarray(Image.open(os.path.join(img_dir, name)),
                         dtype=np.float32)
        n = arr.shape[0]
        q = n // 4
        corner = arr[: q // 2, : q // 2].reshape(-1, 3).mean(0)
        center = arr[q + 4: 3 * q - 4, q + 4: 3 * q - 4].reshape(-1, 3).mean(0)
        assert np.linalg.norm(bg - corner, axis=1).argmin() == a
        assert np.linalg.norm(sq - center, axis=1).argmin() == b
