"""Build a reference-SCALE synthetic VQA dataset through the REAL ETL.

VQA v2 itself is unreachable in this environment (no egress), so this
generates a corpus with the reference dataset's shape — ≥100k QAs over
~12k distinct 224px images, ~12k-word vocabulary, 16 answer categories —
as fake-COCO inputs (JPEG files + VQA-format question/annotation JSON),
then runs the ACTUAL offline pipeline end to end:

    cli.store_dataset (--uint8)  →  hdf5 (reference schema)
    data.packed.pack_hdf5        →  mmap-packed runtime format

This is the fixture for benchmarks/pipeline_flagship.md (VERDICT round-2
item 2): proving the host input pipeline sustains flagship-config training
(reference train_iq.py:366-369 DataLoader-worker capability).

Usage:  python benchmarks/make_flagship_dataset.py --root /root/data_flagship
        [--num-qa 110000 --num-images 12000 --val-qa 5120 --im-size 224]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_word_list(n: int, seed: int = 0):
    """n distinct pronounceable pseudo-words (pure-alpha — survives the
    reference tokenizer regex untouched)."""
    rng = np.random.RandomState(seed)
    syll = ["ka", "ro", "mi", "ta", "lu", "ne", "so", "vi", "pa", "de",
            "fu", "ge", "hi", "jo", "ku", "la", "mo", "nu", "pe", "ri",
            "sa", "te", "va", "wo", "yu", "ze", "bi", "co", "du", "fa"]
    words = []
    seen = set()
    while len(words) < n:
        w = "".join(rng.choice(syll, size=rng.randint(2, 5)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


# --- learnable mode -------------------------------------------------------
# Visual attributes a frozen RANDOM ResNet-18 provably preserves: large
# color regions (global-average-pooled conv features separate them).  Image
# index i carries (a, b) = (i % NA, (i // NA) % NB): background color a,
# centered-square color b.  The question is a deterministic 6-word template
# of (a, b, answer category) — exactly the inputs the model observes under
# input_mode=cat — so a correct model can drive BLEU toward 1 on held-out
# images (fresh noise, same attribute scheme).

NA, NB = 12, 12
# well-separated palettes (background / square use disjoint color sets)
_BG = [(230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
       (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
       (210, 245, 60), (170, 110, 40), (0, 0, 128), (128, 128, 128)]
_SQ = [(250, 190, 212), (0, 128, 128), (220, 190, 255), (128, 0, 0),
       (170, 255, 195), (128, 128, 0), (255, 215, 180), (255, 250, 200),
       (0, 0, 0), (255, 255, 255), (100, 160, 20), (20, 60, 120)]
_POS_PRIMES = (4973, 6007, 3209, 9041, 2741, 7433)


def _attrs(i: int):
    return i % NA, (i // NA) % NB


def learnable_question(a: int, b: int, cat: int, q_words) -> str:
    """Deterministic 6-word template of (bg color, square color, category).

    Per-COMBO word hash: fine for the round-3 memorization corpus, but
    USELESS under a combo holdout — words of held-out combos never occur
    in training, so val references are OOV by construction.  Use
    ``factored_question`` for generalization corpora."""
    nw = len(q_words)
    combo = a + NA * (b + NB * cat)
    return " ".join(q_words[(combo * p + j) % nw]
                    for j, p in enumerate(_POS_PRIMES)) + "?"


def factored_question(a: int, b: int, cat: int, num_cats: int,
                      q_words) -> str:
    """6-word COMPOSITIONAL template: each position depends on ONE factor
    (positions 0,3 ← bg; 1,4 ← square; 2,5 ← category), each factor value
    naming two distinct words via an injective affine hash.  Every word
    occurs in training under any combo holdout that keeps each factor
    VALUE seen (combo_split guarantees that), so held-out combos are
    decodable by composing trained factor→word mappings — the corpus the
    round-4 generalization run uses (VERDICT r3 #4)."""
    nw = len(q_words)
    stride = NA + NB + num_cats
    assert 2 * stride <= nw and nw % 7919 != 0
    idx = (a, NA + b, NA + NB + cat,
           stride + a, stride + NA + b, stride + NA + NB + cat)
    return " ".join(q_words[(7919 * i + 13) % nw] for i in idx) + "?"


def paraphrase_question(a: int, b: int, cat: int, num_cats: int, t: int,
                        q_words) -> str:
    """Template ``t``'s paraphrase of the factored question: a per-template
    STYLE word prefixed to the 6-word factored body.  The style word is a
    function of ``t`` ONLY — not of anything the model observes (image,
    context) — so with questions drawn uniformly over ``t`` the corpus has
    T equally-valid questions per (image, category) and the mapping
    question→t is recoverable only from the question itself.  That is
    exactly the signal the latent ``z`` exists to carry (reference
    iq.py:124-127 prior-sampled decode; the info-max research claim): a
    trained latent model should emit DIFFERENT valid paraphrases across
    prior draws, while the deterministic pretrain decoder cannot.

    Style-word indices extend the factored template's injective affine
    hash (indices ``2*stride + t``), so style words never collide with
    factor words."""
    nw = len(q_words)
    stride = NA + NB + num_cats
    assert 2 * stride + t < nw and nw % 7919 != 0
    style = q_words[(7919 * (2 * stride + t) + 13) % nw]
    return style + " " + factored_question(a, b, cat, num_cats, q_words)


def valid_questions_map(num_cats: int, num_templates: int, q_words) -> dict:
    """combo id → the ``num_templates`` valid paraphrases of that combo
    (all of them — the generator's ground truth).  Written to
    ``valid_questions.json``; consumed by the info-max eval's validity
    predicate (train/infomax.py template_validity) to score generated
    questions as valid-for-their-combo."""
    out = {}
    for combo in range(NA * NB * num_cats):
        a = combo % NA
        b = (combo // NA) % NB
        c = combo // (NA * NB)
        out[str(combo)] = [
            paraphrase_question(a, b, c, num_cats, t, q_words)
            for t in range(num_templates)]
    return out


def factored_consistency_map(num_cats: int, q_words) -> dict:
    """category NAME ('catN') → the two factored-template words positions
    2/5 name for that category (the words present in EVERY question of the
    category and in no other category's — injectivity per
    factored_question).  Consumed by ``evaluate_iq --consistency-map`` for
    the info-max consistency metric on factored corpora
    (train/infomax.py mapped_word_consistency, which looks contexts up by
    the decoded category word)."""
    nw = len(q_words)
    stride = NA + NB + num_cats
    return {
        f"cat{c}": [q_words[(7919 * (NA + NB + c) + 13) % nw],
                    q_words[(7919 * (stride + NA + NB + c) + 13) % nw]]
        for c in range(num_cats)
    }


def make_images_learnable(img_dir: str, split: str, num: int, im_size: int,
                          seed: int = 0):
    """Attribute-bearing JPEGs: background color ``i % NA``, centered square
    color ``(i // NA) % NB``, plus small per-image noise rects + brightness
    jitter so every image is unique (val uses a fresh seed → held-out
    nuisance variation over the same attribute scheme)."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(img_dir, exist_ok=True)
    q = im_size // 4
    for i in range(num):
        a, b = _attrs(i)
        img = np.empty((im_size, im_size, 3), dtype=np.float32)
        img[:] = _BG[a]
        img[q:3 * q, q:3 * q] = _SQ[b]
        img += rng.randint(-10, 11, (1, 1, 3))
        # noise scaled to the image so attributes stay dominant at any size
        # (8-20px at the flagship 224px)
        lo, hi = max(2, im_size // 28), max(3, im_size // 11)
        for _ in range(3):
            y, x = rng.randint(0, im_size - hi - 1, 2)
            h, w = rng.randint(lo, hi + 1, 2)
            img[y:y + h, x:x + w] = rng.randint(0, 255, (1, 1, 3))
        arr = np.clip(img, 0, 255).astype(np.uint8)
        name = (f"COCO_{split}2014_{i + 1}.jpg" if i % 2 == 0
                else f"COCO_{split}2014_{i + 1:012d}.jpg")
        Image.fromarray(arr).save(os.path.join(img_dir, name), "JPEG",
                                  quality=80)
        if (i + 1) % 2000 == 0:
            print(f"  {split} images: {i + 1}/{num}", flush=True)


def combo_split(num_cats: int, holdout_frac: float, seed: int = 7):
    """Compositional-generalization split over (bg, square, category)
    combos (VERDICT r3 #4): per (a, b) attribute pair, hold out a random
    ~``holdout_frac`` of categories (always keeping ≥1 for train), so val
    questions use attribute×category COMBINATIONS never seen in training
    while every attribute and every category is individually seen.
    Returns (train_combos, heldout_combos) as sets of
    ``a + NA*(b + NB*cat)`` ids."""
    rng = np.random.RandomState(seed)
    heldout = set()
    for a in range(NA):
        for b in range(NB):
            k = int(rng.binomial(num_cats, holdout_frac))
            k = min(max(k, 1 if holdout_frac > 0 else 0), num_cats - 1)
            for c in rng.choice(num_cats, size=k, replace=False):
                heldout.add(a + NA * (b + NB * int(c)))
    every = set(range(NA * NB * num_cats))
    return every - heldout, heldout


def make_qa_json_learnable(root: str, split: str, num_qa: int,
                           num_images: int, q_words, answers_by_cat,
                           seed: int = 1, allowed_combos=None,
                           template: str = "combo", num_templates: int = 1):
    """Learnable QA: question = ``learnable_question(a, b, cat)`` where
    (a, b) come from the drawn image's index; answer deterministic of the
    same triple (so input_mode=ans is learnable too).  ``allowed_combos``
    (a set of combo ids; see combo_split) restricts draws to that subset —
    the compositional-generalization corpus.  ``num_templates`` > 1 (with
    the factored template) draws a uniform paraphrase template per QA —
    the multi-valid-question corpus the info-max diversity eval needs
    (see paraphrase_question)."""
    rng = np.random.RandomState(seed)
    cats = sorted(answers_by_cat)
    questions, annotations = [], []
    for qid in range(num_qa):
        for _ in range(10_000):
            image_id = int(rng.randint(1, num_images + 1))
            a, b = _attrs(image_id - 1)
            ci = int(rng.randint(len(cats)))
            combo = a + NA * (b + NB * ci)
            if allowed_combos is None or combo in allowed_combos:
                break
        else:
            raise RuntimeError("no allowed combo drawable — holdout split "
                               "excludes every (image, category) pair?")
        ans = answers_by_cat[cats[ci]][combo % len(answers_by_cat[cats[ci]])]
        if num_templates > 1:
            assert template == "factored", "paraphrases extend the factored template"
            q = paraphrase_question(a, b, ci, len(cats),
                                    int(rng.randint(num_templates)), q_words)
        elif template == "factored":
            q = factored_question(a, b, ci, len(cats), q_words)
        else:
            q = learnable_question(a, b, ci, q_words)
        questions.append({"image_id": image_id, "question_id": qid,
                          "question": q})
        annotations.append({"image_id": image_id, "question_id": qid,
                            "multiple_choice_answer": ans})
    qp = os.path.join(root, f"questions_{split}.json")
    ap = os.path.join(root, f"annotations_{split}.json")
    with open(qp, "w") as f:
        json.dump({"questions": questions}, f)
    with open(ap, "w") as f:
        json.dump({"annotations": annotations}, f)
    return qp, ap


def make_images(img_dir: str, split: str, num: int, im_size: int,
                seed: int = 0):
    """Structured JPEGs (gradient + random rectangles) — realistic decode
    cost without noise-JPEG bloat.  Both COCO filename formats."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(img_dir, exist_ok=True)
    ramp = np.linspace(0, 255, im_size, dtype=np.float32)
    base = (ramp[None, :, None] + ramp[:, None, None]) / 2
    for i in range(num):
        img = np.broadcast_to(base, (im_size, im_size, 3)).copy()
        img += rng.randint(-40, 40, (1, 1, 3))
        for _ in range(4):
            y, x = rng.randint(0, im_size - 16, 2)
            h, w = rng.randint(16, im_size // 2, 2)
            img[y:y + h, x:x + w] = rng.randint(0, 255, (1, 1, 3))
        arr = np.clip(img, 0, 255).astype(np.uint8)
        name = (f"COCO_{split}2014_{i + 1}.jpg" if i % 2 == 0
                else f"COCO_{split}2014_{i + 1:012d}.jpg")
        Image.fromarray(arr).save(os.path.join(img_dir, name), "JPEG",
                                  quality=80)
        if (i + 1) % 2000 == 0:
            print(f"  {split} images: {i + 1}/{num}", flush=True)


def make_qa_json(root: str, split: str, num_qa: int, num_images: int,
                 q_words, answers_by_cat, seed: int = 1):
    """VQA-v2-format questions/annotations: zipf-ish word draw (so the
    count>=4 vocab threshold keeps ~the full word list), category-balanced
    answers."""
    rng = np.random.RandomState(seed)
    nw = len(q_words)
    # zipf-ish but bounded: rank r gets weight 1/(1 + 8r/nw)
    w = 1.0 / (1.0 + 8.0 * np.arange(nw) / nw)
    w /= w.sum()
    cats = sorted(answers_by_cat)
    questions, annotations = [], []
    for qid in range(num_qa):
        image_id = int(rng.randint(1, num_images + 1))
        n = int(rng.randint(5, 16))
        toks = [q_words[j] for j in rng.choice(nw, size=n, p=w)]
        cat = cats[qid % len(cats)]
        ans = answers_by_cat[cat][rng.randint(len(answers_by_cat[cat]))]
        questions.append({"image_id": image_id, "question_id": qid,
                          "question": " ".join(toks) + "?"})
        annotations.append({"image_id": image_id, "question_id": qid,
                            "multiple_choice_answer": ans})
    qp = os.path.join(root, f"questions_{split}.json")
    ap = os.path.join(root, f"annotations_{split}.json")
    with open(qp, "w") as f:
        json.dump({"questions": questions}, f)
    with open(ap, "w") as f:
        json.dump({"annotations": annotations}, f)
    return qp, ap


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/root/data_flagship")
    p.add_argument("--num-qa", type=int, default=110_000)
    p.add_argument("--num-images", type=int, default=12_000)
    p.add_argument("--val-qa", type=int, default=5_120)
    p.add_argument("--val-images", type=int, default=640)
    p.add_argument("--im-size", type=int, default=224)
    p.add_argument("--vocab-words", type=int, default=11_500)
    p.add_argument("--num-cats", type=int, default=16)
    p.add_argument("--skip-images", action="store_true",
                   help="image dirs already populated")
    p.add_argument("--learnable", action="store_true",
                   help="questions a deterministic template of (visual "
                   "attributes, category) — see learnable_question")
    p.add_argument("--holdout-frac", type=float, default=0.0,
                   help="with --learnable: hold out this fraction of "
                   "(attribute, category) combos from training; val draws "
                   "ONLY held-out combos (compositional generalization)")
    p.add_argument("--template", choices=("combo", "factored"),
                   default="combo",
                   help="learnable question template: 'combo' (per-combo "
                   "word hash — round-3 memorization corpus) or 'factored' "
                   "(each word position depends on ONE factor — required "
                   "for --holdout-frac generalization corpora, else "
                   "held-out questions are OOV by construction)")
    p.add_argument("--num-templates", type=int, default=1,
                   help="with --template factored: draw each QA's question "
                   "from this many paraphrase templates (a per-template "
                   "style word prefix) — T valid questions per (image, "
                   "category), the info-max diversity corpus; emits "
                   "valid_questions.json for the eval's validity predicate")
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    t0 = time.time()
    timings = {}

    # vocabulary material: one disjoint partition — question words, then
    # per-category answers (a separate seed would collide with q_words)
    n_ans = args.num_cats * 40
    all_words = make_word_list(args.vocab_words + n_ans, seed=0)
    q_words = all_words[:args.vocab_words]
    a_words = all_words[args.vocab_words:]
    cats = [f"cat{i}" for i in range(args.num_cats)]
    answers_by_cat = {c: a_words[i * 40:(i + 1) * 40]
                      for i, c in enumerate(cats)}
    cat2ans_path = os.path.join(args.root, "cat2ans.json")
    with open(cat2ans_path, "w") as f:
        json.dump(answers_by_cat, f)

    mk_images = make_images_learnable if args.learnable else make_images
    mk_qa = make_qa_json_learnable if args.learnable else make_qa_json
    t = time.time()
    if not args.skip_images:
        mk_images(os.path.join(args.root, "images"), "train",
                  args.num_images, args.im_size, seed=2)
        mk_images(os.path.join(args.root, "images"), "val",
                  args.val_images, args.im_size, seed=3)
    timings["images_s"] = time.time() - t

    t = time.time()
    qa_kw_train, qa_kw_val = {}, {}
    if args.learnable and args.holdout_frac > 0 and args.template != "factored":
        raise SystemExit(
            "--holdout-frac requires --template factored: the per-combo "
            "hash template makes held-out questions OOV by construction "
            "(their words never occur in any training question)")
    if args.learnable and args.holdout_frac > 0:
        train_combos, heldout = combo_split(args.num_cats,
                                            args.holdout_frac)
        qa_kw_train["allowed_combos"] = train_combos
        qa_kw_val["allowed_combos"] = heldout
    if args.learnable and args.num_templates > 1:
        if args.template != "factored":
            raise SystemExit("--num-templates requires --template factored")
        qa_kw_train["num_templates"] = args.num_templates
        qa_kw_val["num_templates"] = args.num_templates
        with open(os.path.join(args.root, "valid_questions.json"), "w") as f:
            json.dump(valid_questions_map(args.num_cats, args.num_templates,
                                          q_words), f)
    if args.learnable and args.template == "factored":
        qa_kw_train["template"] = qa_kw_val["template"] = "factored"
        with open(os.path.join(args.root, "combo_split.json"), "w") as f:
            json.dump({"holdout_frac": args.holdout_frac,
                       "train": sorted(train_combos),
                       "heldout": sorted(heldout)}, f)
        print(f"combo split: {len(train_combos)} train / {len(heldout)} "
              "held-out (val draws held-out only)")
        with open(os.path.join(args.root, "consistency_map.json"), "w") as f:
            json.dump(factored_consistency_map(args.num_cats, q_words), f)
    qp, ap = mk_qa(args.root, "train", args.num_qa, args.num_images,
                   q_words, answers_by_cat, seed=1, **qa_kw_train)
    vqp, vap = mk_qa(args.root, "val", args.val_qa, args.val_images,
                     q_words, answers_by_cat, seed=4, **qa_kw_val)
    timings["json_s"] = time.time() - t

    # the REAL ETL (reference utils/store_dataset.py capability)
    from blt_vqg_tpu.cli.store_dataset import main as store_main
    img_dir = os.path.join(args.root, "images")
    vocab_path = os.path.join(args.root, "vocab_iq.json")
    train_h5 = os.path.join(args.root, "iq_dataset.hdf5")
    val_h5 = os.path.join(args.root, "iq_val_dataset.hdf5")
    cat2name = os.path.join(args.root, "cat2name.json")

    t = time.time()
    rc = store_main(["--image-dir", img_dir, "--questions", qp,
                     "--annotations", ap, "--cat2ans", cat2ans_path,
                     "--vocab-path", vocab_path, "--output", train_h5,
                     "--cat2name", cat2name, "--im_size", str(args.im_size),
                     "--uint8"])
    assert rc == 0
    timings["etl_train_s"] = time.time() - t

    t = time.time()
    rc = store_main(["--image-dir", img_dir, "--questions", vqp,
                     "--annotations", vap, "--cat2ans", cat2ans_path,
                     "--vocab-path", vocab_path, "--output", val_h5,
                     "--cat2name", cat2name, "--im_size", str(args.im_size),
                     "--uint8", "--val"])
    assert rc == 0
    timings["etl_val_s"] = time.time() - t

    # hdf5 → packed mmap runtime format (data/packed.py + native ingest)
    from blt_vqg_tpu.data.packed import pack_hdf5
    t = time.time()
    pack_hdf5(train_h5, os.path.join(args.root, "packed_train"))
    pack_hdf5(val_h5, os.path.join(args.root, "packed_val"))
    timings["pack_s"] = time.time() - t

    from blt_vqg_tpu.text.vocabulary import load_vocab
    vocab = load_vocab(vocab_path)
    summary = {
        "root": args.root, "learnable": args.learnable,
        "num_qa": args.num_qa, "num_images": args.num_images,
        "val_qa": args.val_qa, "im_size": args.im_size,
        "vocab_size": len(vocab),
        "hdf5_train_gb": round(os.path.getsize(train_h5) / 1e9, 2),
        "timings_s": {k: round(v, 1) for k, v in timings.items()},
        "total_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.root, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
