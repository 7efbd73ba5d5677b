"""Fractional golden tests pinning train/nlg_metrics to the pycocoevalcap
formulas (the scorers behind the reference's NLGEval, reference
utils/__init__.py:2, train_iq.py:196-206).

Golden values are derived by hand from the published algorithm definitions
(Papineni 2002 / Lin 2004 / Vedantam 2015 with pycocoevalcap's exact
parameterization) and, where formulas coincide, cross-checked at test time
against independent implementations available in the image (nltk.translate
corpus_bleu, sacrebleu, rouge_score).  Any constant-factor or formula error
in BLEU/ROUGE-L/CIDEr now breaks a test — the weakness VERDICT.md round-1
item #3 called out.
"""

import math

import numpy as np
import pytest

from blt_vqg_tpu.train.nlg_metrics import (
    NLGEval, cider, corpus_bleu, meteor_lite, rouge_l)

LN2 = math.log(2.0)


class TestBleuGoldens:
    def test_cat_mat_hand_computed(self):
        """hyp 'the cat sat on the mat' vs ref 'the cat was on the mat':
        p1=5/6, p2=3/5, p3=1/4, p4=0, BP=1 (equal lengths)."""
        hyp = "the cat sat on the mat".split()
        ref = "the cat was on the mat".split()
        b = corpus_bleu([[ref]], [hyp], 4)
        np.testing.assert_allclose(b[0], 5 / 6, rtol=1e-6)
        np.testing.assert_allclose(b[1], math.sqrt(5 / 6 * 3 / 5), rtol=1e-6)
        np.testing.assert_allclose(b[2], (5 / 6 * 3 / 5 * 1 / 4) ** (1 / 3),
                                   rtol=1e-6)
        # unsmoothed: a zero 4-gram precision collapses BLEU-4 to ~0
        # (pycocoevalcap's tiny=1e-15 fudge, NOT an epsilon floor)
        assert b[3] < 1e-3

    def test_corpus_pooling_and_brevity(self):
        """Corpus-level stats pool across segments before the geometric mean;
        BP uses total hyp/ref lengths with closest-ref-length selection."""
        pairs = [
            ("a b c d", "a b c d e"),   # short hyp
            ("x y z w", "x y z w"),     # exact
        ]
        hyps = [h.split() for h, _ in pairs]
        refs = [[r.split()] for _, r in pairs]
        b = corpus_bleu(refs, hyps, 4)
        # all clipped precisions are 1 → BLEU-k = BP = exp(1 - 9/8)
        bp = math.exp(1 - 9 / 8)
        for k in range(4):
            np.testing.assert_allclose(b[k], bp, rtol=1e-6)

    def test_closest_ref_length_ties_prefer_shorter(self):
        """hyp len 3 with refs of len 2 and 4: tie → shorter (2) → BP=1."""
        hyp = ["a", "b", "c"]
        refs = [["a", "b"], ["a", "b", "c", "d"]]
        b = corpus_bleu([refs], [hyp], 1)
        # clipped unigrams: a,b,c all appear in some ref → p1 = 1, BP = 1
        np.testing.assert_allclose(b[0], 1.0, rtol=1e-6)

    def test_matches_nltk_corpus_bleu(self):
        """Cross-check vs nltk's independent implementation (no smoothing)
        on a corpus where every n-gram precision is strictly positive."""
        nltk_bleu = pytest.importorskip(
            "nltk.translate.bleu_score").corpus_bleu
        hyps = ["the small cat sat on the mat today",
                "a man rides a red bike down the road",
                "two dogs play with a green ball"]
        refs = ["the small cat sat on the red mat",
                "a man rides a red bike along the road",
                "two dogs play with a small green ball"]
        h = [s.split() for s in hyps]
        r = [[s.split()] for s in refs]
        ours = corpus_bleu(r, h, 4)
        for n in range(1, 5):
            w = tuple([1.0 / n] * n)
            golden = nltk_bleu(r, h, weights=w)
            np.testing.assert_allclose(ours[n - 1], golden, rtol=1e-6)

    def test_matches_sacrebleu(self):
        """Cross-check BLEU-4 vs sacrebleu (smoothing off, pre-tokenized)."""
        sacrebleu = pytest.importorskip("sacrebleu")
        hyps = ["the small cat sat on the mat today",
                "a man rides a red bike down the road"]
        refs = ["the small cat sat on the red mat",
                "a man rides a red bike along the road"]
        golden = sacrebleu.corpus_bleu(
            hyps, [refs], smooth_method="none", tokenize="none",
            force=True).score / 100.0
        ours = corpus_bleu([[r.split()] for r in refs],
                           [h.split() for h in hyps], 4)[3]
        np.testing.assert_allclose(ours, golden, rtol=1e-6)


class TestRougeGoldens:
    def test_single_ref_hand_computed(self):
        """LCS('the cat sat on the mat', 'the cat was on the mat') = 5;
        p = r = 5/6 → F(beta) = 5/6 for any beta."""
        hyp = "the cat sat on the mat".split()
        ref = "the cat was on the mat".split()
        np.testing.assert_allclose(rouge_l([[ref]], [hyp]), 5 / 6, rtol=1e-9)

    def test_multi_ref_independent_max_pooling(self):
        """pycocoevalcap takes max-precision and max-recall over DIFFERENT
        references before combining: hyp 'a b c d', refs ['a b', 'a b c x']
        → prec_max = 3/4 (ref2), rec_max = 1.0 (ref1),
        F = 2.44·0.75·1 / (1 + 1.44·0.75) = 1.83/2.08."""
        hyp = "a b c d".split()
        refs = ["a b".split(), "a b c x".split()]
        golden = (1 + 1.2 ** 2) * 0.75 * 1.0 / (1.0 + 1.2 ** 2 * 0.75)
        np.testing.assert_allclose(rouge_l([refs], [hyp]), golden, rtol=1e-9)
        # per-ref best-F pooling (the round-1 behavior) would give 0.75
        assert abs(rouge_l([refs], [hyp]) - 0.75) > 0.1

    def test_matches_rouge_score_when_p_equals_r(self):
        """When precision == recall the F-measure is beta-invariant, so the
        google-research rouge_score package (beta=1) is a valid golden."""
        rs = pytest.importorskip("rouge_score.rouge_scorer")
        cases = [("the cat sat on the mat", "the cat was on the mat"),
                 ("a b c d", "a c b d")]
        scorer = rs.RougeScorer(["rougeL"])
        for hyp, ref in cases:
            golden = scorer.score(ref, hyp)["rougeL"].fmeasure
            ours = rouge_l([[ref.split()]], [hyp.split()])
            np.testing.assert_allclose(ours, golden, rtol=1e-9)


class TestCiderGoldens:
    def test_two_image_exact_match(self):
        """imgs {('a cat','a cat'), ('a dog','a dog')}: 'a' has df=2 → idf 0,
        so only content words score; n=1,2 give cosine 1, n=3,4 are empty →
        per-image mean (1+1+0+0)/4 ×10 = 5.0."""
        refs = [["a cat".split()], ["a dog".split()]]
        hyps = ["a cat".split(), "a dog".split()]
        np.testing.assert_allclose(cider(refs, hyps), 5.0, rtol=1e-9)

    def test_partial_overlap_hand_computed(self):
        """img1 hyp=ref='a cat sat'; img2 hyp 'a dog ran' vs ref 'a dog sat'.
        img1: [1,1,1,0] → 7.5.  img2: n=1 cosine 1/√2 (dog matches, ran has
        idf ln2 but no ref counterpart; sat idf 0), n=2 cosine 1/2, n=3 no
        overlap → 10·(1/√2 + 1/2)/4."""
        refs = [["a cat sat".split()], ["a dog sat".split()]]
        hyps = ["a cat sat".split(), "a dog ran".split()]
        img1 = 7.5
        img2 = 10.0 * (1 / math.sqrt(2) + 0.5) / 4
        np.testing.assert_allclose(cider(refs, hyps), (img1 + img2) / 2,
                                   rtol=1e-9)

    def test_length_penalty_gaussian(self):
        """img1 hyp 'a cat' vs ref 'a cat sat' (delta=-1, Gaussian exp(-1/72));
        img2 exact 'a dog ran'.  img1: n=1 and n=2 cosines are both 1/√2,
        n≥3 empty on the hyp side → 10·g·(2/√2)/4."""
        refs = [["a cat sat".split()], ["a dog ran".split()]]
        hyps = ["a cat".split(), "a dog ran".split()]
        g = math.exp(-1.0 / 72.0)
        img1 = 10.0 * g * (2 / math.sqrt(2)) / 4
        img2 = 7.5
        np.testing.assert_allclose(cider(refs, hyps), (img1 + img2) / 2,
                                   rtol=1e-9)

    def test_single_image_collapses_to_zero(self):
        """ref_len = log(1) = 0 → every IDF weight is 0 → CIDEr 0, exactly
        as pycocoevalcap behaves on a 1-image corpus."""
        refs = [["a cat sat".split()]]
        hyps = ["a cat sat".split()]
        assert cider(refs, hyps) == 0.0

    def test_raw_counts_not_length_normalized(self):
        """Repeating the matching n-grams must change the cosine the way raw
        counts do (a length-normalized TF would renormalize them away)."""
        refs = [["cat cat dog".split()], ["bird bird fly".split()]]
        hyp_single = "cat dog x".split()
        hyp_double = "cat cat dog".split()
        s1 = cider(refs, [hyp_single, "bird bird fly".split()])
        s2 = cider(refs, [hyp_double, "bird bird fly".split()])
        assert s2 > s1  # exact count match (cat×2) scores strictly higher


class TestMeteorLiteGolden:
    def test_hand_computed(self):
        """hyp 'the cat sat' vs ref 'the cat ran': 2 matches in 1 chunk,
        p=r=2/3 → F=2/3; frag=1/2 → penalty 0.5·(1/2)³=1/16;
        score = (2/3)·(15/16) = 0.625."""
        score = meteor_lite([["the cat ran".split()]], [["the", "cat", "sat"]])
        np.testing.assert_allclose(score, 0.625, rtol=1e-9)


class TestFacadeEndToEnd:
    def test_compute_metrics_fractional(self):
        """Facade wiring: one stream of refs, fractional values from above."""
        scores = NLGEval().compute_metrics(
            ref_list=[["the cat was on the mat"]],
            hyp_list=["the cat sat on the mat"])
        np.testing.assert_allclose(scores["Bleu_1"], 5 / 6, rtol=1e-6)
        np.testing.assert_allclose(scores["ROUGE_L"], 5 / 6, rtol=1e-6)
        assert scores["Bleu_4"] < 1e-3
        assert scores["CIDEr"] == 0.0  # single image
