"""In-repo NLG metrics: BLEU-1..4, ROUGE-L, CIDEr, METEOR-lite.

Replaces the reference's external ``nlg_eval`` submodule (Java METEOR jar +
pycocoevalcap, reference utils/__init__.py:2, train_iq.py:41, 196) with
self-contained numpy implementations of the standard formulas:

- BLEU-n: corpus-level modified n-gram precision with brevity penalty
  (Papineni et al. 2002), smoothing-free like pycocoevalcap's default;
- ROUGE-L: LCS-based F-measure with beta=1.2 (Lin 2004, pycocoevalcap
  parameterization);
- CIDEr: TF-IDF-weighted n-gram cosine similarity, n=1..4, sigma=6
  length-penalty Gaussian (Vedantam et al. 2015);
- METEOR-lite: harmonic mean of unigram precision/recall (alpha=0.9) with a
  fragmentation penalty (gamma=0.5, beta=3) on exact matches — the exact-
  match core of METEOR without WordNet synonymy (no Java, no data files).

API mirrors NLGEval.compute_metrics(ref_list, hyp_list) → dict of floats.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


# ----------------------------------------------------------------- BLEU
def corpus_bleu(refs_per_hyp: List[List[List[str]]],
                hyps: List[List[str]], max_n: int = 4) -> List[float]:
    """Returns [BLEU-1, ..., BLEU-max_n] (cumulative, geometric mean)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for refs, hyp in zip(refs_per_hyp, hyps):
        hyp_len += len(hyp)
        # closest reference length (ties → shorter), standard BLEU
        ref_len += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            hyp_ng = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            clipped[n - 1] += sum(min(c, max_ref[ng])
                                  for ng, c in hyp_ng.items())
            totals[n - 1] += max(sum(hyp_ng.values()), 0)
    bp = 1.0 if hyp_len > ref_len else (
        math.exp(1 - ref_len / hyp_len) if hyp_len > 0 else 0.0)
    out = []
    log_sum = 0.0
    for n in range(1, max_n + 1):
        p = clipped[n - 1] / totals[n - 1] if totals[n - 1] > 0 else 0.0
        if p == 0.0:
            # epsilon smoothing so cumulative BLEU degrades instead of zeroing
            p = 1e-12
        log_sum += math.log(p)
        out.append(bp * math.exp(log_sum / n))
    return out


# --------------------------------------------------------------- ROUGE-L
def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(refs_per_hyp: List[List[List[str]]], hyps: List[List[str]],
            beta: float = 1.2) -> float:
    scores = []
    for refs, hyp in zip(refs_per_hyp, hyps):
        best = 0.0
        for r in refs:
            lcs = _lcs_len(r, hyp)
            if lcs == 0:
                continue
            prec = lcs / len(hyp) if hyp else 0.0
            rec = lcs / len(r) if r else 0.0
            if prec and rec:
                f = ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
                best = max(best, f)
        scores.append(best)
    return sum(scores) / len(scores) if scores else 0.0


# ----------------------------------------------------------------- CIDEr
def cider(refs_per_hyp: List[List[List[str]]], hyps: List[List[str]],
          max_n: int = 4, sigma: float = 6.0) -> float:
    # document frequency over reference sets
    df: List[defaultdict] = [defaultdict(float) for _ in range(max_n)]
    for refs in refs_per_hyp:
        for n in range(1, max_n + 1):
            seen = set()
            for r in refs:
                seen.update(_ngrams(r, n).keys())
            for ng in seen:
                df[n - 1][ng] += 1.0
    num_docs = max(len(refs_per_hyp), 1)
    log_docs = math.log(max(num_docs, 1))

    def tfidf_vec(tokens, n):
        counts = _ngrams(tokens, n)
        length = max(sum(counts.values()), 1)
        vec = {}
        norm = 0.0
        for ng, c in counts.items():
            idf = log_docs - math.log(max(df[n - 1].get(ng, 0.0), 1.0))
            w = (c / length) * idf
            vec[ng] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = []
    for refs, hyp in zip(refs_per_hyp, hyps):
        score_n = []
        for n in range(1, max_n + 1):
            hv, hnorm = tfidf_vec(hyp, n)
            s = 0.0
            for r in refs:
                rv, rnorm = tfidf_vec(r, n)
                if hnorm == 0 or rnorm == 0:
                    continue
                sim = sum(min(hv.get(ng, 0.0), w) * w  # clipped like Vedantam
                          for ng, w in rv.items()) / (hnorm * rnorm)
                delta = len(hyp) - len(r)
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                s += sim
            score_n.append(10.0 * s / max(len(refs), 1))
        scores.append(sum(score_n) / max_n)
    return sum(scores) / len(scores) if scores else 0.0


# ----------------------------------------------------------- METEOR-lite
def meteor_lite(refs_per_hyp: List[List[List[str]]], hyps: List[List[str]],
                alpha: float = 0.9, beta_: float = 3.0, gamma: float = 0.5
                ) -> float:
    scores = []
    for refs, hyp in zip(refs_per_hyp, hyps):
        best = 0.0
        for r in refs:
            matches, chunks = _align(hyp, r)
            if matches == 0:
                continue
            p = matches / len(hyp)
            rec = matches / len(r)
            f_mean = p * rec / (alpha * p + (1 - alpha) * rec)
            frag = chunks / matches
            penalty = gamma * (frag ** beta_)
            best = max(best, f_mean * (1 - penalty))
        scores.append(best)
    return sum(scores) / len(scores) if scores else 0.0


def _align(hyp: Sequence[str], ref: Sequence[str]):
    """Greedy left-to-right exact-match alignment; returns (matches, chunks)."""
    used = [False] * len(ref)
    positions = []
    for h in hyp:
        for j, r in enumerate(ref):
            if not used[j] and h == r:
                used[j] = True
                positions.append(j)
                break
        else:
            positions.append(None)
    matches = sum(1 for p in positions if p is not None)
    chunks = 0
    prev = None
    for p in positions:
        if p is None:
            prev = None
            continue
        if prev is None or p != prev + 1:
            chunks += 1
        prev = p
    return matches, chunks


# -------------------------------------------------------------- facade
class NLGEval:
    """Drop-in for the reference's NLGEval facade
    (compute_metrics(ref_list=[refs], hyp_list=hyps) → metric dict)."""

    def __init__(self, no_glove: bool = True, no_skipthoughts: bool = True):
        del no_glove, no_skipthoughts  # capability flags of the original

    def compute_metrics(self, ref_list: List[List[str]],
                        hyp_list: List[str]) -> Dict[str, float]:
        # ref_list: list of reference *streams*; stream i holds one reference
        # per hypothesis (the reference passes [gts], train_iq.py:196)
        refs_per_hyp = [[ref_list[s][i].split() for s in range(len(ref_list))]
                        for i in range(len(hyp_list))]
        hyps = [h.split() for h in hyp_list]
        bleu = corpus_bleu(refs_per_hyp, hyps, 4)
        return {
            "Bleu_1": bleu[0], "Bleu_2": bleu[1],
            "Bleu_3": bleu[2], "Bleu_4": bleu[3],
            "METEOR": meteor_lite(refs_per_hyp, hyps),
            "ROUGE_L": rouge_l(refs_per_hyp, hyps),
            "CIDEr": cider(refs_per_hyp, hyps),
        }
