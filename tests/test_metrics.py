"""Metric parity tests.

CIDEr / BLEU / ROUGE are checked bit-for-bit against the reference's vendored
pure-python scorers (imported straight from /root/reference — they depend
only on numpy).  METEOR-lite is checked for sane behavior only (the Java jar
it approximates is absent).
"""

import os
import sys

import numpy as np
import pytest

from grit_tpu.data.metrics import Bleu, Cider, Meteor, Rouge
from grit_tpu.data.tokenizer import PTBTokenizer, caption_tokenize

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "datasets"))

GTS = {
    "a": ["a man is riding a brown horse", "a person rides a horse on a beach",
          "a man rides a horse", "the man is on a horse", "a guy riding a horse"],
    "b": ["a cat sleeping on a couch", "a cat naps on the sofa",
          "the cat is asleep on a couch", "a kitten sleeps on the couch",
          "a sleeping cat lies on a sofa"],
    "c": ["two dogs play in the park", "dogs playing with a ball outside",
          "a pair of dogs running on grass", "two dogs running in a field",
          "the dogs play fetch in the grass"],
}
RES = {
    "a": ["a man riding a horse on the beach"],
    "b": ["a cat sleeping on the couch"],
    "c": ["two dogs playing in a grassy field"],
}


def _ref_modules():
    sys.path.insert(0, os.path.join(REF, "datasets", "caption", "metrics"))
    try:
        from cider.cider import Cider as RefCider  # type: ignore
        from bleu.bleu import Bleu as RefBleu  # type: ignore
        from rouge.rouge import Rouge as RefRouge  # type: ignore
    finally:
        sys.path.pop(0)
    return RefCider, RefBleu, RefRouge


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")
class TestReferenceParity:
    def test_cider_matches_reference(self):
        RefCider, _, _ = _ref_modules()
        ours_corpus, ours_per = Cider().compute_score(GTS, RES)
        ref_corpus, ref_per = RefCider().compute_score(GTS, RES)
        np.testing.assert_allclose(ours_corpus, ref_corpus, rtol=1e-12)
        np.testing.assert_allclose(ours_per, ref_per, rtol=1e-12)

    def test_cider_precomputed_idf_matches_reference(self):
        RefCider, _, _ = _ref_modules()
        train_refs = {k: v for k, v in GTS.items()}
        ours = Cider(gts=train_refs).compute_score(GTS, RES)
        ref = RefCider(gts=train_refs).compute_score(GTS, RES)
        np.testing.assert_allclose(ours[0], ref[0], rtol=1e-12)
        np.testing.assert_allclose(ours[1], ref[1], rtol=1e-12)

    def test_bleu_matches_reference(self):
        _, RefBleu, _ = _ref_modules()
        ours, _ = Bleu().compute_score(GTS, RES)
        ref, _ = RefBleu(4).compute_score(GTS, RES)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_rouge_matches_reference(self):
        _, _, RefRouge = _ref_modules()
        ours_c, ours_s = Rouge().compute_score(GTS, RES)
        ref_c, ref_s = RefRouge().compute_score(GTS, RES)
        np.testing.assert_allclose(ours_c, ref_c, rtol=1e-12)
        np.testing.assert_allclose(ours_s, ref_s, rtol=1e-12)


class TestMeteorLite:
    def test_perfect_match_scores_high(self):
        gts = {"x": ["a dog runs in the park"]}
        res = {"x": ["a dog runs in the park"]}
        score, _ = Meteor().compute_score(gts, res)
        assert score > 0.9

    def test_orders_quality(self):
        gts = {"x": ["a dog runs in the park"] * 2}
        good = {"x": ["a dog running in the park"]}
        bad = {"x": ["an airplane flies over mountains"]}
        s_good, _ = Meteor().compute_score(gts, good)
        s_bad, _ = Meteor().compute_score(gts, bad)
        assert s_good > s_bad
        assert s_bad < 0.1

    def test_stem_matching_helps(self):
        gts = {"x": ["children playing with toys"]}
        res = {"x": ["child plays with toy"]}
        score, _ = Meteor().compute_score(gts, res)
        assert score > 0.2  # all words stem-match


class TestTokenizers:
    def test_caption_tokenize_basic(self):
        assert caption_tokenize("A man, riding a horse!") == \
            ["a", "man", "riding", "a", "horse"]

    def test_contractions(self):
        assert caption_tokenize("the dog doesn't run") == \
            ["the", "dog", "does", "n't", "run"]

    def test_ptb_tokenizer_dict_interface(self):
        out = PTBTokenizer.tokenize({"k": ["A man's hat."]})
        assert out == {"k": ["a man 's hat"]}

    def test_ptb_tokenizer_list_interface(self):
        out = PTBTokenizer.tokenize(["Hello, world!"])
        assert out == {0: ["hello world"]}


class TestMeteorGoldens:
    """Hand-computed values pin the exact+stem METEOR formula
    (alpha=0.85 fmean, cubic fragmentation penalty with gamma=0.6,
    stem-match weight 0.6) against regressions.  Bit-parity with
    meteor-1.5.jar is unverifiable here: the jar AND its WordNet/paraphrase
    data are stripped from the reference checkout and the environment has
    no network — see the module docstring's documented deviation."""

    def _score_one(self, cand, ref):
        score, _ = Meteor().compute_score({"k": [ref]}, {"k": [cand]})
        return score

    def test_identical_sentence(self):
        # 6 exact matches, 1 chunk: fmean=1, penalty=0.6*(1/6)^3
        want = (1 - 0.6 * (1 / 6) ** 3) * 1.0
        got = self._score_one("the cat sat on the mat", "the cat sat on the mat")
        assert got == pytest.approx(want, abs=1e-12)

    def test_fully_scrambled_all_chunks(self):
        # all 6 words match but in 6 chunks: frag=1 -> penalty=0.6
        got = self._score_one("on the mat sat the cat", "the cat sat on the mat")
        assert got == pytest.approx(0.4, abs=1e-12)

    def test_stem_stage_weight(self):
        # "dogs running" vs "dog runs": both match only via Porter stems
        # wm=1.2, P=R=0.6, fmean=0.6, chunks=1/m=2 -> penalty=0.6*(0.5)^3
        want = (1 - 0.6 * 0.5 ** 3) * 0.6
        got = self._score_one("dogs running", "dog runs")
        assert got == pytest.approx(want, abs=1e-12)
