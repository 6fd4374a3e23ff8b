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
    def test_perfect_match_scores_at_formula_ceiling(self):
        gts = {"x": ["a dog runs in the park"]}
        res = {"x": ["a dog runs in the park"]}
        score, _ = Meteor().compute_score(gts, res)
        # METEOR 1.5's rank-tuned English parameters (beta=0.2) leave even a
        # perfect 6-word match at (1 - 0.6*(1/6)**0.2) ~= 0.581 — the jar's
        # actual ceiling behavior, NOT a bug (the round-2 approximation used
        # the 2005 cubic penalty whose ceiling was ~1.0)
        np.testing.assert_allclose(score, 1 - 0.6 * (1 / 6) ** 0.2, rtol=1e-9)

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
    """Hand-computed values pin the METEOR 1.5 formula (alpha=.85 fmean over
    delta=.75 content/function-weighted P/R, penalty gamma=.6 * frag**.2,
    stem weight .6).  Bit-parity with meteor-1.5.jar is unverifiable here:
    the jar AND its WordNet/paraphrase data are stripped from the reference
    checkout and the environment has no network — the ALGORITHM is complete
    and the data files are pluggable (see the module docstring)."""

    def _score_one(self, cand, ref):
        score, _ = Meteor().compute_score({"k": [ref]}, {"k": [cand]})
        return score

    def test_identical_sentence(self):
        # 6 exact matches, 1 chunk: fmean=1, penalty=0.6*(1/6)^0.2
        want = (1 - 0.6 * (1 / 6) ** 0.2) * 1.0
        got = self._score_one("the cat sat on the mat", "the cat sat on the mat")
        assert got == pytest.approx(want, abs=1e-12)

    def test_fully_scrambled_chunk_minimizing_alignment(self):
        # all 6 words match; the beam search (jar objective: coverage, then
        # FEWEST chunks) pairs the duplicate "the"s to form contiguous runs
        # "on the mat" (cand 0-2 -> ref 3-5), "sat", "the cat" (cand 4-5 ->
        # ref 0-1): 3 chunks, not the 6 a leftmost pairing would give.
        # fmean=1, penalty=0.6*(3/6)^0.2
        want = 1 - 0.6 * 0.5 ** 0.2
        got = self._score_one("on the mat sat the cat", "the cat sat on the mat")
        assert got == pytest.approx(want, abs=1e-12)

    def test_stem_stage_weight(self):
        # "dogs running" vs "dog runs": both content words, stem-only matches
        # wm=1.2; all-content sentences cancel delta: P=R=1.2/2=0.6,
        # fmean=0.6; chunks=1, n_avg=2
        want = (1 - 0.6 * 0.5 ** 0.2) * 0.6
        got = self._score_one("dogs running", "dog runs")
        assert got == pytest.approx(want, abs=1e-12)


class TestMeteorStages:
    """Staged-matcher goldens, hand-computed from the METEOR 1.5 formulas
    (alpha=.85, beta=.2, gamma=.6, delta=.75; stage weights 1/.6/.8/.6).
    The synonym/paraphrase stages activate via pluggable data files."""

    def _hand(self, p, r, chunks, n_avg):
        fmean = p * r / (0.85 * p + 0.15 * r)
        return (1 - 0.6 * (chunks / n_avg) ** 0.2) * fmean

    def test_identical_sentence(self):
        from grit_tpu.data.metrics.meteor import Meteor

        s = Meteor()._score_pair("the cat sat", "the cat sat")
        np.testing.assert_allclose(s, self._hand(1.0, 1.0, 1, 3), rtol=1e-12)

    def test_stem_stage_weight(self):
        from grit_tpu.data.metrics.meteor import Meteor

        s = Meteor()._score_pair("the cats sat", "the cat sat")
        # the(exact,f) sat(exact,c) cats~cat(stem,c,w=.6):
        # p = r = (.75*1.6+.25*1)/1.75; 1 chunk over 3 matched words
        p = (0.75 * 1.6 + 0.25 * 1.0) / 1.75
        np.testing.assert_allclose(s, self._hand(p, p, 1, 3), rtol=1e-12)

    def test_synonym_stage_activates_with_table(self, tmp_path):
        from grit_tpu.data.metrics.meteor import Meteor

        syn = tmp_path / "syn.txt"
        syn.write_text("feline cat\n")
        s = Meteor(synonym_file=str(syn))._score_pair(
            "the feline sat", "the cat sat")
        p = (0.75 * 1.8 + 0.25 * 1.0) / 1.75  # feline~cat at w=.8 (content)
        np.testing.assert_allclose(s, self._hand(p, p, 1, 3), rtol=1e-12)
        # without the table the word is unmatched -> 2 chunks, lower score
        s0 = Meteor()._score_pair("the feline sat", "the cat sat")
        p0 = (0.75 + 0.25) / 1.75
        np.testing.assert_allclose(s0, self._hand(p0, p0, 2, 2), rtol=1e-12)
        assert s > s0

    def test_paraphrase_phrase_match(self, tmp_path):
        from grit_tpu.data.metrics.meteor import Meteor

        para = tmp_path / "para.txt"
        para.write_text("sat down ||| sat\n")
        s = Meteor(paraphrase_file=str(para))._score_pair("he sat down", "he sat")
        # coverage-first alignment picks the 3-word paraphrase match over the
        # 2-word exact sat-sat: he(exact,f=1.0) + [sat down ~ sat](w=.6)
        # cand: mc=.6(sat) mf=1.0+.6; lens cc=1, cf=2 -> p=.68
        # ref:  mc=.6 mf=1.0; rc=rf=1 -> r=.70; 1 chunk, n_avg=(3+2)/2
        np.testing.assert_allclose(s, self._hand(0.68, 0.70, 1, 2.5), rtol=1e-12)

    def test_paraphrase_table_never_displaces_exact_matches(self, tmp_path):
        # REGRESSION: on identical sentences the 3 exact matches cover 6
        # words; the 'sat down ||| sat' paraphrase covers only 5 with he-he.
        # A size-first greedy picked the bigger single match and LOWERED the
        # score of an exact pair; the coverage-first beam must not.
        from grit_tpu.data.metrics.meteor import Meteor

        para = tmp_path / "para.txt"
        para.write_text("sat down ||| sat\n")
        bare = Meteor()._score_pair("he sat down", "he sat down")
        with_table = Meteor(paraphrase_file=str(para))._score_pair(
            "he sat down", "he sat down")
        np.testing.assert_allclose(with_table, bare, rtol=1e-12)
        np.testing.assert_allclose(bare, self._hand(1.0, 1.0, 1, 3), rtol=1e-12)

    def test_fragmentation_chunks(self):
        from grit_tpu.data.metrics.meteor import Meteor

        s = Meteor()._score_pair("sat cat the", "the cat sat")
        # all 3 words match exactly but in 3 chunks: pen = .6 * (3/3)^.2 = .6
        np.testing.assert_allclose(s, 0.4, rtol=1e-12)
