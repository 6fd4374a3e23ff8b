"""Native (C++) metric engine vs pure-Python: identical outputs, faster."""

import numpy as np
import pytest

from grit_tpu import native
from grit_tpu.data.metrics import Cider
from grit_tpu.data.tokenizer import ptb_tokenize_str

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)

RAW = [
    "A man, riding a brown horse!",
    "The dog doesn't run very fast.",
    "Two dogs playing -- in the park...",
    "a man's hat; it's red",
    "There are 3 people and 1,000 trees.",
]

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


class TestNativeTokenizer:
    def test_matches_python_tokenizer(self):
        got = native.ptb_tokenize_batch(RAW)
        want = [ptb_tokenize_str(s) for s in RAW]
        assert got == want


class TestNativeCider:
    def test_matches_python_cider(self):
        py_corpus, py_per = Cider().compute_score(GTS, RES)
        nat = native.NativeCider()
        nat_corpus, nat_per = nat.compute_score(GTS, RES)
        np.testing.assert_allclose(nat_corpus, py_corpus, rtol=1e-10)
        np.testing.assert_allclose(nat_per, py_per, rtol=1e-10)

    def test_precomputed_corpus_matches_python(self):
        py = Cider(gts=GTS).compute_score(GTS, RES)
        nat = native.NativeCider(corpus_refs=GTS).compute_score(GTS, RES)
        np.testing.assert_allclose(nat[0], py[0], rtol=1e-10)
        np.testing.assert_allclose(nat[1], py[1], rtol=1e-10)

    def test_large_batch_speed(self):
        import time

        gts = {i: GTS["a"] for i in range(2000)}
        res = {i: RES["a"] for i in range(2000)}
        nat = native.NativeCider()
        t0 = time.time()
        nat.compute_score(gts, res)
        native_t = time.time() - t0
        t0 = time.time()
        Cider(use_native=False).compute_score(gts, res)
        py_t = time.time() - t0
        # native should beat Python comfortably at corpus scale
        assert native_t < py_t
