"""ctypes binding for the native fastmetrics library (with auto-build).

Provides ``ptb_tokenize_batch`` and ``NativeCider`` — C++ replacements for
the reference's Java metric subprocesses (see fastmetrics.cpp).  The shared
library compiles on first use with g++ (cached next to this file); every
entry point degrades gracefully to the pure-Python implementations in
``grit_tpu.data`` if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastmetrics.cpp")
_SO = os.path.join(_HERE, "_fastmetrics.so")

_lib = None
_lock = threading.Lock()


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        path = _build()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.fm_ptb_tokenize.restype = ctypes.c_void_p
        lib.fm_ptb_tokenize.argtypes = [ctypes.c_char_p]
        lib.fm_free.argtypes = [ctypes.c_void_p]
        lib.fm_cider_corpus_new.restype = ctypes.c_void_p
        lib.fm_cider_corpus_new.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.fm_cider_corpus_free.argtypes = [ctypes.c_void_p]
        lib.fm_cider_scores.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def ptb_tokenize_batch(captions: list[str]) -> list[str]:
    """Native PTB tokenization of a batch -> space-joined token strings."""
    lib = get_lib()
    joined = "\n".join(c.replace("\n", " ") for c in captions).encode()
    ptr = lib.fm_ptb_tokenize(joined)
    try:
        out = ctypes.string_at(ptr).decode()
    finally:
        lib.fm_free(ptr)
    return out.split("\n")


class NativeCider:
    """CIDEr-D over pre-tokenized strings; optional precomputed train-corpus idf."""

    def __init__(self, corpus_refs: dict | None = None, sigma: float = 6.0):
        self.sigma = sigma
        self._handle = None
        self._lib = get_lib()
        if corpus_refs is not None:
            joined, offsets = self._pack_refs(list(corpus_refs.values()))
            self._handle = self._lib.fm_cider_corpus_new(
                joined, offsets, len(corpus_refs)
            )

    @staticmethod
    def _pack_refs(grouped: list[list[str]]):
        lines = []
        offsets = [0]
        for refs in grouped:
            lines += [r.replace("\n", " ") for r in refs]
            offsets.append(len(lines))
        arr = (ctypes.c_int32 * len(offsets))(*offsets)
        return "\n".join(lines).encode(), arr

    def compute_score(self, gts: dict, res: dict):
        assert gts.keys() == res.keys()
        keys = list(gts.keys())
        cands = "\n".join(res[k][0].replace("\n", " ") for k in keys).encode()
        joined_refs, offsets = self._pack_refs([gts[k] for k in keys])
        scores = (ctypes.c_double * len(keys))()
        self._lib.fm_cider_scores(
            self._handle, cands, joined_refs, offsets, len(keys),
            ctypes.c_double(self.sigma), scores,
        )
        arr = np.asarray(list(scores))
        return float(arr.mean()), arr

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            try:
                self._lib.fm_cider_corpus_free(self._handle)
            except Exception:
                pass

    def __str__(self):
        return "CIDEr"
