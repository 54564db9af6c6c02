"""N-gram decontamination janitor.

The reference harness ships a 13-gram "janitor" that registers the eval
set's n-grams and scrubs matching windows out of training/context text
(reference: rag-evaluation-harness/lm_eval/decontamination/janitor.py,
with a pybind11 C++ fast path). Same behavior here, clean-room:

  * ``register_contaminant(text)`` adds the normalized text's n-grams;
  * ``clean(text)`` removes ``window_to_remove`` characters around every
    contaminated n-gram and returns the remaining clean slices (dropping
    slices shorter than ``minimum_slice_length``); a document with more
    than ``too_dirty_cutoff`` matches is dropped entirely.

A C shared-library fast path (native/rstpu_janitor.cpp, loaded via
ctypes) accelerates the n-gram scan; the pure-python path is always
available and behaviorally identical.
"""

from __future__ import annotations

import ctypes
import logging
import os
import string
import threading
from typing import Iterable, Iterator, List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)

# ------------------------------------------------------------ native path
_NATIVE_LOCK = threading.Lock()
_NATIVE_LIB = None
_NATIVE_TRIED = False


def _native_lib():
    """Load (building on first use) native/rstpu_janitor.cpp via ctypes."""
    global _NATIVE_LIB, _NATIVE_TRIED
    with _NATIVE_LOCK:
        if _NATIVE_TRIED:
            return _NATIVE_LIB
        _NATIVE_TRIED = True
        from retrieval_scaling_tpu.data.native_io import _build_library, _native_dir

        src = os.path.join(_native_dir(), "rstpu_janitor.cpp")
        so = os.path.join(_native_dir(), "librstpu_janitor.so")
        if not os.path.exists(src):
            return None
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            if not _build_library(src, so):
                return None
        lib = ctypes.CDLL(so)
        lib.janitor_create.restype = ctypes.c_void_p
        lib.janitor_create.argtypes = [ctypes.c_int]
        lib.janitor_destroy.argtypes = [ctypes.c_void_p]
        lib.janitor_register.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
        lib.janitor_ngram_count.restype = ctypes.c_int64
        lib.janitor_ngram_count.argtypes = [ctypes.c_void_p]
        lib.janitor_scan.restype = ctypes.c_int64
        lib.janitor_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _NATIVE_LIB = lib
        return lib


def normalize_string(s: str) -> str:
    return s.translate(_PUNCT_TABLE).lower()


def word_ngrams(s: str, n: int) -> Iterator[str]:
    tokens = s.split()
    for i in range(len(tokens) - n + 1):
        yield " ".join(tokens[i : i + n])


class Janitor:
    def __init__(
        self,
        ngram_n: int = 13,
        window_to_remove: int = 200,
        too_dirty_cutoff: int = 10,
        minimum_slice_length: int = 200,
        use_native: bool | None = None,
    ) -> None:
        self.ngram_n = ngram_n
        self.window_to_remove = window_to_remove
        self.too_dirty_cutoff = too_dirty_cutoff
        self.minimum_slice_length = minimum_slice_length
        self.dirt_ngrams: set = set()
        self.clean_docs = 0
        self.dirty_docs = 0
        self.ngrams_removed = 0
        # C++ fast path (native/rstpu_janitor.cpp): FNV n-gram set + scan.
        lib = None if use_native is False else _native_lib()
        self._lib = lib
        self._native = (
            lib.janitor_create(ngram_n) if lib is not None else None
        )

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None and getattr(self, "_native", None) is not None:
            lib.janitor_destroy(self._native)
            self._native = None

    # ------------------------------------------------------------ register
    def register_contaminant(self, dirt_string: str) -> None:
        if self._native is not None:
            blob = dirt_string.encode("utf-8", errors="ignore")
            self._lib.janitor_register(self._native, blob, len(blob))
            return
        self.dirt_ngrams.update(
            word_ngrams(normalize_string(dirt_string), self.ngram_n)
        )

    def register_contaminants(self, texts: Iterable[str]) -> None:
        for t in texts:
            self.register_contaminant(t)

    # ------------------------------------------------------------ clean
    def contamination_spans(self, dirty_string: str) -> List[Tuple[int, int]]:
        """(start, end) char spans of contaminated n-grams in the ORIGINAL
        string (matching runs on the normalized form; spans are mapped back
        via per-word positions, like the reference's indices variant)."""
        if self._native is not None:
            blob = dirty_string.encode("utf-8", errors="ignore")
            max_spans = max(len(blob) // max(self.ngram_n, 1), 64)
            buf = np.zeros(2 * max_spans, np.int32)
            n = self._lib.janitor_scan(
                self._native, blob, len(blob),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_spans,
            )
            n_stored = min(int(n), max_spans)
            # byte offsets == char offsets for ascii; map back for non-ascii
            if len(blob) != len(dirty_string):
                # build byte->char map once
                b2c = np.zeros(len(blob) + 1, np.int32)
                pos = 0
                for ci, ch in enumerate(dirty_string):
                    for _ in range(len(ch.encode("utf-8"))):
                        b2c[pos] = ci
                        pos += 1
                b2c[len(blob)] = len(dirty_string)
                return [
                    (int(b2c[buf[2 * i]]), int(b2c[buf[2 * i + 1]]))
                    for i in range(n_stored)
                ]
            return [(int(buf[2 * i]), int(buf[2 * i + 1])) for i in range(n_stored)]
        spans = []
        # normalize per word so char positions stay aligned with the
        # original string's whitespace structure
        import re

        # punctuation-only tokens vanish under normalization on the
        # REGISTER side too, so they must not occupy n-gram slots here
        words = [
            (normalize_string(m.group(0)), m.start(), m.end() - 1)
            for m in re.finditer(r"\S+", dirty_string)
        ]
        words = [w for w in words if w[0]]
        n = self.ngram_n
        for i in range(len(words) - n + 1):
            chunk = words[i : i + n]
            ngram = " ".join(w for w, _, _ in chunk)
            if ngram in self.dirt_ngrams:
                spans.append((chunk[0][1], chunk[-1][2]))
        return spans

    def clean(self, dirty_string: str) -> List[str]:
        spans = self.contamination_spans(dirty_string)
        if not spans:
            self.clean_docs += 1
            return [dirty_string]
        if len(spans) > self.too_dirty_cutoff:
            self.dirty_docs += 1
            self.ngrams_removed += len(spans)
            return []
        self.ngrams_removed += len(spans)
        w = self.window_to_remove
        cut = [(max(0, s - w), min(len(dirty_string), e + 1 + w)) for s, e in spans]
        cut.sort()
        merged = [cut[0]]
        for s, e in cut[1:]:
            if s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        slices, pos = [], 0
        for s, e in merged:
            if s - pos >= self.minimum_slice_length:
                slices.append(dirty_string[pos:s])
            pos = e
        if len(dirty_string) - pos >= self.minimum_slice_length:
            slices.append(dirty_string[pos:])
        return slices

    def is_contaminated(self, text: str) -> bool:
        if self._native is not None:
            return bool(self.contamination_spans(text))
        norm = normalize_string(text)
        return any(g in self.dirt_ngrams for g in word_ngrams(norm, self.ngram_n))


def decontaminate_ctxs(
    eval_docs: Sequence[str],
    rows: Sequence[dict],
    ngram_n: int = 13,
) -> Tuple[List[dict], int]:
    """Drop retrieved ctxs whose text shares an n-gram with any eval doc —
    the request-level decontamination pass the reference applies to RAG
    contexts. Returns (rows with clean ctxs, number removed)."""
    janitor = Janitor(ngram_n=ngram_n)
    janitor.register_contaminants(eval_docs)
    removed = 0
    out = []
    for row in rows:
        ctxs = row.get("ctxs") or []
        clean = [
            c for c in ctxs
            if c is None or not janitor.is_contaminated(c.get("retrieval text", ""))
        ]
        removed += len(ctxs) - len(clean)
        out.append({**row, "ctxs": clean})
    return out, removed
