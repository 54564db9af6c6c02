"""Retrieval answer-recall validation (R@k).

Re-implements the reference's ``validate()`` + ``calculate_matches`` chain
(reference: src/search.py:112-123, contriever/src/evaluation.py:48-118):
for each query, check whether any of the top-j retrieved passages contains
a gold answer (DPR-style normalized-token containment, or regex mode), and
report top-k hit rates R@{5,10,20,100}.
"""

from __future__ import annotations

import logging
import re
import unicodedata
from concurrent.futures import ProcessPoolExecutor
from typing import List, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text).lower()


def _tokenize(text: str) -> List[str]:
    return _WORD_RE.findall(_normalize(text))


def has_answer(answers: Sequence[str], passage_text: str, match_type: str = "string") -> bool:
    """DPR-style containment check (contriever/src/evaluation.py:77-101)."""
    if match_type == "regex":
        for answer in answers:
            try:
                if re.search(answer, passage_text, flags=re.IGNORECASE | re.UNICODE):
                    return True
            except re.error:
                continue
        return False

    text_tokens = _tokenize(passage_text)
    for answer in answers:
        ans_tokens = _tokenize(answer)
        if not ans_tokens:
            continue
        n = len(ans_tokens)
        for i in range(len(text_tokens) - n + 1):
            if text_tokens[i : i + n] == ans_tokens:
                return True
    return False


def _match_one(item):
    answers, ctx_texts, match_type = item
    return [has_answer(answers, t, match_type) for t in ctx_texts]


def calculate_matches(
    data: List[dict],
    workers: int = 8,
    match_type: str = "string",
) -> List[List[bool]]:
    """Per-query, per-rank answer-hit booleans."""
    items = []
    for ex in data:
        answers = ex.get("answers") or ex.get("answer") or []
        if isinstance(answers, str):
            answers = [answers]
        ctxs = [c for c in (ex.get("ctxs") or []) if c]
        items.append((answers, [c.get("retrieval text", c.get("text", "")) for c in ctxs], match_type))
    if len(items) < 8 or workers <= 1:
        return [_match_one(it) for it in items]
    with ProcessPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(_match_one, items, chunksize=16))


def top_k_hits(matches: List[List[bool]], max_k: int | None = None) -> List[float]:
    """hits[j] = fraction of queries with an answer in the top-(j+1)."""
    if not matches:
        return []
    max_k = max_k or max((len(m) for m in matches), default=0)
    hits = np.zeros(max_k)
    for per_query in matches:
        first_hit = next((i for i, h in enumerate(per_query) if h), None)
        if first_hit is not None and first_hit < max_k:
            hits[first_hit:] += 1
    return (hits / len(matches)).tolist()


def validate(data: List[dict], workers: int = 8, match_type: str = "string") -> dict:
    """R@{5,10,20,100} summary (reference: src/search.py:112-123)."""
    matches = calculate_matches(data, workers, match_type)
    hits = top_k_hits(matches)
    report = {}
    for k in (5, 10, 20, 100):
        if k <= len(hits):
            report[f"R@{k}"] = hits[k - 1]
    logger.info("Validation: %s", " ".join(f"{k}: {v:.4f}" for k, v in report.items()))
    return report
