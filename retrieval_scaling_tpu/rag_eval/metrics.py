"""Task metrics (SQuAD-style normalization), matching lm-eval semantics
(reference: rag-evaluation-harness/lm_eval/api/metrics.py)."""

from __future__ import annotations

import re
import string
from collections import Counter
from typing import List, Sequence


def normalize_squad(text: str) -> str:
    text = text.lower()
    text = "".join(c for c in text if c not in string.punctuation)
    text = re.sub(r"\b(a|an|the)\b", " ", text)
    return " ".join(text.split())


def exact_match(prediction: str, references: Sequence[str]) -> float:
    pred = normalize_squad(prediction)
    return float(any(pred == normalize_squad(ref) for ref in references))


def contains_match(prediction: str, references: Sequence[str]) -> float:
    pred = normalize_squad(prediction)
    return float(any(normalize_squad(ref) in pred for ref in references))


def f1_score(prediction: str, references: Sequence[str]) -> float:
    pred_tokens = normalize_squad(prediction).split()
    best = 0.0
    for ref in references:
        ref_tokens = normalize_squad(ref).split()
        common = sum((Counter(pred_tokens) & Counter(ref_tokens)).values())
        if common == 0 or not pred_tokens or not ref_tokens:
            continue
        p = common / len(pred_tokens)
        r = common / len(ref_tokens)
        best = max(best, 2 * p * r / (p + r))
    return best


def regex_match(prediction: str, references: Sequence[str]) -> float:
    """CuratedTREC-style answer matching: references ARE regex patterns
    (the DPR/contriever evaluation convention the reference inherits via
    contriever/src/evaluation.py `regex` match mode)."""
    for ref in references:
        try:
            if re.search(ref, prediction, flags=re.IGNORECASE | re.UNICODE):
                return 1.0
        except re.error:
            # malformed pattern: fall back to normalized containment
            if normalize_squad(ref) in normalize_squad(prediction):
                return 1.0
    return 0.0


METRICS = {
    "exact_match": exact_match,
    "contains": contains_match,
    "f1": f1_score,
    "regex_match": regex_match,
}


def aggregate_mean(values: List[float]) -> float:
    return sum(values) / len(values) if values else 0.0
