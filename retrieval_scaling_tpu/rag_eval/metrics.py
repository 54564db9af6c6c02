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


def _edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance over token sequences (two-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def word_error_rate(prediction: str, references: Sequence[str]) -> float:
    """Word-level edit distance / reference length (best reference)."""
    pred = prediction.split()
    best = float("inf")
    for ref in references:
        rtoks = ref.split()
        if not rtoks:
            continue
        best = min(best, _edit_distance(pred, rtoks) / len(rtoks))
    return best if best != float("inf") else float(bool(pred))


def _bleu_tokenize(text: str):
    """sacrebleu '13a'-style tokenization: split out punctuation."""
    text = re.sub(r"([^\w\s])", r" \1 ", text)
    return text.split()


def corpus_bleu(pairs: List[tuple], max_n: int = 4) -> float:
    """Corpus-level BLEU (Papineni et al. 2002): pooled modified n-gram
    precision over the corpus, geometric mean over n<=4, brevity penalty.
    Multiple references: per-segment max clip counts, closest ref length."""
    import math

    match = [0] * max_n
    total = [0] * max_n
    pred_len = 0
    ref_len = 0
    for pred, refs in pairs:
        ptoks = _bleu_tokenize(pred)
        rtoks_all = [_bleu_tokenize(r) for r in refs]
        pred_len += len(ptoks)
        ref_len += min((abs(len(r) - len(ptoks)), len(r)) for r in rtoks_all)[1]
        for n in range(1, max_n + 1):
            pgrams = Counter(tuple(ptoks[i:i + n]) for i in range(len(ptoks) - n + 1))
            max_ref = Counter()
            for rtoks in rtoks_all:
                rgrams = Counter(tuple(rtoks[i:i + n]) for i in range(len(rtoks) - n + 1))
                for g, c in rgrams.items():
                    max_ref[g] = max(max_ref[g], c)
            match[n - 1] += sum(min(c, max_ref[g]) for g, c in pgrams.items())
            total[n - 1] += sum(pgrams.values())
    if not pred_len or total[0] == 0 or match[0] == 0:
        return 0.0
    # exponential smoothing for zero higher-order matches (sacrebleu's
    # default smooth_method="exp": the k-th zero precision becomes
    # 1 / (2^k * total_n) instead of collapsing the whole score to 0)
    log_prec, smooth_k = 0.0, 0
    for m, t in zip(match, total):
        if t == 0:
            t = 1
        if m == 0:
            smooth_k += 1
            log_prec += math.log(1.0 / (2**smooth_k * t))
        else:
            log_prec += math.log(m / t)
    log_prec /= max_n
    bp = 1.0 if pred_len > ref_len else math.exp(1 - ref_len / max(pred_len, 1))
    return 100.0 * bp * math.exp(log_prec)


METRICS["wer"] = word_error_rate
