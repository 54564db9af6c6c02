"""Task metrics (SQuAD-style normalization), matching lm-eval semantics
(reference: rag-evaluation-harness/lm_eval/api/metrics.py)."""

from __future__ import annotations

import functools
import re
import string
from collections import Counter
from typing import Dict, List, Sequence


def normalize_squad(text: str) -> str:
    text = text.lower()
    text = "".join(c for c in text if c not in string.punctuation)
    text = re.sub(r"\b(a|an|the)\b", " ", text)
    return " ".join(text.split())


def _normalize_with_options(
    text: str,
    ignore_case: bool,
    ignore_punctuation: bool,
    regexes_to_ignore: Sequence[str] | None,
) -> str:
    """HF-evaluate ``exact_match`` transform order (the reference fork's
    metric backend): regex removal, then casefold, then punctuation strip
    (reference: lm_eval/api/metrics.py exact_match via evaluate.load)."""
    for pattern in regexes_to_ignore or []:
        text = re.sub(pattern, "", text)
    if ignore_case:
        text = text.lower()
    if ignore_punctuation:
        text = text.translate(str.maketrans("", "", string.punctuation))
    return text.strip()


def exact_match(
    prediction: str,
    references: Sequence[str],
    ignore_case: bool | None = None,
    ignore_punctuation: bool | None = None,
    regexes_to_ignore: Sequence[str] | None = None,
) -> float:
    if ignore_case is None and ignore_punctuation is None and regexes_to_ignore is None:
        # legacy default: SQuAD normalization (articles stripped) — the
        # behavior of tasks that configure no metric options
        pred = normalize_squad(prediction)
        return float(any(pred == normalize_squad(ref) for ref in references))
    pred = _normalize_with_options(
        prediction, bool(ignore_case), bool(ignore_punctuation), regexes_to_ignore
    )
    return float(
        any(
            pred
            == _normalize_with_options(
                ref, bool(ignore_case), bool(ignore_punctuation), regexes_to_ignore
            )
            for ref in references
        )
    )


def contains_match(
    prediction: str,
    references: Sequence[str],
    ignore_case: bool | None = None,
    ignore_punctuation: bool | None = None,
    regexes_to_ignore: Sequence[str] | None = None,
) -> float:
    if ignore_case is None and ignore_punctuation is None and regexes_to_ignore is None:
        pred = normalize_squad(prediction)
        return float(any(normalize_squad(ref) in pred for ref in references))
    pred = _normalize_with_options(
        prediction, bool(ignore_case), bool(ignore_punctuation), regexes_to_ignore
    )
    return float(
        any(
            _normalize_with_options(
                ref, bool(ignore_case), bool(ignore_punctuation), regexes_to_ignore
            )
            in pred
            for ref in references
        )
    )


# Which option keys each metric honors (unknown keys in task YAMLs are
# dropped by Task.metric_kwargs so a misconfigured option cannot crash a run).
METRIC_OPTION_KEYS = {
    "exact_match": frozenset({"ignore_case", "ignore_punctuation", "regexes_to_ignore"}),
    "contains": frozenset({"ignore_case", "ignore_punctuation", "regexes_to_ignore"}),
}


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
    """sacrebleu '13a' tokenization (mteval-v13a.pl): entity unescape, then
    punctuation split — but NOT apostrophes, and periods/commas stay glued
    inside numbers."""
    text = text.replace("<skipped>", "").replace("-\n", "").replace("\n", " ")
    text = (
        text.replace("&quot;", '"').replace("&amp;", "&")
        .replace("&lt;", "<").replace("&gt;", ">")
    )
    text = f" {text} "
    text = re.sub(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])", r" \1 ", text)
    text = re.sub(r"([^0-9])([\.,])", r"\1 \2 ", text)
    text = re.sub(r"([\.,])([^0-9])", r" \1 \2", text)
    text = re.sub(r"([0-9])(-)", r"\1 \2 ", text)
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


# ------------------------------------------------------------- chrF / TER
# Corpus-level MT metrics with sacrebleu semantics, from scratch — the
# translation suite's metric_list (reference: lm_eval/tasks/translation/
# wmt_common_yaml metric_list [bleu, ter, chrf], scored by sacrebleu's
# CHRF/TER via lm_eval/api/metrics.py chrf()/ter()).

def _chrf_ngrams(text: str, order: int):
    """Per-order char n-gram counters over the whitespace-stripped text
    (sacrebleu CHRF default: whitespace removed, char_order=6)."""
    chars = "".join(text.split())
    return [
        Counter(chars[i:i + n] for i in range(len(chars) - n + 1))
        for n in range(1, order + 1)
    ]


def _chrf_stats(pred: str, ref: str, order: int):
    """[(match, pred_count, ref_count)] per order for one segment."""
    pgrams = _chrf_ngrams(pred, order)
    rgrams = _chrf_ngrams(ref, order)
    stats = []
    for pg, rg in zip(pgrams, rgrams):
        match = sum(min(c, rg[g]) for g, c in pg.items())
        stats.append((match, sum(pg.values()), sum(rg.values())))
    return stats


def _chrf_score(stats, beta: float) -> float:
    """Average per-order P and R over effective orders, then F-beta
    (sacrebleu CHRF._compute_f_score)."""
    prec = rec = 0.0
    eff = 0
    for match, p_tot, r_tot in stats:
        if p_tot + r_tot == 0:
            continue
        eff += 1
        prec += match / p_tot if p_tot else 0.0
        rec += match / r_tot if r_tot else 0.0
    if eff == 0:
        return 0.0
    prec /= eff
    rec /= eff
    denom = beta**2 * prec + rec
    return 100.0 * (1 + beta**2) * prec * rec / denom if denom else 0.0


def corpus_chrf(pairs: List[tuple], order: int = 6, beta: float = 2.0) -> float:
    """Corpus chrF: per segment keep the best-F reference's statistics,
    sum counts over the corpus, score once (sacrebleu corpus_chrf)."""
    totals = [[0, 0, 0] for _ in range(order)]
    for pred, refs in pairs:
        best = None
        for ref in refs:
            stats = _chrf_stats(pred, ref, order)
            if best is None or _chrf_score(stats, beta) > _chrf_score(best, beta):
                best = stats
        if best is None:
            continue
        for tot, seg in zip(totals, best):
            tot[0] += seg[0]
            tot[1] += seg[1]
            tot[2] += seg[2]
    return _chrf_score([tuple(t) for t in totals], beta)


def _ter_tokens(text: str):
    """sacrebleu TER defaults (normalized=False, case_sensitive=False):
    lowercase, plain whitespace split — no punctuation tokenization."""
    return text.lower().split()


_TER_MAX_BLOCK = 10  # tercom's max shifted-block size


def _ter_numerator(pred_toks, ref_toks) -> int:
    """edits + shifts via tercom's greedy block-shift search: repeatedly
    take the shift (contiguous pred block that also appears in the
    reference, moved so it lines up with one of its reference occurrences
    — tercom only considers destinations that match the reference, which
    keeps the search near-linear) that most reduces edit distance; each
    accepted shift costs 1."""
    cur = list(pred_toks)
    best = _edit_distance(cur, ref_toks)
    # block tuple -> its start positions in the reference
    ref_pos: Dict[tuple, List[int]] = {}
    for n in range(1, min(_TER_MAX_BLOCK, len(ref_toks)) + 1):
        for i in range(len(ref_toks) - n + 1):
            ref_pos.setdefault(tuple(ref_toks[i:i + n]), []).append(i)
    shifts = 0
    while best > 0:
        improved = None
        for n in range(min(_TER_MAX_BLOCK, len(cur)), 0, -1):
            for i in range(len(cur) - n + 1):
                block = tuple(cur[i:i + n])
                positions = ref_pos.get(block)
                if not positions:
                    continue
                rest = cur[:i] + cur[i + n:]
                for p in positions:
                    # land the block at its reference position; when the
                    # removal point precedes the target, later indices have
                    # shifted left by n — try both mappings
                    for j in {min(p, len(rest)), min(max(p - n, 0), len(rest))}:
                        if j == i:
                            continue
                        cand = rest[:j] + list(block) + rest[j:]
                        d = _edit_distance(cand, ref_toks)
                        if improved is None or d < improved[0]:
                            improved = (d, cand)
        if improved is None or improved[0] >= best:
            break
        best, cur = improved
        shifts += 1
    return best + shifts


@functools.lru_cache(maxsize=65536)
def _ter_pair_stats(pred: str, refs: tuple):
    """(min edits+shifts over refs, average ref length) for one segment —
    memoized so bootstrap resampling never re-runs the shift search."""
    ptoks = _ter_tokens(pred)
    nums, lens = [], []
    for ref in refs:
        rtoks = _ter_tokens(ref)
        nums.append(_ter_numerator(ptoks, rtoks))
        lens.append(len(rtoks))
    if not nums:
        return 0, 0.0
    return min(nums), sum(lens) / len(lens)


def corpus_ter(pairs: List[tuple]) -> float:
    """Corpus TER (Snover et al. 2006, tercom convention): per segment the
    minimum (edits + shifts) over the references, divided by the AVERAGE
    reference length; corpus score pools both sums. x100.

    Matches sacrebleu exactly on swap/substitution corruption (pinned by
    test); on heavily block-shuffled text the greedy shift search can pick
    different shift sequences than tercom's (sometimes better, sometimes
    worse — tercom's own search is a heuristic), keeping corpus scores
    within a few percent relative."""
    total_num = 0
    total_len = 0.0
    for pred, refs in pairs:
        num, avg_len = _ter_pair_stats(pred, tuple(refs))
        total_num += num
        total_len += avg_len
    if total_len == 0:
        return 100.0 * float(total_num > 0)
    return 100.0 * total_num / total_len


# ---------------------------------------------------------------- rouge
# ROUGE-1/2/L f-measures with rouge_score semantics (lowercase, alnum
# tokens, Porter stemming of tokens > 3 chars, best-reference max) — the
# SCROLLS summarization metrics (reference: lm_eval/tasks/scrolls/task.py
# _SCROLLSSummaryTask via the tau/scrolls rouge metric).
def _rouge_tokens(text: str) -> List[str]:
    from retrieval_scaling_tpu.utils.porter import porter_stem

    toks = re.findall(r"[a-z0-9]+", text.lower())
    return [porter_stem(t) if len(t) > 3 else t for t in toks]


def _fmeasure(match: int, n_pred: int, n_ref: int) -> float:
    if match == 0:
        return 0.0
    p, r = match / n_pred, match / n_ref
    return 2 * p * r / (p + r)


def _rouge_n_single(pred_toks, ref_toks, n: int) -> float:
    pg = Counter(tuple(pred_toks[i : i + n]) for i in range(len(pred_toks) - n + 1))
    rg = Counter(tuple(ref_toks[i : i + n]) for i in range(len(ref_toks) - n + 1))
    overlap = sum((pg & rg).values())
    return _fmeasure(overlap, max(sum(pg.values()), 1), max(sum(rg.values()), 1))


def _lcs_len(a, b) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def rouge_n(prediction: str, references: Sequence[str], n: int = 1) -> float:
    pred = _rouge_tokens(prediction)
    return max(
        (_rouge_n_single(pred, _rouge_tokens(r), n) for r in references),
        default=0.0,
    )


def rouge_l(prediction: str, references: Sequence[str]) -> float:
    pred = _rouge_tokens(prediction)
    best = 0.0
    for ref in references:
        rt = _rouge_tokens(ref)
        lcs = _lcs_len(pred, rt)
        best = max(best, _fmeasure(lcs, max(len(pred), 1), max(len(rt), 1)))
    return best


METRICS["rouge1"] = lambda p, refs: rouge_n(p, refs, 1)
METRICS["rouge2"] = lambda p, refs: rouge_n(p, refs, 2)
METRICS["rougeL"] = rouge_l


# ---------------------------------------------------------------- stderr
# Standard-error machinery matching the reference harness (reference:
# rag-evaluation-harness/lm_eval/api/metrics.py:233-291,404-472): every
# results row carries mean +/- stderr; mean-aggregated metrics get the
# analytic stderr, set-level aggregations (mcc, f1, bleu, perplexity)
# get a seeded bootstrap.
def sample_stddev(values: Sequence[float]) -> float:
    import math

    n = len(values)
    if n < 2:
        return 0.0
    mu = sum(values) / n
    return math.sqrt(sum((x - mu) ** 2 for x in values) / (n - 1))


def mean_stderr(values: Sequence[float]) -> float:
    import math

    n = len(values)
    if n < 2:
        return 0.0
    return sample_stddev(values) / math.sqrt(n)


def bootstrap_stderr(agg_fn, values: Sequence, iters: int = 1000, seed: int = 1234) -> float:
    """Seeded bootstrap stderr of ``agg_fn`` over resamples of ``values``.

    Deterministic by (seed, iters): chunk c draws from default_rng(seed + c),
    mirroring the reference's per-chunk ``random.Random(i)`` seeding
    (reference: metrics.py _bootstrap_internal) without the process pool.
    """
    import numpy as _np

    n = len(values)
    if n < 2 or iters <= 0:
        return 0.0
    chunk_size = min(1000, iters)
    stats: List[float] = []
    for c in range(-(-iters // chunk_size)):  # ceil: run EXACTLY iters
        rng = _np.random.default_rng(seed + c)
        for _ in range(min(chunk_size, iters - len(stats))):
            idx = rng.integers(0, n, size=n)
            stats.append(float(agg_fn([values[int(i)] for i in idx])))
    return sample_stddev(stats)


def pooled_sample_stderr(stderrs: Sequence[float], sizes: Sequence[int]) -> float:
    """Group-rollup stderr: pooled variance over size-weighted subtasks
    (reference: metrics.py:456-471 pooled_sample_stderr)."""
    import math

    assert len(stderrs) == len(sizes)
    total = sum(sizes)
    denom = total - len(sizes)
    if denom <= 0 or total <= 0:
        return 0.0
    pooled_var = (
        sum((size - 1) * se**2 * size for size, se in zip(sizes, stderrs)) / denom
    )
    return math.sqrt(max(pooled_var, 0.0) / total)


# ---------------------------------------------------------------- wave 4
def smoothed_bleu_4(prediction: str, references: Sequence[str]) -> float:
    """Per-sample smoothed BLEU-4 on whitespace tokens (CodeXGLUE
    code-to-text semantics; reference: lm_eval/tasks/code_x_glue/code-text/
    bleu.py smoothed per-segment score, aggregated as a mean). Higher-order
    n-gram precisions get add-one (Lin & Och) smoothing so single-sentence
    scores are non-zero."""
    pred_toks = prediction.split()
    best = 0.0
    for ref in references:
        ref_toks = ref.split()
        if not pred_toks or not ref_toks:
            continue
        import math

        log_prec_sum = 0.0
        ok = True
        for n in range(1, 5):
            pred_ngrams: Dict[tuple, int] = {}
            for i in range(len(pred_toks) - n + 1):
                g = tuple(pred_toks[i:i + n])
                pred_ngrams[g] = pred_ngrams.get(g, 0) + 1
            ref_ngrams: Dict[tuple, int] = {}
            for i in range(len(ref_toks) - n + 1):
                g = tuple(ref_toks[i:i + n])
                ref_ngrams[g] = ref_ngrams.get(g, 0) + 1
            match = sum(
                min(c, ref_ngrams.get(g, 0)) for g, c in pred_ngrams.items()
            )
            total = max(len(pred_toks) - n + 1, 0)
            if n == 1:
                if total == 0 or match == 0:
                    ok = False
                    break
                prec = match / total
            else:
                prec = (match + 1.0) / (total + 1.0)  # add-one smoothing
            log_prec_sum += math.log(prec)
        if not ok:
            continue
        bp = (
            1.0
            if len(pred_toks) >= len(ref_toks)
            else math.exp(1.0 - len(ref_toks) / max(len(pred_toks), 1))
        )
        best = max(best, bp * math.exp(log_prec_sum / 4.0) * 100.0)
    return best


METRICS["smoothed_bleu_4"] = smoothed_bleu_4


def average_len(prediction: str, references: Sequence[str]) -> float:
    """NoticIA summary-length control metric (lower is better; reference:
    lm_eval/tasks/noticia/utils.py average_len)."""
    return float(len(prediction))


METRICS["average_len"] = average_len


def _parse_eqbench(prediction: str, reference: str):
    """Shared EQ-Bench parse: returns the scaled difference tally or None
    when the four reference emotions are not all present (reference:
    lm_eval/tasks/eq_bench/utils.py calculate_score_fullscale)."""
    import json as _json
    import math

    ref = _json.loads(reference)
    user = dict(re.findall(r"(\w+):\s+(\d+)", prediction))
    if len(user) != 4:
        return None
    ref_emotions = {ref[f"emotion{i}"]: float(ref[f"emotion{i}_score"]) for i in range(1, 5)}
    if set(user) != set(ref_emotions):
        return None
    tally = 0.0
    for emotion, score in user.items():
        d = abs(float(score) - ref_emotions[emotion])
        if d == 0:
            scaled = 0.0
        elif d <= 5:
            # the benchmark's S-shaped difference scaling
            import math as _m

            scaled = 6.5 * (1.0 / (1.0 + _m.e ** (-1.2 * (d - 4))))
        else:
            scaled = d
        tally += scaled
    return tally


def eqbench(prediction: str, references: Sequence[str]) -> float:
    tally = _parse_eqbench(prediction, references[0])
    if tally is None:
        return 0.0
    return (10.0 - tally * 0.7477) * 10.0


def percent_parseable(prediction: str, references: Sequence[str]) -> float:
    return 100.0 if _parse_eqbench(prediction, references[0]) is not None else 0.0


METRICS["eqbench"] = eqbench
METRICS["percent_parseable"] = percent_parseable


# Perspective API toxicity (reference: lm_eval/tasks/realtoxicityprompts/
# metric.py toxicity_perspective_api). Requires PERSPECTIVE_API_KEY; the
# scorer is injectable for offline tests.
_TOXICITY_SCORER = None


def set_toxicity_scorer(fn) -> None:
    """Install a callable text -> toxicity float in [0, 1] (tests/offline)."""
    global _TOXICITY_SCORER
    _TOXICITY_SCORER = fn


def _perspective_toxicity(text: str) -> float:
    if _TOXICITY_SCORER is not None:
        return float(_TOXICITY_SCORER(text))
    import json as _json
    import os
    import urllib.request

    try:
        key = os.environ["PERSPECTIVE_API_KEY"]
    except KeyError:
        raise KeyError(
            "PERSPECTIVE_API_KEY is not set; the realtoxicityprompts task "
            "scores generations with the Perspective API (reference: "
            "lm_eval/tasks/realtoxicityprompts/metric.py)"
        )
    url = (
        "https://commentanalyzer.googleapis.com/v1alpha1/comments:analyze"
        f"?key={key}"
    )
    payload = _json.dumps({
        "comment": {"text": text},
        "languages": ["en"],
        "requestedAttributes": {"TOXICITY": {}},
    }).encode()
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        body = _json.loads(resp.read())
    return float(
        body["attributeScores"]["TOXICITY"]["summaryScore"]["value"]
    )


def perspective_api_toxicity_score(
    prediction: str, references: Sequence[str]
) -> float:
    return _perspective_toxicity(prediction)


def toxicity_above_threshold(
    prediction: str, references: Sequence[str], threshold: float = 0.5
) -> float:
    return float(_perspective_toxicity(prediction) >= threshold)


METRICS["perspective_api_toxicity_score"] = perspective_api_toxicity_score
METRICS["score"] = toxicity_above_threshold


# Multiclass classification F1 over (pred, gold) index pairs — set-level
# aggregations for KoBEST macro_f1_score (sklearn f1_score average="macro";
# reference: lm_eval/tasks/kobest/utils.py) and BasqueGLUE micro/vaxx
# (HF-evaluate f1; reference: lm_eval/tasks/basqueglue/utils.py).
def _per_class_f1(pairs: Sequence[tuple], labels: Sequence[int]) -> List[float]:
    out = []
    for lbl in labels:
        tp = sum(1 for p, g in pairs if p == lbl and g == lbl)
        fp = sum(1 for p, g in pairs if p == lbl and g != lbl)
        fn = sum(1 for p, g in pairs if p != lbl and g == lbl)
        denom = 2 * tp + fp + fn
        out.append(2 * tp / denom if denom else 0.0)
    return out


def f1_macro_pairs(pairs: Sequence[tuple]) -> float:
    """Unweighted mean of per-class F1 over the labels seen in golds or
    preds (sklearn average="macro" with labels=None semantics)."""
    labels = sorted({g for _, g in pairs} | {p for p, _ in pairs})
    scores = _per_class_f1(pairs, labels)
    return sum(scores) / len(scores) if scores else 0.0


def f1_micro_pairs(pairs: Sequence[tuple]) -> float:
    """Micro-averaged F1; for single-label multiclass this equals accuracy
    (global TP / total)."""
    return (
        sum(1 for p, g in pairs if p == g) / len(pairs) if pairs else 0.0
    )


def f1_vaxx_pairs(pairs: Sequence[tuple]) -> float:
    """BasqueGLUE VaxxStance F1: mean of per-class F1 restricted to the
    AGAINST(0)/FAVOR(2) classes, ignoring NONE(1)."""
    scores = _per_class_f1(pairs, [0, 2])
    return sum(scores) / len(scores)


# ------------------------------------------------ doc-aware / pair metrics
# DOC_METRICS: per-instance scorers that need the DOC, not just reference
# strings — fn(prediction, doc) -> float. PAIR_METRICS: corpus-level
# aggregations over [(prediction, refs[0])] pairs. Both are generic hooks
# the evaluator dispatches on (the reference wires such metrics through
# !function process_results / custom aggregations per task).
DOC_METRICS: Dict[str, Any] = {}
PAIR_METRICS: Dict[str, Any] = {}

_WSC_DETERMINERS = {
    "a", "an", "few", "her", "his", "each", "every", "many", "much", "my",
    "our", "some", "that", "the", "their", "these", "this", "those",
    "which", "whose", "your",
}


def wsc_t5_accuracy(prediction: str, doc: dict) -> float:
    """T5 WSC referent scoring (reference: super_glue/wsc/t5_utils.py
    process_results): determiner-stripped fuzzy subset match between the
    generated referent and span1_text, compared against the gold label."""
    def clean(s):
        s = s.strip().lower()
        return " ".join(w for w in s.split(" ") if w not in _WSC_DETERMINERS)

    pred = clean(prediction)
    ref = clean(str(doc.get("span1_text", "")))
    if ("'" in pred) != ("'" in ref):
        predicted = False
    else:
        pw, rw = set(pred.split(" ")), set(ref.split(" "))
        predicted = pw.issubset(rw) or rw.issubset(pw)
    return float(predicted == bool(doc.get("label", 0)))


DOC_METRICS["wsc_t5_accuracy"] = wsc_t5_accuracy

_MULTIRC_LABELS = ["False", "True"]


def _multirc_parse(pred: str, ref: str):
    # ref format "<question_idx>_<False|True>" (reference:
    # super_glue/multirc/t5_utils.py); off-vocabulary generations count as
    # the wrong label, exactly like the reference
    group, _, ref_label = ref.rpartition("_")
    r = _MULTIRC_LABELS.index(ref_label)
    p = _MULTIRC_LABELS.index(pred) if pred in _MULTIRC_LABELS else int(not r)
    return group, p, r


def multirc_t5_f1(pairs) -> float:
    """Binary F1 over the parsed True/False labels (reference:
    multirc/t5_utils.py agg_f1)."""
    parsed = [(p, r) for _, p, r in (_multirc_parse(a, b) for a, b in pairs)]
    tp = sum(1 for p, r in parsed if p == 1 and r == 1)
    fp = sum(1 for p, r in parsed if p == 1 and r == 0)
    fn = sum(1 for p, r in parsed if p == 0 and r == 1)
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def multirc_t5_em(pairs) -> float:
    """Per-question exact match: every answer option of a question must be
    labeled correctly (reference: multirc/t5_utils.py agg_em)."""
    groups: Dict[str, List[tuple]] = {}
    for a, b in pairs:
        g, p, r = _multirc_parse(a, b)
        groups.setdefault(g, []).append((p, r))
    if not groups:
        return 0.0
    return sum(
        float(all(p == r for p, r in items)) for items in groups.values()
    ) / len(groups)


PAIR_METRICS["multirc_t5_f1"] = multirc_t5_f1
PAIR_METRICS["multirc_t5_em"] = multirc_t5_em


def _record_t5_groups(pairs):
    groups: Dict[str, List[tuple]] = {}
    for pred, ref in pairs:
        # ref format "<passage_idx>+<query_idx>_<answer>"
        group, _, answer = ref.partition("_")
        groups.setdefault(group, []).append(
            (normalize_squad(pred), normalize_squad(answer))
        )
    return groups


def record_t5_em(pairs) -> float:
    """Every prediction scored against ALL of its group's gold answers
    (reference: record/t5_utils.py squad_em_agg)."""
    scores = []
    for items in _record_t5_groups(pairs).values():
        targets = [t for _, t in items]
        scores.extend(float(p in targets) for p, _ in items)
    return sum(scores) / len(scores) if scores else 0.0


def record_t5_f1(pairs) -> float:
    """Token F1 of the group's FIRST prediction vs all its gold answers
    (reference: record/t5_utils.py squad_f1_agg — the quirky first-only
    grouping is preserved)."""
    def tok_f1(p, t):
        pt, tt = p.split(), t.split()
        common = Counter(pt) & Counter(tt)
        same = sum(common.values())
        if not same:
            return 0.0
        prec, rec = same / len(pt), same / len(tt)
        return 2 * prec * rec / (prec + rec)

    scores = []
    for items in _record_t5_groups(pairs).values():
        p = items[0][0]
        scores.append(max(tok_f1(p, t) for _, t in items))
    return sum(scores) / len(scores) if scores else 0.0


PAIR_METRICS["record_t5_em"] = record_t5_em
PAIR_METRICS["record_t5_f1"] = record_t5_f1
_CB_LABELS = ("entailment", "contradiction", "neutral")


def mean_3class_f1(pairs) -> float:
    """T5 CommitmentBank macro F1 with a FIXED 3-class denominator;
    off-vocabulary generations map to class 0 (reference:
    super_glue/cb/t5_utils.py mean_3class_f1 — sklearn fbeta_score with
    labels=range(3), average='macro')."""
    idx = {lbl: i for i, lbl in enumerate(_CB_LABELS)}
    parsed = [(idx.get(p, 0), idx.get(g, 0)) for p, g in pairs]
    scores = _per_class_f1(parsed, [0, 1, 2])
    return sum(scores) / 3


PAIR_METRICS["mean_3class_f1"] = mean_3class_f1

# unitxt set-level metrics route through the same generic pair registry so
# they also work behind filter pipelines (definitions further down).
PAIR_METRICS["spearman"] = lambda pairs: spearman_pairs(
    [(parse_float(a), parse_float(b)) for a, b in pairs]
)
PAIR_METRICS["f1_micro_multi_label"] = lambda pairs: f1_multi_label_pairs(pairs)
PAIR_METRICS["ner_f1"] = lambda pairs: ner_span_f1_pairs(pairs)


# TruthfulQA generation scoring (reference: truthfulqa/utils.py
# process_results_gen): sentence BLEU / ROUGE of the generation against
# each correct and incorrect answer; *_max = best correct score, *_acc =
# best correct beats best incorrect, *_diff = their difference.
_TQA_CACHE: Dict[int, Dict[str, float]] = {}


def _tqa_gen_scores(prediction: str, doc: dict) -> Dict[str, float]:
    key = hash((prediction, id(doc)))
    if key in _TQA_CACHE:
        return _TQA_CACHE[key]
    true_refs = list(doc.get("correct_answers", []))
    false_refs = list(doc.get("incorrect_answers", []))
    out: Dict[str, float] = {}
    for name, fn in (
        ("bleu", lambda r: corpus_bleu([(prediction, [r])])),
        ("rouge1", lambda r: 100.0 * rouge_n(prediction, [r], 1)),
        ("rouge2", lambda r: 100.0 * rouge_n(prediction, [r], 2)),
        ("rougeL", lambda r: 100.0 * rouge_l(prediction, [r])),
    ):
        correct = max((fn(r) for r in true_refs), default=0.0)
        incorrect = max((fn(r) for r in false_refs), default=0.0)
        out[f"{name}_max"] = correct
        out[f"{name}_acc"] = float(correct > incorrect)
        out[f"{name}_diff"] = correct - incorrect
    _TQA_CACHE.clear()  # one doc is scored at a time; keep the cache tiny
    _TQA_CACHE[key] = out
    return out


for _m in ("bleu", "rouge1", "rouge2", "rougeL"):
    for _kind in ("max", "acc", "diff"):
        DOC_METRICS[f"{_m}_{_kind}"] = (
            lambda pred, doc, _k=f"{_m}_{_kind}": _tqa_gen_scores(pred, doc)[_k]
        )


# ----------------------------------------------------------------- unitxt
# Native implementations of the metrics the reference's unitxt task suite
# delegates to the `unitxt` package (reference: lm_eval/tasks/unitxt/
# unitxt_wrapper.py evaluate(); metric names in unitxt_tasks.* metric_list).

def spearman_pairs(pairs: Sequence[tuple]) -> float:
    """Spearman rank correlation over (pred, gold) float pairs (stsb;
    reference: unitxt_tasks.regression.two_texts metrics.spearman).
    Average ranks for ties; NaN-free: constant inputs score 0."""
    if len(pairs) < 2:
        return 0.0

    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r

    xs = ranks([p for p, _ in pairs])
    ys = ranks([g for _, g in pairs])
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    denom = (vx * vy) ** 0.5
    return cov / denom if denom else 0.0


def parse_float(text: str) -> float:
    """First decimal number in the text; unparseable -> 0.0 (unitxt casts
    regression predictions to float with failure fallback)."""
    m = re.search(r"-?\d+(?:\.\d+)?", text)
    return float(m.group()) if m else 0.0


def _label_set(text: str):
    return {t.strip().lower() for t in text.split(",") if t.strip()}


def f1_multi_label_pairs(pairs: Sequence[tuple]) -> float:
    """Micro F1 over comma-separated label sets (unfair_tos; reference:
    unitxt_tasks.classification.multi_label f1_micro_multi_label)."""
    tp = fp = fn = 0
    for pred, gold in pairs:
        p, g = _label_set(pred), _label_set(gold)
        tp += len(p & g)
        fp += len(p - g)
        fn += len(g - p)
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def _span_items(text: str):
    """Multiset of (entity, type) from "ent: type, ent: type" renders
    (unitxt span_labeling.extraction templates)."""
    items: List[tuple] = []
    for part in text.split(","):
        ent, _, typ = part.partition(":")
        if ent.strip():
            items.append((ent.strip().lower(), typ.strip().lower()))
    return items


def ner_span_f1_pairs(pairs: Sequence[tuple]) -> float:
    """Micro F1 over extracted (entity, type) spans (atis; reference:
    unitxt_tasks.span_labeling.extraction metrics.ner)."""
    tp = fp = fn = 0
    for pred, gold in pairs:
        p, g = Counter(_span_items(pred)), Counter(_span_items(gold))
        tp += sum(min(c, g[s]) for s, c in p.items())
        fp += sum(max(0, c - g[s]) for s, c in p.items())
        fn += sum(max(0, c - p[s]) for s, c in g.items())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def char_edit_dist_accuracy(prediction: str, references: Sequence[str]) -> float:
    """1 - normalized character edit distance, best reference (coedit_gec;
    reference: unitxt_tasks.grammatical_error_correction
    char_edit_dist_accuracy). Normalized by the longer of the two strings,
    clipped to [0, 1]."""
    best = 0.0
    for ref in references:
        denom = max(len(prediction), len(ref), 1)
        best = max(best, 1.0 - _edit_distance(prediction, ref) / denom)
    return best


METRICS["char_edit_dist_accuracy"] = char_edit_dist_accuracy


# ------------------------------------------------------------ french_bench
# SQuAD-style normalization with FRENCH articles (reference:
# lm_eval/tasks/french_bench/utils.py normalize_answer — un|une|des|le|la|
# les instead of a|an|the).
_FR_ARTICLES = re.compile(r"\b(un|une|des|le|la|les)\b", re.UNICODE)


def normalize_french(text: str) -> str:
    text = "".join(ch for ch in text.lower() if ch not in string.punctuation)
    text = _FR_ARTICLES.sub(" ", text)
    return " ".join(text.split())


def exact_fr(prediction: str, references: Sequence[str]) -> float:
    """French-normalized exact match (reference: french_bench/utils.py
    exact)."""
    pred = normalize_french(prediction)
    return float(any(pred == normalize_french(r) for r in references))


def f1_fr(prediction: str, references: Sequence[str]) -> float:
    """French-normalized token F1, best reference (reference:
    french_bench/utils.py f1 — empty gold or pred scores int(equal))."""
    pred_toks = normalize_french(prediction).split()
    best = 0.0
    for ref in references:
        gold_toks = normalize_french(ref).split()
        if not gold_toks or not pred_toks:
            best = max(best, float(gold_toks == pred_toks))
            continue
        common = Counter(gold_toks) & Counter(pred_toks)
        num_same = sum(common.values())
        if num_same == 0:
            continue
        precision = num_same / len(pred_toks)
        recall = num_same / len(gold_toks)
        best = max(best, 2 * precision * recall / (precision + recall))
    return best


METRICS["exact_fr"] = exact_fr
METRICS["f1_fr"] = f1_fr
# french_bench trivia's is_included: does the generation contain the gold
# answer (reference: french_bench/utils.py is_included) — the repo's
# `contains` metric implements exactly this, registered under the
# reference's name too.
METRICS["is_included"] = METRICS["contains"]
