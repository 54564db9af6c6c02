import json
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.config import config_from_dict
from retrieval_scaling_tpu.search.postprocess import (
    inclusion_metric,
    merge_result_files,
    normalize_answer_text,
    post_hoc_merge_topk_multi_domain,
    remove_short_chunks,
    rerank_ctxs,
    subsample_by_coin_flip,
    unigram_f1_metric,
)
from retrieval_scaling_tpu.utils.decontamination import (
    check_below_lexical_overlap_threshold,
    max_contiguous_overlap,
)
from retrieval_scaling_tpu.utils.deduplication import (
    estimate_jaccard,
    minhash_signature,
    remove_duplicates_with_minhash,
    shingle_document,
)


# -------------------------------------------------------- decontamination
def test_max_contiguous_overlap():
    a = "the quick brown fox jumps over".split()
    b = "a quick brown fox leaps the".split()
    assert max_contiguous_overlap(a, b) == 3  # quick brown fox


def test_decontamination_word_count_threshold():
    doc = "alpha beta gamma delta epsilon"
    gold = "x y alpha beta gamma z"
    # overlap of 3 contiguous words; threshold 4 (count) -> clean
    assert check_below_lexical_overlap_threshold(doc, gold, 4, "longest")
    assert not check_below_lexical_overlap_threshold(doc, gold, 3, "longest")


def test_decontamination_ratio_threshold():
    doc = "one two three four"
    gold = "one two three four five six seven eight"
    # overlap 4, gold len 8 -> ratio threshold 0.5 means limit int(4)=4 -> not clean
    assert not check_below_lexical_overlap_threshold(doc, gold, 0.5, "longest")
    assert check_below_lexical_overlap_threshold(doc, gold, 0.75, "longest")


def test_decontamination_jaccard():
    base = " ".join(f"w{i}" for i in range(30))
    assert not check_below_lexical_overlap_threshold(base, base, 0.8, "jaccard")
    other = " ".join(f"v{i}" for i in range(30))
    assert check_below_lexical_overlap_threshold(base, other, 0.8, "jaccard")


# -------------------------------------------------------- minhash dedup
def test_minhash_jaccard_estimate_accuracy():
    a = shingle_document(" ".join(f"w{i}" for i in range(100)))
    b = shingle_document(" ".join(f"w{i}" for i in range(50, 150)))
    true_j = len(a & b) / len(a | b)
    est = estimate_jaccard(minhash_signature(a), minhash_signature(b))
    assert abs(est - true_j) < 0.15


def test_dedup_removes_near_duplicates_keeps_first():
    base = ("machine learning provides the ability to automatically learn "
            "and improve from experience without being explicitly programmed ") * 5
    docs = [
        {"retrieval text": base},
        {"retrieval text": base + "extra."},
        {"retrieval text": " ".join(f"unique{i}" for i in range(60))},
        {"retrieval text": "too short"},
    ]
    out = remove_duplicates_with_minhash(docs)
    texts = [d["retrieval text"] for d in out]
    assert base in texts  # first representative kept
    assert base + "extra." not in texts  # near-duplicate dropped
    assert any("unique0" in t for t in texts)
    assert all(len(t.split()) >= 13 for t in texts)  # short chunk dropped
    assert docs[0]["quality score"] == 1 and docs[1]["quality score"] == 0


def test_dedup_query_decontamination():
    query = " ".join(f"q{i}" for i in range(40))
    docs = [
        {"retrieval text": query},  # exact copy of the query -> contaminated
        {"retrieval text": " ".join(f"d{i}" for i in range(40))},
    ]
    out = remove_duplicates_with_minhash(docs, string_for_decontamination=query)
    assert [d["retrieval text"] for d in out] == [docs[1]["retrieval text"]]


# -------------------------------------------------------- rerankers
def test_metrics_and_rerank():
    assert normalize_answer_text("The Quick  Fox") == "quick fox"
    assert inclusion_metric("paris is the capital of france", ["Paris"]) == 1
    assert inclusion_metric("berlin", ["Paris"]) == 0
    f1 = unigram_f1_metric("paris city", ["paris"])
    assert 0 < f1 <= 1

    ctxs = [
        {"retrieval text": "nothing relevant here", "retrieval score": "9", "quality score": 1},
        {"retrieval text": "the answer is paris", "retrieval score": "5", "quality score": 1},
    ]
    out = rerank_ctxs(ctxs, ["paris"], "inclusion")
    assert out[0]["retrieval text"] == "the answer is paris"
    out = rerank_ctxs(ctxs, ["paris"], "lexical")
    assert out[0]["retrieval text"] == "the answer is paris"


def test_subsample_and_short_chunks():
    import random

    random.seed(0)
    items = list(range(1000))
    kept = subsample_by_coin_flip(items, 0.5)
    assert 400 < len(kept) < 600
    ctxs = [{"retrieval text": "short text"}, {"retrieval text": " ".join(["w"] * 20)}]
    assert len(remove_short_chunks(ctxs)) == 1


# -------------------------------------------------------- multi-domain merge
def _write_results(path, domain, queries, scores_base):
    rows = []
    for qi, q in enumerate(queries):
        ctxs = [
            {
                "id": [0, qi * 10 + c],
                "source": None,
                "retrieval text": f"{domain} doc {qi} {c} " + " ".join(f"t{domain}{qi}{c}x{j}" for j in range(15)),
                "retrieval score": str(scores_base + c * -1.0),
            }
            for c in range(3)
        ]
        rows.append({"raw_query": q, "raw_inputs": q + " answer", "ctxs": ctxs})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return path


def test_multi_domain_merge_pipeline(tmp_path):
    queries = [f"query number {i} " + " ".join(f"qq{i}x{j}" for j in range(10)) for i in range(4)]
    os.makedirs(tmp_path / "wiki_datastore", exist_ok=True)
    os.makedirs(tmp_path / "books_datastore", exist_ok=True)
    p1 = _write_results(str(tmp_path / "wiki_datastore" / "r1.jsonl"), "wiki", queries, 10.0)
    p2 = _write_results(str(tmp_path / "books_datastore" / "r2.jsonl"), "books", queries, 8.0)

    paths_txt = str(tmp_path / "paths.txt")
    with open(paths_txt, "w") as f:
        f.write(p1 + "\n" + p2 + "\n")
    merged_out = str(tmp_path / "merged" / "dedup_merged.jsonl")

    cfg = config_from_dict(
        {
            "tasks": {"eval": {"task_name": "perplexity"}},
            "evaluation": {
                "search": {
                    "paths_to_merge": paths_txt,
                    "merged_path": merged_out,
                    "n_docs": 5,
                    "topk_subsample_p": 1,
                    "subsample_seed": 7,
                    "use_saved_dedup_data": False,
                }
            },
        }
    )
    post_hoc_merge_topk_multi_domain(cfg)

    out_path = os.path.join(os.path.dirname(merged_out), "full_subsampled_1_7_dedup_merged.jsonl")
    assert os.path.exists(out_path)
    with open(out_path) as f:
        rows = [json.loads(line) for line in f]
    assert len(rows) == 4
    for row in rows:
        scores = [float(c["retrieval score"]) for c in row["ctxs"]]
        assert scores == sorted(scores, reverse=True)
        # domain annotation from path regex
        assert {c["source"] for c in row["ctxs"]} <= {"wiki", "books"}
        assert len(row["ctxs"]) <= 5
