import json
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.evals.beir import (
    average_precision,
    evaluate_beir,
    ndcg_at_k,
    recall_at_k,
)


def test_ndcg_and_recall_math():
    qrel = {"a": 2, "b": 1, "c": 0}
    assert ndcg_at_k(["a", "b"], qrel, 10) == pytest.approx(1.0)
    assert ndcg_at_k(["c", "b", "a"], qrel, 10) < 1.0
    assert recall_at_k(["a", "x"], qrel, 2) == 0.5
    assert average_precision(["a", "x", "b"], qrel) == pytest.approx((1 / 1 + 2 / 3) / 2)


class WordOverlapEncoder:
    """Deterministic bag-of-words hashing encoder for tests."""

    def __init__(self, dim=64):
        self.dim = dim

    def encode(self, texts, opts=None):
        import zlib

        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                # deterministic hash: builtin hash() is per-process randomized
                out[i, zlib.crc32(w.encode()) % self.dim] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return (out / np.clip(norms, 1e-6, None)).astype(np.float16)


def test_evaluate_beir_end_to_end(tmp_path):
    os.makedirs(tmp_path / "qrels")
    docs = {
        "d1": "the moon landing happened in 1969",
        "d2": "cats are popular pets worldwide",
        "d3": "apollo eleven reached the moon",
        "d4": "stock markets fell on friday",
    }
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for did, text in docs.items():
            f.write(json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(tmp_path / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "moon landing apollo"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "pets cats"}) + "\n")
    with open(tmp_path / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\nq1\td3\t1\nq2\td2\t1\n")

    report = evaluate_beir(WordOverlapEncoder(), str(tmp_path), k=4)
    assert report["nDCG@10"] > 0.9
    assert report["Recall@10"] == 1.0
