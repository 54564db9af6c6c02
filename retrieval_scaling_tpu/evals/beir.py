"""BEIR-style zero-shot retrieval benchmark evaluation.

The analog of the vendored BEIR harness (reference: contriever/eval_beir.py,
contriever/src/beir_utils.py): given a BEIR-format dataset —
``corpus.jsonl`` ({_id, title, text}), ``queries.jsonl`` ({_id, text}) and
``qrels/{split}.tsv`` (query-id, corpus-id, score) — encode the corpus and
queries with the JAX encoder, run exact MIPS on TPU, and report
nDCG@{10}, MAP, Recall@{10,100} and Precision@10.
"""

from __future__ import annotations

import csv
import json
import logging
import math
import os
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def load_beir_dataset(path: str, split: str = "test"):
    corpus: Dict[str, dict] = {}
    with open(os.path.join(path, "corpus.jsonl")) as f:
        for line in f:
            doc = json.loads(line)
            corpus[str(doc["_id"])] = doc
    queries: Dict[str, str] = {}
    with open(os.path.join(path, "queries.jsonl")) as f:
        for line in f:
            q = json.loads(line)
            queries[str(q["_id"])] = q["text"]
    qrels: Dict[str, Dict[str, int]] = {}
    with open(os.path.join(path, "qrels", f"{split}.tsv")) as f:
        reader = csv.reader(f, delimiter="\t")
        header = next(reader)
        for row in reader:
            qid, did, score = row[0], row[1], int(row[2])
            qrels.setdefault(str(qid), {})[str(did)] = score
    queries = {qid: q for qid, q in queries.items() if qid in qrels}
    return corpus, queries, qrels


def dcg(relevances: List[int]) -> float:
    return sum(rel / math.log2(i + 2) for i, rel in enumerate(relevances))


def ndcg_at_k(ranked_ids: List[str], qrel: Dict[str, int], k: int) -> float:
    gains = [qrel.get(d, 0) for d in ranked_ids[:k]]
    ideal = sorted(qrel.values(), reverse=True)[:k]
    idcg = dcg(ideal)
    return dcg(gains) / idcg if idcg > 0 else 0.0


def recall_at_k(ranked_ids: List[str], qrel: Dict[str, int], k: int) -> float:
    relevant = {d for d, s in qrel.items() if s > 0}
    if not relevant:
        return 0.0
    return len(relevant & set(ranked_ids[:k])) / len(relevant)


def average_precision(ranked_ids: List[str], qrel: Dict[str, int], k: int = 100) -> float:
    relevant = {d for d, s in qrel.items() if s > 0}
    if not relevant:
        return 0.0
    hits, ap = 0, 0.0
    for i, d in enumerate(ranked_ids[:k]):
        if d in relevant:
            hits += 1
            ap += hits / (i + 1)
    return ap / min(len(relevant), k)


def evaluate_beir(
    encoder,
    dataset_path: str,
    split: str = "test",
    k: int = 100,
    encode_opts=None,
    query_opts=None,
) -> Dict[str, float]:
    from retrieval_scaling_tpu.ops.topk import chunked_topk_scores
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    import jax.numpy as jnp

    corpus, queries, qrels = load_beir_dataset(dataset_path, split)
    doc_ids = list(corpus.keys())
    doc_texts = [
        (corpus[d].get("title", "") + " " + corpus[d]["text"]).strip() for d in doc_ids
    ]
    logger.info("BEIR: %d docs, %d queries", len(doc_ids), len(queries))

    encode_opts = encode_opts or EncodeOptions(batch_size=64, maxlength=512)
    query_opts = query_opts or EncodeOptions(batch_size=64, maxlength=512)
    doc_emb = encoder.encode(doc_texts, encode_opts)
    query_ids = list(queries.keys())
    q_emb = encoder.encode([queries[q] for q in query_ids], query_opts)

    n = len(doc_ids)
    pad = (-n) % 128
    db = np.concatenate([doc_emb, np.zeros((pad, doc_emb.shape[1]), doc_emb.dtype)], 0)
    k_eff = min(k, n)
    scores, ids = chunked_topk_scores(
        jnp.asarray(q_emb, jnp.float32), jnp.asarray(db, jnp.float32), n, k_eff
    )
    ids = np.asarray(ids)

    metrics = {"nDCG@10": [], "MAP": [], "Recall@10": [], "Recall@100": [], "P@10": []}
    for row, qid in enumerate(query_ids):
        ranked = [doc_ids[i] for i in ids[row] if i >= 0]
        qrel = qrels[qid]
        metrics["nDCG@10"].append(ndcg_at_k(ranked, qrel, 10))
        metrics["MAP"].append(average_precision(ranked, qrel, k_eff))
        metrics["Recall@10"].append(recall_at_k(ranked, qrel, 10))
        metrics["Recall@100"].append(recall_at_k(ranked, qrel, 100))
        relevant = {d for d, s in qrel.items() if s > 0}
        metrics["P@10"].append(len(relevant & set(ranked[:10])) / 10)

    report = {name: float(np.mean(vals)) for name, vals in metrics.items()}
    logger.info("BEIR %s: %s", os.path.basename(dataset_path), report)
    return report
