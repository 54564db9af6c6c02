#!/usr/bin/env python
"""Standalone retrieval CLI: query a built datastore, write ctxs jsonl.

The ``contriever/passage_retrieval.py`` analog — no eval-data machinery,
just queries in, retrieved passages out:

    python scripts/retrieve.py --config-name example_config \
        --queries queries.jsonl --out retrieved_results.jsonl --n-docs 10 \
        datastore.domain=wiki datastore.raw_data_path=...

Queries: a .txt file (one query per line) or .jsonl with a ``query`` /
``question`` / ``raw_query`` field. Output rows follow the pipeline's
retrieved-results contract: {"raw_query": ..., "ctxs": [{id, source,
"retrieval text", "retrieval score"}]}.
"""

import argparse
import json
import logging
import sys

sys.path.insert(0, ".")

from retrieval_scaling_tpu.config import load_config  # noqa: E402


def read_queries(path: str):
    queries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if path.endswith((".jsonl", ".json")):
                row = json.loads(line)
                queries.append(row.get("query") or row.get("question") or row.get("raw_query"))
            else:
                queries.append(line)
    return [q for q in queries if q]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="default")
    parser.add_argument("--queries", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-docs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    cfg = load_config(args.config_name, overrides=args.overrides)

    from retrieval_scaling_tpu.index.base import Indexer
    from retrieval_scaling_tpu.search.encoder import (
        EncodeOptions,
        load_encoder,
        projection_out_dim,
    )

    queries = read_queries(args.queries)
    logging.info("retrieving for %d queries", len(queries))

    encoder = load_encoder(
        cfg.model.query_encoder, tokenizer_name=cfg.model.query_tokenizer
    )
    opts = EncodeOptions(
        batch_size=args.batch_size,
        maxlength=cfg.evaluation.search.get("question_maxlength", 512),
        lowercase=cfg.evaluation.search.get("lowercase", False),
        normalize_text=cfg.evaluation.search.get("normalize_text", False),
        out_dim=projection_out_dim(cfg, encoder),
    )
    embs = encoder.encode_queries(queries, opts)

    index = Indexer(cfg)
    scores, passages, db_ids = index.search(embs, args.n_docs)

    domain = cfg.datastore.domain
    with open(args.out, "w") as f:
        for qi, query in enumerate(queries):
            ctxs = [
                {
                    "id": db_ids[qi][c],
                    "source": domain,
                    "retrieval text": passages[qi][c],
                    "retrieval score": str(scores[qi][c]),
                }
                for c in range(len(passages[qi]))
            ]
            f.write(json.dumps({"raw_query": query, "ctxs": ctxs}) + "\n")
    logging.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
