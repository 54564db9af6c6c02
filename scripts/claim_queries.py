#!/usr/bin/env python
"""Claim-level query extraction + retrieval re-attachment.

Generalizes the reference's one-off comem massaging scripts
(reference: scripts/_query_preprocess.py, scripts/_query_postprocess.py,
scripts/format_comem_results.py — hard-coded cluster paths there):

  # 1. collect unique claim queries from extracted-claims jsonl trees
  python scripts/claim_queries.py extract --claims_dir claims/ --out all_queries.jsonl

  # 2. run retrieval over all_queries.jsonl (scripts/retrieve.py), then
  #    re-attach each claim's retrieved ctxs to the original records
  python scripts/claim_queries.py attach --claims_dir claims/ \
      --retrieved merged_results.jsonl --out_dir claims_with_ctxs/ --top_k 10

Claim records carry ``all_claims: [str, ...]``; attach writes the same
records with ``claims_with_ctxs: [{claim, ctxs}, ...]`` added.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, ".")

logger = logging.getLogger(__name__)


def load_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(rows, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def iter_claim_files(claims_dir):
    for root, _, files in sorted(os.walk(claims_dir)):
        for name in sorted(files):
            if name.endswith(".jsonl"):
                yield os.path.join(root, name)


def extract(args):
    seen, queries = set(), []
    total, repeats = 0, 0
    for path in iter_claim_files(args.claims_dir):
        for ex in load_jsonl(path):
            for claim in ex.get("all_claims", []):
                total += 1
                if claim in seen:
                    repeats += 1
                    continue
                seen.add(claim)
                queries.append({"query": claim})
    save_jsonl(queries, args.out)
    logger.info(
        "wrote %d unique claim queries (%d repeats of %d total) to %s",
        len(queries), repeats, total, args.out,
    )


def attach(args):
    hashed = {}
    for row in load_jsonl(args.retrieved):
        query = row.get("raw_query", row.get("query"))
        hashed[query] = (row.get("ctxs") or [])[: args.top_k]

    missing = 0
    for path in iter_claim_files(args.claims_dir):
        rows = load_jsonl(path)
        for ex in rows:
            out = []
            for claim in ex.get("all_claims", []):
                ctxs = hashed.get(claim)
                if ctxs is None:
                    missing += 1
                    ctxs = []
                out.append({"claim": claim, "ctxs": ctxs})
            ex["claims_with_ctxs"] = out
        rel = os.path.relpath(path, args.claims_dir)
        save_jsonl(rows, os.path.join(args.out_dir, rel))
    if missing:
        logger.warning("%d claims had no retrieved results", missing)
    logger.info("attached ctxs written under %s", args.out_dir)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract")
    e.add_argument("--claims_dir", required=True)
    e.add_argument("--out", required=True)

    a = sub.add_parser("attach")
    a.add_argument("--claims_dir", required=True)
    a.add_argument("--retrieved", required=True)
    a.add_argument("--out_dir", required=True)
    a.add_argument("--top_k", type=int, default=10)

    args = parser.parse_args(argv)
    (extract if args.cmd == "extract" else attach)(args)


if __name__ == "__main__":
    main()
