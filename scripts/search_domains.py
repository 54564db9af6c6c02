#!/usr/bin/env python
"""Multi-domain search driver — the ``scripts/search.sh`` analog.

Loops the MassiveDS domains x shard-groups, running top-k search per domain
with a cached query embedding (reference: scripts/search.sh:1-44 loops 15
domains x 8/32 shards with ``cache_query_embedding=true``). Domains are
declared as ``name:num_shards`` pairs.

    python scripts/search_domains.py --config-name example_config \
        --domains wiki:8 books:8 rpj_c4:32 \
        --eval-data data/nq_open_inputs.jsonl --n-docs 100
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")

from retrieval_scaling_tpu.config import load_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="default")
    parser.add_argument("--domains", nargs="+", required=True, help="name:num_shards pairs")
    parser.add_argument("--eval-data", required=True)
    parser.add_argument("--n-docs", type=int, default=100)
    parser.add_argument("--emb-cache-dir", default="query_emb_cache")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    from retrieval_scaling_tpu.search.driver import search_topk

    for spec in args.domains:
        domain, _, num_shards = spec.partition(":")
        num_shards = int(num_shards or 1)
        shard_groups = [[i] for i in range(num_shards)]
        cfg = load_config(
            args.config_name,
            overrides=[
                f"datastore.domain={domain}",
                f"datastore.embedding.num_shards={num_shards}",
                f"datastore.index.index_shard_ids={shard_groups}",
                f"evaluation.data.eval_data={args.eval_data}",
                f"evaluation.search.n_docs={args.n_docs}",
                "evaluation.search.cache_query_embedding=true",
                f"evaluation.search.query_embedding_save_path={args.emb_cache_dir}/queries.pkl",
                "tasks.eval.search=true",
            ]
            + args.overrides,
        )
        logging.info("=== searching domain %s (%d shards) ===", domain, num_shards)
        search_topk(cfg)


if __name__ == "__main__":
    main()
