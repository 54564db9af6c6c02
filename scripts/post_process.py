#!/usr/bin/env python
"""Post-processing driver — the ``scripts/post_procress.sh`` analog.

Writes the per-domain retrieved-results path list, then runs the
multi-source merge with MinHash dedup, subsampling and reranking
(reference: scripts/post_procress.sh + scripts/write_retrieval_paths_to_txt.py).
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
    parser.add_argument("--root", required=True, help="datastore_root_dir")
    parser.add_argument("--encoder", default="facebook/contriever-msmarco")
    parser.add_argument("--merged-path", required=True)
    parser.add_argument("--n-docs", type=int, default=1000)
    parser.add_argument("--subsample-p", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=1000)
    parser.add_argument("--rerank", default=None)
    parser.add_argument("--chunk-size", type=int, default=256)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    import os

    from retrieval_scaling_tpu.search.postprocess import post_hoc_merge_topk_multi_domain
    from retrieval_scaling_tpu.utils.retrieval_paths import write_retrieval_paths

    domains = {}
    for spec in args.domains:
        name, _, num_shards = spec.partition(":")
        domains[name] = (int(num_shards or 1), args.chunk_size)

    paths_txt = os.path.join(os.path.dirname(args.merged_path) or ".", "paths_to_merge.txt")
    write_retrieval_paths(
        paths_txt, args.root, args.encoder, os.path.basename(args.eval_data),
        domains, n_docs=args.n_docs,
    )

    cfg = load_config(
        args.config_name,
        overrides=[
            f"evaluation.search.paths_to_merge={paths_txt}",
            f"evaluation.search.merged_path={args.merged_path}",
            f"evaluation.search.n_docs={args.n_docs}",
            f"evaluation.search.topk_subsample_p={args.subsample_p}",
            f"evaluation.search.subsample_seed={args.seed}",
            f"evaluation.search.rerank_method={args.rerank}",
            f"evaluation.data.eval_data={args.eval_data}",
        ]
        + args.overrides,
    )
    post_hoc_merge_topk_multi_domain(cfg)


if __name__ == "__main__":
    main()
