"""Config-driven pipeline entry point — the ``ric/main_ric.py`` analog.

Runs the task sequence gated by ``tasks.*`` booleans
(reference: ric/main_ric.py:13-46): datastore embedding -> index build ->
search -> merge_search -> inference, appending one-line result records to
``evaluation.results_only_log_file``.

Usage:
    python -m retrieval_scaling_tpu.pipeline.main --config-name example_config \
        datastore.domain=my_domain evaluation.search.n_docs=5
"""

from __future__ import annotations

import argparse
import logging
import sys

from retrieval_scaling_tpu.config import load_config

logger = logging.getLogger(__name__)


def run_tasks(cfg, mesh=None) -> None:
    if cfg.tasks.datastore.get("embedding", False):
        from retrieval_scaling_tpu.pipeline.embed import generate_passage_embeddings

        generate_passage_embeddings(cfg)

    if cfg.tasks.datastore.get("index", False):
        from retrieval_scaling_tpu.pipeline.index_build import build_index

        build_index(cfg, mesh=mesh)

    if cfg.tasks.eval.get("search", False):
        from retrieval_scaling_tpu.search.driver import search_topk

        search_topk(cfg, mesh=mesh)

    if cfg.tasks.eval.get("merge_search", False):
        from retrieval_scaling_tpu.search.postprocess import post_hoc_merge_topk_multi_domain

        post_hoc_merge_topk_multi_domain(cfg)

    if cfg.tasks.eval.get("inference", False):
        task_name = cfg.tasks.eval.task_name
        if task_name in ("perplexity", "perplexity_calibration"):
            from retrieval_scaling_tpu.evals.perplexity import evaluate_perplexity

            outputs = evaluate_perplexity(cfg, mesh=mesh)
            log_file = cfg.evaluation.get("results_only_log_file", None)
            if outputs is not None and log_file:
                with open(log_file, "a") as f:
                    f.write(outputs.log_message() + "\n")
        else:
            raise ValueError(
                f"Inference for task {task_name!r} runs through the RAG evaluation "
                "harness (retrieval_scaling_tpu.rag_eval)"
            )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", default="default")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*", help="dotlist overrides key=value")
    args = parser.parse_args(argv)

    fmt = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    logging.basicConfig(level=logging.INFO, format=fmt, stream=sys.stdout)
    cfg = load_config(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    # Append-file logging analog of the reference's hydra job_logging file
    # handler (reference: ric/conf/default.yaml:120-137).
    log_path = cfg.get("logging", {}).get("file", None) if hasattr(cfg, "get") else None
    if log_path:
        handler = logging.FileHandler(log_path, mode="a")
        handler.setFormatter(logging.Formatter(fmt))
        logging.getLogger().addHandler(handler)
    run_tasks(cfg)


if __name__ == "__main__":
    main()
