#!/usr/bin/env python
"""Datastore-scaling experiment driver (the paper's headline curve).

Runs the full pipeline at several datastore subsample rates and collects
perplexity per datastore size — the MassiveDS scaling-curve machinery
(reference: utils/subsample_data_new.py + scripts/search.sh +
utils/extract_results.py scaling plots) as one offline-runnable script:

    python examples/scaling_experiment.py --out runs/scaling \
        --corpus raw_data/corpus.jsonl --eval raw_data/eval.jsonl \
        --encoder facebook/contriever-msmarco --reader EleutherAI/pythia-1b \
        --rates 0.1 0.25 0.5 1.0

Writes one results-log line per rate and a summary table; pass --plot to
render the PPL-vs-datastore-size curve with utils.extract_results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--eval", dest="eval_data", required=True)
    parser.add_argument("--encoder", default="facebook/contriever-msmarco")
    parser.add_argument("--reader", default="EleutherAI/pythia-1b")
    parser.add_argument("--rates", type=float, nargs="+", default=[0.25, 0.5, 1.0])
    parser.add_argument("--chunk-size", type=int, default=256)
    parser.add_argument("--n-docs", type=int, default=3)
    parser.add_argument("--concate-k", type=int, default=3)
    parser.add_argument("--num-eval-samples", type=int, default=128)
    parser.add_argument("--seed", type=int, default=1000)
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    from retrieval_scaling_tpu.config import load_config
    from retrieval_scaling_tpu.pipeline.main import run_tasks
    from retrieval_scaling_tpu.utils.subsample_data import subsample_jsonl

    os.makedirs(args.out, exist_ok=True)
    results_log = os.path.join(args.out, "results.log")
    summary = []

    for rate in args.rates:
        if rate >= 1.0:
            sub_corpus = args.corpus
        else:
            sub_corpus = os.path.join(args.out, f"corpus_p{rate}.jsonl")
            if not os.path.exists(sub_corpus):
                kept = subsample_jsonl(args.corpus, sub_corpus, rate, seed=args.seed)
                print(f"rate {rate}: kept {kept} docs")

        n_tokens = sum(
            len(json.loads(line).get("text", "").split())
            for line in open(sub_corpus)
        )

        cfg = load_config(
            "default",
            overrides=[
                f"datastore.domain=scaling_p{rate}",
                "evaluation.domain=scaling",
                f"datastore.raw_data_path={sub_corpus}",
                f"datastore.datastore_root_dir={args.out}/scaling_out",
                f"datastore.chunk_size={args.chunk_size}",
                f"model.datastore_encoder={args.encoder}",
                f"model.query_encoder={args.encoder}",
                f"model.datastore_tokenizer={args.encoder}",
                f"model.query_tokenizer={args.encoder}",
                f"model.lm_model={args.reader}",
                f"evaluation.data.eval_data={args.eval_data}",
                f"evaluation.data.num_eval_samples={args.num_eval_samples}",
                f"evaluation.search.n_docs={args.n_docs}",
                f"evaluation.concate_k={args.concate_k}",
                f"evaluation.results_only_log_file={results_log}",
                "tasks.datastore.embedding=true",
                "tasks.datastore.index=true",
                "tasks.eval.search=true",
                "tasks.eval.inference=true",
            ]
            + list(args.overrides),
        )
        run_tasks(cfg)

        with open(results_log) as f:
            last = [line for line in f if line.strip()][-1]
        ppl = float(last.split("perplexity = ")[1].split("\t")[0])
        summary.append({"rate": rate, "datastore_words": n_tokens, "perplexity": ppl})
        print(json.dumps(summary[-1]))

    with open(os.path.join(args.out, "scaling_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\nrate\twords\tppl")
    for row in summary:
        print(f"{row['rate']}\t{row['datastore_words']}\t{row['perplexity']:.4f}")

    if args.plot:
        import pandas as pd

        from retrieval_scaling_tpu.utils.extract_results import plot_scaling_curve

        df = pd.DataFrame(summary)
        out_png = os.path.join(args.out, "scaling_curve.png")
        plot_scaling_curve(df, out_png, x="datastore_words", y="perplexity", group=None)
        print(f"plot: {out_png}")


if __name__ == "__main__":
    main()
