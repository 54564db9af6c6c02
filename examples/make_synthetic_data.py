#!/usr/bin/env python
"""Generate a synthetic corpus + eval set for offline smoke runs.

The reference quick start downloads FineWeb-Edu-1MT and a C4 sample
(reference: README.md:77-113, scripts/download_raw_data.sh); in air-gapped
environments this script fabricates structurally-identical jsonl files so
the full pipeline (embed -> index -> search -> eval) can be exercised.

    python examples/make_synthetic_data.py --out raw_data/ --docs 10000
"""

import argparse
import json
import os
import random


TOPICS = [
    "astronomy", "biology", "chemistry", "geology", "history",
    "mathematics", "music", "philosophy", "physics", "poetry",
]


def synth_doc(rng: random.Random, idx: int) -> dict:
    topic = TOPICS[idx % len(TOPICS)]
    n_sent = rng.randint(3, 12)
    sentences = []
    for s in range(n_sent):
        words = [f"{topic}_term_{rng.randint(0, 400)}" for _ in range(rng.randint(8, 24))]
        sentences.append(" ".join(words) + ".")
    return {"text": " ".join(sentences), "meta": {"topic": topic, "id": idx}}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="raw_data")
    parser.add_argument("--docs", type=int, default=10000)
    parser.add_argument("--eval-docs", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    os.makedirs(args.out, exist_ok=True)

    corpus_path = os.path.join(args.out, "synthetic-corpus.jsonl")
    with open(corpus_path, "w") as f:
        for i in range(args.docs):
            f.write(json.dumps(synth_doc(rng, i)) + "\n")
    print(f"wrote {args.docs} docs to {corpus_path}")

    eval_path = os.path.join(args.out, "synthetic-eval.jsonl")
    with open(eval_path, "w") as f:
        for i in range(args.eval_docs):
            f.write(json.dumps(synth_doc(rng, i * 7)) + "\n")
    print(f"wrote {args.eval_docs} eval docs to {eval_path}")


if __name__ == "__main__":
    main()
