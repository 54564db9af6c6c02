"""One-command datastore serving (the reference's MassiveServe analog).

Reference: README.md:41-53 — ``massive-serve serve --domain_name demo``
downloads/builds a datastore and serves it. Here:

    python -m retrieval_scaling_tpu.serve --domain_name demo
    python -m retrieval_scaling_tpu.serve --domain_name my_corpus \
        --raw_data my.jsonl --config-name serving --port 5000

``demo`` fabricates a small synthetic corpus (offline-friendly), builds
embeddings + a Flat index with the configured encoder, and serves
``POST /search`` on the chosen port.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--domain_name", default="demo")
    parser.add_argument("--raw_data", default=None, help="jsonl corpus ({'text': ...} rows)")
    parser.add_argument("--config-name", dest="config_name", default="serving")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--registry", default="running_ports_massiveds.jsonl")
    parser.add_argument("--demo-docs", type=int, default=2000)
    parser.add_argument("overrides", nargs="*", help="config dotlist overrides")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    from retrieval_scaling_tpu.config import config_from_env, load_config
    from retrieval_scaling_tpu.pipeline.embed import generate_passage_embeddings
    from retrieval_scaling_tpu.pipeline.index_build import build_index
    from retrieval_scaling_tpu.serve.http_server import serve_worker_from_config

    raw_data = args.raw_data
    if raw_data is None:
        if args.domain_name != "demo":
            parser.error("--raw_data is required for non-demo domains")
        raw_data = os.path.join("raw_data", "demo-corpus.jsonl")
        if not os.path.exists(raw_data):
            import json
            import random

            topics = ["astronomy", "biology", "chemistry", "geology", "history"]
            rng = random.Random(0)
            os.makedirs("raw_data", exist_ok=True)
            with open(raw_data, "w") as f:
                for i in range(args.demo_docs):
                    topic = topics[i % len(topics)]
                    words = [
                        f"{topic}_term_{rng.randint(0, 400)}"
                        for _ in range(rng.randint(20, 80))
                    ]
                    f.write(json.dumps({"text": " ".join(words), "meta": {"topic": topic}}) + "\n")
            print(f"wrote demo corpus to {raw_data}")

    overrides = [
        f"datastore.domain={args.domain_name}",
        f"datastore.raw_data_path={raw_data}",
        "tasks.datastore.embedding=true",
        "tasks.datastore.index=true",
    ] + list(args.overrides)
    cfg = load_config(args.config_name, overrides=overrides)
    config_from_env(cfg)

    generate_passage_embeddings(cfg)
    build_index(cfg)
    return serve_worker_from_config(cfg, port=args.port, registry_path=args.registry)


if __name__ == "__main__":
    main()
