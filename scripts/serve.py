#!/usr/bin/env python
"""Serving launcher — the ``api/launch_workers.sh`` / ``launch_main_node.sh`` analog.

Worker mode hosts one datastore shard group behind HTTP; main mode
aggregates registered workers. Topology env vars (DS_DOMAIN, NUM_SHARDS,
NUM_SHARDS_PER_WORKER, WORKER_ID) keep the reference's contract.

    # worker (one per shard group)
    python scripts/serve.py worker --config-name example_config --port 5000

    # aggregator over all registered workers
    python scripts/serve.py main --registry running_ports_massiveds.jsonl --port 5005
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="mode", required=True)

    w = sub.add_parser("worker")
    w.add_argument("--config-name", default="default")
    w.add_argument("--port", type=int, default=None)
    w.add_argument("--registry", default="running_ports_massiveds.jsonl")
    w.add_argument("overrides", nargs="*")

    m = sub.add_parser("main")
    m.add_argument("--registry", default="running_ports_massiveds.jsonl")
    m.add_argument("--port", type=int, default=None)
    m.add_argument("--expected-endpoints", type=int, default=None)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    if args.mode == "worker":
        from retrieval_scaling_tpu.config import config_from_env, load_config
        from retrieval_scaling_tpu.serve.http_server import serve_worker_from_config

        cfg = load_config(args.config_name, overrides=args.overrides)
        config_from_env(cfg)  # RST_OVERRIDE_* env overrides
        serve_worker_from_config(cfg, port=args.port, registry_path=args.registry)
    else:
        from retrieval_scaling_tpu.serve.main_node import serve_main_node

        serve_main_node(args.registry, port=args.port, expected_endpoints=args.expected_endpoints)


if __name__ == "__main__":
    main()
