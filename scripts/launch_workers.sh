#!/usr/bin/env bash
# Launch a fleet of serving workers, one per datastore shard group
# (reference: api/launch_workers.sh — SLURM array of 13 workers; here a
# plain process fleet on TPU hosts, one JAX process per host/slice).
#
#   DOMAINS="wiki pes2o" NUM_SHARDS=8 NUM_SHARDS_PER_WORKER=8 \
#     CONFIG=serving REGISTRY=running_ports_massiveds.jsonl \
#     bash scripts/launch_workers.sh
#
# Topology env vars per worker keep the reference contract
# (serve_worker_node.py:19-24): DS_DOMAIN, NUM_SHARDS,
# NUM_SHARDS_PER_WORKER, WORKER_ID.

set -euo pipefail

DOMAINS=${DOMAINS:-demo}
NUM_SHARDS=${NUM_SHARDS:-1}
NUM_SHARDS_PER_WORKER=${NUM_SHARDS_PER_WORKER:-$NUM_SHARDS}
CONFIG=${CONFIG:-serving}
REGISTRY=${REGISTRY:-running_ports_massiveds.jsonl}
LOG_DIR=${LOG_DIR:-serving_logs}

mkdir -p "$LOG_DIR"
workers_per_domain=$(( (NUM_SHARDS + NUM_SHARDS_PER_WORKER - 1) / NUM_SHARDS_PER_WORKER ))

for domain in $DOMAINS; do
  for ((w = 0; w < workers_per_domain; w++)); do
    DS_DOMAIN=$domain NUM_SHARDS=$NUM_SHARDS \
    NUM_SHARDS_PER_WORKER=$NUM_SHARDS_PER_WORKER WORKER_ID=$w \
      python scripts/serve.py worker --config-name "$CONFIG" \
        --registry "$REGISTRY" "$@" \
        > "$LOG_DIR/worker_${domain}_${w}.log" 2>&1 &
    echo "launched worker domain=$domain id=$w pid=$!"
  done
done
wait
