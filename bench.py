"""Headline benchmark: end-to-end retrieval query latency on one TPU chip.

Measures the serving hot path — query encoding (Contriever-architecture
forward) + exact Flat MIPS search over an in-HBM datastore + top-k — and
reports p50 latency against the reference's own <30 ms serving claim
(reference: README.md:35, BASELINE.md). vs_baseline = 30ms / p50_ms
(>1 means faster than the reference bound).

Prints ONE JSON line on stdout; auxiliary metrics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.index.flat import FlatIndex  # noqa: F401 (import check)
    from retrieval_scaling_tpu.models.bert import BertConfig, contriever_embed, init_bert_params
    from retrieval_scaling_tpu.ops.topk import chunked_topk_scores
    from retrieval_scaling_tpu.parallel.mesh import single_device_mesh
    from retrieval_scaling_tpu.parallel.sharded_search import (
        replicate,
        shard_rows,
        sharded_flat_search,
    )

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    n, d, k = 1_000_000, 768, 100
    rng = np.random.RandomState(0)

    # Datastore: 1M x 768 bf16 (~1.5 GB HBM)
    db = rng.randn(n, d).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    mesh = single_device_mesh()
    db_dev = shard_rows(mesh, jnp.asarray(db, jnp.bfloat16))

    # Query encoder: Contriever-architecture (BERT-base) bf16, batch 1 x 64 tokens
    cfg = BertConfig(attention_impl="auto")
    params = init_bert_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    @jax.jit
    def encode(params, ids, mask):
        return contriever_embed(params, cfg, ids, mask)

    q_ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 64)), jnp.int32)
    q_mask = jnp.ones((1, 64), jnp.int32)

    # One fused device program: encode -> exact scan -> top-k (single dispatch,
    # the serving tier's hot path).
    @jax.jit
    def serve_query(params, ids, mask, db):
        emb = contriever_embed(params, cfg, ids, mask).astype(jnp.bfloat16)
        return chunked_topk_scores(emb, db, n, k, chunk_size=131072)

    def query_once():
        scores, ids = serve_query(params, q_ids, q_mask, db_dev)
        return scores.block_until_ready()

    # warmup/compile
    t0 = time.perf_counter()
    query_once()
    log(f"compile+first query: {time.perf_counter() - t0:.1f}s")

    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        query_once()
        lat.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    log(f"end-to-end query latency over 1M-vector datastore: p50={p50:.2f}ms p99={p99:.2f}ms")

    # auxiliary: batched search throughput (QPS at batch 64)
    qb = jnp.asarray(rng.randn(64, d), jnp.bfloat16)

    def batch_once():
        s, _ = sharded_flat_search(mesh, qb, db_dev, n, k, db_dev.shape[0], chunk_size=131072)
        return s.block_until_ready()

    batch_once()
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        batch_once()
    qps = 64 * iters / (time.perf_counter() - t0)
    log(f"batched search throughput: {qps:.0f} QPS (batch 64, exact 1M-vector scan)")

    # auxiliary: encoder throughput (passages/sec, batch 512 x 256 tokens)
    p_ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (512, 256)), jnp.int32)
    p_mask = jnp.ones((512, 256), jnp.int32)
    encode(params, p_ids, p_mask).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        encode(params, p_ids, p_mask).block_until_ready()
    psg_per_s = 512 * 5 / (time.perf_counter() - t0)
    # reference: 3,518,123 passages in ~47 min on 1x L40 (README.md:94) = ~1248/s
    log(f"encoder throughput: {psg_per_s:.0f} passages/s (ref L40 ~1248/s -> {psg_per_s/1248:.1f}x)")

    print(
        json.dumps(
            {
                "metric": "e2e_query_latency_p50_1M",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(30.0 / p50, 2),
                "aux": {
                    "p99_ms": round(p99, 3),
                    "batch64_qps": round(qps, 1),
                    "encoder_passages_per_s": round(psg_per_s, 1),
                    "backend": backend,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
