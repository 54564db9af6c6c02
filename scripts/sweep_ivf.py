#!/usr/bin/env python
"""nprobe-vs-recall (and QPS) sweep for the TPU IVF indexes.

The reference tunes `probe` per datastore by hand (`ric/conf/default.yaml:74`,
64–2048); this tool measures the trade-off curve so the choice is data-driven
(SURVEY.md §7 step 6). Ground truth is an exact Flat scan over the same
embedding shards.

    python scripts/sweep_ivf.py --embeddings 'scaling_out/.../passages_*.pkl' \
        --index-type IVFFlat --ncentroids 1024 --probes 8,16,32,64 --queries 256

With --synthetic N, runs on N clustered synthetic vectors (offline smoke).
Prints one JSON line per probe setting: {probe, recall@k, ms_per_batch, qps}.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synthetic_embeddings(n: int, d: int, n_clusters: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d).astype(np.float32)
    assign = rng.randint(0, n_clusters, n)
    emb = centers[assign] + 0.15 * rng.randn(n, d).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--embeddings", default=None, help="glob of passages_*.pkl shards")
    parser.add_argument("--synthetic", type=int, default=None, help="use N synthetic vectors")
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--index-type", default="IVFFlat", choices=["IVFFlat", "IVFPQ"])
    parser.add_argument("--ncentroids", type=int, default=256)
    parser.add_argument("--probes", default="4,8,16,32,64")
    parser.add_argument("--queries", type=int, default=128)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--n-subquantizers", type=int, default=8)
    parser.add_argument(
        "--refine-factor", type=int, default=0,
        help="IVFPQ: rerank PQ top (factor*k) with exact int8 rows",
    )
    parser.add_argument(
        "--opq", action="store_true",
        help="IVFPQ: train an OPQ rotation (same bytes/vector, better recall)",
    )
    parser.add_argument("--n-bits", type=int, default=8)
    parser.add_argument(
        "--quantization", default=None, choices=[None, "int8"],
        help="IVFFlat: SQ8 int8 list tiles (2x rows/chip at near-exact recall)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force a JAX backend (site hooks may override JAX_PLATFORMS)",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import pickle
    import tempfile

    from retrieval_scaling_tpu.index.flat import FlatIndex  # noqa: F401 (exact baseline)

    tmp = tempfile.mkdtemp(prefix="sweep_ivf_")
    if args.synthetic:
        emb = synthetic_embeddings(args.synthetic, args.dim, n_clusters=args.ncentroids, seed=args.seed)
        path = f"{tmp}/passages_00.pkl"
        with open(path, "wb") as f:
            pickle.dump(([f"p{i}" for i in range(len(emb))], emb.astype(np.float16)), f)
        embed_paths = [path]
    elif args.embeddings:
        embed_paths = sorted(glob.glob(args.embeddings))
        if not embed_paths:
            raise SystemExit(f"no embedding shards match {args.embeddings!r}")
        with open(embed_paths[0], "rb") as f:
            emb = np.asarray(pickle.load(f)[1], np.float32)
    else:
        raise SystemExit("pass --embeddings or --synthetic")

    rng = np.random.RandomState(args.seed + 1)
    all_emb = []
    for p in embed_paths:
        with open(p, "rb") as f:
            all_emb.append(np.asarray(pickle.load(f)[1], np.float32))
    all_emb = np.concatenate(all_emb, axis=0)
    q_idx = rng.choice(len(all_emb), size=args.queries, replace=False)
    queries = all_emb[q_idx] + 0.05 * rng.randn(args.queries, all_emb.shape[1]).astype(np.float32)

    # Exact ground truth (host matmul is fine at sweep scale).
    scores = queries @ all_emb.T
    truth = np.argsort(-scores, axis=1)[:, : args.k]

    probes = [int(p) for p in args.probes.split(",")]
    common = dict(
        embed_paths=embed_paths,
        dimension=all_emb.shape[1],
        ncentroids=args.ncentroids,
        sample_train_size=min(len(all_emb), 200_000),
    )
    if args.index_type == "IVFFlat":
        from retrieval_scaling_tpu.index.ivf_flat import IVFFlatIndex

        index = IVFFlatIndex(
            probe=probes[0], quantization=args.quantization, **common
        )
    else:
        from retrieval_scaling_tpu.index.ivf_pq import IVFPQIndex

        index = IVFPQIndex(
            probe=probes[0],
            n_subquantizers=args.n_subquantizers,
            n_bits=args.n_bits,
            refine_factor=args.refine_factor,
            opq=args.opq,
            **common,
        )

    for probe in probes:
        t0 = time.perf_counter()
        _, ids = index.search_ids(queries, args.k, nprobe=probe)
        ms = (time.perf_counter() - t0) * 1e3
        # second timed run (first may compile)
        t0 = time.perf_counter()
        _, ids = index.search_ids(queries, args.k, nprobe=probe)
        ms = min(ms, (time.perf_counter() - t0) * 1e3)
        hits = [
            len(set(truth[b].tolist()) & set(np.asarray(ids[b]).tolist())) / args.k
            for b in range(args.queries)
        ]
        print(
            json.dumps(
                {
                    "index": args.index_type,
                    "probe": probe,
                    **({"refine_factor": args.refine_factor} if args.refine_factor else {}),
                    **({"opq": True} if args.opq else {}),
                    f"recall@{args.k}": round(float(np.mean(hits)), 4),
                    "ms_per_batch": round(ms, 2),
                    "qps": round(args.queries / (ms / 1e3), 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
