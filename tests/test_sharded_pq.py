"""Mesh-sharded IVF-PQ search: per-shard lane-gather ADC scans + one ICI
all_gather merge must equal a single-shard index over the concatenated
datastore (the reference's per-shard FAISS indexes + rerank_elements,
api/serve_main_node.py:109-165, as one SPMD program)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.index.ivf_common import TILE, build_list_layout
from retrieval_scaling_tpu.ops.kmeans import (
    assign_clusters,
    kmeans,
    pq_encode,
    pq_train_codebooks,
)
from retrieval_scaling_tpu.parallel.mesh import build_mesh
from retrieval_scaling_tpu.parallel.sharded_pq import (
    shard_pq,
    sharded_pq_search,
    stack_shard_layouts,
)


def test_sharded_pq_matches_single_index():
    rng = np.random.RandomState(0)
    n_shards, rows_per_shard, d, m, nlist, nprobe, k = 4, 512, 32, 8, 8, 8, 10
    n = n_shards * rows_per_shard
    centers = rng.randn(nlist, d).astype(np.float32) * 2
    data = centers[rng.randint(0, nlist, n)] + 0.5 * rng.randn(n, d).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = data[rng.choice(n, 6, replace=False)] + 0.02 * rng.randn(6, d).astype(np.float32)

    # shared coarse quantizer + codebooks trained once (as a shared trained
    # index is in the reference's per-domain layout)
    centroids, _ = kmeans(data, nlist, iters=8)
    centroids = np.asarray(centroids, np.float32)
    assign = np.asarray(assign_clusters(jnp.asarray(data), jnp.asarray(centroids), nlist, metric="ip"))
    residuals = data - centroids[assign]
    codebooks = np.asarray(pq_train_codebooks(residuals, m, 8, iters=8), np.float32)
    codes_all = np.asarray(pq_encode(jnp.asarray(residuals), jnp.asarray(codebooks)))

    # per-shard inverted-list layouts over the shard's rows
    shards = []
    for s in range(n_shards):
        lo, hi = s * rows_per_shard, (s + 1) * rows_per_shard
        layout = build_list_layout(codes_all[lo:hi], assign[lo:hi], nlist, TILE)
        t_s = max(int(layout.tile_count.sum()), 1)
        shards.append({
            "codes": layout.sorted_rows.reshape(t_s, TILE, m),
            "row_flat_ids": layout.row_flat_ids,
            "tile_start": layout.tile_start,
            "tile_count": layout.tile_count,
            "n_valid": rows_per_shard,
        })
    stacked = stack_shard_layouts(shards, m)

    mesh = build_mesh(data_axis=4, model_axis=2)
    dev = shard_pq(mesh, stacked)
    max_tiles = int(max(s["tile_count"].sum() for s in shards))
    scores, ids = sharded_pq_search(
        mesh,
        jnp.asarray(q), jnp.asarray(centroids), jnp.asarray(codebooks),
        dev["codes"], dev["row_flat_ids"], dev["tile_start"], dev["tile_count"],
        dev["row_base"],
        k=k, nprobe=nprobe, max_tiles=max_tiles, interpret=True,
    )
    scores, ids = np.asarray(scores), np.asarray(ids)

    # ground truth: the same ADC math over ALL rows (nprobe = all lists
    # probed per shard here covers every row's list)
    lut = np.einsum("bmd,mkd->bmk", q.reshape(len(q), m, d // m), codebooks)
    coarse = q @ centroids.T
    adc = np.zeros((len(q), n), np.float32)
    for b in range(len(q)):
        for i in range(n):
            adc[b, i] = coarse[b, assign[i]] + sum(
                lut[b, j, codes_all[i, j]] for j in range(m)
            )
    for b in range(len(q)):
        order = np.argsort(-adc[b])[:k]
        got = [int(i) for i in ids[b]]
        # exact same candidate set and scores (ties aside)
        np.testing.assert_allclose(
            np.sort(scores[b])[::-1], np.sort(adc[b][order])[::-1], atol=2e-3, rtol=1e-4
        )
        assert len(set(got) & set(order.tolist())) >= k - 1  # tie tolerance
