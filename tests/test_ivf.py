import json
import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.index.ivf_common import (
    TILE,
    build_list_layout,
    default_max_tiles,
    ivf_scan_topk,
    probe_tile_schedule,
    select_probes,
)
from retrieval_scaling_tpu.ops.kmeans import (
    assign_clusters,
    kmeans,
    pq_decode,
    pq_encode,
    pq_train_codebooks,
)


def _clustered_data(rng, n=2000, d=32, n_clusters=16, spread=0.15):
    centers = rng.randn(n_clusters, d).astype(np.float32)
    labels = rng.randint(0, n_clusters, n)
    data = centers[labels] + spread * rng.randn(n, d).astype(np.float32)
    return data, centers, labels


# ---------------------------------------------------------------- k-means
def test_kmeans_objective_decreases_and_recovers_clusters(rng):
    data, centers, labels = _clustered_data(rng)
    centroids, history = kmeans(data, 16, iters=15, seed=0)
    hist = np.asarray(history)
    assert hist[-1] <= hist[0]
    # each true center should have a learned centroid nearby
    d2 = ((np.asarray(centroids)[None] - centers[:, None]) ** 2).sum(-1)
    assert np.median(d2.min(axis=1)) < 0.5


def test_kmeans_handles_empty_clusters(rng):
    data = rng.randn(40, 8).astype(np.float32)
    centroids, _ = kmeans(data, 32, iters=5, seed=0)
    assert np.isfinite(np.asarray(centroids)).all()


def test_assign_clusters_matches_bruteforce(rng):
    data = rng.randn(500, 16).astype(np.float32)
    cents = rng.randn(8, 16).astype(np.float32)
    got = np.asarray(assign_clusters(jnp.asarray(data), jnp.asarray(cents), 8, chunk_size=128))
    want_l2 = np.argmin(((data[:, None] - cents[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(got, want_l2)
    got_ip = np.asarray(
        assign_clusters(jnp.asarray(data), jnp.asarray(cents), 8, chunk_size=128, metric="ip")
    )
    want_ip = np.argmax(data @ cents.T, axis=1)
    np.testing.assert_array_equal(got_ip, want_ip)


# ---------------------------------------------------------------- layout
def test_list_layout_roundtrip(rng):
    data = rng.randn(300, 8).astype(np.float32)
    assignments = rng.randint(0, 5, 300)
    layout = build_list_layout(data, assignments, 5, tile=TILE)
    # every original row appears exactly once
    ids = layout.row_flat_ids[layout.row_flat_ids >= 0]
    assert sorted(ids.tolist()) == list(range(300))
    # rows land in their list's tile span with matching data
    for c in range(5):
        start = layout.tile_start[c] * TILE
        ln = int(layout.list_len[c])
        rows = layout.row_flat_ids[start : start + ln]
        assert (assignments[rows] == c).all()
        np.testing.assert_array_equal(layout.sorted_rows[start : start + ln], data[rows])


def test_probe_tile_schedule(rng):
    tile_start = jnp.asarray([0, 2, 3, 7], jnp.int32)
    tile_count = jnp.asarray([2, 1, 4, 1], jnp.int32)
    probe_ids = jnp.asarray([[2, 0], [3, 3]], jnp.int32)
    tile_ids, valid, probe_of = probe_tile_schedule(probe_ids, tile_start, tile_count, 8)
    # query 0 probes list2 (tiles 3,4,5,6) then list0 (tiles 0,1)
    np.testing.assert_array_equal(np.asarray(tile_ids[0][:6]), [3, 4, 5, 6, 0, 1])
    assert np.asarray(valid[0]).sum() == 6
    np.testing.assert_array_equal(np.asarray(probe_of[0][:6]), [0, 0, 0, 0, 1, 1])
    # query 1 probes list3 twice (1 tile each)
    np.testing.assert_array_equal(np.asarray(tile_ids[1][:2]), [7, 7])
    assert np.asarray(valid[1]).sum() == 2


# ---------------------------------------------------------------- ivf search
def test_ivf_scan_matches_bruteforce_over_probed_lists(rng):
    n, d, nlist = 1000, 16, 8
    data = rng.randn(n, d).astype(np.float32)
    assignments = rng.randint(0, nlist, n)
    layout = build_list_layout(data, assignments, nlist, tile=TILE)
    q = rng.randn(3, d).astype(np.float32)

    tiles = jnp.asarray(layout.sorted_rows.reshape(-1, TILE, d))
    row_ids = jnp.asarray(layout.row_flat_ids, jnp.int32)
    probe_ids = jnp.asarray([[0, 3], [1, 2], [7, 4]], jnp.int32)
    tile_ids, valid, _ = probe_tile_schedule(
        probe_ids, jnp.asarray(layout.tile_start), jnp.asarray(layout.tile_count), 8
    )
    scores, ids = ivf_scan_topk(jnp.asarray(q), tiles, row_ids, tile_ids, valid, k=5, group=2)
    scores, ids = np.asarray(scores), np.asarray(ids)

    for b in range(3):
        lists = probe_ids[b].tolist()
        cand = np.where(np.isin(assignments, lists))[0]
        exact = q[b] @ data[cand].T
        order = cand[np.argsort(-exact)][:5]
        np.testing.assert_array_equal(ids[b], order)
        np.testing.assert_allclose(scores[b], np.sort(exact)[::-1][:5], rtol=1e-4, atol=1e-4)


def test_ivf_flat_index_end_to_end(tmp_path, rng):
    from retrieval_scaling_tpu.index.ivf_flat import IVFFlatIndex

    n_per, d, nlist = 400, 32, 16
    emb_dir = tmp_path / "emb"
    psg_dir = tmp_path / "psg"
    emb_dir.mkdir(), psg_dir.mkdir()
    data, _, _ = _clustered_data(rng, n=2 * n_per, d=d, n_clusters=nlist)
    for shard in range(2):
        emb = data[shard * n_per : (shard + 1) * n_per].astype(np.float16)
        with open(emb_dir / f"passages_{shard:02d}.pkl", "wb") as f:
            pickle.dump((list(range(n_per)), emb), f)
        with open(psg_dir / f"raw_passages-{shard}-of-2.jsonl", "w") as f:
            for i in range(n_per):
                f.write(json.dumps({"text": f"p-{shard}-{i}", "id": i}) + "\n")

    index = IVFFlatIndex(
        embed_paths=[str(emb_dir / "passages_00.pkl"), str(emb_dir / "passages_01.pkl")],
        index_path=str(tmp_path / "idx" / "index_IVFFlat.tpu.npz"),
        meta_file=str(tmp_path / "idx" / "index_IVFFlat.tpu.ids.npy"),
        trained_index_path=str(tmp_path / "idx" / "index_IVFFlat.tpu.trained.npz"),
        passage_dir=str(psg_dir),
        dimension=d,
        sample_train_size=600,
        ncentroids=nlist,
        probe=nlist,  # probe everything -> exact
        kmeans_iters=8,
        dtype=jnp.float32,
    )
    q = data[:5] + 0.01 * rng.randn(5, d).astype(np.float32)
    scores, passages, db_ids = index.search(q, k=10)

    # with nprobe == nlist the search is exhaustive -> exact top-k
    # (ground truth in fp16, the storage dtype of embedding shards)
    exact = q @ data.astype(np.float16).astype(np.float32).T
    for b in range(5):
        order = np.argsort(-exact[b])[:10]
        got = [sid * n_per + cid for sid, cid in db_ids[b]]
        assert got == order.tolist()

    # reload from disk and check determinism
    index2 = IVFFlatIndex(
        index_path=str(tmp_path / "idx" / "index_IVFFlat.tpu.npz"),
        meta_file=str(tmp_path / "idx" / "index_IVFFlat.tpu.ids.npy"),
        trained_index_path=str(tmp_path / "idx" / "index_IVFFlat.tpu.trained.npz"),
        passage_dir=str(psg_dir),
        dimension=d,
        ncentroids=nlist,
        probe=4,
        dtype=jnp.float32,
    )
    s1, i1 = index2.search_ids(q, 10)
    s2, i2 = index2.search_ids(q, 10)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_recall_with_partial_probes(rng):
    """nprobe = 25% of lists on clustered data should give high recall@10."""
    from retrieval_scaling_tpu.index.ivf_common import (
        build_list_layout,
        probe_tile_schedule,
        select_probes,
    )

    n, d, nlist = 4000, 32, 32
    data, _, _ = _clustered_data(rng, n=n, d=d, n_clusters=nlist)
    centroids, _ = kmeans(data, nlist, iters=10, seed=0)
    assignments = np.asarray(assign_clusters(jnp.asarray(data), centroids, nlist, metric="ip"))
    layout = build_list_layout(data, assignments, nlist, tile=TILE)

    q = data[rng.randint(0, n, 20)] + 0.05 * rng.randn(20, d).astype(np.float32)
    nprobe = 8
    _, probe_ids = select_probes(jnp.asarray(q), centroids, nprobe)
    max_tiles = default_max_tiles(layout.list_len, nprobe)
    tile_ids, valid, _ = probe_tile_schedule(
        probe_ids, jnp.asarray(layout.tile_start), jnp.asarray(layout.tile_count), max_tiles
    )
    scores, ids = ivf_scan_topk(
        jnp.asarray(q),
        jnp.asarray(layout.sorted_rows.reshape(-1, TILE, d)),
        jnp.asarray(layout.row_flat_ids, jnp.int32),
        tile_ids,
        valid,
        k=10,
    )
    ids = np.asarray(ids)
    exact = q @ data.T
    recalls = []
    for b in range(20):
        truth = set(np.argsort(-exact[b])[:10].tolist())
        recalls.append(len(truth & set(ids[b].tolist())) / 10)
    assert np.mean(recalls) > 0.85, np.mean(recalls)


# ---------------------------------------------------------------- PQ ops
def test_pq_encode_decode_reduces_error(rng):
    data = rng.randn(1500, 32).astype(np.float32)
    books = pq_train_codebooks(data[:1000], n_subquantizers=4, n_bits=6, iters=8)
    codes = pq_encode(jnp.asarray(data), books)
    assert codes.shape == (1500, 4) and codes.dtype == jnp.uint8
    recon = np.asarray(pq_decode(codes, books))
    err = ((recon - data) ** 2).mean()
    base = (data**2).mean()
    assert err < 0.6 * base  # quantization reduces energy error substantially


def test_pq_encode_picks_nearest_codeword(rng):
    books = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    data = rng.randn(50, 8).astype(np.float32)
    codes = np.asarray(pq_encode(jnp.asarray(data), books))
    for j in range(2):
        sub = data[:, j * 4 : (j + 1) * 4]
        d2 = ((sub[:, None] - np.asarray(books[j])[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, j], np.argmin(d2, axis=1))


def test_ivf_scan_scores_are_f32_accumulated(rng):
    """Scores must come from f32 MXU accumulation, not bf16 rounding.

    Regression: a missing preferred_element_type made scan scores land on
    the bf16 grid, tie-breaking true neighbors away (recall plateaued at
    ~0.75 regardless of nprobe).
    """
    import jax.numpy as jnp

    from retrieval_scaling_tpu.index.ivf_common import (
        build_list_layout,
        ivf_scan_topk,
        probe_tile_schedule,
        select_probes,
    )

    d = 32
    data, _, _ = _clustered_data(rng, n=600, d=d, n_clusters=4)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    assign = np.zeros(len(data), np.int32)  # single list: pure ranking test
    layout = build_list_layout(data.astype(np.float16), assign, 1)

    q = data[:1] + 0.001 * rng.randn(1, d).astype(np.float32)
    tiles = jnp.asarray(layout.sorted_rows.reshape(-1, 128, d), jnp.bfloat16)
    probe_ids = jnp.zeros((1, 1), jnp.int32)
    tile_ids, valid, _ = probe_tile_schedule(
        probe_ids, jnp.asarray(layout.tile_start), jnp.asarray(layout.tile_count),
        int(layout.tile_count.max()),
    )
    scores, ids = ivf_scan_topk(
        jnp.asarray(q, jnp.bfloat16), tiles, jnp.asarray(layout.row_flat_ids),
        tile_ids, valid, 10,
    )
    got = np.asarray(scores[0])
    # bf16 values round-trip exactly; f32-accumulated scores of bf16 inputs
    # almost surely don't. At least some scores must be off-grid.
    on_grid = np.asarray(jnp.asarray(got, jnp.bfloat16), np.float32) == got
    assert not on_grid.all(), got[:5]


def test_ivf_flat_sq8_matches_float(tmp_path, rng):
    """IVFFlat quantization='int8' (SQ8 list tiles): near-exact recall at
    half the tile DMA stream, scores dequantized to the exact scale."""
    from retrieval_scaling_tpu.index.ivf_flat import IVFFlatIndex

    n_per, d, nlist = 400, 32, 16
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    data, _, _ = _clustered_data(rng, n=2 * n_per, d=d, n_clusters=nlist)
    for shard in range(2):
        emb = data[shard * n_per : (shard + 1) * n_per].astype(np.float16)
        with open(emb_dir / f"passages_{shard:02d}.pkl", "wb") as f:
            pickle.dump((list(range(n_per)), emb), f)
    paths = [str(emb_dir / "passages_00.pkl"), str(emb_dir / "passages_01.pkl")]
    kw = dict(
        embed_paths=paths, dimension=d, sample_train_size=600,
        ncentroids=nlist, probe=nlist, kmeans_iters=8, dtype=jnp.float32,
        trained_index_path=str(tmp_path / "trained.npz"),
    )
    base = IVFFlatIndex(**kw)
    quant = IVFFlatIndex(quantization="int8", **kw)
    assert quant.tiles_dev.dtype == jnp.int8 and quant.tile_scales_dev is not None

    q = data[:8] + 0.01 * rng.randn(8, d).astype(np.float32)
    s_f, i_f = base.search_ids(q, 10)
    s_q, i_q = quant.search_ids(q, 10)
    recall = np.mean([
        len(set(map(int, a)) & set(map(int, b))) / 10 for a, b in zip(i_f, i_q)
    ])
    assert recall >= 0.95, recall
    np.testing.assert_allclose(s_q, s_f, rtol=0.05, atol=0.2)

    with pytest.raises(ValueError):
        IVFFlatIndex(quantization="fp4", **kw)


def test_ivf_scan_pallas_sq8_interpret(rng):
    """The Pallas gather kernel path with int8 tiles + dequant scales."""
    from retrieval_scaling_tpu.index.flat import quantize_rows_sq8
    from retrieval_scaling_tpu.ops.ivf_gather import ivf_scan_topk_pallas

    data, _, _ = _clustered_data(rng, n=1024, d=32, n_clusters=8)
    assign = np.asarray(assign_clusters(jnp.asarray(data), jnp.asarray(
        data[rng.choice(1024, 8, replace=False)]), 8, metric="ip"))
    layout = build_list_layout(data, assign, 8, TILE)
    total_tiles = int(layout.tile_count.sum())
    rows_q, scales = quantize_rows_sq8(layout.sorted_rows)
    q = jnp.asarray(data[:4])
    tile_ids = jnp.broadcast_to(jnp.arange(total_tiles, dtype=jnp.int32)[None], (4, total_tiles))
    valid = jnp.ones((4, total_tiles), bool)

    s_f, i_f = ivf_scan_topk_pallas(
        q, jnp.asarray(layout.sorted_rows.reshape(total_tiles, TILE, 32), jnp.float32),
        jnp.asarray(layout.row_flat_ids, jnp.int32), tile_ids, valid, 10, interpret=True)
    s_q, i_q = ivf_scan_topk_pallas(
        q, jnp.asarray(rows_q.reshape(total_tiles, TILE, 32)),
        jnp.asarray(layout.row_flat_ids, jnp.int32), tile_ids, valid, 10, interpret=True,
        tile_row_scales=jnp.asarray(scales.reshape(total_tiles, TILE)))
    recall = np.mean([
        len(set(map(int, a)) & set(map(int, b))) / 10
        for a, b in zip(np.asarray(i_f), np.asarray(i_q))
    ])
    assert recall >= 0.9, recall
