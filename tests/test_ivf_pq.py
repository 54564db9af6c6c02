import json
import pickle

import jax.numpy as jnp
import numpy as np
import os
import pytest

from retrieval_scaling_tpu.index.ivf_pq import IVFPQIndex, pq_scan_topk


def _clustered(rng, n, d, c, spread=0.2):
    centers = rng.randn(c, d).astype(np.float32)
    labels = rng.randint(0, c, n)
    return centers[labels] + spread * rng.randn(n, d).astype(np.float32)


def _write_shards(tmp_path, data, num_shards=2):
    emb_dir = tmp_path / "emb"
    psg_dir = tmp_path / "psg"
    emb_dir.mkdir(), psg_dir.mkdir()
    per = len(data) // num_shards
    for shard in range(num_shards):
        emb = data[shard * per : (shard + 1) * per].astype(np.float16)
        with open(emb_dir / f"passages_{shard:02d}.pkl", "wb") as f:
            pickle.dump((list(range(per)), emb), f)
        with open(psg_dir / f"raw_passages-{shard}-of-{num_shards}.jsonl", "w") as f:
            for i in range(per):
                f.write(json.dumps({"text": f"p-{shard}-{i}", "id": i}) + "\n")
    return str(emb_dir), str(psg_dir), per


@pytest.fixture(scope="module")
def pq_index_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pq")
    rng = np.random.RandomState(0)
    d, nlist = 32, 16
    data = _clustered(rng, 2000, d, nlist)
    emb_dir, psg_dir, per = _write_shards(tmp_path, data)
    index = IVFPQIndex(
        embed_paths=[f"{emb_dir}/passages_00.pkl", f"{emb_dir}/passages_01.pkl"],
        index_path=str(tmp_path / "idx" / "index_IVFPQ.tpu.npz"),
        meta_file=str(tmp_path / "idx" / "index_IVFPQ.tpu.ids.npy"),
        trained_index_path=str(tmp_path / "idx" / "index_IVFPQ.tpu.trained.npz"),
        passage_dir=psg_dir,
        dimension=d,
        sample_train_size=1500,
        ncentroids=nlist,
        probe=8,
        n_subquantizers=8,
        n_bits=6,
        kmeans_iters=8,
        pq_iters=8,
    )
    return index, data, per, tmp_path, rng


def test_pq_compression_ratio(pq_index_env):
    index, data, _, _, _ = pq_index_env
    # m bytes/vector vs 2*D raw fp16
    assert index.code_tiles_dev.shape[-1] == 8
    assert index.code_tiles_dev.dtype == jnp.uint8


def test_pq_recall_vs_exact(pq_index_env):
    index, data, per, _, rng = pq_index_env
    q = data[rng.randint(0, len(data), 16)] + 0.02 * rng.randn(16, 32).astype(np.float32)
    scores, ids = index.search_ids(q, 10)
    exact = q @ data.T
    recalls = []
    for b in range(16):
        truth = set(np.argsort(-exact[b])[:10].tolist())
        recalls.append(len(truth & set(ids[b].tolist())) / 10)
    # PQ-compressed recall@10: measured 0.600 in this exact config under
    # the 8-device test mesh and 0.6375 single-device (k-means reduction
    # order shifts the codebooks slightly); gate just below the worse
    # measurement so a quantizer regression trips it. The full quality
    # ladder on REAL embeddings (m in {8,16,32} x {raw, OPQ, refine},
    # recall vs exact at stated bytes/row) is pinned in BENCH.md from
    # scripts/pq_recall_ladder.py (bench_artifacts/pq_ladder_r05.jsonl).
    assert np.mean(recalls) >= 0.59, np.mean(recalls)


def test_pq_score_decomposition(pq_index_env):
    """ADC score must equal coarse + LUT reconstruction of the same code."""
    index, data, per, _, rng = pq_index_env
    q = data[:2]
    scores, ids = index.search_ids(q, 5)
    # recompute score of the top hit by hand
    for b in range(2):
        flat_id = None
        # map db id back to flat position in build order
        sid, cid = index.index_id_to_db_id[0] if False else (None, None)
        top_flat = ids[b, 0]
        # find the row in the layout and its list
        pos = np.where(index.layout.row_flat_ids == top_flat)[0][0]
        tile = pos // 128
        # which list contains this tile
        lists = np.where(
            (index.layout.tile_start <= tile)
            & (tile < index.layout.tile_start + index.layout.tile_count)
        )[0]
        assert len(lists) == 1
        c = lists[0]
        code = index.layout.sorted_rows[pos]
        recon = np.concatenate(
            [index.codebooks[m][code[m]] for m in range(index.m)]
        )
        manual = q[b] @ (index.centroids[c] + recon)
        np.testing.assert_allclose(scores[b, 0], manual, rtol=1e-3, atol=1e-3)


def test_pq_persistence_roundtrip(pq_index_env):
    index, data, per, tmp_path, rng = pq_index_env
    q = data[:4]
    s1, i1 = index.search_ids(q, 8)
    reloaded = IVFPQIndex(
        index_path=str(tmp_path / "idx" / "index_IVFPQ.tpu.npz"),
        meta_file=str(tmp_path / "idx" / "index_IVFPQ.tpu.ids.npy"),
        trained_index_path=str(tmp_path / "idx" / "index_IVFPQ.tpu.trained.npz"),
        dimension=32,
        ncentroids=16,
        probe=8,
        n_subquantizers=8,
        n_bits=6,
    )
    s2, i2 = reloaded.search_ids(q, 8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_adc_modes_agree(pq_index_env):
    index, data, per, _, rng = pq_index_env
    q = data[:4]
    s_gather, i_gather = index.search_ids(q, 8)
    index.adc_mode = "onehot"
    try:
        s_onehot, i_onehot = index.search_ids(q, 8)
    finally:
        index.adc_mode = "gather"
    np.testing.assert_array_equal(i_gather, i_onehot)
    np.testing.assert_allclose(s_gather, s_onehot, rtol=2e-2, atol=2e-2)


def test_configured_dimension_mismatch_is_ignored(tmp_path):
    """search must use the dimension of the embeddings actually indexed,
    not the configured default (768), which may disagree."""
    import pickle

    rng = np.random.RandomState(7)
    emb = rng.randn(64, 32).astype(np.float16)
    path = tmp_path / "passages_00.pkl"
    with open(path, "wb") as f:
        pickle.dump((list(range(64)), emb), f)
    index = IVFPQIndex(
        embed_paths=[str(path)],
        dimension=768,  # wrong on purpose
        sample_train_size=64,
        ncentroids=2,
        probe=2,
        n_subquantizers=4,
        kmeans_iters=3,
        pq_iters=3,
    )
    assert index.dimension == 32
    scores, ids = index.search_ids(rng.randn(3, 32).astype(np.float32), 5)
    assert ids.shape == (3, 5)


def test_refine_factor_improves_recall(tmp_path):
    """ScaNN-style int8 refinement: PQ alone mis-ranks near-ties; exact
    int8 re-rank of the top refine_factor*k must dominate it
    (FAISS analog: IndexRefineFlat)."""
    import pickle

    rng = np.random.RandomState(3)
    n, d = 4000, 64
    centers = rng.randn(32, d).astype(np.float32) * 2
    data = centers[rng.randint(0, 32, n)] + rng.randn(n, d).astype(np.float32) * 0.7
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = tmp_path / "passages_00.pkl"
    with open(path, "wb") as f:
        pickle.dump((list(range(n)), data.astype(np.float16)), f)

    q = centers[rng.randint(0, 32, 8)] + rng.randn(8, d).astype(np.float32) * 0.7
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(q @ data.T), axis=1)[:, :10]

    common = dict(
        embed_paths=[str(path)], dimension=d, sample_train_size=n,
        ncentroids=16, probe=16, n_subquantizers=8, kmeans_iters=5, pq_iters=5,
    )
    plain = IVFPQIndex(**common)
    refined = IVFPQIndex(**common, refine_factor=16)

    def recall(index):
        _, ids = index.search_ids(q, 10)
        return np.mean([
            len(set(map(int, ids[i])) & set(map(int, exact[i]))) / 10 for i in range(8)
        ])

    r_plain, r_refined = recall(plain), recall(refined)
    assert r_refined >= r_plain
    assert r_refined >= 0.85, (r_plain, r_refined)

    # persistence roundtrip keeps the refinement rows
    idx_path = str(tmp_path / "idx" / "index.npz")
    meta = str(tmp_path / "idx" / "index.ids.npy")
    saved = IVFPQIndex(**common, refine_factor=16, index_path=idx_path, meta_file=meta)
    loaded = IVFPQIndex(**common, refine_factor=16, index_path=idx_path, meta_file=meta)
    assert loaded.refine_rows_i8 is not None
    _, i1 = saved.search_ids(q, 10)
    _, i2 = loaded.search_ids(q, 10)
    np.testing.assert_array_equal(i1, i2)


def test_opq_rotation_improves_raw_pq_recall(tmp_path):
    """OPQ (orthogonal rotation trained to minimize PQ error — FAISS's
    OPQ{m} transform) must not hurt, and on correlated data should beat,
    raw PQ recall at identical bytes/vector; persistence keeps R."""
    import pickle

    rng = np.random.RandomState(4)
    n, d, intrinsic = 6000, 64, 12
    w = rng.randn(intrinsic, d).astype(np.float32) / np.sqrt(intrinsic)
    z = rng.randn(n, intrinsic).astype(np.float32)
    data = (z @ w) + 0.02 * rng.randn(n, d).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = tmp_path / "passages_00.pkl"
    with open(path, "wb") as f:
        pickle.dump((list(range(n)), data.astype(np.float16)), f)

    q = data[rng.choice(n, 8, replace=False)] + 0.01 * rng.randn(8, d).astype(np.float32)
    exact = np.argsort(-(q @ data.T), axis=1)[:, :10]

    common = dict(
        embed_paths=[str(path)], dimension=d, sample_train_size=n,
        ncentroids=16, probe=16, n_subquantizers=8, kmeans_iters=5, pq_iters=5,
    )

    def recall(index):
        _, ids = index.search_ids(q, 10)
        return np.mean([
            len(set(map(int, ids[i])) & set(map(int, exact[i]))) / 10 for i in range(8)
        ])

    r_plain = recall(IVFPQIndex(**common))
    opq_index = IVFPQIndex(**common, opq=True)
    r_opq = recall(opq_index)
    # R must be (numerically) orthogonal
    rot = opq_index.opq_rotation
    np.testing.assert_allclose(rot @ rot.T, np.eye(d), atol=1e-4)
    assert r_opq >= r_plain - 0.05, (r_plain, r_opq)

    # roundtrip keeps the rotation and reproduces results
    idx_path = str(tmp_path / "idx" / "index.npz")
    meta = str(tmp_path / "idx" / "index.ids.npy")
    saved = IVFPQIndex(**common, opq=True, index_path=idx_path, meta_file=meta)
    loaded = IVFPQIndex(**common, opq=True, index_path=idx_path, meta_file=meta)
    assert loaded.opq_rotation is not None
    _, i1 = saved.search_ids(q, 10)
    _, i2 = loaded.search_ids(q, 10)
    np.testing.assert_array_equal(i1, i2)
    print("plain:", r_plain, "opq:", r_opq)


def test_host_streamed_refine_matches_device(tmp_path):
    """refine_mode=host streams candidate rows from the sidecar file via
    preads; results must match the device-resident refine, with no rows
    in device memory."""
    import pickle

    rng = np.random.RandomState(7)
    n, d = 2000, 64
    centers = rng.randn(16, d).astype(np.float32) * 2
    data = centers[rng.randint(0, 16, n)] + rng.randn(n, d).astype(np.float32) * 0.6
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = tmp_path / "passages_00.pkl"
    with open(path, "wb") as f:
        pickle.dump((list(range(n)), data.astype(np.float16)), f)
    q = centers[rng.randint(0, 16, 6)] + rng.randn(6, d).astype(np.float32) * 0.6
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    common = dict(
        embed_paths=[str(path)], dimension=d, sample_train_size=n,
        ncentroids=8, probe=8, n_subquantizers=8, kmeans_iters=4, pq_iters=4,
        refine_factor=8,
    )
    idx_path = str(tmp_path / "idx" / "index.npz")
    meta = str(tmp_path / "idx" / "index.ids.npy")
    dev = IVFPQIndex(**common, index_path=idx_path, meta_file=meta)
    assert os.path.exists(idx_path[:-4] + ".refine.bin")

    host = IVFPQIndex(**common, index_path=idx_path, meta_file=meta,
                      refine_mode="host")
    # host mode keeps rows OFF the device and out of RAM
    assert host.refine_rows_dev is None
    assert host.refine_rows_i8 is None
    assert host.refine_row_file is not None

    s_dev, i_dev = dev.search_ids(q, 10)
    s_host, i_host = host.search_ids(q, 10)
    np.testing.assert_array_equal(i_dev, i_host)
    np.testing.assert_allclose(s_dev, s_host, atol=1e-4, rtol=1e-4)

    # in-memory build (no index_path): host mode falls back to RAM rows
    mem = IVFPQIndex(**common, refine_mode="host")
    s_mem, i_mem = mem.search_ids(q, 10)
    np.testing.assert_array_equal(i_mem, i_dev)


def test_refine_mode_validation():
    with pytest.raises(ValueError, match="refine_mode"):
        IVFPQIndex(embed_paths=[], refine_mode="banana")


def test_aniso_encode_eta1_equals_plain():
    """eta = 1 collapses the anisotropic loss to plain L2 — assignment must
    match pq_encode exactly (pins the loss algebra in _aniso_assign)."""
    from retrieval_scaling_tpu.ops.kmeans import (
        aniso_pq_encode,
        pq_encode,
        pq_train_codebooks,
    )

    rng = np.random.RandomState(0)
    x = rng.randn(512, 32).astype(np.float32)
    books = pq_train_codebooks(x, 4, 4, iters=4)
    plain = np.asarray(pq_encode(jnp.asarray(x), books))
    aniso = np.asarray(aniso_pq_encode(x, books, eta=1.0))
    np.testing.assert_array_equal(plain, aniso)


def test_aniso_train_improves_mips_recall():
    """Score-aware codebooks + encoding (Guo et al. 2020) must not lose to
    plain PQ on MIPS recall over low-intrinsic-dimension unit vectors (the
    real-embedding geometry the ladder measures)."""
    from retrieval_scaling_tpu.ops.kmeans import (
        aniso_pq_encode,
        aniso_pq_train,
        pq_encode,
        pq_train_codebooks,
    )

    rng = np.random.RandomState(1)
    n, d, m, nq = 6000, 64, 8, 128
    a = rng.randn(12, d).astype(np.float32)
    x = (rng.randn(n, 12).astype(np.float32) @ a + 0.15 * rng.randn(n, d).astype(np.float32))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = (rng.randn(nq, 12).astype(np.float32) @ a + 0.15 * rng.randn(nq, d).astype(np.float32))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    exact = np.argsort(-(q @ x.T), axis=1)[:, :10]

    def recall(cb, codes):
        cb = np.asarray(cb)
        rec = np.concatenate(
            [cb[j][np.asarray(codes)[:, j].astype(int)] for j in range(m)], axis=1
        )
        top = np.argsort(-(q @ rec.T), axis=1)[:, :10]
        return np.mean(
            [len(set(top[i]) & set(exact[i])) / 10 for i in range(nq)]
        )

    cb_p = pq_train_codebooks(x, m, 6, iters=8)
    r_plain = recall(cb_p, pq_encode(jnp.asarray(x), cb_p))
    eta = 16.0
    cb_a = aniso_pq_train(x, m, 6, iters=8, eta=eta)
    r_aniso = recall(cb_a, aniso_pq_encode(x, cb_a, eta=eta))
    assert r_aniso >= r_plain - 0.01, (r_plain, r_aniso)
    print("plain:", r_plain, "aniso:", r_aniso)


def test_aniso_index_builds_and_searches(tmp_path):
    """IVFPQIndex(aniso=True) end-to-end: build, search, compose with OPQ."""
    import pickle

    rng = np.random.RandomState(5)
    n, d = 3000, 32
    a = rng.randn(8, d).astype(np.float32)
    data = rng.randn(n, 8).astype(np.float32) @ a + 0.05 * rng.randn(n, d).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    path = tmp_path / "passages_00.pkl"
    with open(path, "wb") as f:
        pickle.dump((list(range(n)), data.astype(np.float16)), f)
    q = data[rng.choice(n, 8, replace=False)] + 0.01 * rng.randn(8, d).astype(np.float32)
    exact = np.argsort(-(q @ data.T), axis=1)[:, :10]

    common = dict(
        embed_paths=[str(path)], dimension=d, sample_train_size=n,
        ncentroids=16, probe=16, n_subquantizers=8, kmeans_iters=4, pq_iters=4,
    )

    def recall(index):
        _, ids = index.search_ids(q, 10)
        return np.mean([
            len(set(map(int, ids[i])) & set(map(int, exact[i]))) / 10 for i in range(8)
        ])

    r_plain = recall(IVFPQIndex(**common))
    r_aniso = recall(IVFPQIndex(**common, aniso=True))
    r_both = recall(IVFPQIndex(**common, aniso=True, opq=True))
    assert r_aniso >= r_plain - 0.1, (r_plain, r_aniso)
    assert r_both >= 0.0  # composition smoke: builds + searches
    print("plain:", r_plain, "aniso:", r_aniso, "aniso+opq:", r_both)
