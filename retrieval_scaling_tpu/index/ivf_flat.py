"""IVF-Flat index on TPU: trained coarse quantizer + tiled inverted lists.

The ``faiss.IndexIVFFlat`` replacement (reference: src/indicies/ivf_flat.py):
coarse centroids are trained with the TPU k-means (ops/kmeans.py) on a
sample of the shard embeddings (reference: ivf_flat.py:122-140 samples
``sample_train_size`` uniformly across shards); vectors are assigned by
inner product and laid out in tile-padded CSR lists; search selects
``nprobe`` lists per query and streams their tiles with a running top-k
(index/ivf_common.py).

Artifacts: ``.trained.npz`` (centroids — the FAISS ``.trained`` analog,
reference: ivf_flat.py:77-82), ``.npz`` (lists + layout), ``.ids.npy``.
"""

from __future__ import annotations

import logging
import os
import time
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from retrieval_scaling_tpu.data.passages import PassageStore
from retrieval_scaling_tpu.index.flat import (
    filter_pad_hits,
    load_embedding_shard,
    shard_id_from_embedding_path,
)
from retrieval_scaling_tpu.index.ivf_common import (
    TILE,
    build_list_layout,
    default_max_tiles,
    ivf_scan_topk,
    probe_tile_schedule,
    select_probes,
)
from retrieval_scaling_tpu.ops.kmeans import assign_clusters, kmeans
from retrieval_scaling_tpu.parallel.mesh import single_device_mesh

logger = logging.getLogger(__name__)


class IVFFlatIndex:
    def __init__(
        self,
        embed_paths: Sequence[str] | None = None,
        index_path: str | None = None,
        meta_file: str | None = None,
        trained_index_path: str | None = None,
        passage_dir: str | None = None,
        pos_map_save_path: str | None = None,
        dimension: int = 768,
        sample_train_size: int = 1000000,
        ncentroids: int = 4096,
        probe: int = 64,
        kmeans_iters: int = 20,
        mesh: Mesh | None = None,
        dtype=jnp.bfloat16,
        probe_slack: float = 1.5,
        quantization: str | None = None,
    ):
        self.index_path = index_path
        self.meta_file = meta_file
        self.trained_index_path = trained_index_path
        self.dimension = dimension
        self.sample_train_size = sample_train_size
        self.ncentroids = ncentroids
        self.probe = probe
        self.kmeans_iters = kmeans_iters
        self.mesh = mesh or single_device_mesh()
        self.dtype = dtype
        self.probe_slack = probe_slack
        # "int8" = per-row SQ8 list tiles (FAISS IndexIVFScalarQuantizer
        # analog): doubles list rows per chip at SQ8's near-exact recall
        # (measured +7% QPS — the per-tile scan is program-overhead-bound,
        # see BENCH.md). Applied at device-placement time; artifacts stay
        # fp16.
        if quantization not in (None, "", "none", "int8"):
            raise ValueError(f"unknown datastore quantization {quantization!r}")
        self.quantization = quantization if quantization == "int8" else None

        if index_path and meta_file and os.path.exists(index_path) and os.path.exists(meta_file):
            logger.info("Loading IVF-Flat index from %s", index_path)
            self._load(index_path, meta_file)
        else:
            centroids = self._load_or_train_centroids(embed_paths or [])
            self._build(embed_paths or [], centroids)
            if index_path and meta_file:
                self._save(index_path, meta_file)

        self._place_on_device()

        self.passage_store: PassageStore | None = None
        if passage_dir is not None:
            self.passage_store = PassageStore.from_passages_dir(passage_dir, pos_map_save_path)

    # ------------------------------------------------------------ training
    def _sample_training_vectors(self, embed_paths: Sequence[str]) -> np.ndarray:
        """Uniform per-shard sample (reference: ivf_flat.py:122-140)."""
        per_shard = max(1, self.sample_train_size // max(len(embed_paths), 1))
        rng = np.random.RandomState(1)  # fixed seed like the reference (np.random.seed(1))
        samples: List[np.ndarray] = []
        for path in embed_paths:
            _, emb = load_embedding_shard(path)
            take = min(per_shard, len(emb))
            idx = rng.choice(len(emb), size=take, replace=False)
            samples.append(np.asarray(emb[idx], np.float32))
        return np.concatenate(samples, axis=0)

    def _load_or_train_centroids(self, embed_paths: Sequence[str]) -> np.ndarray:
        if self.trained_index_path and os.path.exists(self.trained_index_path):
            logger.info("Loading trained centroids from %s", self.trained_index_path)
            return np.load(self.trained_index_path)["centroids"]
        sample = self._sample_training_vectors(embed_paths)
        logger.info("Training %d centroids on %d samples", self.ncentroids, len(sample))
        t0 = time.time()
        centroids, history = kmeans(sample, self.ncentroids, iters=self.kmeans_iters)
        centroids = np.asarray(centroids, np.float32)
        logger.info(
            "k-means done in %.1fs (objective %.4g -> %.4g)",
            time.time() - t0,
            float(history[0]),
            float(history[-1]),
        )
        if self.trained_index_path:
            os.makedirs(os.path.dirname(self.trained_index_path), exist_ok=True)
            np.savez(self.trained_index_path[:-4] if self.trained_index_path.endswith(".npz") else self.trained_index_path, centroids=centroids)
        return centroids

    # ------------------------------------------------------------ build
    def _load_all_embeddings(self, embed_paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        parts, id_parts = [], []
        for path in sorted(embed_paths, key=shard_id_from_embedding_path):
            shard_id = shard_id_from_embedding_path(path)
            _, emb = load_embedding_shard(path)
            parts.append(np.asarray(emb, np.float16))
            ids = np.empty((len(emb), 2), np.int64)
            ids[:, 0] = shard_id
            ids[:, 1] = np.arange(len(emb))
            id_parts.append(ids)
        return np.concatenate(parts, 0), np.concatenate(id_parts, 0)

    def _build(self, embed_paths: Sequence[str], centroids: np.ndarray) -> None:
        emb, db_ids = self._load_all_embeddings(embed_paths)
        t0 = time.time()
        assignments = np.asarray(
            assign_clusters(jnp.asarray(emb, self.dtype), jnp.asarray(centroids, jnp.float32),
                            self.ncentroids, metric="ip")
        )
        layout = build_list_layout(emb, assignments, self.ncentroids, TILE)
        logger.info(
            "Assigned+laid out %d vectors into %d lists (%.1fs, %d tiles)",
            len(emb), self.ncentroids, time.time() - t0, int(layout.tile_count.sum()),
        )
        self.centroids = centroids
        self.layout = layout
        self.index_id_to_db_id = db_ids
        self.n_valid = len(emb)

    # ------------------------------------------------------------ io
    def _save(self, index_path: str, meta_file: str) -> None:
        os.makedirs(os.path.dirname(index_path), exist_ok=True)
        base = index_path[:-4] if index_path.endswith(".npz") else index_path
        np.savez(
            base,
            centroids=self.centroids,
            sorted_rows=self.layout.sorted_rows.astype(np.float16),
            row_flat_ids=self.layout.row_flat_ids,
            tile_start=self.layout.tile_start,
            tile_count=self.layout.tile_count,
            list_len=self.layout.list_len,
            n_valid=np.int64(self.n_valid),
        )
        np.save(meta_file + ".tmp.npy", self.index_id_to_db_id)
        os.replace(meta_file + ".tmp.npy", meta_file)

    def _load(self, index_path: str, meta_file: str) -> None:
        from retrieval_scaling_tpu.index.ivf_common import IVFListLayout

        data = np.load(index_path)
        self.centroids = data["centroids"]
        self.layout = IVFListLayout(
            data["sorted_rows"], data["row_flat_ids"], data["tile_start"],
            data["tile_count"], data["list_len"],
        )
        self.n_valid = int(data["n_valid"])
        self.index_id_to_db_id = np.load(meta_file)

    def _place_on_device(self) -> None:
        d = self.layout.sorted_rows.shape[1]
        total_tiles = max(int(self.layout.tile_count.sum()), 1)
        if self.quantization == "int8":
            from retrieval_scaling_tpu.index.flat import quantize_rows_sq8

            rows_q, scales = quantize_rows_sq8(self.layout.sorted_rows)
            self.tiles_dev = jnp.asarray(rows_q.reshape(total_tiles, TILE, d))
            self.tile_scales_dev = jnp.asarray(scales.reshape(total_tiles, TILE))
        else:
            self.tiles_dev = jnp.asarray(
                self.layout.sorted_rows.reshape(total_tiles, TILE, d), self.dtype
            )
            self.tile_scales_dev = None
        self.row_ids_dev = jnp.asarray(self.layout.row_flat_ids, jnp.int32)
        self.centroids_dev = jnp.asarray(self.centroids, jnp.float32)
        self.tile_start_dev = jnp.asarray(self.layout.tile_start, jnp.int32)
        self.tile_count_dev = jnp.asarray(self.layout.tile_count, jnp.int32)

    # ------------------------------------------------------------ search
    def search_ids(self, query_embs: np.ndarray, k: int, nprobe: int | None = None):
        nprobe = int(nprobe or self.probe)
        q_dtype = jnp.float32 if self.quantization == "int8" else self.dtype
        q = jnp.asarray(np.asarray(query_embs), q_dtype)
        _, probe_ids = select_probes(q.astype(jnp.float32), self.centroids_dev, nprobe)
        max_tiles = default_max_tiles(self.layout.list_len, nprobe, TILE, self.probe_slack)
        tile_ids, valid, _ = probe_tile_schedule(
            probe_ids, self.tile_start_dev, self.tile_count_dev, max_tiles
        )
        k_eff = min(k, self.n_valid)
        if jax.default_backend() == "tpu":
            # Pallas scalar-prefetch gather kernel: XLA's generic gather of
            # probed tiles lowers pathologically on TPU (ops/ivf_gather.py).
            from retrieval_scaling_tpu.ops.ivf_gather import ivf_scan_topk_pallas

            scores, ids = ivf_scan_topk_pallas(
                q, self.tiles_dev, self.row_ids_dev, tile_ids, valid, k_eff,
                tile_row_scales=self.tile_scales_dev,
            )
        else:
            scores, ids = ivf_scan_topk(
                q, self.tiles_dev, self.row_ids_dev, tile_ids, valid, k_eff,
                tile_row_scales=self.tile_scales_dev,
            )
        return np.asarray(jax.device_get(scores)), np.asarray(jax.device_get(ids))

    def get_retrieved_passages(self, all_indices):
        # Ragged rows of valid (>= 0) ids; see FlatIndex.get_retrieved_passages.
        assert self.passage_store is not None, "passage store not configured"
        flat = [int(i) for row in all_indices for i in row]
        assert all(i >= 0 for i in flat), "pad ids must be filtered before fetch"
        pairs = [tuple(int(v) for v in self.index_id_to_db_id[i]) for i in flat]
        records = self.passage_store.fetch_many(pairs)
        texts = [r["text"] for r in records]
        passages, db_ids, pos = [], [], 0
        for row in all_indices:
            passages.append(texts[pos : pos + len(row)])
            db_ids.append([list(pairs[pos + j]) for j in range(len(row))])
            pos += len(row)
        return passages, db_ids

    def search(self, query_embs: np.ndarray, k: int = 4096):
        scores, ids = self.search_ids(query_embs, k)
        scores, id_rows = filter_pad_hits(scores, ids)
        passages, db_ids = self.get_retrieved_passages(id_rows)
        return scores, passages, db_ids
