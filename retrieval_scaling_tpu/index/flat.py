"""Exact MIPS (Flat) index resident in TPU HBM.

The FAISS ``IndexFlatIP`` replacement (reference: src/indicies/flat.py:18-141)
rebuilt TPU-first: embeddings live as a bf16 [N_pad, D] device array
row-sharded over the mesh's ``data`` axis; search is MXU-tiled matmul
scoring with a streaming top-k (ops/topk.py) and an ICI cross-shard merge
(parallel/sharded_search.py).

On-disk artifacts:
  * ``index_Flat.tpu.npz``   — fp16 embeddings + shape metadata
  * ``index_Flat.tpu.ids.npy`` — int64 [N, 2] ``(shard_id, chunk_id)`` map
    (semantics of the reference's ``index_id_to_db_id`` pickle,
    reference: src/indicies/flat.py:57-71)
Input embedding shards are the reference's ``passages_{i:02d}.pkl``
``(ids, ndarray)`` pickles, so reference-built embeddings load directly.
"""

from __future__ import annotations

import logging
import os
import pickle
import re
import time
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from retrieval_scaling_tpu.data.passages import PassageStore
from retrieval_scaling_tpu.parallel.mesh import single_device_mesh
from retrieval_scaling_tpu.parallel.sharded_search import (
    replicate,
    shard_rows,
    shard_rows_1d,
    sharded_flat_search,
)

logger = logging.getLogger(__name__)

_ROW_ALIGN = 128  # pad datastore rows to the MXU tile


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def filter_pad_hits(scores: np.ndarray, ids: np.ndarray):
    """Drop pad hits (id < 0) from fixed-shape [b, k] search output.

    ``search_ids`` pads rows with id -1 when k exceeds the number of valid
    datastore rows. FAISS (reference: src/indicies/flat.py:129-141) returns
    only real hits, so pads must never reach the passage fetch: Python -1
    indexing would wrap to the LAST passage and a clamp-to-0 would return
    passage 0 — both silent phantom hits. Returns ragged per-row lists.
    """
    scores = np.asarray(scores)
    ids = np.asarray(ids)
    out_scores, out_ids = [], []
    for row_scores, row_ids in zip(scores, ids):
        valid = row_ids >= 0
        out_scores.append([float(s) for s in row_scores[valid]])
        out_ids.append([int(i) for i in row_ids[valid]])
    return out_scores, out_ids


def quantize_rows_sq8(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization: (int8 rows [N, D], f32 scales [N]).

    score(q, row) ≈ (q_int8 · row_int8) * q_scale * row_scale; pad rows get
    scale 0 so they dequantize to exact zeros.
    """
    embf = np.asarray(emb, np.float32)
    absmax = np.abs(embf).max(axis=1)
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    rows_q = np.clip(np.rint(embf / safe[:, None]), -127, 127).astype(np.int8)
    return rows_q, scales


def load_embedding_shard(path: str) -> Tuple[list, np.ndarray]:
    """Load one ``passages_{i}.pkl`` ``(ids, [N, D] array)`` shard."""
    with open(path, "rb") as f:
        ids, embeddings = pickle.load(f)
    return ids, np.asarray(embeddings)


def shard_id_from_embedding_path(path: str) -> int:
    m = re.search(r"_(\d+)\.pkl$", os.path.basename(path))
    if not m:
        raise ValueError(f"Cannot parse shard id from {path}")
    return int(m.group(1))


class FlatIndex:
    def __init__(
        self,
        embed_paths: Sequence[str] | None = None,
        index_path: str | None = None,
        meta_file: str | None = None,
        passage_dir: str | None = None,
        pos_map_save_path: str | None = None,
        dimension: int = 768,
        mesh: Mesh | None = None,
        dtype=jnp.bfloat16,
        search_chunk_size: int = 1 << 20,
        approx_recall: float | None = None,
        quantization: str | None = None,
    ):
        self.index_path = index_path
        self.meta_file = meta_file
        self.dimension = dimension
        self.mesh = mesh or single_device_mesh()
        self.dtype = dtype
        self.search_chunk_size = search_chunk_size
        # None = exact top-k; a recall target (e.g. 0.99) enables the
        # lax.approx_max_k serving fast path (datastore.index.approx_recall).
        self.approx_recall = approx_recall
        # "int8" = per-row symmetric scalar quantization of the datastore
        # (the FAISS IndexScalarQuantizer SQ8 analog): halves the HBM scan
        # stream — the exact-search bottleneck — and doubles rows/chip.
        # Applied at load time; on-disk artifacts stay fp16 for interop.
        if quantization not in (None, "", "none", "int8"):
            raise ValueError(f"unknown datastore quantization {quantization!r}")
        self.quantization = quantization if quantization == "int8" else None

        if index_path and meta_file and os.path.exists(index_path) and os.path.exists(meta_file):
            logger.info("Loading index from %s", index_path)
            emb, self.index_id_to_db_id = self._read_artifacts(index_path, meta_file)
        else:
            logger.info("Building Flat index from %d embedding shards", len(embed_paths or []))
            emb, self.index_id_to_db_id = self._build(embed_paths or [])
            if index_path and meta_file:
                self._write_artifacts(index_path, meta_file, emb, self.index_id_to_db_id)

        self.n_valid = emb.shape[0]
        self._place_on_mesh(emb)

        self.passage_store: PassageStore | None = None
        if passage_dir is not None:
            self.passage_store = PassageStore.from_passages_dir(passage_dir, pos_map_save_path)

    # ------------------------------------------------------------ build/io
    def _build(self, embed_paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        parts: List[np.ndarray] = []
        id_parts: List[np.ndarray] = []
        t0 = time.time()
        for path in sorted(embed_paths, key=shard_id_from_embedding_path):
            shard_id = shard_id_from_embedding_path(path)
            _, emb = load_embedding_shard(path)
            parts.append(np.asarray(emb, np.float16))
            ids = np.empty((len(emb), 2), np.int64)
            ids[:, 0] = shard_id
            ids[:, 1] = np.arange(len(emb))
            id_parts.append(ids)
            logger.info("added shard %d (%d vectors, %.1fs)", shard_id, len(emb), time.time() - t0)
        if not parts:
            raise ValueError("No embedding shards to index")
        return np.concatenate(parts, axis=0), np.concatenate(id_parts, axis=0)

    def _write_artifacts(self, index_path, meta_file, emb: np.ndarray, ids: np.ndarray) -> None:
        os.makedirs(os.path.dirname(index_path), exist_ok=True)
        tmp = index_path + ".tmp.npz"
        np.savez(tmp[:-4], embeddings=emb.astype(np.float16))
        os.replace(tmp, index_path)
        np.save(meta_file + ".tmp.npy", ids)
        os.replace(meta_file + ".tmp.npy", meta_file)
        logger.info("Wrote %s (%d vectors)", index_path, emb.shape[0])

    def _read_artifacts(self, index_path, meta_file) -> Tuple[np.ndarray, np.ndarray]:
        emb = np.load(index_path)["embeddings"]
        ids = np.load(meta_file)
        return emb, ids

    def _place_on_mesh(self, emb: np.ndarray) -> None:
        num_shards = self.mesh.shape["data"]
        rows_per_shard = _round_up(max(self.n_valid, 1), _ROW_ALIGN * num_shards) // num_shards
        total = rows_per_shard * num_shards
        if total != emb.shape[0]:
            emb = np.concatenate(
                [emb, np.zeros((total - emb.shape[0], emb.shape[1]), emb.dtype)], axis=0
            )
        self.rows_per_shard = rows_per_shard
        if self.quantization == "int8":
            rows_q, scales = quantize_rows_sq8(emb)
            self.embeddings = shard_rows(self.mesh, jnp.asarray(rows_q))
            self.row_scales = shard_rows_1d(self.mesh, jnp.asarray(scales))
        else:
            self.embeddings = shard_rows(self.mesh, jnp.asarray(emb, self.dtype))
            self.row_scales = None

    # ------------------------------------------------------------ search
    def search_ids(self, query_embs: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Device search: returns (scores [B, k], flat index ids [B, k])."""
        from retrieval_scaling_tpu.ops.topk import pick_chunk_size

        k_eff = min(k, self.n_valid)
        q_np = np.asarray(query_embs)
        q_dtype = jnp.float32 if self.quantization == "int8" else self.dtype
        q = replicate(self.mesh, jnp.asarray(q_np, q_dtype))
        chunk = min(
            self.search_chunk_size, pick_chunk_size(self.rows_per_shard, len(q_np))
        )
        scores, ids = sharded_flat_search(
            self.mesh,
            q,
            self.embeddings,
            self.n_valid,
            k_eff,
            self.rows_per_shard,
            chunk_size=chunk,
            approx_recall=self.approx_recall,
            row_scales=self.row_scales,
        )
        return np.asarray(jax.device_get(scores)), np.asarray(jax.device_get(ids))

    def get_retrieved_passages(self, all_indices):
        """Map flat ids -> (passage texts, db_ids) via the disk-resident store
        (reference: src/indicies/flat.py:122-136). Accepts ragged rows; ids
        must already be valid (>= 0) — use :func:`filter_pad_hits` first."""
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
        """Reference-compatible search: (scores, passages, db_ids) lists."""
        scores, ids = self.search_ids(query_embs, k)
        scores, id_rows = filter_pad_hits(scores, ids)
        passages, db_ids = self.get_retrieved_passages(id_rows)
        return scores, passages, db_ids
