"""IVF-PQ index on TPU: residual product quantization + ADC list scan.

The ``faiss.IndexIVFPQ`` replacement (reference: src/indicies/ivf_pq.py):
coarse k-means + per-subspace PQ codebooks trained on *residuals*
(FAISS ``by_residual`` default), codes stored in the same tile-padded CSR
layout as IVF-Flat but at ``m`` bytes/vector instead of ``2*D``.

ADC on TPU: for inner product with residual encoding the score decomposes
as ``q.c_list + sum_m LUT[m, code_m]`` where ``LUT = q_sub . codebooks`` is
query-only — one [m, ksub] matmul per query, shared across all probed
lists. On TPU the scan streams TRANSPOSED uint8 code tiles ([MP, TILE]:
sublane-padded subquantizer rows x the tile's 128 vectors, lane-aligned
at ~m bytes/vector) and evaluates the LUT sum with two
``tpu.dynamic_gather`` lane-gathers against per-query [MP, 128] tables +
one tiny MXU pass (ops/ivf_gather.py) — 16-96x less HBM traffic than raw
vectors and ADC cheaper than the DMA, the reason PQ wins at datastore
scale. The XLA fallback (CPU) keeps ``adc_mode`` gather/one-hot variants.

Quality levers, both persisted with the index: ``opq`` trains an
orthogonal OPQ rotation (FAISS OPQ transform analog) and
``refine_factor`` re-ranks the PQ top (factor*k) candidates with exact
per-row-scaled int8 inner products (FAISS IndexRefineFlat analog).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Sequence, Tuple

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
    probe_tile_schedule,
    select_probes,
)
from retrieval_scaling_tpu.ops.kmeans import (
    assign_clusters,
    kmeans,
    pq_encode,
    pq_train_codebooks,
)
from retrieval_scaling_tpu.ops.ivf_gather import transpose_code_tiles
from retrieval_scaling_tpu.ops.topk import merge_topk
from retrieval_scaling_tpu.parallel.mesh import single_device_mesh

logger = logging.getLogger(__name__)

NEG_INF = -1e30


def quantize_rows_int8(emb: np.ndarray):
    """Per-row symmetric int8 quantization: (rows_i8 [N, D], scales [N])."""
    emb = np.asarray(emb, np.float32)
    scales = np.abs(emb).max(axis=1) / 127.0
    scales = np.maximum(scales, 1e-12)
    rows = np.clip(np.round(emb / scales[:, None]), -127, 127).astype(np.int8)
    return rows, scales.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k", "group", "adc_mode"))
def pq_scan_topk(
    lut: jax.Array,           # [B, m, ksub] f32 query lookup tables
    coarse_scores: jax.Array,  # [B, nprobe] q.c term per probed list
    code_tiles: jax.Array,    # [total_tiles, TILE, m] uint8
    row_flat_ids: jax.Array,  # [total_tiles * TILE] int32
    tile_ids: jax.Array,      # [B, max_tiles]
    tile_valid: jax.Array,    # [B, max_tiles]
    probe_of_tile: jax.Array,  # [B, max_tiles] probe slot per tile
    k: int,
    group: int = 4,
    adc_mode: str = "gather",
) -> Tuple[jax.Array, jax.Array]:
    b, m, ksub = lut.shape
    max_tiles = tile_ids.shape[1]
    n_groups = -(-max_tiles // group)
    pad = n_groups * group - max_tiles
    if pad:
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, pad)))
        probe_of_tile = jnp.pad(probe_of_tile, ((0, 0), (0, pad)))

    row_ids_tiled = row_flat_ids.reshape(-1, TILE)
    k_eff = min(k, n_groups * group * TILE)

    def body(carry, inp):
        best_s, best_i = carry
        ids_g, valid_g, probe_g = inp              # [B, group]
        codes = code_tiles[ids_g]                  # [B, group, TILE, m] uint8
        rows = row_ids_tiled[ids_g]                # [B, group, TILE]

        if adc_mode == "onehot":
            onehot = jax.nn.one_hot(codes.astype(jnp.int32), ksub, dtype=jnp.bfloat16)
            s = jnp.einsum(
                "bgtmk,bmk->bgt", onehot, lut.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            idx = codes.astype(jnp.int32)                      # [B, g, T, m]
            gathered = jnp.take_along_axis(
                lut[:, None, None, :, :],                       # [B, 1, 1, m, ksub]
                idx[..., None],                                 # [B, g, T, m, 1]
                axis=-1,
            )[..., 0]                                           # [B, g, T, m]
            s = jnp.sum(gathered, axis=-1)                      # [B, g, T]

        coarse = jnp.take_along_axis(coarse_scores, probe_g, axis=1)  # [B, group]
        s = s + coarse[:, :, None]
        ok = valid_g[:, :, None] & (rows >= 0)
        s = jnp.where(ok, s, NEG_INF).reshape(b, group * TILE)
        flat_rows = jnp.where(ok, rows, -1).reshape(b, group * TILE)
        kk = min(k_eff, group * TILE)
        c_s, c_pos = jax.lax.top_k(s, kk)
        c_i = jnp.take_along_axis(flat_rows, c_pos, axis=-1)
        return merge_topk(best_s, best_i, c_s, c_i, k_eff), None

    init = (
        jnp.full((b, k_eff), NEG_INF, jnp.float32),
        jnp.full((b, k_eff), -1, jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(
        body,
        init,
        (
            jnp.moveaxis(tile_ids.reshape(b, n_groups, group), 1, 0),
            jnp.moveaxis(tile_valid.reshape(b, n_groups, group), 1, 0),
            jnp.moveaxis(probe_of_tile.reshape(b, n_groups, group), 1, 0),
        ),
    )
    if k_eff < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return scores, ids


class IVFPQIndex:
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
        n_subquantizers: int = 16,
        n_bits: int = 8,
        kmeans_iters: int = 20,
        pq_iters: int = 20,
        mesh: Mesh | None = None,
        probe_slack: float = 1.5,
        adc_mode: str = "gather",
        refine_factor: int = 0,
        opq: bool = False,
        refine_mode: str = "device",
        aniso: bool = False,
        aniso_threshold: float = 0.2,
    ):
        self.index_path = index_path
        self.meta_file = meta_file
        self.trained_index_path = trained_index_path
        self.dimension = dimension
        self.sample_train_size = sample_train_size
        self.ncentroids = ncentroids
        self.probe = probe
        self.m = n_subquantizers
        self.n_bits = n_bits
        self.kmeans_iters = kmeans_iters
        self.pq_iters = pq_iters
        self.mesh = mesh or single_device_mesh()
        self.probe_slack = probe_slack
        self.adc_mode = adc_mode
        # ScaNN-style refinement: the PQ scan returns refine_factor*k
        # candidates which are re-ranked by exact int8 inner products
        # (per-row scale). PQ alone mis-ranks near-ties (quantization
        # noise ~ the score margins between true neighbors); measured
        # recall@10 0.31 -> 0.98 at refine_factor 4 on clustered data.
        # FAISS analog: IndexRefineFlat (at 8x the memory of int8 rows).
        self.refine_factor = int(refine_factor)
        # "device": exact int8 rows live in HBM (fast; +D bytes/row on top
        # of the m-byte codes). "host": rows live in a sidecar binary file
        # and the refine candidates stream in via threaded preads
        # (native/rstpu_io.cpp) — HBM holds ONLY the m-byte codes, the PQ
        # memory story at datastore scale (see BENCH.md "PQ memory story").
        if refine_mode not in ("device", "host"):
            raise ValueError(f"unknown refine_mode {refine_mode!r}")
        self.refine_mode = refine_mode
        self.refine_row_file: str | None = None
        # OPQ (Ge et al.; FAISS 'OPQ{m}' transform): an orthogonal rotation
        # trained to minimize PQ quantization error. Residuals rotate at
        # encode time; queries rotate at LUT-build time (scores preserved
        # by orthogonality). Measured on clustered data: meaningful raw-PQ
        # recall gains at identical bytes/vector.
        self.opq = bool(opq)
        # Anisotropic (score-aware) codebooks + encoding (Guo et al. 2020 /
        # ScaNN): weight the residual component PARALLEL to each row's
        # direction eta = (d-1)T^2/(1-T^2) times the orthogonal one —
        # parallel error is what perturbs the inner products of the queries
        # that rank this row highly. Search is unchanged (same ADC LUT);
        # only training/encoding differ. Composes with OPQ as rotation-init
        # + anisotropic final fit.
        self.aniso = bool(aniso)
        self.aniso_threshold = float(aniso_threshold)

        if index_path and meta_file and os.path.exists(index_path) and os.path.exists(meta_file):
            logger.info("Loading IVF-PQ index from %s", index_path)
            self._load(index_path, meta_file)
        else:
            centroids, codebooks = self._load_or_train(embed_paths or [])
            self._build(embed_paths or [], centroids, codebooks)
            if index_path and meta_file:
                self._save(index_path, meta_file)

        self.dimension = int(self.codebooks.shape[0] * self.codebooks.shape[2])
        self._place_on_device()

        self.passage_store: PassageStore | None = None
        if passage_dir is not None:
            self.passage_store = PassageStore.from_passages_dir(passage_dir, pos_map_save_path)

    # ------------------------------------------------------------ training
    def _sample(self, embed_paths: Sequence[str]) -> np.ndarray:
        per_shard = max(1, self.sample_train_size // max(len(embed_paths), 1))
        rng = np.random.RandomState(1)
        samples = []
        for path in embed_paths:
            _, emb = load_embedding_shard(path)
            take = min(per_shard, len(emb))
            idx = rng.choice(len(emb), size=take, replace=False)
            samples.append(np.asarray(emb[idx], np.float32))
        return np.concatenate(samples, axis=0)

    def _load_or_train(self, embed_paths: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        if self.trained_index_path and os.path.exists(self.trained_index_path):
            data = np.load(self.trained_index_path)
            self.opq_rotation = data["opq_rotation"] if "opq_rotation" in data else None
            return data["centroids"], data["codebooks"]
        sample = self._sample(embed_paths)
        t0 = time.time()
        centroids, _ = kmeans(sample, self.ncentroids, iters=self.kmeans_iters)
        centroids = np.asarray(centroids, np.float32)
        assign = np.asarray(
            assign_clusters(jnp.asarray(sample), jnp.asarray(centroids), self.ncentroids, metric="ip")
        )
        residuals = sample - centroids[assign]
        if self.opq:
            from retrieval_scaling_tpu.ops.kmeans import opq_train

            rotation, codebooks = opq_train(
                residuals, self.m, self.n_bits, pq_iters=self.pq_iters
            )
            self.opq_rotation = rotation
            codebooks = np.asarray(codebooks, np.float32)
        else:
            self.opq_rotation = None
            codebooks = np.asarray(
                pq_train_codebooks(residuals, self.m, self.n_bits, iters=self.pq_iters), np.float32
            )
        if self.aniso:
            from retrieval_scaling_tpu.ops.kmeans import aniso_eta, aniso_pq_train

            eta = aniso_eta(sample.shape[1], self.aniso_threshold)
            dirs = sample / np.clip(
                np.linalg.norm(sample, axis=1, keepdims=True), 1e-12, None
            )
            train_res, train_dirs = residuals, dirs
            if self.opq_rotation is not None:
                train_res = residuals @ self.opq_rotation
                train_dirs = dirs @ self.opq_rotation
            codebooks = np.asarray(
                aniso_pq_train(
                    train_res, self.m, self.n_bits, iters=self.pq_iters, eta=eta,
                    dirs=train_dirs,
                ),
                np.float32,
            )
        logger.info(
            "Trained %d centroids + %dx%d PQ codebooks in %.1fs",
            self.ncentroids, self.m, 1 << self.n_bits, time.time() - t0,
        )
        if self.trained_index_path:
            os.makedirs(os.path.dirname(self.trained_index_path), exist_ok=True)
            base = self.trained_index_path[:-4] if self.trained_index_path.endswith(".npz") else self.trained_index_path
            extra = (
                {"opq_rotation": self.opq_rotation}
                if self.opq_rotation is not None else {}
            )
            np.savez(base, centroids=centroids, codebooks=codebooks, **extra)
        return centroids, codebooks

    # ------------------------------------------------------------ build
    def _build(self, embed_paths, centroids: np.ndarray, codebooks: np.ndarray) -> None:
        parts, id_parts = [], []
        for path in sorted(embed_paths, key=shard_id_from_embedding_path):
            shard_id = shard_id_from_embedding_path(path)
            _, emb = load_embedding_shard(path)
            parts.append(np.asarray(emb, np.float32))
            ids = np.empty((len(emb), 2), np.int64)
            ids[:, 0] = shard_id
            ids[:, 1] = np.arange(len(emb))
            id_parts.append(ids)
        emb = np.concatenate(parts, 0)
        self.index_id_to_db_id = np.concatenate(id_parts, 0)
        self.n_valid = len(emb)
        self.refine_rows_i8, self.refine_scales = (
            quantize_rows_int8(emb) if self.refine_factor > 0 else (None, None)
        )

        assignments = np.asarray(
            assign_clusters(jnp.asarray(emb), jnp.asarray(centroids), self.ncentroids, metric="ip")
        )
        residuals = emb - centroids[assignments]
        dirs = None
        if self.aniso:
            dirs = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)
        if getattr(self, "opq_rotation", None) is not None:
            residuals = residuals @ self.opq_rotation
            if dirs is not None:
                dirs = dirs @ self.opq_rotation
        if self.aniso:
            from retrieval_scaling_tpu.ops.kmeans import aniso_eta, aniso_pq_encode

            codes = np.asarray(
                aniso_pq_encode(
                    residuals, jnp.asarray(codebooks), dirs=jnp.asarray(dirs),
                    eta=aniso_eta(emb.shape[1], self.aniso_threshold),
                )
            )
        else:
            codes = np.asarray(pq_encode(jnp.asarray(residuals), jnp.asarray(codebooks)))
        # lay codes out in the tiled CSR (layout works on any row payload)
        layout = build_list_layout(codes, assignments, self.ncentroids, TILE)
        self.centroids = centroids
        self.codebooks = codebooks
        self.layout = layout

    # ------------------------------------------------------------ io
    def _save(self, index_path: str, meta_file: str) -> None:
        os.makedirs(os.path.dirname(index_path), exist_ok=True)
        base = index_path[:-4] if index_path.endswith(".npz") else index_path
        np.savez(
            base,
            centroids=self.centroids,
            codebooks=self.codebooks,
            codes=self.layout.sorted_rows.astype(np.uint8),
            row_flat_ids=self.layout.row_flat_ids,
            tile_start=self.layout.tile_start,
            tile_count=self.layout.tile_count,
            list_len=self.layout.list_len,
            n_valid=np.int64(self.n_valid),
            **(
                {"refine_rows_i8": self.refine_rows_i8, "refine_scales": self.refine_scales}
                if self.refine_rows_i8 is not None
                else {}
            ),
            **(
                {"opq_rotation": self.opq_rotation}
                if getattr(self, "opq_rotation", None) is not None
                else {}
            ),
        )
        np.save(meta_file + ".tmp.npy", self.index_id_to_db_id)
        os.replace(meta_file + ".tmp.npy", meta_file)
        if self.refine_rows_i8 is not None:
            # sidecar raw int8 rows (row-major, D bytes/row) for the
            # host-streamed refine mode: batched preads fetch candidates
            # without the rows ever living in HBM
            sidecar = base + ".refine.bin"
            with open(sidecar + ".tmp", "wb") as f:
                f.write(np.ascontiguousarray(self.refine_rows_i8).tobytes())
            os.replace(sidecar + ".tmp", sidecar)
            self.refine_row_file = sidecar

    def _load(self, index_path: str, meta_file: str) -> None:
        from retrieval_scaling_tpu.index.ivf_common import IVFListLayout

        data = np.load(index_path)
        self.centroids = data["centroids"]
        self.codebooks = data["codebooks"]
        self.layout = IVFListLayout(
            data["codes"], data["row_flat_ids"], data["tile_start"],
            data["tile_count"], data["list_len"],
        )
        self.n_valid = int(data["n_valid"])
        self.opq_rotation = data["opq_rotation"] if "opq_rotation" in data else None
        base = index_path[:-4] if index_path.endswith(".npz") else index_path
        sidecar = base + ".refine.bin"
        if (
            self.refine_mode == "host"
            and self.refine_factor > 0
            and os.path.exists(sidecar)
            and "refine_scales" in data
        ):
            # host-streamed refine: rows stay on disk; only the 4-byte
            # per-row scales load into RAM
            self.refine_row_file = sidecar
            self.refine_rows_i8 = None
            self.refine_scales = data["refine_scales"]
        elif "refine_rows_i8" in data:
            self.refine_rows_i8 = data["refine_rows_i8"]
            self.refine_scales = data["refine_scales"]
        else:
            self.refine_rows_i8, self.refine_scales = None, None
            if self.refine_factor > 0:
                logger.warning(
                    "refine_factor=%d requested but the saved index has no "
                    "int8 refinement rows; rebuilding with refine_factor>0 "
                    "is required — refinement disabled",
                    self.refine_factor,
                )
                self.refine_factor = 0
        self.index_id_to_db_id = np.load(meta_file)

    def _place_on_device(self) -> None:
        total_tiles = max(int(self.layout.tile_count.sum()), 1)
        codes_np = self.layout.sorted_rows.reshape(total_tiles, TILE, self.m)
        self.use_pallas_scan = jax.default_backend() == "tpu" and self.n_bits <= 8
        if self.use_pallas_scan:
            # Transposed tile layout for the lane-gather ADC kernel: rows =
            # subquantizers (sublane-padded), lanes = the 128 vectors, so
            # each probed-tile DMA is lane-aligned at ~m bytes/vector (the
            # round-1 layout needed 8x lane padding for alignment).
            codes_np = transpose_code_tiles(codes_np, self.m)
        self.code_tiles_dev = jnp.asarray(codes_np, jnp.uint8)
        self.row_ids_dev = jnp.asarray(self.layout.row_flat_ids, jnp.int32)
        self.centroids_dev = jnp.asarray(self.centroids, jnp.float32)
        self.codebooks_dev = jnp.asarray(self.codebooks, jnp.float32)
        self.tile_start_dev = jnp.asarray(self.layout.tile_start, jnp.int32)
        self.tile_count_dev = jnp.asarray(self.layout.tile_count, jnp.int32)
        if (
            self.refine_factor > 0
            and self.refine_mode == "device"
            and getattr(self, "refine_rows_i8", None) is not None
        ):
            self.refine_rows_dev = jnp.asarray(self.refine_rows_i8, jnp.int8)
            self.refine_scales_dev = jnp.asarray(self.refine_scales, jnp.float32)
        else:
            self.refine_rows_dev = None
        self.opq_rotation_dev = (
            jnp.asarray(self.opq_rotation, jnp.float32)
            if getattr(self, "opq_rotation", None) is not None
            else None
        )

    # ------------------------------------------------------------ search
    def search_ids(self, query_embs: np.ndarray, k: int, nprobe: int | None = None):
        nprobe = int(nprobe or self.probe)
        q = jnp.asarray(np.asarray(query_embs), jnp.float32)
        coarse, probe_ids = select_probes(q, self.centroids_dev, nprobe)
        max_tiles = default_max_tiles(self.layout.list_len, nprobe, TILE, self.probe_slack)
        tile_ids, valid, probe_of = probe_tile_schedule(
            probe_ids, self.tile_start_dev, self.tile_count_dev, max_tiles
        )
        # query LUT: q_sub . codebooks  -> [B, m, ksub]
        # (queries rotate into OPQ space first: q.r == (qR).(rR))
        if self.opq_rotation_dev is not None:
            q_lut = jnp.dot(q, self.opq_rotation_dev, preferred_element_type=jnp.float32)
        else:
            q_lut = q
        b = q.shape[0]
        # actual dim from the trained codebooks (the configured
        # `dimension` may disagree with the embeddings on disk)
        dsub = int(self.codebooks.shape[2])
        q_sub = q_lut.reshape(b, self.m, dsub)
        lut = jnp.einsum(
            "bmd,mkd->bmk", q_sub, self.codebooks_dev, preferred_element_type=jnp.float32
        )
        k_eff = min(k, self.n_valid)
        refine_dev = (
            self.refine_factor > 0
            and getattr(self, "refine_rows_dev", None) is not None
        )
        refine_host = (
            self.refine_factor > 0
            and self.refine_mode == "host"
            and (
                getattr(self, "refine_row_file", None) is not None
                or getattr(self, "refine_rows_i8", None) is not None
            )
        )
        refine = refine_dev or refine_host
        k_scan = k_eff
        if refine:
            k_scan = min(self.refine_factor * k_eff, int(tile_ids.shape[1]) * TILE)
        if self.use_pallas_scan:
            # Pallas scalar-prefetch gather + in-kernel lane-gather ADC
            # (ops/ivf_gather.py): XLA's dynamic tile gather lowers
            # pathologically on TPU; grouped programs amortize DMA latency
            # over PQ_TG concurrent tile fetches.
            from retrieval_scaling_tpu.ops.ivf_gather import pq_scan_topk_pallas

            scores, ids = pq_scan_topk_pallas(
                lut, coarse, self.code_tiles_dev, self.row_ids_dev,
                tile_ids, valid, probe_of, k_scan,
            )
        else:
            scores, ids = pq_scan_topk(
                lut, coarse, self.code_tiles_dev, self.row_ids_dev,
                tile_ids, valid, probe_of, k_scan, adc_mode=self.adc_mode,
            )
        if refine_dev:
            scores, ids = self._refine(q, scores, ids, k_eff)
        elif refine_host:
            return self._refine_host(np.asarray(query_embs), scores, ids, k_eff)
        return np.asarray(jax.device_get(scores)), np.asarray(jax.device_get(ids))

    def _refine(self, q: jax.Array, pq_scores, pq_ids, k: int):
        """Exact int8 re-rank of the PQ candidates (top refine_factor*k).

        XLA row gather + einsum on every backend: a Pallas scattered-row
        DMA kernel does not lower on v5e (single-row uint8 DMA slices
        violate the (32, 128) tile granularity), and the XLA gather costs
        ~4 ms at B=64, R=416 on chip — acceptable for the quality tier."""
        safe = jnp.maximum(pq_ids, 0)
        rows = jnp.take(self.refine_rows_dev, safe, axis=0).astype(jnp.float32)
        ip = jnp.einsum("brd,bd->br", rows, q, preferred_element_type=jnp.float32)
        scores = ip * jnp.take(self.refine_scales_dev, safe)
        scores = jnp.where(pq_ids >= 0, scores, NEG_INF)
        top_s, top_pos = jax.lax.top_k(scores, min(k, scores.shape[1]))
        top_i = jnp.take_along_axis(pq_ids, top_pos, axis=1)
        top_i = jnp.where(top_s <= NEG_INF / 2, -1, top_i)
        return top_s, top_i

    def _read_refine_rows(self, uniq_ids: np.ndarray) -> np.ndarray:
        """Fetch exact int8 rows for ``uniq_ids`` — threaded preads from the
        sidecar file (native/rstpu_io.cpp), or a RAM slice for in-memory
        builds. Rows never enter HBM in host mode."""
        d = self.dimension
        if getattr(self, "refine_row_file", None) is not None:
            from retrieval_scaling_tpu.data.native_io import pread_lines_native

            spans = [(int(i) * d, d) for i in uniq_ids]
            blobs = pread_lines_native(self.refine_row_file, spans)
            if blobs is None:  # native lib unavailable: plain seek/read
                blobs = []
                with open(self.refine_row_file, "rb") as f:
                    for start, length in spans:
                        f.seek(start)
                        blobs.append(f.read(length))
            return np.frombuffer(b"".join(blobs), np.int8).reshape(len(uniq_ids), d)
        return np.asarray(self.refine_rows_i8)[uniq_ids]

    def _refine_host(self, q_np: np.ndarray, pq_scores, pq_ids, k: int):
        """Host-streamed exact re-rank: candidates' int8 rows stream from
        disk (deduplicated across the batch), the dot products run in host
        f32. HBM holds only the m-byte codes — the datastore-scale memory
        story (FAISS IndexRefineFlat semantics without device-resident
        rows)."""
        ids = np.asarray(jax.device_get(pq_ids))
        b, r = ids.shape
        safe = np.maximum(ids, 0)
        uniq, inv = np.unique(safe, return_inverse=True)
        rows_u = self._read_refine_rows(uniq)
        rows = rows_u[inv.reshape(b, r)].astype(np.float32)       # [B, R, D]
        ip = np.einsum("brd,bd->br", rows, np.asarray(q_np, np.float32))
        scores = ip * np.asarray(self.refine_scales)[safe]
        scores = np.where(ids >= 0, scores, NEG_INF).astype(np.float32)
        kk = min(k, r)
        top_pos = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        part = np.take_along_axis(scores, top_pos, axis=1)
        order = np.argsort(-part, axis=1, kind="stable")
        top_pos = np.take_along_axis(top_pos, order, axis=1)
        top_s = np.take_along_axis(scores, top_pos, axis=1)
        top_i = np.take_along_axis(ids, top_pos, axis=1)
        top_i = np.where(top_s <= NEG_INF / 2, -1, top_i)
        return top_s, top_i

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
