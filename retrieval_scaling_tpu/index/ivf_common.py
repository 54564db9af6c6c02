"""IVF inverted-list machinery for TPU: tiled CSR layout + probed scan.

The core ragged-data problem (SURVEY §7 "hard parts"): FAISS stores
variable-length inverted lists and scans ``nprobe`` of them per query
(reference: src/indicies/ivf_flat.py:224-227 via ``faiss.IndexIVFFlat``).
XLA needs static shapes, so:

  * Vectors are sorted by their coarse-centroid assignment and each list is
    padded to a multiple of the 128-row MXU tile -> a dense
    ``[total_tiles, 128, D]`` array plus per-list ``(tile_start, tile_count)``
    — a tile-granular CSR.
  * At query time the probed lists' tile ids are flattened per query into a
    fixed-width ``[B, max_tiles]`` schedule (vectorized prefix-sum /
    segment-search, no host round-trip), truncated at ``max_tiles`` —
    probes are centroid-score ordered so truncation drops the least
    promising lists first.
  * The scan streams tile-groups under ``lax.scan``: gather [B, 128, D]
    tiles, one batched matvec per step, running top-k merge — the same
    streaming pattern as the Flat scan but through the gather.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_scaling_tpu.ops.topk import merge_topk

TILE = 128
NEG_INF = -1e30


class IVFListLayout(NamedTuple):
    """Host-built tiled CSR layout (numpy; device placement by the index)."""

    sorted_rows: np.ndarray    # [total_rows, D] list-sorted, tile-padded
    row_flat_ids: np.ndarray   # [total_rows] original flat id or -1 for pad
    tile_start: np.ndarray     # [nlist] first tile of each list
    tile_count: np.ndarray     # [nlist] tiles in each list
    list_len: np.ndarray       # [nlist] real rows in each list


def build_list_layout(
    data: np.ndarray, assignments: np.ndarray, nlist: int, tile: int = TILE
) -> IVFListLayout:
    n, d = data.shape
    order = np.argsort(assignments, kind="stable")
    sorted_assign = assignments[order]
    list_len = np.bincount(sorted_assign, minlength=nlist).astype(np.int64)
    tile_count = np.maximum((list_len + tile - 1) // tile, 0).astype(np.int32)
    tile_start = np.zeros(nlist, np.int32)
    tile_start[1:] = np.cumsum(tile_count)[:-1].astype(np.int32)
    total_tiles = int(tile_count.sum())

    sorted_rows = np.zeros((max(total_tiles, 1) * tile, d), data.dtype)
    row_flat_ids = np.full(max(total_tiles, 1) * tile, -1, np.int64)

    src = 0
    for c in range(nlist):
        ln = int(list_len[c])
        if ln == 0:
            continue
        dst = int(tile_start[c]) * tile
        rows = order[src : src + ln]
        sorted_rows[dst : dst + ln] = data[rows]
        row_flat_ids[dst : dst + ln] = rows
        src += ln
    return IVFListLayout(sorted_rows, row_flat_ids, tile_start, tile_count, list_len)


def default_max_tiles(list_len: np.ndarray, nprobe: int, tile: int = TILE, slack: float = 1.5) -> int:
    """Static probe budget: slack x the expected tiles of nprobe average lists."""
    tiles_per_list = np.maximum((list_len + tile - 1) // tile, 1)
    mean_tiles = float(tiles_per_list.mean()) if len(tiles_per_list) else 1.0
    budget = int(np.ceil(nprobe * mean_tiles * slack))
    cap = int(tiles_per_list.sum())
    return max(1, min(budget, cap))


@functools.partial(jax.jit, static_argnames=("nprobe",))
def select_probes(
    queries: jax.Array,     # [B, D]
    centroids: jax.Array,   # [nlist, D]
    nprobe: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-nprobe centroid ids by inner product (FAISS IP quantizer)."""
    scores = jax.lax.dot_general(
        queries.astype(jnp.float32),
        centroids.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    coarse, ids = jax.lax.top_k(scores, min(nprobe, centroids.shape[0]))
    return coarse, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_tiles",))
def probe_tile_schedule(
    probe_ids: jax.Array,   # [B, nprobe]
    tile_start: jax.Array,  # [nlist]
    tile_count: jax.Array,  # [nlist]
    max_tiles: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flatten probed lists into per-query tile ids.

    Returns (tile_ids [B, max_tiles], valid [B, max_tiles], probe_of_tile
    [B, max_tiles] — the probe slot each tile belongs to, for per-list
    score terms like the IVF-PQ coarse offset).
    """
    counts = tile_count[probe_ids]                       # [B, P]
    starts = tile_start[probe_ids]
    cum = jnp.cumsum(counts, axis=1)                     # inclusive
    cum_prev = cum - counts
    total = cum[:, -1]

    j = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]  # [1, T]
    # segment: number of probes fully before position j
    seg = jnp.sum(j[:, :, None] >= cum[:, None, :], axis=-1).astype(jnp.int32)  # [B, T]
    seg_c = jnp.minimum(seg, probe_ids.shape[1] - 1)
    offset_in_seg = j - jnp.take_along_axis(cum_prev, seg_c, axis=1)
    tile_ids = jnp.take_along_axis(starts, seg_c, axis=1) + offset_in_seg
    valid = j < total[:, None]
    return (
        jnp.where(valid, tile_ids, 0).astype(jnp.int32),
        valid,
        jnp.where(valid, seg_c, 0).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("k", "group"))
def ivf_scan_topk(
    queries: jax.Array,       # [B, D]
    tiles: jax.Array,         # [total_tiles, TILE, D]
    row_flat_ids: jax.Array,  # [total_tiles * TILE] int32 (-1 = pad)
    tile_ids: jax.Array,      # [B, max_tiles]
    tile_valid: jax.Array,    # [B, max_tiles]
    k: int,
    group: int = 8,
    tile_row_scales: jax.Array | None = None,  # [total_tiles, TILE] f32 (int8 tiles)
) -> Tuple[jax.Array, jax.Array]:
    """Stream probed tiles, score by inner product, keep running top-k.

    Returns (scores [B, k], flat ids [B, k]; -1 where exhausted).
    SQ8 tiles (int8 rows): pass per-row dequant ``tile_row_scales``;
    queries stay float and scores dequantize to the exact-scan scale.
    """
    b, d = queries.shape
    max_tiles = tile_ids.shape[1]
    n_groups = -(-max_tiles // group)
    pad = n_groups * group - max_tiles
    if pad:
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, pad)))

    int8_tiles = tiles.dtype == jnp.int8
    qf = queries.astype(jnp.float32 if int8_tiles else tiles.dtype)
    row_ids_tiled = row_flat_ids.reshape(-1, TILE)

    g_tile_ids = tile_ids.reshape(b, n_groups, group)
    g_valid = tile_valid.reshape(b, n_groups, group)

    k_eff = min(k, n_groups * group * TILE)

    def body(carry, inp):
        best_s, best_i = carry
        ids_g, valid_g = inp                       # [B, group]
        gathered = tiles[ids_g]                    # [B, group, TILE, D]
        if int8_tiles:
            gathered = gathered.astype(jnp.float32)
        rows = row_ids_tiled[ids_g]                # [B, group, TILE]
        # bf16 inputs MUST accumulate in f32 on the MXU: without
        # preferred_element_type the result is bf16 (~3 significant digits),
        # which tie-breaks away true neighbors (recall loss at high nprobe).
        s = jnp.einsum("bd,bgtd->bgt", qf, gathered, preferred_element_type=jnp.float32)
        if tile_row_scales is not None:
            s = s * tile_row_scales[ids_g]
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
        (jnp.moveaxis(g_tile_ids, 1, 0), jnp.moveaxis(g_valid, 1, 0)),
    )
    if k_eff < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return scores, ids
