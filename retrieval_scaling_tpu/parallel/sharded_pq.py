"""Mesh-sharded IVF-PQ search with ICI cross-shard top-k merge.

The datastore-scale index scaled out the datastore-scale way: each mesh
``data`` device owns one shard's tile-padded PQ code lists (the
reference's one-FAISS-index-per-shard-group layout,
src/indicies/base.py + api worker topology), centroids/codebooks are
shared and replicated (so per-shard ADC scores are directly comparable —
the cross-shard-score-comparability problem SURVEY §7 flags is solved by
construction), and the merge is one ``all_gather`` over ICI + a global
top-k, replacing the reference's HTTP fan-out + ``rerank_elements``.

Inside each device program the scan is the same lane-gather ADC pipeline
as the single-chip index (ops/ivf_gather.py); shards pad to a common
``tiles_per_shard``/``max_tiles`` so the SPMD program is shape-uniform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retrieval_scaling_tpu.index.ivf_common import TILE, probe_tile_schedule, select_probes
from retrieval_scaling_tpu.ops.ivf_gather import (
    gather_adc_tiles_grouped,
    PQ_TG,
    pq_sublane_pad,
    transpose_code_tiles,
)
from retrieval_scaling_tpu.ops.topk import NEG_INF, exact_topk_2stage


def stack_shard_layouts(shards: list, m: int):
    """Host prep: per-shard (codes [T_s, TILE, m] uint8, row_flat_ids
    [T_s*TILE] int32 LOCAL ids, tile_start [nlist], tile_count [nlist])
    -> shape-uniform stacked arrays for the SPMD search.

    Returns dict of arrays whose leading axis is the shard axis; pad tiles
    carry row id -1 so they are masked like intra-list padding.
    """
    n_shards = len(shards)
    t_max = max(max(int(s["codes"].shape[0]), 1) for s in shards)
    t_max = -(-t_max // PQ_TG) * PQ_TG
    mp = pq_sublane_pad(m)
    nlist = shards[0]["tile_start"].shape[0]

    codes = np.zeros((n_shards, t_max, mp, TILE), np.uint8)
    rows = np.full((n_shards, t_max * TILE), -1, np.int64)
    starts = np.zeros((n_shards, nlist), np.int32)
    counts = np.zeros((n_shards, nlist), np.int32)
    bases = np.zeros((n_shards,), np.int32)
    base = 0
    for i, s in enumerate(shards):
        t_s = int(s["codes"].shape[0])
        codes[i, :t_s] = transpose_code_tiles(np.asarray(s["codes"], np.uint8), m)
        rows[i, : t_s * TILE] = np.asarray(s["row_flat_ids"], np.int64)
        starts[i] = np.asarray(s["tile_start"], np.int32)
        counts[i] = np.asarray(s["tile_count"], np.int32)
        bases[i] = base
        base += int(s["n_valid"])
    return {
        "codes": codes,
        "row_flat_ids": rows.astype(np.int32),
        "tile_start": starts,
        "tile_count": counts,
        "row_base": bases,
        "n_total": base,
    }


def shard_pq(mesh: Mesh, stacked: dict) -> dict:
    """Place the stacked layout: shard-axis arrays over "data", replicate
    the rest."""
    sharded = NamedSharding(mesh, P(("data",),))
    out = {}
    for key in ("codes", "row_flat_ids", "tile_start", "tile_count", "row_base"):
        out[key] = jax.device_put(jnp.asarray(stacked[key]), sharded)
    return out


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "nprobe", "max_tiles", "interpret")
)
def sharded_pq_search(
    mesh: Mesh,
    queries: jax.Array,      # [B, D] replicated
    centroids: jax.Array,    # [nlist, D] replicated (shared across shards)
    codebooks: jax.Array,    # [m, ksub, dsub] replicated
    codes: jax.Array,        # [S, T, MP, TILE] uint8, sharded over "data"
    row_flat_ids: jax.Array,  # [S, T*TILE] int32 local ids (-1 pad)
    tile_start: jax.Array,   # [S, nlist]
    tile_count: jax.Array,   # [S, nlist]
    row_base: jax.Array,     # [S] global row offset per shard
    k: int,
    nprobe: int,
    max_tiles: int,
    interpret: bool = False,
):
    """Global (scores [B, k], global row ids [B, k]), replicated.

    Every shard probes the SAME nprobe lists (shared coarse quantizer),
    scans its local inverted lists with the lane-gather ADC, keeps a local
    top-k, and one ICI all_gather + top-k merges the shards.
    """
    num_shards = mesh.shape["data"]
    b, d = queries.shape
    m = codebooks.shape[0]
    dsub = codebooks.shape[2]
    max_tiles_p = -(-max_tiles // PQ_TG) * PQ_TG

    def local_search(q, cents, books, codes_l, rows_l, starts_l, counts_l, base_l):
        codes_l, rows_l = codes_l[0], rows_l[0]
        starts_l, counts_l = starts_l[0], counts_l[0]
        coarse, probe_ids = select_probes(q, cents, nprobe)
        tile_ids, valid, probe_of = probe_tile_schedule(
            probe_ids, starts_l, counts_l, max_tiles_p
        )
        lut = jnp.einsum(
            "bmd,mkd->bmk", q.reshape(b, m, dsub), books,
            preferred_element_type=jnp.float32,
        )
        safe_ids = jnp.where(valid, tile_ids, 0)
        adc = gather_adc_tiles_grouped(lut, codes_l, safe_ids, interpret=interpret)
        coarse_term = jnp.take_along_axis(
            coarse, jnp.where(valid, probe_of, 0), axis=1
        )
        scores = adc + coarse_term[:, :, None]
        rows = rows_l.reshape(-1, TILE)[safe_ids]
        ok = valid[:, :, None] & (rows >= 0)
        t = tile_ids.shape[1]
        flat_s = jnp.where(ok, scores, NEG_INF).reshape(b, t * TILE)
        flat_r = jnp.where(ok, rows, -1).reshape(b, t * TILE)
        kk = min(k, t * TILE)
        s_loc, pos = exact_topk_2stage(flat_s, kk)
        i_loc = jnp.take_along_axis(flat_r, pos, axis=-1)
        gi = jnp.where(i_loc >= 0, i_loc + base_l[0], -1)
        if kk < k:
            s_loc = jnp.pad(s_loc, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
            gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)

        # ICI merge: gather every shard's candidates, global exact top-k.
        all_s = jax.lax.all_gather(s_loc, "data", axis=0)   # [S, B, k]
        all_i = jax.lax.all_gather(gi, "data", axis=0)
        cat_s = jnp.moveaxis(all_s, 0, 1).reshape(b, num_shards * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(b, num_shards * k)
        top_s, top_pos = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, top_pos, axis=-1)
        return top_s, top_i

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(("data",),), P(("data",),), P(("data",),), P(("data",),), P(("data",),),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(
        queries.astype(jnp.float32), centroids, codebooks,
        codes, row_flat_ids, tile_start, tile_count, row_base,
    )
