"""Pallas TPU kernel: probed-tile gather + score for IVF list scans.

The IVF search must score each query against the vectors of its probed
inverted lists — a data-dependent gather of 128-row tiles from HBM. XLA's
generic gather lowers poorly for this shape; the TPU-native form is a
Pallas kernel whose *block index map reads the tile id from a scalar-
prefetched array*, so the pipeline double-buffers exactly the tile DMAs
the probe schedule names (pallas_guide: PrefetchScalarGridSpec).

Kernel shape: grid (B, T). Step (b, t) DMAs ``tiles[tile_ids[b, t]]``
([TILE, D] bf16) into VMEM and computes the [TILE] inner products against
query b. The scan is DMA-bandwidth-bound (~1 FLOP/byte), which is the
physical floor for gathered lists; invalid slots point at tile 0 and are
masked by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _kernel(ids_ref, q_ref, tiles_ref, out_ref):
    # q_ref: [B, D] (full, tiny); tiles_ref: [1, TILE, D]; out [1, 1, 1, TILE].
    # Mosaic tiling: blocks of rank >= 2 need their last two dims divisible
    # by (8, 128) or equal to the array's — hence the full-q block (indexed
    # by program_id) and the rank-4 output whose trailing dims are (1, TILE).
    bi = pl.program_id(0)
    # Row-select q by one-hot matmul: Mosaic can't prove alignment of a
    # dynamic vector.load row index, and rejects mixed bf16->f32 matvecs —
    # so everything is f32 MXU ops on static shapes. DMA-bound regardless.
    b = q_ref.shape[0]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) == bi).astype(jnp.float32)
    q_row = jax.lax.dot_general(
        sel, q_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # [1, D]
    scores = jax.lax.dot_general(
        tiles_ref[0].astype(jnp.float32),  # [TILE, D]
        q_row,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # [TILE, 1]
    out_ref[0, 0, 0, :] = scores[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_score_tiles(
    queries: jax.Array,    # [B, D] (any float dtype; cast to tiles dtype)
    tiles: jax.Array,      # [T_total, TILE, D] bf16/f32 (HBM resident)
    tile_ids: jax.Array,   # [B, T] int32 (invalid slots must be in range)
    interpret: bool = False,
) -> jax.Array:
    """Scores [B, T, TILE] f32: query b vs every row of its probed tiles."""
    b, d = queries.shape
    t = tile_ids.shape[1]
    q = queries.astype(tiles.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((b, d), lambda bi, ti, ids: (0, 0)),
            pl.BlockSpec((1, TILE, d), lambda bi, ti, ids: (ids[bi, ti], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda bi, ti, ids: (bi, ti, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 1, TILE), jnp.float32),
        interpret=interpret,
    )(tile_ids, q, tiles)
    return out[:, :, 0, :]


def ivf_scan_topk_pallas(
    queries: jax.Array,       # [B, D]
    tiles: jax.Array,         # [T_total, TILE, D]
    row_flat_ids: jax.Array,  # [T_total * TILE] int32 (-1 = pad)
    tile_ids: jax.Array,      # [B, T]
    tile_valid: jax.Array,    # [B, T] bool
    k: int,
    interpret: bool = False,
):
    """Drop-in for ``ivf_common.ivf_scan_topk`` on TPU.

    Pallas gather+score kernel, then masked exact top-k over the [B, T*TILE]
    candidate scores (two-stage select — T*TILE is at most a few tens of K).
    """
    from retrieval_scaling_tpu.ops.topk import NEG_INF, exact_topk_2stage

    b, t = tile_ids.shape
    safe_ids = jnp.where(tile_valid, tile_ids, 0)
    scores = gather_score_tiles(queries, tiles, safe_ids, interpret=interpret)  # [B,T,TILE]
    rows = row_flat_ids.reshape(-1, TILE)[safe_ids]                             # [B,T,TILE]
    ok = tile_valid[:, :, None] & (rows >= 0)
    flat_scores = jnp.where(ok, scores, NEG_INF).reshape(b, t * TILE)
    flat_rows = jnp.where(ok, rows, -1).reshape(b, t * TILE)
    kk = min(k, t * TILE)
    c_s, c_pos = exact_topk_2stage(flat_scores, kk)
    c_i = jnp.take_along_axis(flat_rows, c_pos, axis=-1)
    if kk < k:
        c_s = jnp.pad(c_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        c_i = jnp.pad(c_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return c_s, c_i


# --------------------------------------------------------------------------
# IVF-PQ: gathered code tiles + in-kernel ADC
# --------------------------------------------------------------------------
def _pq_kernel(ids_ref, lutp_ref, codes_ref, out_ref):
    """codes_ref: [1, TILE, m] uint8; lutp_ref: [1, 1, m*ksub] f32 with the
    *interleaved* layout j = code_value * m + subquantizer; out [1,1,1,TILE].

    ADC as ONE [TILE, m*ksub] x [m*ksub, 1] MXU matvec: the block one-hot
    has m ones per row. Constructed without in-kernel reshapes (Mosaic
    rejects them) via ``pltpu.repeat`` — which tiles copies along lanes, so
    position j maps to (value j // m, subquantizer j % m), matching the
    interleaved LUT. Measured 38% faster than per-m matvec or VPU
    select-reduce forms (their 16 sequential ops pay 16 setups).
    """
    tile, m = codes_ref.shape[1], codes_ref.shape[2]
    mk = lutp_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32)            # [TILE, m]
    codes_rep = pltpu.repeat(codes, mk // m, axis=1)  # [TILE, m*ksub] tiled copies
    value_of_j = jax.lax.broadcasted_iota(jnp.int32, (tile, mk), 1) // m
    onehot = (codes_rep == value_of_j).astype(jnp.float32)
    lutp = lutp_ref[0, 0].reshape(mk, 1)
    acc = jax.lax.dot_general(
        onehot, lutp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0, 0, 0, :] = acc[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles(
    lut: jax.Array,        # [B, m, ksub] f32
    codes_tm: jax.Array,   # [T_total, TILE, m] uint8 (the index's layout)
    tile_ids: jax.Array,   # [B, T] int32
    interpret: bool = False,
) -> jax.Array:
    """ADC scores [B, T, TILE] f32 for each query's probed code tiles."""
    b, m, ksub = lut.shape
    t = tile_ids.shape[1]
    tile = codes_tm.shape[1]
    # interleave: j = value * m + subquantizer
    lutp = jnp.transpose(lut, (0, 2, 1)).reshape(b, 1, ksub * m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, ksub * m), lambda bi, ti, ids: (bi, 0, 0)),
            pl.BlockSpec((1, tile, m), lambda bi, ti, ids: (ids[bi, ti], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tile), lambda bi, ti, ids: (bi, ti, 0, 0)),
    )
    out = pl.pallas_call(
        _pq_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 1, tile), jnp.float32),
        interpret=interpret,
    )(tile_ids, lutp, codes_tm)
    return out[:, :, 0, :]


def pq_scan_topk_pallas(
    lut: jax.Array,            # [B, m, ksub]
    coarse_scores: jax.Array,  # [B, nprobe]
    codes_tm: jax.Array,       # [T_total, TILE, m] uint8
    row_flat_ids: jax.Array,   # [T_total * TILE] int32
    tile_ids: jax.Array,       # [B, T]
    tile_valid: jax.Array,     # [B, T]
    probe_of_tile: jax.Array,  # [B, T]
    k: int,
    interpret: bool = False,
):
    """Drop-in for ``ivf_pq.pq_scan_topk`` on TPU (Pallas gather + ADC)."""
    from retrieval_scaling_tpu.ops.topk import NEG_INF, exact_topk_2stage

    b, t = tile_ids.shape
    safe_ids = jnp.where(tile_valid, tile_ids, 0)
    adc = gather_adc_tiles(lut, codes_tm, safe_ids, interpret=interpret)   # [B,T,TILE]
    coarse = jnp.take_along_axis(coarse_scores, jnp.where(tile_valid, probe_of_tile, 0), axis=1)
    scores = adc + coarse[:, :, None]
    rows = row_flat_ids.reshape(-1, TILE)[safe_ids]
    ok = tile_valid[:, :, None] & (rows >= 0)
    flat_scores = jnp.where(ok, scores, NEG_INF).reshape(b, t * TILE)
    flat_rows = jnp.where(ok, rows, -1).reshape(b, t * TILE)
    kk = min(k, t * TILE)
    c_s, c_pos = exact_topk_2stage(flat_scores, kk)
    c_i = jnp.take_along_axis(flat_rows, c_pos, axis=-1)
    if kk < k:
        c_s = jnp.pad(c_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        c_i = jnp.pad(c_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return c_s, c_i


# --------------------------------------------------------------------------
# IVF-PQ fast layout: 8 tiles/program, one [TG*TILE, m*ksub] ADC matmul
# --------------------------------------------------------------------------
PQ_TG = 8


def _pq_group_kernel(ids_ref, lutp_ref, codes_hbm, out_ref, scratch, sems):
    """codes_hbm: [T, TILE, 128] uint8, first m lanes real (lane-padded so
    destination DMA slices are 128-aligned). TG tiles DMA concurrently into
    one scratch slab, then ONE [TG*TILE, m*ksub] one-hot matmul scores all
    of them — amortizing both DMA latency and MXU setup 8x (measured
    17.9 -> 13.2 ms at b64 nprobe64 on 1M codes).
    """
    bi, gi = pl.program_id(0), pl.program_id(1)
    mk = lutp_ref.shape[2]

    def dma(j):
        tid = ids_ref[bi, gi * PQ_TG + j]
        return pltpu.make_async_copy(
            codes_hbm.at[tid], scratch.at[pl.ds(j * TILE, TILE), :], sems.at[j]
        )

    for j in range(PQ_TG):
        dma(j).start()
    for j in range(PQ_TG):
        dma(j).wait()

    # m is static via the interleave ratio: mk = m * ksub with ksub = 256.
    m_sub = mk // 256
    codes = scratch[:, :m_sub].astype(jnp.int32)          # [TG*TILE, m]
    codes_rep = pltpu.repeat(codes, mk // m_sub, axis=1)  # [TG*TILE, mk]
    value_of_j = jax.lax.broadcasted_iota(jnp.int32, (PQ_TG * TILE, mk), 1) // m_sub
    onehot = (codes_rep == value_of_j).astype(jnp.float32)
    lutp = lutp_ref[0, 0].reshape(mk, 1)
    acc = jax.lax.dot_general(
        onehot, lutp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[0, 0, 0, :] = acc[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles_fast(
    lut: jax.Array,          # [B, m, ksub] f32 (ksub must be 256)
    codes_padded: jax.Array,  # [T_total, TILE, 128] uint8 (first m lanes real)
    tile_ids: jax.Array,     # [B, T] int32, T % PQ_TG == 0
    interpret: bool = False,
) -> jax.Array:
    b, m, ksub = lut.shape
    assert ksub == 256, "fast ADC layout assumes 8-bit codes"
    t = tile_ids.shape[1]
    assert t % PQ_TG == 0, t
    g = t // PQ_TG
    lutp = jnp.transpose(lut, (0, 2, 1)).reshape(b, 1, ksub * m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 1, ksub * m), lambda bi, gi, ids: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, PQ_TG * TILE), lambda bi, gi, ids: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((PQ_TG * TILE, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((PQ_TG,)),
        ],
    )
    out = pl.pallas_call(
        _pq_group_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, 1, PQ_TG * TILE), jnp.float32),
        interpret=interpret,
    )(tile_ids, lutp, codes_padded)
    return out.reshape(b, t, TILE)
