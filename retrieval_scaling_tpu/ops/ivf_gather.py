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
    # SQ8 int8 tiles: the query stays f32 (the kernel casts tiles to f32).
    # Halved tile bytes move QPS little (the per-tile scan measures
    # program-overhead-bound, BENCH.md); the win is 2x rows per chip.
    q = queries.astype(jnp.float32 if tiles.dtype == jnp.int8 else tiles.dtype)

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
    grouped: bool = False,
    tile_row_scales: jax.Array | None = None,  # [T_total, TILE] f32 (int8 tiles)
):
    """Drop-in for ``ivf_common.ivf_scan_topk`` on TPU.

    Pallas gather+score kernel, then masked exact top-k over the
    [B, T*TILE] candidate scores (two-stage select — T*TILE is at most a
    few tens of K). ``grouped`` batches FL_TG tile DMAs per program like
    the PQ scan; measured SLOWER for flat on a v5e (9.7 vs 8.0 ms at b64
    nprobe64 — 196KB tile fetches are bandwidth-bound, not latency-bound,
    and the grouped kernel pays an extra [FL_TG*TILE, D] f32 cast), so
    per-tile stays the default.
    """
    from retrieval_scaling_tpu.ops.topk import NEG_INF, exact_topk_2stage

    b, t = tile_ids.shape
    if grouped and t % FL_TG:
        pad = FL_TG - t % FL_TG
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, pad)))
        t += pad
    safe_ids = jnp.where(tile_valid, tile_ids, 0)
    if grouped:
        scores = gather_score_tiles_grouped(queries, tiles, safe_ids, interpret=interpret)
    else:
        scores = gather_score_tiles(queries, tiles, safe_ids, interpret=interpret)  # [B,T,TILE]
    if tile_row_scales is not None:  # SQ8 dequant (per-row scales)
        scores = scores * tile_row_scales[safe_ids]
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
PQ_TG = 8  # tiles per grouped program (concurrent DMAs)


def pq_sublane_pad(m: int) -> int:
    """Code-tile sublane count: m padded to the uint8 VMEM tile height (32)."""
    return max(32, -(-m // 32) * 32)


def transpose_code_tiles(codes_tm, m: int):
    """[T, TILE, m] uint8 -> transposed device layout [T, MP, TILE].

    Rows = subquantizers (sublane-padded to MP = the uint8 VMEM tile
    height 32), lanes = the tile's 128 vectors: each tile is a
    lane-aligned 2D block, so probed-tile DMAs need no LANE padding. The
    sublane pad costs 2x code HBM at m=16 (32 B/row) and nothing at
    m >= 32 — vs the round-1 lane-padded layout's 8x (128 B/row) and
    flat bf16's 1536 B/row.
    """
    import numpy as np

    t, tile, _ = codes_tm.shape
    mp = pq_sublane_pad(m)
    out = np.zeros((t, mp, tile), np.uint8)
    out[:, :m, :] = np.transpose(np.asarray(codes_tm), (0, 2, 1))
    return out


def pq_lut_tables(lut):
    """[B, m, ksub<=256] f32 -> (lo, hi) [B, MP, 128] gather tables.

    Row s of each table is subquantizer s's LUT for code values 0..127
    (lo) / 128..255 (hi); pad rows are ZERO so padded code sublanes
    contribute nothing to the score sum.
    """
    b, m, ksub = lut.shape
    assert ksub <= 256, "8-bit PQ codes"
    mp = pq_sublane_pad(m)
    lo = jnp.zeros((b, mp, 128), jnp.float32)
    hi = jnp.zeros((b, mp, 128), jnp.float32)
    lo = lo.at[:, :m, : min(ksub, 128)].set(lut[:, :, :128])
    if ksub > 128:
        hi = hi.at[:, :m, : ksub - 128].set(lut[:, :, 128:])
    return lo, hi


def _adc_gather_block(codes_i32, lo, hi):
    """[1, TILE] f32 ADC scores for transposed codes [MP, TILE] (int32).

    The heart of the scan: ONE lane-gather per half-LUT
    (``tpu.dynamic_gather``; Mosaic requires operand/index/output shapes
    equal and 2D, hence the [MP, 128] tables) + a [1, MP] x [MP, TILE]
    MXU pass for the subquantizer sum. ~30 VPU ops on [MP, 128] vs the
    round-1 one-hot construction's ~1.5k cycles on [TILE, m*ksub] — the
    scan drops from compute-bound to DMA-bound.
    """
    mp = codes_i32.shape[0]
    sel = codes_i32 < 128
    idx_lo = jnp.where(sel, codes_i32, 0)
    idx_hi = jnp.where(sel, 0, codes_i32 - 128)
    v_lo = jnp.take_along_axis(lo, idx_lo, axis=1)    # [MP, TILE]
    v_hi = jnp.take_along_axis(hi, idx_hi, axis=1)
    vals = jnp.where(sel, v_lo, v_hi)
    ones = jnp.full((1, mp), 1.0, jnp.float32)
    return jax.lax.dot_general(
        ones, vals, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pq_kernel_t(ids_ref, lo_ref, hi_ref, codes_ref, out_ref):
    codes = codes_ref[0].astype(jnp.int32)            # [MP, TILE]
    out_ref[0, 0, 0, :] = _adc_gather_block(codes, lo_ref[0], hi_ref[0])[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles(
    lut: jax.Array,        # [B, m, ksub] f32
    codes_t: jax.Array,    # [T_total, MP, TILE] uint8 (transposed layout)
    tile_ids: jax.Array,   # [B, T] int32
    interpret: bool = False,
) -> jax.Array:
    """ADC scores [B, T, TILE] f32 for each query's probed code tiles."""
    b = lut.shape[0]
    t = tile_ids.shape[1]
    mp, tile = codes_t.shape[1], codes_t.shape[2]
    lo, hi = pq_lut_tables(lut)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, mp, 128), lambda bi, ti, ids: (bi, 0, 0)),
            pl.BlockSpec((1, mp, 128), lambda bi, ti, ids: (bi, 0, 0)),
            pl.BlockSpec((1, mp, tile), lambda bi, ti, ids: (ids[bi, ti], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tile), lambda bi, ti, ids: (bi, ti, 0, 0)),
    )
    out = pl.pallas_call(
        _pq_kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 1, tile), jnp.float32),
        interpret=interpret,
    )(tile_ids, lo, hi, codes_t)
    return out[:, :, 0, :]


def _pq_group_kernel_t(ids_ref, lo_ref, hi_ref, codes_hbm, out_ref, scratch, sems, *, mp):
    """PQ_TG concurrent tile DMAs into one scratch slab, then PQ_TG cheap
    gather-ADC blocks — amortizes DMA latency 8x over the per-tile kernel."""
    bi, gi = pl.program_id(0), pl.program_id(1)

    def dma(j):
        tid = ids_ref[bi, gi * PQ_TG + j]
        return pltpu.make_async_copy(
            codes_hbm.at[tid], scratch.at[pl.ds(j * mp, mp), :], sems.at[j]
        )

    for j in range(PQ_TG):
        dma(j).start()
    for j in range(PQ_TG):
        dma(j).wait()
    for j in range(PQ_TG):
        codes = scratch[j * mp:(j + 1) * mp, :].astype(jnp.int32)
        out_ref[0, 0, 0, pl.ds(j * TILE, TILE)] = _adc_gather_block(
            codes, lo_ref[0], hi_ref[0]
        )[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles_grouped(
    lut: jax.Array,        # [B, m, ksub] f32
    codes_t: jax.Array,    # [T_total, MP, TILE] uint8 (transposed layout)
    tile_ids: jax.Array,   # [B, T] int32, T % PQ_TG == 0
    interpret: bool = False,
) -> jax.Array:
    b = lut.shape[0]
    t = tile_ids.shape[1]
    assert t % PQ_TG == 0, t
    g = t // PQ_TG
    mp, tile = codes_t.shape[1], codes_t.shape[2]
    lo, hi = pq_lut_tables(lut)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, mp, 128), lambda bi, gi, ids: (bi, 0, 0)),
            pl.BlockSpec((1, mp, 128), lambda bi, gi, ids: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, PQ_TG * TILE), lambda bi, gi, ids: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((PQ_TG * mp, tile), jnp.uint8),
            pltpu.SemaphoreType.DMA((PQ_TG,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pq_group_kernel_t, mp=mp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, 1, PQ_TG * TILE), jnp.float32),
        interpret=interpret,
    )(tile_ids, lo, hi, codes_t)
    return out.reshape(b, t, TILE)


def pq_scan_topk_pallas(
    lut: jax.Array,            # [B, m, ksub]
    coarse_scores: jax.Array,  # [B, nprobe]
    codes_t: jax.Array,        # [T_total, MP, TILE] uint8 (transposed layout)
    row_flat_ids: jax.Array,   # [T_total * TILE] int32
    tile_ids: jax.Array,       # [B, T]
    tile_valid: jax.Array,     # [B, T]
    probe_of_tile: jax.Array,  # [B, T]
    k: int,
    interpret: bool = False,
    grouped: bool = True,
):
    """Drop-in for ``ivf_pq.pq_scan_topk`` on TPU (Pallas gather + ADC).

    ``grouped`` scores PQ_TG tiles per program via concurrent DMAs; the
    probe schedule is padded to a PQ_TG multiple with invalid slots so any
    T works.
    """
    from retrieval_scaling_tpu.ops.topk import NEG_INF, exact_topk_2stage

    b, t = tile_ids.shape
    if grouped and t % PQ_TG:
        pad = PQ_TG - t % PQ_TG
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, pad)))
        probe_of_tile = jnp.pad(probe_of_tile, ((0, 0), (0, pad)))
        t += pad
    safe_ids = jnp.where(tile_valid, tile_ids, 0)
    if grouped:
        adc = gather_adc_tiles_grouped(lut, codes_t, safe_ids, interpret=interpret)
    else:
        adc = gather_adc_tiles(lut, codes_t, safe_ids, interpret=interpret)
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
# IVF-Flat grouped scan: FL_TG concurrent tile DMAs + one matmul per program
# --------------------------------------------------------------------------
FL_TG = 4


def _flat_group_kernel(ids_ref, q_ref, tiles_hbm, out_ref, scratch, sems):
    """Gather FL_TG probed [TILE, D] tiles concurrently, score them against
    query b with ONE [FL_TG*TILE, D] x [D, 1] MXU pass — amortizes DMA
    latency like the PQ grouped kernel (the per-tile pipeline stalls on
    each 196KB fetch's latency; four in flight hide it)."""
    bi, gi = pl.program_id(0), pl.program_id(1)

    def dma(j):
        tid = ids_ref[bi, gi * FL_TG + j]
        return pltpu.make_async_copy(
            tiles_hbm.at[tid], scratch.at[pl.ds(j * TILE, TILE), :], sems.at[j]
        )

    for j in range(FL_TG):
        dma(j).start()
    for j in range(FL_TG):
        dma(j).wait()

    d = q_ref.shape[2]
    q = q_ref[0, 0].astype(jnp.float32).reshape(d, 1)
    scores = jax.lax.dot_general(
        scratch[:, :].astype(jnp.float32), q,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[0, 0, 0, :] = scores[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_score_tiles_grouped(
    queries: jax.Array,    # [B, D]
    tiles: jax.Array,      # [T_total, TILE, D] bf16/f32
    tile_ids: jax.Array,   # [B, T] int32, T % FL_TG == 0
    interpret: bool = False,
) -> jax.Array:
    b, d = queries.shape
    t = tile_ids.shape[1]
    assert t % FL_TG == 0, t
    g = t // FL_TG
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda bi, gi, ids: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, FL_TG * TILE), lambda bi, gi, ids: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((FL_TG * TILE, d), tiles.dtype),
            pltpu.SemaphoreType.DMA((FL_TG,)),
        ],
    )
    out = pl.pallas_call(
        _flat_group_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, 1, FL_TG * TILE), jnp.float32),
        interpret=interpret,
    )(tile_ids, queries.astype(jnp.float32).reshape(b, 1, d), tiles)
    return out.reshape(b, t, TILE)
