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
def _pq_kernel(ids_ref, lut_ref, codes_ref, out_ref):
    """codes_ref: [1, m, TILE] uint8; lut_ref: [1, m, ksub] f32; out [1,1,1,TILE].

    ADC by one-hot matvec per subquantizer: TPU has no per-lane VMEM
    gather, so score[t] = sum_m lut[m, codes[m, t]] becomes m small
    [TILE, ksub] x [ksub, 1] matmuls on the MXU (pallas_guide:
    quantization-kernel pattern).
    """
    m, tile = codes_ref.shape[1], codes_ref.shape[2]
    ksub = lut_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32)           # [m, TILE]
    # Per-subquantizer select-and-reduce on the VPU. A [TILE, ksub] x
    # [ksub, 1] MXU matvec wastes 127/128 of the array (1-wide output);
    # masking the broadcast LUT row and lane-reducing is ~3x cheaper.
    # (Mosaic rejects the fused forms: in-kernel reshapes and multi-dim
    # contractions are unsupported.)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, ksub), 1)
    acc = jnp.zeros((tile,), jnp.float32)
    for mi in range(m):
        lut_m = lut_ref[0, mi].astype(jnp.float32)                    # [ksub]
        sel = jnp.where(codes[mi][:, None] == lanes, lut_m[None, :], 0.0)
        acc = acc + jnp.sum(sel, axis=1)
    out_ref[0, 0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles(
    lut: jax.Array,        # [B, m, ksub] f32
    codes_mt: jax.Array,   # [T_total, m, TILE] uint8 (transposed layout)
    tile_ids: jax.Array,   # [B, T] int32
    interpret: bool = False,
) -> jax.Array:
    """ADC scores [B, T, TILE] f32 for each query's probed code tiles."""
    b, m, ksub = lut.shape
    t = tile_ids.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, m, ksub), lambda bi, ti, ids: (bi, 0, 0)),
            pl.BlockSpec((1, m, TILE), lambda bi, ti, ids: (ids[bi, ti], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TILE), lambda bi, ti, ids: (bi, ti, 0, 0)),
    )
    out = pl.pallas_call(
        _pq_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, 1, TILE), jnp.float32),
        interpret=interpret,
    )(tile_ids, lut, codes_mt)
    return out[:, :, 0, :]


def pq_scan_topk_pallas(
    lut: jax.Array,            # [B, m, ksub]
    coarse_scores: jax.Array,  # [B, nprobe]
    codes_mt: jax.Array,       # [T_total, m, TILE] uint8
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
    # Pad the schedule to a PQ_TG multiple so the grouped double-buffered
    # kernel applies (padding slots are invalid and masked below).
    pad = (-t) % PQ_TG
    if pad:
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, pad)))
        tile_valid = jnp.pad(tile_valid, ((0, 0), (0, pad)))
        probe_of_tile = jnp.pad(probe_of_tile, ((0, 0), (0, pad)))
        t += pad
    safe_ids = jnp.where(tile_valid, tile_ids, 0)
    adc = gather_adc_tiles_grouped(lut, codes_mt, safe_ids, interpret=interpret)  # [B,T,TILE]
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
# IVF-PQ grouped kernel: TG tiles per program, manual double-buffered DMA
# --------------------------------------------------------------------------
PQ_TG = 16


def _pq_grouped_kernel(ids_ref, lut_ref, codes_hbm, out_ref, scratch, sems):
    """Per program: DMA TG code tiles (double-buffered) + ADC each.

    The one-tile-per-program kernel is bounded by per-program DMA issue
    latency (2 KB tiles); grouping TG tiles per program amortizes it
    (pallas_guide: double-buffering pattern). codes_hbm stays in ANY/HBM;
    scratch: VMEM [2, m, TILE]; sems: DMA[2].
    """
    bi = pl.program_id(0)
    tg_i = pl.program_id(1)
    m, ksub = lut_ref.shape[1], lut_ref.shape[2]
    tile = out_ref.shape[3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, ksub), 1)

    def dma(slot, j):
        tid = ids_ref[bi, tg_i * PQ_TG + j]
        return pltpu.make_async_copy(codes_hbm.at[tid], scratch.at[slot], sems.at[slot])

    dma(0, 0).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < PQ_TG)
        def _():
            dma(nxt, j + 1).start()

        dma(slot, j).wait()
        codes = scratch[slot].astype(jnp.int32)      # [m, TILE]
        acc = jnp.zeros((tile,), jnp.float32)
        for mi in range(m):
            lut_m = lut_ref[0, mi].astype(jnp.float32)
            sel = jnp.where(codes[mi][:, None] == lanes, lut_m[None, :], 0.0)
            acc = acc + jnp.sum(sel, axis=1)
        out_ref[0, 0, j, :] = acc
        return carry

    jax.lax.fori_loop(0, PQ_TG, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_adc_tiles_grouped(
    lut: jax.Array,        # [B, m, ksub] f32
    codes_mt: jax.Array,   # [T_total, m, TILE] uint8
    tile_ids: jax.Array,   # [B, T] int32, T % PQ_TG == 0
    interpret: bool = False,
) -> jax.Array:
    """ADC scores [B, T, TILE] via the grouped double-buffered kernel."""
    b, m, ksub = lut.shape
    t = tile_ids.shape[1]
    assert t % PQ_TG == 0, t
    n_groups = t // PQ_TG
    tile = codes_mt.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_groups),
        in_specs=[
            pl.BlockSpec((1, m, ksub), lambda bi, gi, ids: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, PQ_TG, tile), lambda bi, gi, ids: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, m, tile), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _pq_grouped_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_groups, PQ_TG, tile), jnp.float32),
        interpret=interpret,
    )(tile_ids, lut, codes_mt)
    return out.reshape(b, t, tile)
