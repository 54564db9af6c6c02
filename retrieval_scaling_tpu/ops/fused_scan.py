"""Fused Pallas exact-MIPS scan: matmul + segment-max epilogue.

The exact Flat search is HBM-bound; its XLA form materializes the [B, N]
f32 score matrix in HBM (256 MB at B=64, N=1M) just to immediately reduce
it. This kernel fuses the reduction into the scan: each grid step loads a
BLOCK of database rows, computes the [B, BLOCK] scores on the MXU in VMEM,
and writes only the 128-wide segment maxima — 128x less score traffic.

Exact top-k then needs a second, tiny pass: pick the top-k segments per
query from the maxima and re-score just those k segments with the existing
gather kernel (`ops/ivf_gather.gather_score_tiles`). Exactness follows the
same argument as ``ops/topk.exact_topk_2stage`` (every element greater than
the k-th value lives in a kept segment).

Traffic: N*D*2 bytes (pass 1) + B*k*SEG*D*2 bytes (pass 2) — at B=1 the
second pass is ~20 MB, putting single-query latency near the HBM floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 128        # segment width (= gather-kernel TILE)
BLOCK = 2048     # database rows per grid step
NEG_INF = -1e30


def _segmax_kernel(nvalid_ref, q_ref, db_ref, out_ref):
    """q_ref: [B, D]; db_ref: [BLOCK, D]; out [1, SEGS, B] segment maxima."""
    i = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32),
        db_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [B, BLOCK]
    base = i * BLOCK
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < nvalid_ref[0], scores, NEG_INF)
    for s in range(BLOCK // SEG):
        seg = scores[:, s * SEG : (s + 1) * SEG]        # [B, SEG]
        out_ref[0, s, :] = jnp.max(seg, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmax_scan(
    queries: jax.Array,   # [B, D]
    database: jax.Array,  # [N_pad, D] (N_pad % BLOCK == 0)
    n_valid: jax.Array,   # scalar int32
    interpret: bool = False,
) -> jax.Array:
    """Segment maxima [B, N_pad // SEG] f32 (padding segments = -inf)."""
    b, d = queries.shape
    n_pad = database.shape[0]
    assert n_pad % BLOCK == 0, n_pad
    n_blocks = n_pad // BLOCK
    segs = BLOCK // SEG

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, nv: (0, 0)),
            pl.BlockSpec((BLOCK, d), lambda i, nv: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, segs, b), lambda i, nv: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _segmax_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, segs, b), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), queries.astype(database.dtype), database)
    return jnp.moveaxis(out, 2, 0).reshape(b, n_blocks * segs)


def flat_topk_fused(
    queries: jax.Array,   # [B, D]
    database: jax.Array,  # [N_pad, D], N_pad % BLOCK == 0
    n_valid,
    k: int,
    interpret: bool = False,
):
    """Exact (scores [B, k], row ids [B, k]) over the database.

    Pass 1: fused segment-max scan. Pass 2: re-score the top-k segments per
    query with the probed-tile gather kernel and take the exact top-k.
    """
    from retrieval_scaling_tpu.ops.ivf_gather import gather_score_tiles

    b, d = queries.shape
    n_pad = database.shape[0]
    n_seg = n_pad // SEG

    seg_max = segmax_scan(queries, database, n_valid, interpret=interpret)  # [B, n_seg]
    k_seg = min(k, n_seg)
    _, seg_ids = jax.lax.top_k(seg_max, k_seg)                               # [B, k_seg]

    tiles = database.reshape(n_seg, SEG, d)
    scores = gather_score_tiles(queries, tiles, seg_ids, interpret=interpret)  # [B, k_seg, SEG]
    rows = seg_ids[:, :, None] * SEG + jnp.arange(SEG)[None, None, :]          # [B, k_seg, SEG]
    ok = rows < jnp.asarray(n_valid, jnp.int32)
    flat_scores = jnp.where(ok, scores, NEG_INF).reshape(b, k_seg * SEG)
    flat_rows = jnp.where(ok, rows, -1).reshape(b, k_seg * SEG)

    kk = min(k, k_seg * SEG)
    c_s, c_pos = jax.lax.top_k(flat_scores, kk)
    c_i = jnp.take_along_axis(flat_rows, c_pos, axis=-1).astype(jnp.int32)
    if kk < k:
        c_s = jnp.pad(c_s, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        c_i = jnp.pad(c_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return c_s, c_i
