"""Streaming / merged top-k primitives for TPU MIPS search.

The exact-search hot path (the FAISS ``IndexFlatIP`` replacement) scores
queries against the datastore with MXU-tiled matmuls and keeps a running
top-k per query instead of materializing the [B, N] score matrix
(reference behavior: src/indicies/flat.py:129-141). The datastore axis is
scanned in fixed-size chunks under ``lax.scan`` so the program is
shape-static and XLA double-buffers HBM loads against MXU compute.

``merge_topk`` merges candidate lists (multi-shard / multi-device), the
collective analog of the reference's ``rerank_elements``
(reference: api/serve_main_node.py:109-165).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def merge_topk(scores_a, ids_a, scores_b, ids_b, k: int):
    """Merge two per-query candidate sets into the top-k of their union.

    scores_*: [B, Ka], [B, Kb]; ids are int arrays aligned with scores.
    """
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    top_scores, pos = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(ids, pos, axis=-1)


def exact_topk_2stage(scores: jax.Array, k: int, seg: int = 128):
    """Exact top-k over the last axis via segment-max prefilter.

    ``lax.top_k`` on TPU sorts the whole row (ruinous at 1M columns). This
    selects exactly the same set in two cheap stages:

      1. max over SEG-wide segments (VPU reduction) -> [B, C/SEG]
      2. top-k of the segment maxima, gather those k segments
         (k*SEG candidates), exact top-k over the small pool.

    Exactness: let t = the k-th largest value. Every element > t lives in a
    segment whose max > t; there are < k such elements, hence < k such
    segments, and all of them rank above any max == t segment — so they are
    all among the k segments kept. Remaining slots are filled by elements
    == t from kept segments, which is a valid top-k under tie-arbitrariness.

    Returns (values [B, k'], column indices [B, k']) with k' = min(k, C).
    """
    b, c = scores.shape
    if c <= max(k, 2 * seg):  # small rows: direct sort is fine
        kk = min(k, c)
        return jax.lax.top_k(scores, kk)
    n_seg = -(-c // seg)
    if n_seg * seg != c:
        scores = jnp.pad(scores, ((0, 0), (0, n_seg * seg - c)), constant_values=NEG_INF)
    s3 = scores.reshape(b, n_seg, seg)
    seg_max = jnp.max(s3, axis=-1)                               # [B, G]
    k_seg = min(k, n_seg)
    _, seg_ids = jax.lax.top_k(seg_max, k_seg)                   # [B, k_seg]
    cand = jnp.take_along_axis(s3, seg_ids[..., None], axis=1)   # [B, k_seg, SEG]
    cand = cand.reshape(b, k_seg * seg)
    kk = min(k, c)
    c_s, c_pos = jax.lax.top_k(cand, kk)
    seg_of = jnp.take_along_axis(seg_ids, c_pos // seg, axis=1)
    cols = seg_of * seg + c_pos % seg
    return c_s, cols.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "approx_recall"))
def chunked_topk_scores(
    queries: jax.Array,      # [B, D]
    database: jax.Array,     # [N_pad, D] (rows >= n_valid are padding)
    n_valid: jax.Array | int,  # scalar: number of real rows
    k: int,
    chunk_size: int = 1 << 20,
    approx_recall: float | None = None,
    row_scales: jax.Array | None = None,  # [N_pad] f32 when database is int8
):
    """Inner-product top-k of each query against the database.

    Returns (scores [B, k], indices [B, k]) with float32 scores. Padding rows
    are masked to -inf. The database is scanned chunk-by-chunk with a running
    top-k carry: per chunk, per-query top-k on the [B, C] chunk scores, then
    a merge with the carry — O(B * (k + C)) VMEM.

    ``approx_recall=None`` keeps exact ``lax.top_k`` semantics; setting a
    recall target (e.g. 0.99) switches the per-chunk selection to
    ``lax.approx_max_k``, the TPU-native partial-reduction top-k — much
    faster on large chunks at a bounded per-chunk recall cost.

    int8 datastore (the FAISS SQ8 analog): pass an int8 ``database`` plus
    per-row ``row_scales``; queries are dynamically row-quantized and the
    scan runs on the int8 MXU — the HBM stream (the bottleneck) halves vs
    bf16. Scores are dequantized, so they stay comparable across shards.

    Prefer the largest chunk the [B, C] f32 score buffer affords: measured
    on v5e, one 1M-row chunk streams 2x faster than 8x128K chunks (the
    inter-chunk top-k merge does not overlap with the next chunk's load).
    ``pick_chunk_size`` computes that bound.
    """
    n_pad, d = database.shape
    b = queries.shape[0]
    chunk_size = min(chunk_size, n_pad)
    # Pad database rows to a chunk multiple (scores masked below).
    n_chunks = -(-n_pad // chunk_size)
    total = n_chunks * chunk_size
    if total != n_pad:
        database = jnp.pad(database, ((0, total - n_pad), (0, 0)))
        if row_scales is not None:
            row_scales = jnp.pad(row_scales, (0, total - n_pad))

    int8_db = database.dtype == jnp.int8
    if int8_db:
        assert row_scales is not None, "int8 database requires row_scales"
        from retrieval_scaling_tpu.ops.quant_matmul import _rowquant

        qq, q_scale = _rowquant(queries.astype(jnp.float32))  # [B, D] int8, [B, 1]
        scale_chunks = row_scales.astype(jnp.float32).reshape(n_chunks, chunk_size)
    else:
        qf = queries.astype(database.dtype)
        scale_chunks = jnp.zeros((n_chunks, 1), jnp.float32)  # unused
    chunks = database.reshape(n_chunks, chunk_size, d)

    k_carry = min(k, total)        # candidates retained across the scan
    k_chunk = min(k, chunk_size)   # candidates a single chunk can contribute

    def scan_body(carry, chunk_data):
        best_s, best_i = carry
        chunk, scales, chunk_idx = chunk_data
        if int8_db:
            acc = jax.lax.dot_general(
                qq, chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )  # [B, C] int32
            scores = acc.astype(jnp.float32) * q_scale * scales[None, :]
        else:
            scores = jax.lax.dot_general(
                qf, chunk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [B, C]
        base = chunk_idx * chunk_size
        col = jnp.arange(chunk_size, dtype=jnp.int32)[None, :]
        valid = (base + col) < n_valid
        scores = jnp.where(valid, scores, NEG_INF)
        if approx_recall is None:
            c_s, c_pos = exact_topk_2stage(scores, k_chunk)
        else:
            c_s, c_pos = jax.lax.approx_max_k(scores, k_chunk, recall_target=approx_recall)
        c_i = jnp.where(c_s > NEG_INF / 2, (base + c_pos).astype(jnp.int32), -1)
        return merge_topk(best_s, best_i, c_s, c_i, k_carry), None

    init = (
        jnp.full((b, k_carry), NEG_INF, jnp.float32),
        jnp.full((b, k_carry), -1, jnp.int32),
    )
    (scores, ids), _ = jax.lax.scan(
        scan_body, init, (chunks, scale_chunks, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    if k_carry < k:  # datastore smaller than k: pad out
        pad = k - k_carry
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    return scores, ids


def pick_chunk_size(
    n_rows: int, batch: int, score_budget_bytes: int = 256 << 20, align: int = 128
) -> int:
    """Largest chunk whose [B, C] f32 score buffer stays within budget."""
    cap = max(score_budget_bytes // (4 * max(batch, 1)), align)
    chunk = min(n_rows, cap)
    return max(align, chunk - chunk % align)


def topk_bitonic_ok(k: int) -> bool:
    return (k & (k - 1)) == 0
