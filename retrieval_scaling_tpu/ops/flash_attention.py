"""Flash attention for TPU (Pallas) with an XLA reference path.

Replaces the reference's optional CUDA flash-attention-2 dependency
(reference: src/evaluate_perplexity.py:99-103) with a TPU-native kernel.
Online-softmax tiling: for each query block, stream key/value blocks through
VMEM keeping a running max / normalizer / weighted accumulator, so the
S x S score matrix never materializes in HBM.

Supports key-padding masks (encoder) and causal masking (reader LM). The
XLA path is numerically equivalent and used on CPU (tests verify parity via
the interpreter mode of the Pallas kernel).
"""

from __future__ import annotations

import contextlib
import functools
from contextvars import ContextVar

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Active (mesh, head_axis, batch_axis) for tensor-parallel attention — see
# attention_head_sharding below.
_HEAD_SHARDING: ContextVar = ContextVar("flash_head_sharding", default=None)


@contextlib.contextmanager
def attention_head_sharding(mesh, head_axis: str = "model", batch_axis: str | None = "data"):
    """Route flash attention through ``shard_map`` over ``mesh`` inside
    GSPMD-jitted programs.

    Under plain ``jit`` + ``NamedSharding`` (the Megatron TP layout in
    parallel/reader_tp.py), XLA's partitioner treats a ``pallas_call`` as
    replicated: it would all-gather q/k/v and run the full-head kernel on
    every chip. Attention is embarrassingly parallel over (batch, head),
    so wrapping the kernel in ``shard_map`` with heads split over the
    ``model`` axis keeps each chip computing only its own heads — the
    same sharding the surrounding qkv/out-proj einsums already use, so
    the partitioner inserts no extra collectives.

    Enter this context around TRACING of the TP-jitted forward (the
    reader scoring fn); it is a no-op for meshes whose axes don't divide
    the head/batch counts (those fall back to the replicated kernel).
    """
    token = _HEAD_SHARDING.set((mesh, head_axis, batch_axis))
    try:
        yield
    finally:
        _HEAD_SHARDING.reset(token)


def batch_shard_ctx():
    """(mesh, batch_axis, dp) when a sharding context with a >1 batch axis
    is active — lets other pallas entry points (ops/quant_matmul.py) shard
    their row dimension instead of being replicated by GSPMD."""
    ctx = _HEAD_SHARDING.get()
    if ctx is None:
        return None
    mesh, _, batch_axis = ctx
    dp = mesh.shape.get(batch_axis, 1) if batch_axis else 1
    return (mesh, batch_axis, dp) if dp > 1 else None


def _flash_head_sharded(causal, sm_scale, logit_cap, window, q, k, v, mask_f, seg):
    """shard_map-wrapped _flash_diffable, or None if the mesh doesn't fit."""
    ctx = _HEAD_SHARDING.get()
    if ctx is None:
        return None
    mesh, head_axis, batch_axis = ctx
    tp = mesh.shape.get(head_axis, 1) if head_axis else 1
    dp = mesh.shape.get(batch_axis, 1) if batch_axis else 1
    b, h = q.shape[0], q.shape[1]
    hkv = k.shape[1]
    # per-shard GQA grouping must stay integral: (h/tp) % (hkv/tp) == 0
    # holds whenever both divide, since n_rep is unchanged per shard
    hax = head_axis if (tp > 1 and h % tp == 0 and hkv % tp == 0) else None
    bax = batch_axis if (dp > 1 and b % dp == 0) else None
    if hax is None and bax is None:
        # nothing shardable (1-axis mesh or indivisible shapes): plain call
        return None

    P = jax.sharding.PartitionSpec
    qspec = P(bax, hax, None, None)
    args = [q, k, v]
    specs = [qspec, qspec, qspec]
    if mask_f is not None:
        args.append(mask_f)
        specs.append(P(bax, None))
    if seg is not None:
        args.append(seg)
        specs.append(P(bax, None))

    def inner(*xs):
        it = iter(xs)
        q_, k_, v_ = next(it), next(it), next(it)
        m_ = next(it) if mask_f is not None else None
        s_ = next(it) if seg is not None else None
        return _flash_diffable(causal, sm_scale, logit_cap, window, q_, k_, v_, m_, s_)

    return jax.shard_map(
        inner, mesh=mesh, in_specs=tuple(specs), out_specs=qspec, check_vma=False
    )(*args)


def flash_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    sm_scale: float | None = None,
    logit_cap: float | None = None,
) -> jax.Array:
    """``flash_attention`` that honors an active ``attention_head_sharding``
    context (decode-path helper: generate.py calls the kernel directly,
    not through ``multi_head_attention``, so without this a TP decode step
    would replicate the pallas_call — all-gathering the head-sharded KV
    cache every token)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    mask_f = None if kv_mask is None else kv_mask.astype(jnp.float32)
    out = _flash_head_sharded(
        False, float(sm_scale), logit_cap, None, q, k, v, mask_f, None
    )
    if out is not None:
        return out
    return flash_attention(
        q, k, v, kv_mask=kv_mask, sm_scale=sm_scale, logit_cap=logit_cap
    )


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# --------------------------------------------------------------------------
# XLA reference implementation
# --------------------------------------------------------------------------
def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    logit_cap: float | None = None,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Plain XLA attention. q,k,v: [B, H, S, D]; kv_mask: [B, Sk] (True=keep).
    ``logit_cap``: Gemma-2 soft-capping, cap*tanh(scores/cap) pre-mask.
    ``window``: causal sliding window — key j visible to query i iff
    i - window < j <= i (HF's sliding_window semantics).
    ``segment_ids``: [B, S] int; tokens attend only within their own
    segment (packed-sequence block-diagonal masking; requires Sq == Sk).

    GQA: k/v may carry fewer heads than q ([B, Hkv, S, D] with
    H % Hkv == 0). Query heads fold into a group axis over their kv head
    (HF's kv-major repeat_kv order), so the grouped K/V are contracted
    directly — never materialized at the full head count."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    g = h // hkv
    qg = q.reshape(b, hkv, g, sq, d)
    scores = jnp.einsum("bkgqd,bkmd->bkgqm", qg, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, None, :], scores, NEG_INF)
    if segment_ids is not None:
        same = segment_ids[:, None, None, :, None] == segment_ids[:, None, None, None, :]
        scores = jnp.where(same, scores, NEG_INF)
    if causal or window is not None:
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        keep = ki <= qi
        if window is not None:
            keep = keep & (ki > qi - window)
        scores = jnp.where(keep[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqm,bkmd->bkgqd", probs.astype(v.dtype), v)
    return out.reshape(b, h, sq, d)


# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------
def _flash_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, Sk_pad, D]
    v_ref,      # [1, 1, Sk_pad, D]
    *rest,      # [mask_ref if has_mask], segmented: (kseg, qseg, qlo, qhi),
                # then o_ref
    sm_scale: float,
    block_k: int,
    sk_pad: int,
    causal: bool,
    q_offset_per_block: int,
    seq_delta: int,
    has_mask: bool = True,
    segmented: bool = False,
    logit_cap: float | None = None,
    window: int | None = None,
):
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    if segmented:
        kseg_ref, qseg_ref, qlo_ref, qhi_ref, o_ref = rest
    else:
        (o_ref,) = rest
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    # f32 operands here are deliberate: an on-chip A/B (r04) found Mosaic
    # lowers a bf16 dot whose k operand is a pl.ds-sliced block far slower
    # than the f32-upcast version (S=2048 causal 3.7 -> 6.4 ms), while the
    # one-shot kernel's whole-row static operands take the fast bf16 path.
    # bf16-native dots live in _flash_oneshot_kernel, which now takes every
    # shape where it does no extra dot work.
    q = q_ref[0, 0].astype(jnp.float32) * sm_scale

    num_k_blocks = sk_pad // block_k
    qi = pl.program_id(2)
    first_q = qi * q_offset_per_block + seq_delta
    last_q = first_q + block_q - 1

    k_start = jnp.zeros((), jnp.int32)
    if causal:
        # Only key blocks intersecting the causal triangle contribute.
        k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(last_q + 1, block_k))
    else:
        k_blocks = num_k_blocks
    if window is not None:
        # Sliding window (Mistral/Gemma-2/Phi-3): query i sees keys in
        # (i - window, i]. The first visible key of this q block bounds
        # k_start, so compute is linear in the window, not the sequence.
        lowest_key = first_q - window + 1
        k_start = jnp.maximum(k_start, jnp.maximum(lowest_key, 0) // block_k)
    if segmented:
        # Packed rows: segments are contiguous, so this q block's keys live
        # in [min(lo), max(hi)) — blocks outside never run (linear-in-tokens
        # attention for block-diagonal masks, no [S, S] mask in HBM).
        k_start = jnp.maximum(k_start, jnp.min(qlo_ref[0, 0]) // block_k)
        k_blocks = jnp.minimum(k_blocks, pl.cdiv(jnp.max(qhi_ref[0, 0]), block_k))

    def body(ki, carry, masked):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        if logit_cap:
            # Gemma-2 soft-capping: cap * tanh(scores / cap), pre-mask
            s = logit_cap * jnp.tanh(s / logit_cap)
        if has_mask:
            s = s + mask_ref[0, 0, pl.ds(ki * block_k, block_k)][None, :]
        if segmented:
            k_seg = kseg_ref[0, 0, pl.ds(ki * block_k, block_k)]
            s = jnp.where(
                qseg_ref[0, 0][:, None] == k_seg[None, :], s, NEG_INF
            )
        if masked and (causal or window is not None):
            q_pos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + qi * q_offset_per_block
                + seq_delta
            )
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
            keep = k_pos <= q_pos
            if window is not None:
                keep = keep & (k_pos > q_pos - window)
            s = jnp.where(keep, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # masked entries hold NEG_INF; clamping the exp reference to
        # NEG_INF/2 makes their probabilities underflow to exactly 0 (and
        # keeps the all-masked block at p == 0) without a guard select —
        # real scores always exceed the clamp, so it never shifts them.
        m_safe = jnp.maximum(m_new, NEG_INF * 0.5)
        p = jnp.exp(s - m_safe)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    if (causal or window is not None) and not segmented:
        # Split the scan at the mask boundaries: interior key blocks (every
        # query in this q block sees every key) run a select-free body —
        # the causal/window iota+compare+select VPU passes only run on the
        # O(1) boundary blocks, not the whole row.
        int_start = k_start
        int_end = k_blocks
        if window is not None:
            # blocks fully inside the window's lower edge for ALL queries:
            # ki * block_k > last_q - window
            int_start = jnp.maximum(
                int_start, pl.cdiv(jnp.maximum(last_q - window + 1, 0), block_k)
            )
        if causal:
            # blocks fully below the diagonal for ALL queries:
            # (ki + 1) * block_k - 1 <= first_q
            int_end = jnp.minimum(int_end, (first_q + 1) // block_k)
        int_start = jnp.minimum(int_start, int_end)
        carry = jax.lax.fori_loop(
            k_start, int_start, functools.partial(body, masked=True), init
        )
        carry = jax.lax.fori_loop(
            int_start, int_end, functools.partial(body, masked=False), carry
        )
        acc, _, l = jax.lax.fori_loop(
            jnp.maximum(int_end, k_start), k_blocks,
            functools.partial(body, masked=True), carry,
        )
    else:
        acc, _, l = jax.lax.fori_loop(
            k_start, k_blocks, functools.partial(body, masked=True), init
        )
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_oneshot_kernel(
    q_ref,      # [1, 1, block_q, D]
    k_ref,      # [1, 1, Sk_pad, D]
    v_ref,      # [1, 1, Sk_pad, D]
    *rest,      # [mask_ref if has_mask], then o_ref
    sm_scale: float,
    causal: bool,
    q_offset_per_block: int,
    seq_delta: int,
    has_mask: bool,
    logit_cap: float | None,
    window: int | None,
):
    """One softmax over the whole key row per q block.

    For moderate key lengths the [block_q, Sk] score tile fits VMEM, so the
    online-softmax carry (running max / normalizer / accumulator rescale per
    key block) is pure overhead: this body does one big QK^T matmul, one
    masked softmax, one PV matmul. The causal/window mask comes from a
    [bq, 1] x [1, Sk] broadcast compare (no [bq, Sk] iota materialization),
    applied BEFORE the row max so an arbitrarily dominant masked score can
    never distort the visible probabilities.
    """
    rest = list(rest)
    mask_ref = rest.pop(0) if has_mask else None
    (o_ref,) = rest
    block_q = q_ref.shape[2]
    sk_pad = k_ref.shape[2]
    qi = pl.program_id(2)

    # same operand-dtype scheme as the looped kernel: bf16 MXU dots with
    # f32 accumulation, sm_scale folded into the exp (exact; see there)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    es_scale = 1.0 if logit_cap else sm_scale
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, Sk_pad] f32, unscaled unless logit_cap
    if logit_cap:
        s = logit_cap * jnp.tanh(s * (sm_scale / logit_cap))
    if has_mask:
        s = s + mask_ref[0, 0][None, :]
    if causal or window is not None:
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
            + qi * q_offset_per_block
            + seq_delta
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, sk_pad), 1)
        keep = col <= row
        if window is not None:
            keep = keep & (col > row - window)
        s = jnp.where(keep, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # same exp-reference clamp as the looped kernel: masked rows/entries
    # underflow to exact 0 without a guard select
    p = jnp.exp((s - jnp.maximum(m, NEG_INF * 0.5)) * es_scale)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# one-shot feasibility: the [block_q, Sk_pad] f32 score + prob tiles (plus
# whole-row K/V in f32 and double-buffered bf16 operands) must fit scoped
# VMEM. 1M elems = 4 MB s + 4 MB p + ~3 MB operands — comfortably inside
# the 16 MB v5e budget; 2M would already be s+p = 16 MB alone.
_ONESHOT_MAX_SCORE_ELEMS = 1024 * 1024


def segment_bounds(segment_ids: jax.Array):
    """Per-token [lo, hi) span of the token's segment along the row.

    Segments must be contiguous runs (the packed layout). Pad tokens
    (segment 0) get lo = hi = 0.
    """
    b, s = segment_ids.shape
    idx = jnp.arange(s, dtype=jnp.int32)[None, :]
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, segment_ids.dtype), segment_ids[:, :-1]], axis=1
    )
    start = segment_ids != prev  # first token of each run
    lo = jax.lax.cummax(jnp.where(start, idx, 0), axis=1)
    nxt = jnp.concatenate(
        [segment_ids[:, 1:], jnp.full((b, 1), -1, segment_ids.dtype)], axis=1
    )
    end = segment_ids != nxt  # last token of each run
    hi = jnp.flip(
        jax.lax.cummin(jnp.where(jnp.flip(end, 1), jnp.flip(idx + 1, 1), s), axis=1), 1
    )
    pad = segment_ids == 0
    return jnp.where(pad, 0, lo).astype(jnp.int32), jnp.where(pad, 0, hi).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "interpret", "logit_cap",
        "window", "one_shot",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    # Measured on v5e at the reader shape (b8 h16 S1024 d128): 256x256
    # blocks 5.15 ms, 512x1024 3.86 ms (1.33x; S=2048 6.28 -> 5.40).
    # Larger q blocks amortize per-program cost; block_k only sets the
    # inner-loop tile (K/V are whole-S resident per program regardless).
    # Segmented (packed) rows keep 256x256: a 512-token q block widens the
    # [min lo, max hi) key span across more segments, re-paying the scan
    # the bigger q block saved.
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
    segment_ids: jax.Array | None = None,
    logit_cap: float | None = None,
    window: int | None = None,
    one_shot: bool | None = None,
) -> jax.Array:
    """Pallas flash attention. q,k,v: [B, H, S, D]; kv_mask: [B, Sk] bool.

    ``segment_ids`` [B, S] (packed rows, contiguous runs, 0 = pad):
    block-diagonal attention computed from the per-token ids alone — no
    [S, S] mask array in HBM, and key blocks outside a query block's
    segment span are skipped entirely (linear-in-tokens for packed rows).
    Requires Sq == Sk.

    ``logit_cap``: Gemma-2 tanh soft-capping fused pre-mask. ``window``:
    causal sliding window (implies causal masking; key blocks fully outside
    the window band are skipped, so compute is O(S * window)).

    ``one_shot``: compute each q block's softmax over the whole key row in
    one pass (no online-softmax carry) when the [block_q, Sk] f32 score
    tile fits VMEM; falls back to the looped kernel when it doesn't (or
    for segmented rows). None = auto.

    GQA: k/v may be [B, Hkv, Sk, D] with H % Hkv == 0 (grouped-query
    attention, reference models' num_key_value_heads). The kernel maps
    query head -> kv head in the BlockSpec index map, so the grouped
    K/V are never repeated in HBM and consecutive query-head programs
    reuse the same resident K/V block (the repeat the torch reference
    does at e.g. transformers' repeat_kv costs n_rep x the K/V HBM
    traffic; here it is free).
    """
    b, h, sq, d = q.shape
    hkv = k.shape[1]
    assert h % hkv == 0, f"q heads {h} not a multiple of kv heads {hkv}"
    n_rep = h // hkv
    sk = k.shape[2]
    if block_q is None:
        # whole-row q blocks win at S<=1024 (measured: 2.28 vs 2.48 ms at
        # b8h16S1024d128, 2.86 vs 3.33 at the Llama b8h32S1024d64 shape);
        # 512 stays ahead at S>=2048
        block_q = 256 if segment_ids is not None else (1024 if sq <= 1024 else 512)
    if block_k is None:
        block_k = 256 if segment_ids is not None else 1024
    if sm_scale is None:
        sm_scale = d**-0.5
    if window is not None:
        causal = True  # HF sliding_window semantics are causal

    # tiny-S (decode) q blocks stay at the 32-sublane tile instead of 128:
    # a [128, block_k] score block for one real query row wastes 4-16x the
    # MXU/VPU work (32 is the strictest input-dtype sublane tile, int8)
    block_q = min(block_q, max(32, _round_up(sq, 32)) if sq < 128 else _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    # Additive mask folding key padding + kv-tail padding: [B, 1, Sk_pad]
    # (middle singleton keeps TPU block shapes legal: trailing dims match).
    # With no kv mask and no tail padding the operand is dropped entirely —
    # its per-block broadcast add is a pure VPU pass the hot reader shape
    # never needs.
    has_mask = kv_mask is not None or sk_pad != sk
    add_mask = None
    if kv_mask is None:
        if sk_pad != sk:
            add_mask = jnp.zeros((b, sk_pad), jnp.float32).at[:, sk:].set(NEG_INF)
    else:
        valid = jnp.pad(kv_mask.astype(bool), ((0, 0), (0, sk_pad - sk)))
        add_mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    if add_mask is not None:
        add_mask = add_mask[:, None, :]

    grid = (b, h, sq_pad // block_q)

    # One-shot softmax (no online carry, no per-k-block loop) when the
    # [block_q, Sk_pad] f32 score tile fits VMEM. None = auto: ON wherever
    # one-shot does no extra dot work — non-causal rows, and causal rows
    # with a single (whole-row) q block, where the looped kernel could not
    # skip any key block either. That covers the S<=1024 reader shapes and
    # every decode step (the 32-row q tail sees ~the whole cache). Multi-
    # q-block causal rows (S>=2048 dense) keep the looped kernel's causal
    # key-block skip, which one-shot forfeits. On-chip (r04, bf16 dots in
    # the one-shot body): b8h16S1024d128 2.29 -> 1.96 ms, llama d64 3.19
    # -> 2.83 ms, parity 1.4e-2 = bf16 resolution. Segmented rows and a
    # small window relative to Sk keep the looped kernel: its key-block
    # skipping is what makes them linear-in-tokens / O(S*window).
    if one_shot is None:
        one_shot = (not causal) or sq_pad == block_q
    use_oneshot = (
        one_shot
        and segment_ids is None
        # a window smaller than the key row needs the looped kernel's
        # key-block skipping to stay O(S * window)
        and (window is None or window >= sk)
        and block_q * sk_pad <= _ONESHOT_MAX_SCORE_ELEMS
    )

    if use_oneshot:
        kernel = functools.partial(
            _flash_oneshot_kernel,
            sm_scale=sm_scale,
            causal=causal,
            q_offset_per_block=block_q,
            seq_delta=sk - sq,
            has_mask=has_mask,
            logit_cap=logit_cap,
            window=window,
        )
    else:
        kernel = functools.partial(
            _flash_kernel,
            sm_scale=sm_scale,
            block_k=block_k,
            sk_pad=sk_pad,
            causal=causal,
            q_offset_per_block=block_q,
            seq_delta=sk - sq,
            has_mask=has_mask,
            segmented=segment_ids is not None,
            logit_cap=logit_cap,
            window=window,
        )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        # GQA: query head hi reads kv head hi // n_rep; with the grid's
        # h dimension outer to qi, consecutive programs hit the same kv
        # block index and Pallas skips the re-copy.
        pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
        pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi // n_rep, 0, 0)),
    ]
    operands = [q, k, v]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, sk_pad), lambda bi, hi, qi: (bi, 0, 0)))
        operands.append(add_mask)
    if segment_ids is not None:
        assert sq == sk, "segment attention requires Sq == Sk"
        seg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, sk_pad - sk)))
        lo, hi = segment_bounds(seg)
        in_specs += [
            pl.BlockSpec((1, 1, sk_pad), lambda bi, hi_, qi: (bi, 0, 0)),     # key segs
            pl.BlockSpec((1, 1, block_q), lambda bi, hi_, qi: (bi, 0, qi)),   # q segs
            pl.BlockSpec((1, 1, block_q), lambda bi, hi_, qi: (bi, 0, qi)),   # lo
            pl.BlockSpec((1, 1, block_q), lambda bi, hi_, qi: (bi, 0, qi)),   # hi
        ]
        operands += [seg[:, None, :], seg[:, None, :], lo[:, None, :], hi[:, None, :]]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(*operands)

    return out[:, :, :sq, :]


# --------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA-recompute backward.
#
# pallas_call has no automatic VJP, so training through the flash kernel
# needs a custom one. The backward recomputes attention with XLA in f32
# (flash-style rematerialization: no S x S tensor is saved between fwd and
# bwd) and takes exact gradients of that recomputation. Sequences here are
# <= 512 (SURVEY.md §5 long-context scope), so the XLA backward's blockwise
# fusion is adequate; a fused Pallas dq/dk/dv kernel is a further step.
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_diffable(causal, sm_scale, logit_cap, window, q, k, v, mask_f, seg):
    kv_mask = None if mask_f is None else mask_f > 0.5
    return flash_attention(
        q, k, v, kv_mask, causal, sm_scale, segment_ids=seg,
        logit_cap=logit_cap, window=window,
    )


def _flash_diffable_fwd(causal, sm_scale, logit_cap, window, q, k, v, mask_f, seg):
    out = _flash_diffable(causal, sm_scale, logit_cap, window, q, k, v, mask_f, seg)
    return out, (q, k, v, mask_f, seg)


def _flash_diffable_bwd(causal, sm_scale, logit_cap, window, residuals, g):
    q, k, v, mask_f, seg = residuals
    kv_mask = None if mask_f is None else mask_f > 0.5

    def ref(q_, k_, v_):
        return xla_attention(
            q_, k_, v_, kv_mask, causal, sm_scale, logit_cap, window,
            segment_ids=seg,
        )

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    dmask = None if mask_f is None else jnp.zeros_like(mask_f)
    import numpy as _np

    dseg = None if seg is None else _np.zeros(seg.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dseg


_flash_diffable.defvjp(_flash_diffable_fwd, _flash_diffable_bwd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    impl: str = "auto",
    logit_cap: float | None = None,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Dispatching attention entry point. q,k,v: [B, H, S, D].

    ``impl``: "auto" picks Pallas on TPU, XLA elsewhere; "flash"/"xla"
    force a backend; "flash_interpret" runs the kernel in interpreter mode
    (for CPU parity tests). The flash path is differentiable (custom VJP
    with XLA-recompute backward), so the same model code trains and serves.
    """
    if impl == "auto":
        # Measured on v5e (BERT-base, 512x256): XLA attention is ~25% faster
        # than the Pallas kernel at short sequences (tiny per-head blocks
        # underutilize the MXU); the online-softmax kernel wins once the
        # S x S score tensor stops fitting on-chip. Segmented (packed)
        # attention always uses the kernel on TPU: the XLA path's [S, S]
        # mask costs HBM every layer, the kernel reads only the [B, S] ids
        # and skips out-of-segment key blocks. Sliding-window and soft-cap
        # models (Mistral/Gemma-2/Phi-3) take the same route: both are
        # fused into the kernel, and the XLA path's [S, S] score tensor is
        # exactly what hurts at the long contexts where windows matter.
        use_flash = jax.default_backend() == "tpu" and (
            q.shape[2] >= 1024 or segment_ids is not None
        )
        impl = "flash" if use_flash else "xla"
    if segment_ids is not None and window is not None and impl == "flash":
        # packed rows + sliding window together are not fused (no model
        # family needs it: packing is encoder-side, windows are decoder-side)
        impl = "xla"
    if impl == "xla":
        return xla_attention(
            q, k, v, kv_mask, causal, sm_scale, logit_cap, window, segment_ids
        )
    cap = float(logit_cap) if logit_cap else None
    win = int(window) if window is not None else None
    if impl == "flash":
        if sm_scale is None:
            sm_scale = q.shape[-1] ** -0.5
        mask_f = None if kv_mask is None else kv_mask.astype(jnp.float32)
        out = _flash_head_sharded(
            causal, float(sm_scale), cap, win, q, k, v, mask_f, segment_ids
        )
        if out is not None:
            return out
        return _flash_diffable(
            causal, float(sm_scale), cap, win, q, k, v, mask_f, segment_ids
        )
    if impl == "flash_interpret":
        return flash_attention(
            q, k, v, kv_mask, causal, sm_scale, interpret=True,
            segment_ids=segment_ids, logit_cap=cap, window=win,
        )
    raise ValueError(f"Unknown attention impl: {impl!r}")
