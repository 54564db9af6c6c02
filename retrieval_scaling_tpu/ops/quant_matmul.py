"""Int8 quantized matmul with fused dynamic activation quantization.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPs), but an XLA-level quantized matmul loses the gain to memory traffic:
the quantize (bf16 -> int8) and dequantize (int32 -> bf16) passes each
re-stream the full activation tensor through HBM. Measured on chip at
encoder shapes ([65536, 768] x [768, 3072]): pure int8 dot = 1.49x bf16,
but with XLA quant/dequant epilogues only 1.11x.

These kernels fuse the whole pipeline in VMEM: each grid step loads a
[BM, K] activation tile, computes per-row absmax scales, quantizes,
runs the int8 MXU dot against the resident [K, N] int8 weight, and
applies dequantize + bias + (optionally) gelu — or residual + LayerNorm
(``int8_matmul_residual_ln``) — in the epilogue. HBM sees only the bf16
input tile and the bf16 output tile, exactly like a plain matmul, while
the residual/LN fusion removes the two extra activation round-trips that
a pallas_call fusion barrier would otherwise cost.

Scheme: symmetric int8, per-row dynamic scales for activations (no
calibration needed; exact-max, not stochastic), per-output-channel static
scales for weights. Per-matmul relative error ~3e-3, below bf16 noise.

Reference analog: none — the reference encoder runs fp16 torch matmuls
(reference: src/embed.py:59-92); this is TPU-specific headroom.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256  # activation rows per grid step


class QuantizedWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight."""

    wq: jax.Array     # [K, N] int8
    scale: jax.Array  # [1, N] f32 (dequant multiplier)


def quantize_weight(w: jax.Array) -> QuantizedWeight:
    """[K, N] float -> per-column symmetric int8."""
    wf = w.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12)
    scale = absmax / 127.0
    wq = jnp.round(wf / scale).astype(jnp.int8)
    return QuantizedWeight(wq=wq, scale=scale)


def _rowquant(x: jax.Array):
    """Per-row symmetric int8 quantization (f32 in, int8 + f32 scale out)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
    xq = jnp.round(x * (127.0 / absmax)).astype(jnp.int8)
    return xq, absmax / 127.0


def _apply_activation(x: jax.Array, activation: str) -> jax.Array:
    if activation == "none":
        return x
    if activation == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if activation == "gelu_exact":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {activation!r}")


def _int8_matmul_kernel(x_ref, wq_ref, scale_ref, bias_ref, out_ref, *, activation):
    x = x_ref[:].astype(jnp.float32)                      # [BM, K]
    xq, row_scale = _rowquant(x)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )                                                     # [BM, N] int32
    out = acc.astype(jnp.float32) * row_scale * scale_ref[:] + bias_ref[:]
    out_ref[:] = _apply_activation(out, activation).astype(out_ref.dtype)


def _int8_matmul_xla(x2d, qw: QuantizedWeight, bias, activation: str, out_dtype):
    """Same math without Pallas (CPU tests / shape fallback)."""
    xq, row_scale = _rowquant(x2d.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, qw.wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * row_scale * qw.scale + bias
    return _apply_activation(out, activation).astype(out_dtype)


def int8_matmul(
    x: jax.Array,                # [..., K] bf16/f32
    qw: QuantizedWeight,         # wq [K, N], scale [1, N]
    bias: Optional[jax.Array] = None,   # [N]
    activation: str = "none",
    impl: str = "auto",          # "auto" | "pallas" | "xla"
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """activation(dequant(int8dot(rowquant(x), wq)) + bias) -> [..., N].

    Under an active sharding context (attention_head_sharding with a >1
    batch axis — DP encoder/scoring jits), rows shard over the mesh via
    shard_map: GSPMD treats a pallas_call as replicated and would
    all-gather the batch and compute it fully on every chip. The context
    read lives OUTSIDE the jitted body — a jit cache keyed only on
    shapes/statics must not capture it."""
    shard = _batch_shard()
    if shard is not None:
        k, n = qw.wq.shape
        batch_shape = x.shape[:-1]
        m = 1
        for s in batch_shape:
            m *= s
        mesh, bax, dp = shard
        if m > 0 and m % dp == 0:
            x2d = x.reshape(m, k)
            bias_row = (
                jnp.zeros((1, n), jnp.float32)
                if bias is None
                else bias.astype(jnp.float32).reshape(1, n)
            )

            def inner(x_, wq_, sc_, b_):
                return _int8_matmul_jit(
                    x_, QuantizedWeight(wq_, sc_), b_[0], activation=activation,
                    impl=impl, interpret=interpret, out_dtype=out_dtype,
                )

            out = _row_shard_map(
                mesh, bax, inner, (x2d,), (qw.wq, qw.scale, bias_row)
            )
            return out.reshape(*batch_shape, n)
    return _int8_matmul_jit(
        x, qw, bias, activation=activation, impl=impl, interpret=interpret,
        out_dtype=out_dtype,
    )


@functools.partial(
    jax.jit, static_argnames=("activation", "impl", "interpret", "out_dtype")
)
def _int8_matmul_jit(
    x: jax.Array,
    qw: QuantizedWeight,
    bias: Optional[jax.Array] = None,
    activation: str = "none",
    impl: str = "auto",
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    k, n = qw.wq.shape
    batch_shape = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, qw.wq.shape)
    m = 1
    for s in batch_shape:
        m *= s
    x2d = x.reshape(m, k)
    bias_row = (
        jnp.zeros((1, n), jnp.float32)
        if bias is None
        else bias.astype(jnp.float32).reshape(1, n)
    )

    use_pallas = impl == "pallas" or (
        impl == "auto"
        and m % BM == 0
        and k % 128 == 0
        and n % 128 == 0
        and (interpret or jax.default_backend() == "tpu")
        # The N-blocked schedule re-streams the weight once per 128-row
        # block; beyond a few blocks the XLA int8 dot (weight streamed
        # ONCE) wins — measured: int8 prefill at 3840 rows via the blocked
        # kernel made a 480-token generate SLOWER than bf16.
        and (_resident_ok(k, n) or m <= 4 * BM)
    )
    if not use_pallas:
        out = _int8_matmul_xla(x2d, qw, bias_row, activation, out_dtype)
        return out.reshape(*batch_shape, n)

    # forced impl="pallas" must not silently truncate: grid=(m // BM,)
    # leaves remainder rows unwritten
    assert m % BM == 0 and k % 128 == 0 and n % 128 == 0, (m, k, n)
    if _resident_ok(k, n):
        # whole weight resident across the m-steps (encoder-sized weights)
        out = pl.pallas_call(
            functools.partial(_int8_matmul_kernel, activation=activation),
            grid=(m // BM,),
            in_specs=[
                pl.BlockSpec((BM, k), lambda i: (i, 0)),
                pl.BlockSpec((k, n), lambda i: (0, 0)),   # resident across steps
                pl.BlockSpec((1, n), lambda i: (0, 0)),
                pl.BlockSpec((1, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BM, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            interpret=interpret,
        )(x2d, qw.wq, qw.scale, bias_row)
        return out.reshape(*batch_shape, n)

    # Reader-sized weights (e.g. 8192x2048, 2048x50304) exceed scoped VMEM:
    # block over N too — the x tile stays resident while [K, BN] weight
    # blocks stream (j is the fast grid axis). Smaller row block: the
    # kernel's in-VMEM f32 activation copy is the other big consumer.
    bn = _pick_bn(k, n)
    bm = 128
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, activation=activation),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(x2d, qw.wq, qw.scale, bias_row)
    return out.reshape(*batch_shape, n)


# Streamed weight-block budget: the [K, BN] int8 block (double-buffered)
# plus the f32 x tile and accumulator must fit the ~16 MB scoped VMEM.
_WEIGHT_VMEM_BUDGET = 2 << 20


def _resident_ok(k: int, n: int) -> bool:
    """Whole-weight-resident schedule fits scoped VMEM?

    Footprint model: int8 weight [K, N] + the x tile's bf16 load, f32 copy,
    and int8 quantized form (~6 bytes/elem at [BM, K]) + f32 accumulator
    and output (~8 bytes/elem at [BM, N]). Encoder-sized weights
    (768x3072) pass; reader-sized (8192x2048, vocab heads) stream instead.
    """
    return k * n + 6 * BM * k + 8 * BM * n <= 14 << 20


def _pick_bn(k: int, n: int) -> int:
    """Largest multiple-of-128 divisor of n with k * bn within budget."""
    best = 0
    cap = max(_WEIGHT_VMEM_BUDGET // k, 128)
    for bn in range(128, n + 1, 128):
        if n % bn == 0 and bn <= cap:
            best = bn
    return best or 128


def _batch_shard():
    """Active (mesh, batch_axis, dp) from attention_head_sharding, or None
    (lazy import: flash_attention does not import this module)."""
    from retrieval_scaling_tpu.ops.flash_attention import batch_shard_ctx

    return batch_shard_ctx()


def _row_shard_map(mesh, bax, inner, row_args, rep_args):
    """shard_map ``inner(*row_args, *rep_args)`` with the row args split
    over ``bax`` and the rest replicated — the shared shape of the DP
    wrappers below (GSPMD would replicate the pallas_call instead)."""
    P = jax.sharding.PartitionSpec
    specs = (P(bax, None),) * len(row_args) + (P(None, None),) * len(rep_args)
    return jax.shard_map(
        inner, mesh=mesh, in_specs=specs, out_specs=P(bax, None), check_vma=False
    )(*row_args, *rep_args)


def has_q8(store, name: str) -> bool:
    """True when ``store`` holds ``name`` quantized (int8 ``<name>@q8`` /
    ``<name>@s`` or int4 ``<name>@q4`` / ``<name>@s4g``) — produced by
    ``models.generate.quantize_decode_params``."""
    return f"{name}@q8" in store or f"{name}@q4" in store


def q8_dot(store, name: str, x: jax.Array, out_dtype=None) -> jax.Array:
    """x @ dequant(store[name]) for int8/int4-quantized weights.

    Routes by leading-dim size: decode shapes (rows <= M_DECODE) hit the
    weight-streaming kernel; prefill/scoring shapes hit the M-blocked
    kernel (or the XLA fallback). Weights column-padded at quantize time
    (``pad_cols_for_stream``) carry a ``<name>@padcols`` marker whose
    static SHAPE is the pad width; the pad columns are sliced back off
    here, on every route."""
    if f"{name}@q4" in store:
        qw4 = QuantizedWeight4(store[f"{name}@q4"], store[f"{name}@s4g"])
        out = int4_decode_matmul(x, qw4, out_dtype=out_dtype or x.dtype)
    else:
        qw = QuantizedWeight(store[f"{name}@q8"], store[f"{name}@s"])
        out = int8_decode_matmul(x, qw, out_dtype=out_dtype or x.dtype)
    pad_marker = store.get(f"{name}@padcols")
    if pad_marker is not None and pad_marker.shape[0]:
        out = out[..., : out.shape[-1] - pad_marker.shape[0]]
    return out


# --------------------------------------------------------------------------
# Small-batch weight-streaming matmul (autoregressive decode).
#
# At decode, matmuls are [B<=~32, K] x [K, N] — arithmetic intensity is so
# low that throughput equals weight bytes / HBM bandwidth. Storing weights
# int8 halves the bytes; the kernel streams [K, BN] int8 weight blocks
# while the tiny activations stay resident in VMEM.
#
# The dot runs on the *bf16* MXU path against the streamed int8 block
# (round-4 on-chip ablation, scripts/ablate_decode.py): every int8 value
# is exact in bf16 and products/sums are exact in the f32 accumulator, so
# x @ wq.astype(bf16) * scale EQUALS the dequantized-weight matmul — while
# the int8 x int8 -> int32 dot that previously consumed the stream capped
# the whole chain at ~300 GB/s effective at these M<=32 shapes. Dropping
# the in-kernel activation row-quantization also removes that error term
# entirely: decode int8 now has pure weight-RTN error. The int8 MXU's 2x
# rate still pays at prefill/scoring shapes (compute-bound), which keep
# the quantize-in-kernel int8-dot kernels above.
#
# Measured stream floors on chip (pure-DMA probes, round 4): int8 blocks
# DMA HBM->VMEM at ~520 GB/s, bf16 blocks at ~1030 GB/s — int8 halves the
# bytes but streams at half the byte rate, so its decode win over bf16
# comes from the downstream (VMEM/MXU) side, not the HBM read. Marginal
# pallas_call launch overhead is ~60 us (scripts/ablate_launch_overhead.py:
# 16 chained streaming calls = 1.90 ms vs the identical work in ONE call
# = 0.99 ms), which is why the decode path fuses launches aggressively.
# --------------------------------------------------------------------------

M_DECODE = 32    # resident activation rows (callers pad up)
# per-block weight bytes: big blocks amortize per-grid-step overhead and
# keep the DMA engine byte-fed (double-buffered: 2 blocks live in VMEM).
# Env-tunable for on-chip sweeps (scripts/bench_decode_quick.py).
DECODE_BLOCK_BYTES = int(os.environ.get("RST_DECODE_BLOCK_BYTES", 4 << 20))


def _pick_bn_decode(k: int, n: int, itemsize: int) -> int:
    """Largest multiple-of-128 divisor of n whose [K, bn] block stays
    within DECODE_BLOCK_BYTES."""
    cap = max(DECODE_BLOCK_BYTES // (k * itemsize), 128)
    best = 0
    for bn in range(128, min(n, cap) + 1, 128):
        if n % bn == 0:
            best = bn
    return best or 128


def pad_cols_for_stream(k: int, n: int, itemsize: int) -> int:
    """Columns to ADD to an [K, n] streamed decode weight so its width
    divides into full-cap blocks.

    Awkward widths wreck the stream: Pythia's 50304-col vocab head factors
    as 2^7*3*131, so the largest block divisor is 384 cols (0.79 MB int8)
    -> 131 grid steps whose per-block overhead dominates (measured: the
    head alone ran ~2.7x slower than its byte share). Padding to the next
    multiple of the cap (50304 -> 51200 at bn=2048) costs <2% extra bytes
    and restores full-size blocks. ``q8_dot`` slices the pad columns back
    off (see the ``@padcols`` marker in models.generate)."""
    cap = max(DECODE_BLOCK_BYTES // (k * itemsize), 128)
    bn_t = (cap // 128) * 128
    if n <= bn_t:
        # single-block weight: lane-align only
        return _round_up(n, 128) - n
    # never trade >5% extra stream bytes for block shape: shrink the
    # target block until the pad is cheap (128 always is: n % 128 pad)
    while bn_t > 128 and (_round_up(n, bn_t) - n) * 20 > n:
        bn_t = max(128, (bn_t // 2 // 128) * 128)
    return _round_up(n, bn_t) - n


def _w8_decode_kernel(x_ref, wq_ref, scale_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:], wq_ref[:].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [m_pad, BN] f32
    out_ref[:] = (acc * scale_ref[:]).astype(out_ref.dtype)


# Largest batch the weight-streaming kernel keeps resident; beyond this the
# M-blocked prefill kernel takes over (rows padded up to its BM).
M_DECODE_MAX = 128


def int8_decode_matmul(
    x: jax.Array,            # [..., K]
    qw: QuantizedWeight,     # wq [K, N], scale [1, N]
    impl: str = "auto",
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """x @ dequant(wq) for small leading dims (the decode hot path).

    NOT jitted itself: the prefill-sized routes delegate to int8_matmul,
    whose sharding-context read must stay outside any jit cache (a cached
    trace keyed only on shapes/statics would bake a stale shard/no-shard
    choice). The weight-streaming kernel path is its own jitted body."""
    k, n = qw.wq.shape
    batch_shape = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, qw.wq.shape)
    m = 1
    for s in batch_shape:
        m *= s
    x2d = x.reshape(m, k)

    aligned = k % 128 == 0 and n % 128 == 0
    on_tpu = interpret or jax.default_backend() == "tpu"
    use_decode = impl == "pallas" or (
        impl == "auto" and m <= M_DECODE_MAX and aligned and on_tpu
    )
    if not use_decode and qw.wq.dtype != jnp.int8:
        # bf16 2-D weights (scheme="bf16" re-layout) at prefill/scoring
        # sizes: a plain MXU dot — the int8_matmul fallbacks below would
        # rowquant-and-int8-dot a float weight
        out = (
            jnp.dot(
                x2d.astype(qw.wq.dtype), qw.wq, preferred_element_type=jnp.float32
            )
            * qw.scale
        ).astype(out_dtype)
        return out.reshape(*batch_shape, n)
    if not use_decode:
        if (
            impl == "auto" and aligned and on_tpu and m % BM != 0
            and (_resident_ok(k, n) or m <= 4 * BM)
        ):
            # ragged batches pad to the kernel's rows whenever the kernel
            # will actually run it well: resident weights stream once at
            # ANY m; non-resident (N-blocked) only up to ~4 row blocks
            # before the per-block weight re-stream loses to the XLA path
            x_pad = jnp.pad(x2d, ((0, _round_up(m, BM) - m), (0, 0)))
            out = int8_matmul(x_pad, qw, impl=impl, interpret=interpret, out_dtype=out_dtype)
            return out[:m].reshape(*batch_shape, n)
        out = int8_matmul(x2d, qw, impl=impl, interpret=interpret, out_dtype=out_dtype)
        return out.reshape(*batch_shape, n)
    return _int8_decode_stream_jit(
        x, qw, interpret=interpret, out_dtype=out_dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def _int8_decode_stream_jit(
    x: jax.Array,
    qw: QuantizedWeight,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """The weight-streaming decode kernel (replication under GSPMD is
    near-free here: the weight stream dominates and is per-chip either
    way, and the resident activations are tiny).

    Activations enter the bf16 dot as bf16 (the decode path's native
    dtype); the streamed block upcasts int8 -> bf16 on operand load."""
    k, n = qw.wq.shape
    batch_shape = x.shape[:-1]
    m = 1
    for s in batch_shape:
        m *= s
    x2d = x.reshape(m, k).astype(jnp.bfloat16)
    bn = _pick_bn_decode(k, n, qw.wq.dtype.itemsize)
    assert m <= M_DECODE_MAX and k % 128 == 0 and n % bn == 0, (m, k, n)
    m_pad = max(M_DECODE, _round_up(m, 32))  # sublane-aligned resident block
    x_pad = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _w8_decode_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0)),      # resident
            pl.BlockSpec((k, bn), lambda j: (0, j)),         # streamed
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
    )(x_pad, qw.wq, qw.scale)
    return out[:m].reshape(*batch_shape, n)


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


# --------------------------------------------------------------------------
# Fused decode streams (launch-count reduction).
#
# A pallas_call costs ~60 us marginal on chip (scripts/
# ablate_launch_overhead.py: 16 chained streaming calls = 1.90 ms vs the
# same work in ONE call = 0.99 ms), so the decode step fuses weight
# streams to cut launches per layer:
#
#   * N-concat, same input (Llama q|k|v, gate|up): just store the weights
#     column-concatenated — the ordinary q8_dot streams them as one call
#     and the caller splits the output columns.
#   * N-concat, TWO inputs (NeoX parallel-residual qkv|mlp_in, whose
#     inputs are ln1(x) and ln2(x)): ``q8_dual_in_dot`` stacks both
#     activation blocks in the resident rows and streams the concatenated
#     weight ONCE; each output slab keeps only its own input's rows. The
#     cross terms cost extra MXU work, which is ~free next to the stream.
#   * K-concat, two inputs summed (NeoX parallel-residual attn_out +
#     mlp_out, which the residual ADDS anyway): ``q8_splitk_dot`` streams
#     [Wa; Wb] row-concatenated and computes xa@Wa*sa + xb@Wb*sb per
#     block — the residual sum falls out of the kernel with exact
#     per-matrix scales.
# --------------------------------------------------------------------------


def _slice_padcols(store, name: str, out: jax.Array) -> jax.Array:
    pad_marker = store.get(f"{name}@padcols")
    if pad_marker is not None and pad_marker.shape[0]:
        out = out[..., : out.shape[-1] - pad_marker.shape[0]]
    return out


def q8_col_slice_dot(store, name: str, x: jax.Array, lo: int, hi: int, out_dtype=None) -> jax.Array:
    """x @ dequant(store[name][:, lo:hi]) — per-part access to an
    N-concat fused weight (prefill/scoring, where each projection is
    consumed separately; XLA fuses the slice into the dot)."""
    qw = QuantizedWeight(
        store[f"{name}@q8"][:, lo:hi], store[f"{name}@s"][:, lo:hi]
    )
    return int8_decode_matmul(x, qw, out_dtype=out_dtype or x.dtype)


def q8_row_part_dot(store, name: str, x: jax.Array, part: str, out_dtype=None) -> jax.Array:
    """x @ dequant(Wa or Wb) of a K-concat fused weight ([Wa; Wb] rows,
    scales ``@sa``/``@sb``). ``part="a"`` takes the first x.shape[-1]
    rows; ``part="b"`` the last."""
    wq = store[f"{name}@q8"]
    kx = x.shape[-1]
    if part == "a":
        qw = QuantizedWeight(wq[:kx], store[f"{name}@sa"])
    else:
        qw = QuantizedWeight(wq[wq.shape[0] - kx :], store[f"{name}@sb"])
    out = int8_decode_matmul(x, qw, out_dtype=out_dtype or x.dtype)
    return _slice_padcols(store, name, out)


def q8_dual_in_dot(store, name: str, x1: jax.Array, x2: jax.Array, n_split: int, out_dtype=None, interpret: bool = False):
    """(x1 @ W[:, :n_split], x2 @ W[:, n_split:]) with the N-concat fused
    weight streamed ONCE.

    Decode route: pad each input to the 32-row sublane block, stack
    [x1_pad; x2_pad] as the resident activations, one streaming call;
    slab rows 0..m-1 of columns [:n_split] are x1's projection, slab rows
    part..part+m-1 of columns [n_split:] are x2's. Prefill/scoring (or
    unaligned shapes) fall back to two column-slice dots."""
    wq = store[f"{name}@q8"]
    sc = store[f"{name}@s"]
    k, n = wq.shape
    batch_shape = x1.shape[:-1]
    assert x2.shape == x1.shape and x1.shape[-1] == k, (x1.shape, x2.shape, wq.shape)
    m = 1
    for s in batch_shape:
        m *= s
    dt = out_dtype or x1.dtype
    part = max(M_DECODE, _round_up(m, 32))
    on_tpu = interpret or jax.default_backend() == "tpu"
    if 2 * part <= M_DECODE_MAX and k % 128 == 0 and n % 128 == 0 and on_tpu:
        x1p = jnp.pad(x1.reshape(m, k), ((0, part - m), (0, 0)))
        x2p = jnp.pad(x2.reshape(m, k), ((0, part - m), (0, 0)))
        stack = jnp.concatenate([x1p, x2p], axis=0)          # [2*part, k]
        out = _int8_decode_stream_jit(stack, QuantizedWeight(wq, sc), out_dtype=dt, interpret=interpret)
        y1 = out[:m, :n_split].reshape(*batch_shape, n_split)
        y2 = out[part : part + m, n_split:].reshape(*batch_shape, n - n_split)
        pad_marker = store.get(f"{name}@padcols")
        if pad_marker is not None and pad_marker.shape[0]:
            y2 = y2[..., : y2.shape[-1] - pad_marker.shape[0]]
        return y1, y2
    y1 = q8_col_slice_dot(store, name, x1, 0, n_split, out_dtype=dt)
    y2 = q8_col_slice_dot(store, name, x2, n_split, n, out_dtype=dt)
    pad_marker = store.get(f"{name}@padcols")
    if pad_marker is not None and pad_marker.shape[0]:
        y2 = y2[..., : y2.shape[-1] - pad_marker.shape[0]]
    return y1, y2


def q8_splitk_dot(store, name: str, xa: jax.Array, xb: jax.Array, out_dtype=None, interpret: bool = False) -> jax.Array:
    """xa @ dequant(Wa) + xb @ dequant(Wb) with [Wa; Wb] streamed as ONE
    row-concatenated weight (store[name]@q8, scales ``@sa``/``@sb``).

    The split-K dual dot keeps exact per-matrix dequant scales; MXU work
    is identical to two separate dots. Fallback: two row-slice dots."""
    wq = store[f"{name}@q8"]
    sa, sb = store[f"{name}@sa"], store[f"{name}@sb"]
    k, n = wq.shape
    ka = xa.shape[-1]
    batch_shape = xa.shape[:-1]
    assert xb.shape[:-1] == batch_shape and ka + xb.shape[-1] == k
    m = 1
    for s in batch_shape:
        m *= s
    dt = out_dtype or xa.dtype
    on_tpu = interpret or jax.default_backend() == "tpu"
    aligned = ka % 128 == 0 and k % 128 == 0 and n % 128 == 0
    if m <= M_DECODE_MAX and aligned and on_tpu:
        x_cat = jnp.concatenate(
            [xa.reshape(m, ka), xb.reshape(m, k - ka)], axis=-1
        )
        out = _w8_splitk_stream_jit(x_cat, wq, sa, sb, ka=ka, out_dtype=dt, interpret=interpret)
        out = out.reshape(*batch_shape, n)
    else:
        ya = int8_decode_matmul(xa, QuantizedWeight(wq[:ka], sa), out_dtype=dt)
        yb = int8_decode_matmul(xb, QuantizedWeight(wq[ka:], sb), out_dtype=dt)
        out = (ya.astype(jnp.float32) + yb.astype(jnp.float32)).astype(dt)
    return _slice_padcols(store, name, out)


def _w8_splitk_kernel(x_ref, wq_ref, sa_ref, sb_ref, out_ref, *, ka):
    w = wq_ref[:].astype(x_ref.dtype)
    acc_a = jax.lax.dot_general(
        x_ref[:, :ka], w[:ka], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_b = jax.lax.dot_general(
        x_ref[:, ka:], w[ka:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (acc_a * sa_ref[:] + acc_b * sb_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ka", "out_dtype", "interpret"))
def _w8_splitk_stream_jit(x2d, wq, sa, sb, ka: int, out_dtype=jnp.bfloat16, interpret: bool = False):
    m, k = x2d.shape
    _, n = wq.shape
    bn = _pick_bn_decode(k, n, wq.dtype.itemsize)
    assert n % bn == 0, (n, bn)
    m_pad = max(M_DECODE, _round_up(m, 32))
    x_pad = jnp.pad(x2d.astype(jnp.bfloat16), ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_w8_splitk_kernel, ka=ka),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0)),      # resident
            pl.BlockSpec((k, bn), lambda j: (0, j)),         # streamed
            pl.BlockSpec((1, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
    )(x_pad, wq, sa, sb)
    return out[:m]


# --------------------------------------------------------------------------
# Fused projection + residual + LayerNorm (the transformer FFN tail).
#
# In-context, a bare int8 matmul gains nothing over XLA's bf16 matmul: XLA
# fuses the residual add and LayerNorm into the bf16 GEMM's neighborhood,
# and a pallas_call is a fusion barrier that forfeits exactly that. Folding
# the residual and LayerNorm INTO the epilogue removes two full activation
# round-trips through HBM and keeps the int8 MXU gain: measured 1.27x per
# BERT-base layer at 2048x256 on a v5e (row cosine vs bf16 > 0.9999).
# --------------------------------------------------------------------------


def _int8_res_ln_kernel(
    h_ref, x_ref, wq_ref, scale_ref, bias_ref, g_ref, b_ref, out_ref, *, eps
):
    h = h_ref[:].astype(jnp.float32)                      # [BM, N] (FFN hidden)
    hq, row_scale = _rowquant(h)
    acc = jax.lax.dot_general(
        hq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )                                                     # [BM, K]
    y = (
        acc.astype(jnp.float32) * row_scale * scale_ref[:]
        + bias_ref[:]
        + x_ref[:].astype(jnp.float32)
    )
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps) * g_ref[:] + b_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def _int8_res_ln_xla(h2d, x2d, qw, bias, ln_scale, ln_bias, eps):
    proj = _int8_matmul_xla(h2d, qw, bias, "none", jnp.float32)
    y = proj + x2d.astype(jnp.float32)
    mean = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=1, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    return out.astype(x2d.dtype)


def int8_matmul_residual_ln(
    h: jax.Array,            # [..., N] FFN hidden (bf16/f32)
    x: jax.Array,            # [..., K] residual input
    qw: QuantizedWeight,     # wq [N, K]
    bias: jax.Array,         # [K]
    ln_scale: jax.Array,     # [K]
    ln_bias: jax.Array,      # [K]
    eps: float = 1e-12,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm(x + dequant(int8dot(rowquant(h), wq)) + bias) -> [..., K].

    See int8_matmul: rows shard via shard_map under an active DP sharding
    context (the context read stays outside the jitted body)."""
    shard = _batch_shard()
    if shard is not None:
        n, k = qw.wq.shape
        batch_shape = x.shape[:-1]
        m = 1
        for s in batch_shape:
            m *= s
        mesh, bax, dp = shard
        if m > 0 and m % dp == 0:
            h2d, x2d = h.reshape(m, n), x.reshape(m, k)

            def inner(h_, x_, wq_, sc_, b_, g_, lb_):
                return _int8_res_ln_jit(
                    h_, x_, QuantizedWeight(wq_, sc_), b_[0], g_[0], lb_[0],
                    eps=eps, impl=impl, interpret=interpret,
                )

            out = _row_shard_map(
                mesh, bax, inner, (h2d, x2d),
                (
                    qw.wq, qw.scale,
                    bias.astype(jnp.float32).reshape(1, k),
                    ln_scale.astype(jnp.float32).reshape(1, k),
                    ln_bias.astype(jnp.float32).reshape(1, k),
                ),
            )
            return out.reshape(*batch_shape, k)
    return _int8_res_ln_jit(
        h, x, qw, bias, ln_scale, ln_bias, eps=eps, impl=impl, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("eps", "impl", "interpret"))
def _int8_res_ln_jit(
    h: jax.Array,
    x: jax.Array,
    qw: QuantizedWeight,
    bias: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    eps: float = 1e-12,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    n, k = qw.wq.shape
    batch_shape = x.shape[:-1]
    assert h.shape[:-1] == batch_shape and h.shape[-1] == n and x.shape[-1] == k
    m = 1
    for s in batch_shape:
        m *= s
    h2d, x2d = h.reshape(m, n), x.reshape(m, k)
    bias_row = bias.astype(jnp.float32).reshape(1, k)
    g_row = ln_scale.astype(jnp.float32).reshape(1, k)
    b_row = ln_bias.astype(jnp.float32).reshape(1, k)

    use_pallas = impl == "pallas" or (
        impl == "auto"
        and m % BM == 0
        and k % 128 == 0
        and n % 128 == 0
        and (interpret or jax.default_backend() == "tpu")
        # the kernel holds the whole [N, K] weight resident in VMEM; fall
        # back to XLA for reader-sized weights that would overflow it
        and _resident_ok(n, k)
    )
    if not use_pallas:
        out = _int8_res_ln_xla(h2d, x2d, qw, bias_row, g_row, b_row, eps)
        return out.reshape(*batch_shape, k)

    assert m % BM == 0 and k % 128 == 0 and n % 128 == 0, (m, k, n)
    out = pl.pallas_call(
        functools.partial(_int8_res_ln_kernel, eps=eps),
        grid=(m // BM,),
        in_specs=[
            pl.BlockSpec((BM, n), lambda i: (i, 0)),
            pl.BlockSpec((BM, k), lambda i: (i, 0)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        interpret=interpret,
    )(h2d, x2d, qw.wq, qw.scale, bias_row, g_row, b_row)
    return out.reshape(*batch_shape, k)


# --------------------------------------------------------------------------
# Int4 weight-only matmul (decode weight streaming, group-128 scales).
#
# Halves the decode weight stream AGAIN over int8. Symmetric 4-bit values
# in [-7, 7] stored as offset-by-8 nibbles, two per byte along K (low nibble =
# top half rows, high = bottom half); scales
# are per (K-group of 128, output channel) — plain per-channel int4 is too
# lossy for transformer weights, group-128 RTN is the standard recipe.
# --------------------------------------------------------------------------
INT4_GROUP = 128


class QuantizedWeight4(NamedTuple):
    packed: jax.Array   # [K//2, N] uint8 (low nibble = row k, high = row k + K/2)
    scale: jax.Array    # [K//INT4_GROUP, N] f32


def quantize_weight_int4(w: jax.Array) -> QuantizedWeight4:
    """[K, N] float -> group-128 symmetric int4, nibble-packed along K."""
    k, n = w.shape
    assert k % INT4_GROUP == 0, k
    wf = w.astype(jnp.float32).reshape(k // INT4_GROUP, INT4_GROUP, n)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-12)  # [G, N]
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7).reshape(k, n)
    offs = (q + 8).astype(jnp.uint8)
    # pack TOP/BOTTOM halves (not adjacent rows): unpacking is then a
    # rank-2 concat — an interleaving stack's [K/2, 2, N] intermediate
    # gets its 2-sublane dim padded to 32 in VMEM (16x blowup)
    lo = offs[: k // 2]
    hi = offs[k // 2 :]
    return QuantizedWeight4((lo | (hi << 4)).astype(jnp.uint8), scale)


def _int4_unpack(packed: jax.Array) -> jax.Array:
    """[K//2, N] uint8 -> [K, N] int8 in [-7, 7] (top/bottom-half layout).

    Arithmetic runs in int32 — Mosaic does not legalize sub/shift on
    8-bit vectors (`arith.subi` legalization failure on chip)."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.int8)
    hi = ((p32 >> 4) - 8).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def _int4_dot(xq: jax.Array, row_scale: jax.Array, packed: jax.Array, scale: jax.Array):
    """dequant(int4) matmul with per-group weight scales.

    xq [M, K] int8 (row-quantized activations), row_scale [M, 1] f32;
    packed [K//2, N], scale [K//G, N]. Returns [M, N] f32.
    """
    k = xq.shape[1]
    w = _int4_unpack(packed)                               # [K, N] int8
    groups = k // INT4_GROUP
    # unrolled per-group dots: Mosaic does not lower batched dot_general
    acc = jnp.zeros((xq.shape[0], w.shape[1]), jnp.float32)
    for g in range(groups):
        sl = slice(g * INT4_GROUP, (g + 1) * INT4_GROUP)
        part = jax.lax.dot_general(
            xq[:, sl], w[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * scale[g][None, :]
    return acc * row_scale


def _int4_decode_kernel(x_ref, packed_ref, scale_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    xq, row_scale = _rowquant(x)
    out_ref[:] = _int4_dot(xq, row_scale, packed_ref[:], scale_ref[:]).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def int4_decode_matmul(
    x: jax.Array,             # [..., K]
    qw: QuantizedWeight4,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """x @ dequant(int4 weight): weight-streaming kernel for small leading
    dims; XLA fallback (unpack + grouped dots) elsewhere."""
    k2, n = qw.packed.shape
    k = 2 * k2
    batch_shape = x.shape[:-1]
    assert x.shape[-1] == k, (x.shape, qw.packed.shape)
    m = 1
    for s in batch_shape:
        m *= s
    x2d = x.reshape(m, k)

    # 128-wide blocks: the in-kernel int32 unpack intermediates put a
    # 256-wide block just past the scoped-VMEM limit at K=2048
    bn = 128
    use_kernel = (
        m <= M_DECODE_MAX and k % 256 == 0 and n % bn == 0
        and (interpret or jax.default_backend() == "tpu")
    )
    if not use_kernel:
        xq, row_scale = _rowquant(x2d.astype(jnp.float32))
        out = _int4_dot(xq, row_scale, qw.packed, qw.scale).astype(out_dtype)
        return out.reshape(*batch_shape, n)

    m_pad = max(M_DECODE, -(-m // 32) * 32)
    x_pad = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _int4_decode_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m_pad, k), lambda j: (0, 0)),          # resident
            pl.BlockSpec((k2, bn), lambda j: (0, j)),            # streamed nibbles
            pl.BlockSpec((k // INT4_GROUP, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        interpret=interpret,
    )(x_pad, qw.packed, qw.scale)
    return out[:m].reshape(*batch_shape, n)
