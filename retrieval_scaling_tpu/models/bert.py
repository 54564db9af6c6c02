"""BERT encoder (Contriever) as a pure-functional JAX model.

TPU-native re-design of the reference's Contriever retriever
(reference: contriever/src/contriever.py:11-56 — a ``BertModel`` subclass
with masked mean pooling). Design choices for the MXU:

  * Parameters are a plain pytree of arrays; the forward pass is a jittable
    function ``bert_encode(params, cfg, input_ids, attention_mask)`` — pjit
    shards it with no framework machinery.
  * Q/K/V projections are fused into one ``[d, 3, H, hd]`` matmul; bf16
    activations with f32 layernorm statistics.
  * Attention dispatches to the Pallas flash kernel on TPU
    (``ops/flash_attention.py``) and XLA elsewhere.

Pooling parity: ``mean`` = attention-masked token average (Contriever),
``cls`` = first token (generic HF encoders, reference: src/embed.py:77-79).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.ops.flash_attention import multi_head_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pooling: str = "mean"  # "mean" (contriever) | "cls"
    attention_impl: str = "auto"
    # gelu flavor: "exact" (erf — HF BertIntermediate), "tanh", or "auto".
    # "auto" uses tanh when activations are bf16: the tanh approximation's
    # ~1e-3 error is below bf16 quantization noise (~4e-3), and the exact
    # erf costs ~190 ms/2048x256 batch on a v5e (24% of the forward).
    gelu: str = "auto"
    # RoBERTa/XLM-R (the reference's XLMRetriever variant, reference:
    # contriever/src/contriever.py:58-100): positions are pad-offset —
    # position_id = cumsum(mask) * mask + padding_idx (padding_idx = 1).
    roberta_position_ids: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def init_bert_params(cfg: BertConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random initialization (for tests and training-from-scratch)."""
    k_iter = iter(jax.random.split(key, 6 + 16 * cfg.num_layers))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    d, hh, hd, ff = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": dense((cfg.vocab_size, d)),
            "position": dense((cfg.max_position_embeddings, d)),
            "token_type": dense((cfg.type_vocab_size, d)),
            "ln_scale": jnp.ones((d,), dtype),
            "ln_bias": jnp.zeros((d,), dtype),
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "qkv_w": dense((d, 3, hh, hd)),
                "qkv_b": jnp.zeros((3, hh, hd), dtype),
                "attn_out_w": dense((hh, hd, d)),
                "attn_out_b": jnp.zeros((d,), dtype),
                "attn_ln_scale": jnp.ones((d,), dtype),
                "attn_ln_bias": jnp.zeros((d,), dtype),
                "mlp_in_w": dense((d, ff)),
                "mlp_in_b": jnp.zeros((ff,), dtype),
                "mlp_out_w": dense((ff, d)),
                "mlp_out_b": jnp.zeros((d,), dtype),
                "mlp_ln_scale": jnp.ones((d,), dtype),
                "mlp_ln_bias": jnp.zeros((d,), dtype),
            }
        )
    return params


def quantize_bert_params(params: Params) -> Params:
    """FFN weight quantization for the int8 MXU path.

    The two MLP weights (2/3 of the per-layer GEMM FLOPs) are replaced by
    per-output-channel symmetric int8 pairs (``*_wq`` int8 [K, N], ``*_ws``
    f32 [1, N]); biases and layernorms stay float. ``_bert_layer`` detects
    the quantized keys and routes the FFN through the fused Pallas kernels
    in ``ops/quant_matmul.py`` (quantize + int8 dot + gelu, then quantize +
    int8 dot + residual + LayerNorm) — measured 1.27x per layer at
    2048x256 on a v5e with row cosine vs bf16 > 0.9999.

    QKV and the attention output projection deliberately stay bf16: as
    Pallas calls they lose XLA's transpose/fusion around the attention
    kernel and measure net-negative (101.8 vs 58.3 ms/layer on chip).
    """
    from retrieval_scaling_tpu.ops.quant_matmul import quantize_weight

    out = {"embeddings": params["embeddings"], "layers": []}
    for layer in params["layers"]:
        new = {k: v for k, v in layer.items()
               if k not in ("mlp_in_w", "mlp_out_w")}
        for key, w2d in (
            ("mlp_in", layer["mlp_in_w"]),
            ("mlp_out", layer["mlp_out_w"]),
        ):
            qw = quantize_weight(w2d)
            new[f"{key}_wq"], new[f"{key}_ws"] = qw.wq, qw.scale
        out["layers"].append(new)
    return out


def bert_encode(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,       # [B, S] int32
    attention_mask: jax.Array,  # [B, S] (1 = token, 0 = pad)
    token_type_ids: jax.Array | None = None,
    position_ids: jax.Array | None = None,   # [B, S] (packed: restart per segment)
    segment_ids: jax.Array | None = None,    # [B, S] (packed: block-diag attention)
) -> jax.Array:
    """Return the last hidden state [B, S, D]."""
    b, s = input_ids.shape
    emb = params["embeddings"]
    x = emb["word"][input_ids]
    if position_ids is not None:
        x = x + emb["position"][position_ids]
    elif cfg.roberta_position_ids:
        pos_ids = jnp.cumsum(attention_mask, axis=1) * attention_mask + 1
        x = x + emb["position"][pos_ids]
    else:
        x = x + emb["position"][None, :s, :]
    if token_type_ids is None:
        x = x + emb["token_type"][0][None, None, :]
    else:
        x = x + emb["token_type"][token_type_ids]
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)

    kv_mask = attention_mask.astype(bool)

    for layer in params["layers"]:
        x = _bert_layer(layer, cfg, x, kv_mask, segment_ids=segment_ids)
    return x


def _bert_layer(layer: Params, cfg: BertConfig, x: jax.Array, kv_mask: jax.Array, segment_ids=None) -> jax.Array:
    if "mlp_in_wq" in layer:
        return _bert_layer_int8(layer, cfg, x, kv_mask, segment_ids=segment_ids)
    b, s, d = x.shape
    qkv = (
        jnp.einsum("bsd,dtnk->bstnk", x, layer["qkv_w"]) + layer["qkv_b"][None, None]
    )  # [B, S, 3, H, hd]
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))  # [B, H, S, hd]

    attn = multi_head_attention(
        q, k, v, kv_mask=kv_mask, impl=cfg.attention_impl, segment_ids=segment_ids
    )
    attn_out = jnp.einsum("bhsk,hkd->bsd", attn, layer["attn_out_w"]) + layer["attn_out_b"]
    x = _layer_norm(x + attn_out, layer["attn_ln_scale"], layer["attn_ln_bias"], cfg.layer_norm_eps)

    h = jnp.dot(x, layer["mlp_in_w"]) + layer["mlp_in_b"]
    approx = cfg.gelu == "tanh" or (cfg.gelu == "auto" and h.dtype == jnp.bfloat16)
    h = jax.nn.gelu(h, approximate=approx)
    h = jnp.dot(h, layer["mlp_out_w"]) + layer["mlp_out_b"]
    x = _layer_norm(x + h, layer["mlp_ln_scale"], layer["mlp_ln_bias"], cfg.layer_norm_eps)
    return x


def _bert_layer_int8(layer: Params, cfg: BertConfig, x: jax.Array, kv_mask: jax.Array, segment_ids=None) -> jax.Array:
    """Transformer layer with the int8 FFN (weights from ``quantize_bert_params``).

    Attention (QKV, scores, output projection, attention LayerNorm) is the
    bf16 ``_bert_layer`` dataflow — XLA's fusion there beats int8 Pallas
    calls. The FFN runs on the int8 MXU with per-row dynamic activation
    scales: gelu fused into the mlp_in epilogue, residual + LayerNorm fused
    into the mlp_out epilogue (``int8_matmul_residual_ln``).
    """
    from retrieval_scaling_tpu.ops.quant_matmul import (
        QuantizedWeight,
        int8_matmul,
        int8_matmul_residual_ln,
    )

    b, s, d = x.shape
    qkv = (
        jnp.einsum("bsd,dtnk->bstnk", x, layer["qkv_w"]) + layer["qkv_b"][None, None]
    )
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))  # [B, H, S, hd]

    attn = multi_head_attention(
        q, k, v, kv_mask=kv_mask, impl=cfg.attention_impl, segment_ids=segment_ids
    )
    attn_out = jnp.einsum("bhsk,hkd->bsd", attn, layer["attn_out_w"]) + layer["attn_out_b"]
    x = _layer_norm(x + attn_out, layer["attn_ln_scale"], layer["attn_ln_bias"], cfg.layer_norm_eps)

    approx = cfg.gelu == "tanh" or (cfg.gelu == "auto" and x.dtype == jnp.bfloat16)
    h = int8_matmul(
        x,
        QuantizedWeight(layer["mlp_in_wq"], layer["mlp_in_ws"]),
        layer["mlp_in_b"],
        activation="gelu_tanh" if approx else "gelu_exact",
        out_dtype=x.dtype,
    )
    return int8_matmul_residual_ln(
        h,
        x,
        QuantizedWeight(layer["mlp_out_wq"], layer["mlp_out_ws"]),
        layer["mlp_out_b"],
        layer["mlp_ln_scale"],
        layer["mlp_ln_bias"],
        eps=cfg.layer_norm_eps,
    )


def pool_embeddings(
    hidden: jax.Array, attention_mask: jax.Array, pooling: str
) -> jax.Array:
    if pooling == "mean":
        mask = attention_mask[..., None].astype(hidden.dtype)
        summed = jnp.sum(hidden * mask, axis=1)
        counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
        return summed / counts
    if pooling == "cls":
        return hidden[:, 0, :]
    raise ValueError(f"Unknown pooling: {pooling!r}")


def contriever_embed(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    normalize: bool = False,
) -> jax.Array:
    """Passage/query embedding: encode + pool (+ optional L2 normalize).

    Matches ``Contriever.forward`` (reference: contriever/src/contriever.py:29-56).
    """
    hidden = bert_encode(params, cfg, input_ids, attention_mask)
    emb = pool_embeddings(hidden, attention_mask, cfg.pooling)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def contriever_embed_packed(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,      # [B, S] packed rows (pad id beyond last segment)
    position_ids: jax.Array,   # [B, S] restart at 0 per segment
    segment_ids: jax.Array,    # [B, S] 1..G per segment, 0 = pad
    seg_starts: jax.Array,     # [B, G] first-token index of each segment
    normalize: bool = False,
) -> jax.Array:
    """Packed-sequence embedding: many passages per row -> [B, G, D].

    TPU rationale: bucketed batching still pays pad waste inside each
    bucket and rounds lengths up to powers of two; packing fills every
    row to exactly ``S`` real tokens, so the encoder runs one compiled
    shape at ~100% token occupancy. Attention is block-diagonal via
    ``segment_ids`` (tokens never see a neighboring passage); positions
    restart per segment, so each passage computes exactly what it would
    alone. Per-segment pooling is a [B, S, G] one-hot matmul (MXU-friendly
    segment-sum). Rows beyond a row's last segment pool over an empty set
    and are dropped by the caller via its (row, segment) mapping.

    Reference analog: none — the reference pads every batch to max length
    (src/embed.py:59-92); this is TPU-specific headroom.
    """
    hidden = bert_encode(
        params, cfg, input_ids,
        attention_mask=(segment_ids > 0).astype(jnp.int32),
        position_ids=position_ids, segment_ids=segment_ids,
    )  # [B, S, D]
    g = seg_starts.shape[1]
    if cfg.pooling == "mean":
        onehot = (
            segment_ids[:, :, None] == (1 + jnp.arange(g))[None, None, :]
        ).astype(hidden.dtype)  # [B, S, G]
        summed = jnp.einsum("bsd,bsg->bgd", hidden, onehot)
        counts = jnp.clip(jnp.sum(onehot, axis=1), 1e-9, None)  # [B, G]
        emb = summed / counts[..., None]
    elif cfg.pooling == "cls":
        emb = jnp.take_along_axis(hidden, seg_starts[..., None], axis=1)  # [B, G, D]
    else:
        raise ValueError(f"Unknown pooling: {cfg.pooling!r}")
    if normalize:
        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
        emb = (emb.astype(jnp.float32) / jnp.clip(norm, 1e-9, None)).astype(emb.dtype)
    return emb
