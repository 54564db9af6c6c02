"""T5 encoder stack for sentence-transformers retrievers (GTR-T5 family).

The reference supports sentence-transformers dense retrievers such as
``sentence-transformers/gtr-t5-base`` (reference: README.md:197-208,
src/embed.py:24-41 SentenceTransformer branch). GTR = a T5 encoder with
mean pooling, an optional linear projection, and L2 normalization.

Architecture notes (vs BERT):
  * RMS layer norm (no mean subtraction, no bias), pre-norm residual blocks.
  * No absolute position embeddings; a bucketed relative-position bias is
    added to attention scores. The bias table lives on the first layer and
    is shared by all layers (HF ``has_relative_attention_bias`` on block 0).
  * Attention scores are NOT scaled by 1/sqrt(d) (folded into init).
  * FFN is ReLU wi/wo (t5 v1.0) or gated-GELU wi_0/wi_1 (v1.1 / flan).

Attention uses XLA with the additive bias (sequences are <=512 here; the
bias term rules out the current Pallas kernel, which takes masks only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    hidden_size: int = 768        # d_model
    num_layers: int = 12
    num_heads: int = 12
    head_dim: int = 64            # d_kv (NOT hidden/heads in general)
    intermediate_size: int = 3072  # d_ff
    relative_buckets: int = 32
    relative_max_distance: int = 128
    rms_eps: float = 1e-6
    gated_act: bool = False       # v1.1 gated-gelu vs v1.0 relu
    projection_dim: int | None = None  # sentence-transformers Dense module


def _rms_norm(x, scale, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> jax.Array:
    """HF T5 bidirectional relative-position bucketing. [q_len, k_len] int32."""
    ctx = jnp.arange(q_len, dtype=jnp.int32)[:, None]
    mem = jnp.arange(k_len, dtype=jnp.int32)[None, :]
    rel = mem - ctx                                        # relative_position
    half = num_buckets // 2
    bucket = jnp.where(rel > 0, half, 0)
    n = jnp.abs(rel)
    max_exact = half // 2
    is_small = n < max_exact
    log_ratio = jnp.log(n.astype(jnp.float32) / max_exact + 1e-9) / jnp.log(
        max_distance / max_exact
    )
    large = max_exact + (log_ratio * (half - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, half - 1)
    return bucket + jnp.where(is_small, n, large)


def init_t5_encoder_params(cfg: T5EncoderConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k_iter = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    d, h, hd, ff = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size
    params: Params = {
        "embed": dense((cfg.vocab_size, d)),
        "rel_bias": dense((cfg.relative_buckets, h), scale=0.1),
        "final_norm": jnp.ones((d,), dtype),
        "layers": [],
    }
    if cfg.projection_dim:
        params["projection"] = dense((d, cfg.projection_dim))
    for _ in range(cfg.num_layers):
        layer = {
            "attn_norm": jnp.ones((d,), dtype),
            "q_w": dense((d, h, hd)),
            "k_w": dense((d, h, hd)),
            "v_w": dense((d, h, hd)),
            "o_w": dense((h, hd, d)),
            "ffn_norm": jnp.ones((d,), dtype),
            "wo": dense((ff, d)),
        }
        if cfg.gated_act:
            layer["wi_0"] = dense((d, ff))
            layer["wi_1"] = dense((d, ff))
        else:
            layer["wi"] = dense((d, ff))
        params["layers"].append(layer)
    return params


def t5_encode(
    params: Params,
    cfg: T5EncoderConfig,
    input_ids: jax.Array,       # [B, S]
    attention_mask: jax.Array,  # [B, S] 1 = token
) -> jax.Array:
    """Last hidden state [B, S, D] (final RMS-norm applied, HF parity)."""
    s = input_ids.shape[1]
    x = params["embed"][input_ids]

    buckets = relative_position_buckets(
        s, s, cfg.relative_buckets, cfg.relative_max_distance
    )
    pos_bias = params["rel_bias"][buckets].astype(jnp.float32)  # [S, S, H]
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]         # [1, H, S, S]
    key_ok = attention_mask[:, None, None, :].astype(bool)

    for layer in params["layers"]:
        h = _rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = jnp.einsum("bsd,dnk->bnsk", h, layer["q_w"])
        k = jnp.einsum("bsd,dnk->bnsk", h, layer["k_w"])
        v = jnp.einsum("bsd,dnk->bnsk", h, layer["v_w"])
        scores = jnp.einsum("bnqk,bnmk->bnqm", q, k, preferred_element_type=jnp.float32)
        scores = scores + pos_bias                               # T5: no 1/sqrt(d)
        scores = jnp.where(key_ok, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnqm,bnmk->bnqk", probs, v)
        x = x + jnp.einsum("bnsk,nkd->bsd", attn, layer["o_w"])

        h = _rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        if cfg.gated_act:
            inner = jax.nn.gelu(jnp.dot(h, layer["wi_0"]), approximate=True) * jnp.dot(
                h, layer["wi_1"]
            )
        else:
            inner = jax.nn.relu(jnp.dot(h, layer["wi"]))
        x = x + jnp.dot(inner, layer["wo"])

    return _rms_norm(x, params["final_norm"], cfg.rms_eps)


def t5_embed(
    params: Params,
    cfg: T5EncoderConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    normalize: bool = True,
) -> jax.Array:
    """GTR-style embedding: mean pool -> optional projection -> L2 norm."""
    hidden = t5_encode(params, cfg, input_ids, attention_mask)
    maskf = attention_mask[..., None].astype(hidden.dtype)
    emb = jnp.sum(hidden * maskf, axis=1) / jnp.clip(jnp.sum(maskf, axis=1), 1e-9, None)
    if "projection" in params:
        emb = jnp.dot(emb, params["projection"])
    if normalize:
        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
        emb = (emb.astype(jnp.float32) / jnp.clip(norm, 1e-9, None)).astype(emb.dtype)
    return emb
