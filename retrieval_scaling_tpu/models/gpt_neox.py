"""GPT-NeoX (Pythia) causal reader LM as a pure-functional JAX model.

The reference evaluates perplexity with HF ``AutoModelForCausalLM`` readers
(EleutherAI/pythia-*, reference: src/evaluate_perplexity.py:97-108,
ric/conf/default.yaml:20). This is a TPU-first reimplementation:

  * Parallel-residual blocks (``x + attn(ln1(x)) + mlp(ln2(x))``), partial
    rotary embeddings (``rotary_pct``), untied input/output embeddings —
    the GPT-NeoX architecture.
  * Causal attention via the Pallas flash kernel on TPU.
  * Loss masking follows the reference contract: label positions equal to
    ``-100`` are excluded (reference: src/evaluate_perplexity.py:119-124).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.ops.flash_attention import multi_head_attention

Params = Dict[str, Any]
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class GPTNeoXConfig:
    vocab_size: int = 50304
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 8
    intermediate_size: int = 8192
    max_position_embeddings: int = 2048
    rotary_pct: float = 0.25
    rotary_base: float = 10000.0
    layer_norm_eps: float = 1e-5
    use_parallel_residual: bool = True
    attention_impl: str = "auto"
    # GPT-2 / OPT deltas (the classic reader baselines): learned absolute
    # position embeddings (``pos_embed`` param) instead of rotary — OPT
    # offsets the position index by 2 — and the MLP activation flavor.
    learned_positions: bool = False
    position_offset: int = 0
    gelu: str = "exact"  # "exact" (GPT-NeoX erf) | "tanh" (GPT-2) | "relu" (OPT)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dims(self) -> int:
        return int(self.head_dim * self.rotary_pct)


def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def init_gpt_neox_params(cfg: GPTNeoXConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k_iter = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    d, hh, hd, ff = cfg.hidden_size, cfg.num_heads, cfg.head_dim, cfg.intermediate_size
    params: Params = {
        "embed_in": dense((cfg.vocab_size, d)),
        "final_ln_scale": jnp.ones((d,), dtype),
        "final_ln_bias": jnp.zeros((d,), dtype),
        "embed_out": dense((d, cfg.vocab_size)),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln1_scale": jnp.ones((d,), dtype),
                "ln1_bias": jnp.zeros((d,), dtype),
                "qkv_w": dense((d, 3, hh, hd)),
                "qkv_b": jnp.zeros((3, hh, hd), dtype),
                "attn_out_w": dense((hh, hd, d)),
                "attn_out_b": jnp.zeros((d,), dtype),
                "ln2_scale": jnp.ones((d,), dtype),
                "ln2_bias": jnp.zeros((d,), dtype),
                "mlp_in_w": dense((d, ff)),
                "mlp_in_b": jnp.zeros((ff,), dtype),
                "mlp_out_w": dense((ff, d)),
                "mlp_out_b": jnp.zeros((d,), dtype),
            }
        )
    return params


def _rotary_cos_sin(seq_len: int, dims: int, base: float, dtype) -> Tuple[jax.Array, jax.Array]:
    inv_freq = 1.0 / (base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                      # [S, dims/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # [S, dims] (HF layout)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF-style rotate-half rotary. x: [B, H, S, rot_dims]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, None] + rotated * sin[None, None]


def neox_qkv(layer: Params, cfg: GPTNeoXConfig, ln1: jax.Array):
    """Fused QKV projection -> (q, k, v) each [B, H, S, hd] (float or int8)."""
    from retrieval_scaling_tpu.ops.quant_matmul import (
        has_q8,
        q8_col_slice_dot,
        q8_dot,
    )

    b, s, _ = ln1.shape
    if "qkv_mi@q8" in layer:
        # launch-fused qkv|mlp_in storage (quantize_decode_params): the
        # scoring path takes the qkv column span; decode takes the whole
        # stream via q8_dual_in_dot in models.generate
        nqkv = 3 * cfg.num_heads * cfg.head_dim
        qkv = q8_col_slice_dot(layer, "qkv_mi", ln1, 0, nqkv)
        qkv = qkv.reshape(b, s, 3, cfg.num_heads, cfg.head_dim) + layer["qkv_b"][None, None]
    elif has_q8(layer, "qkv_w"):
        qkv = q8_dot(layer, "qkv_w", ln1).reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
        qkv = qkv + layer["qkv_b"][None, None]
    else:
        qkv = jnp.einsum("bsd,dtnk->bstnk", ln1, layer["qkv_w"]) + layer["qkv_b"][None, None]
    return tuple(jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))


def neox_attn_out(layer: Params, attn: jax.Array) -> jax.Array:
    """Output projection: attn [B, H, S, hd] -> [B, S, D] (float or int8)."""
    from retrieval_scaling_tpu.ops.quant_matmul import (
        has_q8,
        q8_dot,
        q8_row_part_dot,
    )

    if "ao_mo@q8" in layer:
        b, h, s, hd = attn.shape
        flat = jnp.moveaxis(attn, 1, 2).reshape(b, s, h * hd)
        return q8_row_part_dot(layer, "ao_mo", flat, "a") + layer["attn_out_b"]
    if has_q8(layer, "attn_out_w"):
        b, h, s, hd = attn.shape
        flat = jnp.moveaxis(attn, 1, 2).reshape(b, s, h * hd)
        return q8_dot(layer, "attn_out_w", flat) + layer["attn_out_b"]
    return jnp.einsum("bhsk,hkd->bsd", attn, layer["attn_out_w"]) + layer["attn_out_b"]


def _mlp_act(h: jax.Array, act) -> jax.Array:
    if act == "relu":  # OPT
        return jax.nn.relu(h)
    return jax.nn.gelu(h, approximate=bool(act is True or act == "tanh"))


def neox_mlp(layer: Params, inp: jax.Array, act="exact") -> jax.Array:
    """MLP (float or int8 weights); ``act``: exact gelu | "tanh" | "relu".

    With launch-fused ``qkv_mi`` storage the mlp_in column offset is
    derived from the stored qkv bias (= 3 * heads * head_dim) — never
    passed by callers, so it cannot be wrong."""
    from retrieval_scaling_tpu.ops.quant_matmul import (
        has_q8,
        q8_col_slice_dot,
        q8_dot,
        q8_row_part_dot,
    )

    if "qkv_mi@q8" in layer:
        qkv_cols = layer["qkv_b"].size  # [3, H, hd] bias spans the qkv columns
        n_total = layer["qkv_mi@q8"].shape[1]
        pad_marker = layer.get("qkv_mi@padcols")
        if pad_marker is not None:
            n_total -= pad_marker.shape[0]
        h = q8_col_slice_dot(layer, "qkv_mi", inp, qkv_cols, n_total) + layer["mlp_in_b"]
        h = _mlp_act(h, act)
        return q8_row_part_dot(layer, "ao_mo", h, "b") + layer["mlp_out_b"]
    if has_q8(layer, "mlp_in_w"):
        h = q8_dot(layer, "mlp_in_w", inp) + layer["mlp_in_b"]
        h = _mlp_act(h, act)
        return q8_dot(layer, "mlp_out_w", h) + layer["mlp_out_b"]
    h = jnp.dot(inp, layer["mlp_in_w"]) + layer["mlp_in_b"]
    h = _mlp_act(h, act)
    return jnp.dot(h, layer["mlp_out_w"]) + layer["mlp_out_b"]


def neox_logits(params: Params, x: jax.Array) -> jax.Array:
    """Final-hidden -> vocab logits in f32 (float or int8 head)."""
    from retrieval_scaling_tpu.ops.quant_matmul import has_q8, q8_dot

    if has_q8(params, "embed_out"):
        return q8_dot(params, "embed_out", x, out_dtype=jnp.float32)
    return jnp.dot(x, params["embed_out"], preferred_element_type=jnp.float32)


def gpt_neox_forward(
    params: Params,
    cfg: GPTNeoXConfig,
    input_ids: jax.Array,  # [B, S]
    return_hidden: bool = False,
) -> jax.Array:
    """Return logits [B, S, V] (or the final-LN hidden states when
    ``return_hidden`` — used by profiling ablations and the blockwise
    loss path, which applies the vocab head per sequence block)."""
    b, s = input_ids.shape
    x = params["embed_in"][input_ids]
    if cfg.learned_positions:
        off = cfg.position_offset
        x = x + params["pos_embed"][None, off : s + off, :]
    rot = cfg.rotary_dims
    cos, sin = _rotary_cos_sin(s, max(rot, 2), cfg.rotary_base, jnp.float32)
    act = cfg.gelu

    for layer in params["layers"]:
        ln1 = _layer_norm(x, layer["ln1_scale"], layer["ln1_bias"], cfg.layer_norm_eps)
        q, k, v = neox_qkv(layer, cfg, ln1)  # [B, H, S, hd]

        if rot > 0:
            q = jnp.concatenate(
                [_apply_rotary(q[..., :rot].astype(jnp.float32), cos, sin).astype(q.dtype), q[..., rot:]],
                axis=-1,
            )
            k = jnp.concatenate(
                [_apply_rotary(k[..., :rot].astype(jnp.float32), cos, sin).astype(k.dtype), k[..., rot:]],
                axis=-1,
            )

        attn = multi_head_attention(q, k, v, causal=True, impl=cfg.attention_impl)
        attn_out = neox_attn_out(layer, attn)

        if cfg.use_parallel_residual:
            ln2 = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.layer_norm_eps)
            x = x + attn_out + neox_mlp(layer, ln2, act)
        else:
            x = x + attn_out
            ln2 = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.layer_norm_eps)
            x = x + neox_mlp(layer, ln2, act)

    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], cfg.layer_norm_eps)
    if return_hidden:
        return x
    return neox_logits(params, x)


def gpt_neox_lm(
    params: Params,
    cfg: GPTNeoXConfig,
    input_ids: jax.Array,  # [B, S]
    labels: jax.Array,     # [B, S]; positions == -100 are not scored
) -> Tuple[jax.Array, jax.Array]:
    """HF-compatible causal LM loss.

    Labels are shifted internally (position t scored against label t+1),
    matching ``GPTNeoXForCausalLM`` so reference perplexities reproduce.
    Returns (sum_loss, num_scored_tokens) so callers can aggregate across
    batches/devices exactly.
    """
    from retrieval_scaling_tpu.models.loss import blockwise_row_lm_loss, use_blockwise

    if use_blockwise(input_ids.shape[1], cfg.vocab_size):
        # streamed loss: the [B, S, V] f32 logits/logprobs never
        # materialize (models/loss.py)
        hidden = gpt_neox_forward(params, cfg, input_ids, return_hidden=True)
        row_loss, row_count = blockwise_row_lm_loss(
            lambda h: neox_logits(params, h), hidden, labels
        )
        return jnp.sum(row_loss), jnp.sum(row_count)
    logits = gpt_neox_forward(params, cfg, input_ids)
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    loss_sum = -jnp.sum(token_ll * mask)
    return loss_sum, jnp.sum(mask)
