"""Llama-family transformer (Llama 1/2/3, Mistral, Qwen2/2.5, Qwen3, Gemma, OLMo-1/2).

The reference treats the reader LM as an arbitrary HF ``AutoModelForCausalLM``
(reference: src/evaluate_perplexity.py:97-108) — the paper's readers are
Llama-2/3 and Pythia — and its retriever dispatch includes decoder-based
embedders (GRIT/gritlm, Qwen3, ReasonIR; reference: src/embed.py:118-133).
This module covers the whole llama architecture family with one pure-
functional JAX implementation:

  * RMSNorm (fp32 accumulation), full-head-dim rotary embeddings, SwiGLU
    MLP, grouped-query attention (``num_kv_heads`` < ``num_heads``).
  * Optional attention QKV bias (Qwen2), per-head q/k RMSNorm (Qwen3),
    full-width q/k RMSNorm + post-output norm placement (OLMo-2),
    non-parametric LayerNorm + QKV clipping (OLMo-1), gelu-tanh MLP +
    zero-centered RMSNorm + sqrt(d) embedding scaling (Gemma).
  * Causal attention for reading; ``bidirectional=True`` turns the same
    weights into a GRIT-style embedder (mean/last-token pooling).
  * The Pallas flash-attention kernel on TPU via ``multi_head_attention``.

Loss contract matches ``gpt_neox_lm``: labels equal to -100 are excluded
(reference: src/evaluate_perplexity.py:119-124).
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
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    max_position_embeddings: int = 4096
    head_dim: int | None = None          # Qwen3 decouples head_dim from hidden/heads
    rope_base: float = 10000.0
    rms_eps: float = 1e-5
    attention_bias: bool = False         # Qwen2-style QKV bias
    qk_norm: bool = False                # Qwen3 per-head q/k RMSNorm
    tie_embeddings: bool = False
    attention_impl: str = "auto"
    # RoPE scaling (HF rope_scaling): None | "linear" | "llama3"
    rope_scaling_type: str | None = None
    rope_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192
    # Gemma-family deltas (reference reader contract is any HF causal LM,
    # src/evaluate_perplexity.py:97-108): gelu-tanh MLP instead of SiLU,
    # RMSNorm scales stored as (weight) with an implicit +1, and embeddings
    # multiplied by sqrt(hidden_size).
    hidden_act: str = "silu"             # "silu" | "gelu_tanh"
    rms_norm_offset: bool = False        # Gemma: norm scale = 1 + weight
    embedding_multiplier: float = 1.0    # Gemma: sqrt(hidden_size)
    # OLMo-family deltas: OLMo-1 uses non-parametric (weightless) LayerNorm
    # and optional QKV clipping; OLMo-2 applies RMSNorm to the attention /
    # MLP OUTPUTS (post-norm) and full-width q/k RMSNorm.
    norm_type: str = "rms"               # "rms" | "layernorm_np"
    # "pre" (llama) | "post_output" (OLMo-2) | "pre_post" (Gemma-2: norm
    # both the sublayer INPUT and its OUTPUT — 4 norms per layer)
    norm_placement: str = "pre"
    clip_qkv: float | None = None        # OLMo-1
    qk_norm_full: bool = False           # OLMo-2: RMSNorm over h*hd, not per head
    # Gemma-2 soft-capping + attention scale override
    attn_logit_softcap: float | None = None
    final_logit_softcap: float | None = None
    query_pre_attn_scalar: float | None = None
    # Gemma-2 interleaves sliding-window layers with full-attention ones;
    # layers where sliding_pattern is True mask keys outside
    # (q - sliding_window, q] (HF layer_types semantics).
    sliding_window: int | None = None
    sliding_pattern: tuple | None = None  # per-layer bool, True = sliding

    @property
    def hd(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads


def _layer_norm_np(x: jax.Array, eps: float) -> jax.Array:
    """Non-parametric LayerNorm (OLMo-1: no scale, no bias)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms_norm(x: jax.Array, scale: jax.Array, eps: float, offset: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if offset:  # Gemma stores scale - 1 ("zero-centered" weights)
        return (normed * (1.0 + scale.astype(jnp.float32))).astype(x.dtype)
    return normed.astype(x.dtype) * scale


def init_llama_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k_iter = iter(jax.random.split(key, 2 + 8 * cfg.num_layers))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(k_iter), shape) * scale).astype(dtype)

    d, h, hkv, hd, ff = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.hd, cfg.intermediate_size
    params: Params = {
        "embed": dense((cfg.vocab_size, d)),
        "final_norm": jnp.ones((d,), dtype),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense((d, cfg.vocab_size))
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((d,), dtype),
            "q_w": dense((d, h, hd)),
            "k_w": dense((d, hkv, hd)),
            "v_w": dense((d, hkv, hd)),
            "o_w": dense((h, hd, d)),
            "post_norm": jnp.ones((d,), dtype),
            "gate_w": dense((d, ff)),
            "up_w": dense((d, ff)),
            "down_w": dense((ff, d)),
        }
        if cfg.attention_bias:
            layer["q_b"] = jnp.zeros((h, hd), dtype)
            layer["k_b"] = jnp.zeros((hkv, hd), dtype)
            layer["v_b"] = jnp.zeros((hkv, hd), dtype)
        if cfg.qk_norm_full:
            layer["q_norm"] = jnp.ones((h, hd), dtype)
            layer["k_norm"] = jnp.ones((hkv, hd), dtype)
        elif cfg.qk_norm:
            layer["q_norm"] = jnp.ones((hd,), dtype)
            layer["k_norm"] = jnp.ones((hd,), dtype)
        if cfg.norm_placement in ("post_output", "pre_post"):
            layer["post_attn_norm"] = jnp.ones((d,), dtype)
            layer["post_mlp_norm"] = jnp.ones((d,), dtype)
        params["layers"].append(layer)
    return params


def rope_inv_freq(cfg: LlamaConfig) -> jax.Array:
    """Base inverse frequencies with optional HF rope_scaling applied."""
    dims = cfg.hd
    inv_freq = 1.0 / (cfg.rope_base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims))
    if cfg.rope_scaling_type == "linear":
        inv_freq = inv_freq / cfg.rope_factor
    elif cfg.rope_scaling_type == "llama3":
        # HF Llama-3.1 NTK-by-parts (transformers modeling_rope_utils
        # _compute_llama3_parameters): low-frequency bands divide by factor,
        # high-frequency bands stay, mid bands interpolate smoothly.
        low_wavelen = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
        high_wavelen = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = inv_freq / cfg.rope_factor
        smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        mid = (1 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > low_wavelen, scaled, jnp.where(wavelen < high_wavelen, inv_freq, mid)
        )
    elif cfg.rope_scaling_type not in (None, "default"):
        # e.g. Phi-3-128k "longrope", "yarn", "dynamic" — refusing beats
        # silently computing wrong positions.
        raise NotImplementedError(
            f"rope_scaling type {cfg.rope_scaling_type!r} is not supported "
            "(supported: linear, llama3)"
        )
    return inv_freq


def rotary_cos_sin(
    seq_len: int, dims: int, base: float, cfg: LlamaConfig | None = None
) -> Tuple[jax.Array, jax.Array]:
    if cfg is not None:
        inv_freq = rope_inv_freq(cfg)
    else:
        inv_freq = 1.0 / (base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                      # [S, dims/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # [S, dims] (HF layout)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF rotate-half rotary over the full head dim. x: [B, H, S, hd]."""
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, None] + rotated * sin[None, None]).astype(x.dtype)


def _qkv(layer: Params, cfg: LlamaConfig, x: jax.Array):
    """Project to q,k,v heads: [B, H(_kv), S, hd]; GQA kv repeated to H."""
    from retrieval_scaling_tpu.ops.quant_matmul import has_q8, q8_dot

    if "qkv3@q8" in layer:
        # launch-fused q|k|v storage (quantize_decode_params): one weight
        # stream per layer instead of three pallas calls at decode
        b, s, _ = x.shape
        nq = cfg.num_heads * cfg.hd
        nkv = cfg.num_kv_heads * cfg.hd
        qkv = q8_dot(layer, "qkv3", x)
        q = jnp.moveaxis(qkv[..., :nq].reshape(b, s, cfg.num_heads, cfg.hd), 2, 1)
        k = jnp.moveaxis(
            qkv[..., nq : nq + nkv].reshape(b, s, cfg.num_kv_heads, cfg.hd), 2, 1
        )
        v = jnp.moveaxis(
            qkv[..., nq + nkv :].reshape(b, s, cfg.num_kv_heads, cfg.hd), 2, 1
        )
    elif has_q8(layer, "q_w"):
        b, s, _ = x.shape
        q = jnp.moveaxis(q8_dot(layer, "q_w", x).reshape(b, s, cfg.num_heads, cfg.hd), 2, 1)
        k = jnp.moveaxis(q8_dot(layer, "k_w", x).reshape(b, s, cfg.num_kv_heads, cfg.hd), 2, 1)
        v = jnp.moveaxis(q8_dot(layer, "v_w", x).reshape(b, s, cfg.num_kv_heads, cfg.hd), 2, 1)
    else:
        q = jnp.einsum("bsd,dnk->bnsk", x, layer["q_w"])
        k = jnp.einsum("bsd,dnk->bnsk", x, layer["k_w"])
        v = jnp.einsum("bsd,dnk->bnsk", x, layer["v_w"])
    return _qkv_post(layer, cfg, q, k, v)


def attn_out_proj(layer: Params, attn: jax.Array) -> jax.Array:
    """Output projection: attn [B, H, S, hd] -> [B, S, D] (float or int8)."""
    from retrieval_scaling_tpu.ops.quant_matmul import has_q8, q8_dot

    if has_q8(layer, "o_w"):
        b, h, s, hd = attn.shape
        return q8_dot(layer, "o_w", jnp.moveaxis(attn, 1, 2).reshape(b, s, h * hd))
    return jnp.einsum("bnsk,nkd->bsd", attn, layer["o_w"])


def llama_mlp(layer: Params, cfg: LlamaConfig, h: jax.Array) -> jax.Array:
    """Gated MLP: down(act(gate(h)) * up(h)) (float or int8 weights)."""
    from retrieval_scaling_tpu.ops.quant_matmul import has_q8, q8_dot

    if "gateup@q8" in layer:
        # launch-fused gate|up storage: one stream, split the output
        gu = q8_dot(layer, "gateup", h)
        ff = gu.shape[-1] // 2
        pre, up = gu[..., :ff], gu[..., ff:]
        gate = (
            jax.nn.gelu(pre, approximate=True)
            if cfg.hidden_act == "gelu_tanh"
            else jax.nn.silu(pre)
        )
        return q8_dot(layer, "down_w", gate * up)
    quant = has_q8(layer, "gate_w")
    pre = q8_dot(layer, "gate_w", h) if quant else jnp.dot(h, layer["gate_w"])
    gate = (
        jax.nn.gelu(pre, approximate=True)
        if cfg.hidden_act == "gelu_tanh"
        else jax.nn.silu(pre)
    )
    up = q8_dot(layer, "up_w", h) if quant else jnp.dot(h, layer["up_w"])
    if quant:
        return q8_dot(layer, "down_w", gate * up)
    return jnp.dot(gate * up, layer["down_w"])


def _qkv_post(layer: Params, cfg: LlamaConfig, q, k, v):
    """Family-variant post-projection: bias, QKV clipping, qk norms —
    shared by the float and int8 projection paths above."""
    if cfg.attention_bias:
        q = q + layer["q_b"][None, :, None, :]
        k = k + layer["k_b"][None, :, None, :]
        v = v + layer["v_b"][None, :, None, :]
    if cfg.clip_qkv is not None:  # OLMo-1
        q = jnp.clip(q, -cfg.clip_qkv, cfg.clip_qkv)
        k = jnp.clip(k, -cfg.clip_qkv, cfg.clip_qkv)
        v = jnp.clip(v, -cfg.clip_qkv, cfg.clip_qkv)
    if cfg.qk_norm_full:
        # OLMo-2: RMSNorm over the FULL flattened projection (h*hd), weight
        # stored per (head, hd); variance pools across heads.
        q = _rms_norm_full(q, layer["q_norm"], cfg.rms_eps)
        k = _rms_norm_full(k, layer["k_norm"], cfg.rms_eps)
    elif cfg.qk_norm:
        q = _rms_norm(q, layer["q_norm"], cfg.rms_eps)
        k = _rms_norm(k, layer["k_norm"], cfg.rms_eps)
    return q, k, v


def _rms_norm_full(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """RMSNorm over (heads, hd) jointly; x [B, H, S, hd], scale [H, hd]."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale[None, :, None, :]


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jax.Array,                 # [B, S]
    attention_mask: jax.Array | None = None,  # [B, S] 1=keep (padding mask)
    bidirectional: bool = False,
) -> jax.Array:
    """Return final hidden states [B, S, D] (pre-lm-head)."""
    x = params["embed"][input_ids]
    if cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    s = input_ids.shape[1]
    cos, sin = rotary_cos_sin(s, cfg.hd, cfg.rope_base, cfg=cfg)
    kv_mask = None if attention_mask is None else attention_mask.astype(bool)

    def norm(v, scale):
        if cfg.norm_type == "layernorm_np":
            return _layer_norm_np(v, cfg.rms_eps)
        return _rms_norm(v, scale, cfg.rms_eps, cfg.rms_norm_offset)

    post_only = cfg.norm_placement == "post_output"   # OLMo-2
    pre_post = cfg.norm_placement == "pre_post"       # Gemma-2
    sm_scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None
        else None
    )
    for li, layer in enumerate(params["layers"]):
        window = None
        if (
            cfg.sliding_window is not None
            and cfg.sliding_pattern is not None
            and cfg.sliding_pattern[li]
            and not bidirectional
        ):
            window = cfg.sliding_window
        h = x if post_only else norm(x, layer["input_norm"])
        q, k, v = _qkv(layer, cfg, h)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        # GQA k/v stay at num_kv_heads: the flash kernel maps query head ->
        # kv head in its index map (no n_rep x HBM materialization) and the
        # XLA path broadcasts internally.
        attn = multi_head_attention(
            q, k, v, kv_mask=kv_mask, causal=not bidirectional,
            impl=cfg.attention_impl, sm_scale=sm_scale,
            logit_cap=cfg.attn_logit_softcap,
            window=window,
        )
        attn_out = attn_out_proj(layer, attn)
        if post_only or pre_post:  # norm the sublayer OUTPUT
            attn_out = norm(attn_out, layer["post_attn_norm"])
        x = x + attn_out

        h = x if post_only else norm(x, layer["post_norm"])
        mlp_out = llama_mlp(layer, cfg, h)
        if post_only or pre_post:
            mlp_out = norm(mlp_out, layer["post_mlp_norm"])
        x = x + mlp_out

    return norm(x, params["final_norm"])


def llama_logits(params: Params, cfg: LlamaConfig, hidden: jax.Array) -> jax.Array:
    from retrieval_scaling_tpu.ops.quant_matmul import has_q8, q8_dot

    if has_q8(params, "lm_head"):
        logits = q8_dot(params, "lm_head", hidden, out_dtype=jnp.float32)
        if cfg.final_logit_softcap:
            logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
        return logits
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
    if cfg.final_logit_softcap:  # Gemma-2
        logits = cfg.final_logit_softcap * jnp.tanh(logits / cfg.final_logit_softcap)
    return logits


def llama_lm(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jax.Array,  # [B, S]
    labels: jax.Array,     # [B, S]; positions == -100 are not scored
) -> Tuple[jax.Array, jax.Array]:
    """HF-compatible causal LM loss; returns (sum_loss, num_scored_tokens)."""
    from retrieval_scaling_tpu.models.loss import blockwise_row_lm_loss, use_blockwise

    if use_blockwise(input_ids.shape[1], cfg.vocab_size):
        hidden = llama_forward(params, cfg, input_ids)
        row_loss, row_count = blockwise_row_lm_loss(
            lambda h: llama_logits(params, cfg, h), hidden, labels
        )
        return jnp.sum(row_loss), jnp.sum(row_count)
    logits = llama_logits(params, cfg, llama_forward(params, cfg, input_ids))
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    loss_sum = -jnp.sum(token_ll * mask)
    return loss_sum, jnp.sum(mask)


def llama_embed(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    pooling: str = "last",
    normalize: bool = True,
    bidirectional: bool = False,
) -> jax.Array:
    """Decoder-based retrieval embedding (GRIT / Qwen3-embedding style).

    ``pooling='last'`` takes the hidden state at each row's final non-pad
    token (causal embedders); ``'mean'`` masked-mean-pools (GRIT uses mean
    with bidirectional attention).
    """
    hidden = llama_forward(params, cfg, input_ids, attention_mask, bidirectional=bidirectional)
    maskf = attention_mask.astype(hidden.dtype)
    if pooling == "last":
        last_idx = jnp.maximum(jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1, 0)
        emb = hidden[jnp.arange(hidden.shape[0]), last_idx]
    elif pooling == "mean":
        emb = jnp.sum(hidden * maskf[..., None], axis=1) / jnp.clip(
            jnp.sum(maskf, axis=1, keepdims=True), 1e-9, None
        )
    else:
        raise ValueError(f"Unknown pooling: {pooling!r}")
    if normalize:
        emb = emb / jnp.clip(jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True), 1e-9, None).astype(emb.dtype)
    return emb
