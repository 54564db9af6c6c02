"""HuggingFace checkpoint -> JAX parameter conversion.

The reference loads retrievers/readers straight from HF hub with torch
(reference: src/embed.py:118-138, src/evaluate_perplexity.py:97-108). Here
torch is only a host-side loading detail: state dicts are converted once to
our pure-JAX parameter pytrees (fused QKV layouts re-packed for the MXU)
and can be cached as orbax/npz artifacts.

Also handles the reference's local Contriever training checkpoints, which
prefix weights with ``encoder_q.``/``encoder.``
(reference: contriever/src/contriever.py:123-127).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Mapping

import numpy as np

from retrieval_scaling_tpu.models.bert import BertConfig
from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig
from retrieval_scaling_tpu.models.llama import LlamaConfig

logger = logging.getLogger(__name__)


def _np(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        t = tensor.detach().cpu()
        # torch bf16 has no numpy analog; upcast then let callers re-cast.
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(tensor)


def _strip_prefixes(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Normalize wrapper prefixes from MoCo/InBatch/DDP checkpoints.

    Anchors on ``embeddings.word_embeddings.weight``: whatever precedes it
    (``module.``, ``encoder_q.``, ``encoder.``, ``bert.``, combinations) is
    the wrapper prefix, stripped from all keys. This avoids clobbering
    BertModel's own ``encoder.layer.*`` keys.
    """
    anchor = "embeddings.word_embeddings.weight"
    candidates = [k[: -len(anchor)] for k in state if k.endswith(anchor)]
    if not candidates:
        raise KeyError(f"No '{anchor}' key found in checkpoint")
    # MoCo checkpoints carry both encoder_q (query) and encoder_k (momentum)
    # towers; the reference loads encoder_q (contriever/src/contriever.py:123).
    q_first = [c for c in candidates if "encoder_q" in c]
    prefix = q_first[0] if q_first else min(candidates, key=len)
    if not prefix:
        return dict(state)
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


# --------------------------------------------------------------------------
# BERT / Contriever
# --------------------------------------------------------------------------
_ROBERTA_MODEL_TYPES = ("roberta", "xlm-roberta", "camembert")


def bert_config_from_hf(hf_config, pooling: str = "mean", attention_impl: str = "auto") -> BertConfig:
    return BertConfig(
        roberta_position_ids=getattr(hf_config, "model_type", "bert") in _ROBERTA_MODEL_TYPES,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        pooling=pooling,
        attention_impl=attention_impl,
    )


def bert_params_from_state_dict(state: Mapping[str, Any], cfg: BertConfig, dtype=np.float32) -> Dict:
    sd = {k: _np(v) for k, v in _strip_prefixes(state).items()}
    d, hh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def g(name):
        return sd[name].astype(dtype)

    params: Dict[str, Any] = {
        "embeddings": {
            "word": g("embeddings.word_embeddings.weight"),
            "position": g("embeddings.position_embeddings.weight"),
            "token_type": g("embeddings.token_type_embeddings.weight"),
            "ln_scale": g("embeddings.LayerNorm.weight"),
            "ln_bias": g("embeddings.LayerNorm.bias"),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        # HF stores [out, in] Linear weights; we use [in, out] matmuls.
        q_w = g(p + "attention.self.query.weight").T.reshape(d, hh, hd)
        k_w = g(p + "attention.self.key.weight").T.reshape(d, hh, hd)
        v_w = g(p + "attention.self.value.weight").T.reshape(d, hh, hd)
        q_b = g(p + "attention.self.query.bias").reshape(hh, hd)
        k_b = g(p + "attention.self.key.bias").reshape(hh, hd)
        v_b = g(p + "attention.self.value.bias").reshape(hh, hd)
        params["layers"].append(
            {
                "qkv_w": np.stack([q_w, k_w, v_w], axis=1),           # [d, 3, H, hd]
                "qkv_b": np.stack([q_b, k_b, v_b], axis=0),           # [3, H, hd]
                "attn_out_w": g(p + "attention.output.dense.weight").T.reshape(hh, hd, d),
                "attn_out_b": g(p + "attention.output.dense.bias"),
                "attn_ln_scale": g(p + "attention.output.LayerNorm.weight"),
                "attn_ln_bias": g(p + "attention.output.LayerNorm.bias"),
                "mlp_in_w": g(p + "intermediate.dense.weight").T,
                "mlp_in_b": g(p + "intermediate.dense.bias"),
                "mlp_out_w": g(p + "output.dense.weight").T,
                "mlp_out_b": g(p + "output.dense.bias"),
                "mlp_ln_scale": g(p + "output.LayerNorm.weight"),
                "mlp_ln_bias": g(p + "output.LayerNorm.bias"),
            }
        )
    return params


def bert_from_hf_model(hf_model, pooling: str = "mean", dtype=np.float32, attention_impl: str = "auto"):
    cfg = bert_config_from_hf(hf_model.config, pooling=pooling, attention_impl=attention_impl)
    params = bert_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# GPT-NeoX / Pythia
# --------------------------------------------------------------------------
def gpt_neox_config_from_hf(hf_config, attention_impl: str = "auto") -> GPTNeoXConfig:
    return GPTNeoXConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        rotary_pct=hf_config.rotary_pct,
        rotary_base=getattr(hf_config, "rotary_emb_base", 10000.0),
        layer_norm_eps=hf_config.layer_norm_eps,
        use_parallel_residual=hf_config.use_parallel_residual,
        attention_impl=attention_impl,
    )


def gpt_neox_params_from_state_dict(
    state: Mapping[str, Any], cfg: GPTNeoXConfig, dtype=np.float32
) -> Dict:
    sd = {}
    for key, val in state.items():
        if key.startswith("gpt_neox."):
            key = key[len("gpt_neox."):]
        sd[key] = _np(val)

    d, hh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def g(name):
        return sd[name].astype(dtype)

    params: Dict[str, Any] = {
        "embed_in": g("embed_in.weight"),
        "final_ln_scale": g("final_layer_norm.weight"),
        "final_ln_bias": g("final_layer_norm.bias"),
        "embed_out": g("embed_out.weight").T,
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        # HF qkv output dim is head-major [H, (q k v), hd].
        qkv_w = g(p + "attention.query_key_value.weight").T.reshape(d, hh, 3, hd)
        qkv_b = g(p + "attention.query_key_value.bias").reshape(hh, 3, hd)
        params["layers"].append(
            {
                "ln1_scale": g(p + "input_layernorm.weight"),
                "ln1_bias": g(p + "input_layernorm.bias"),
                "qkv_w": np.ascontiguousarray(qkv_w.transpose(0, 2, 1, 3)),  # [d, 3, H, hd]
                "qkv_b": np.ascontiguousarray(qkv_b.transpose(1, 0, 2)),     # [3, H, hd]
                "attn_out_w": g(p + "attention.dense.weight").T.reshape(hh, hd, d),
                "attn_out_b": g(p + "attention.dense.bias"),
                "ln2_scale": g(p + "post_attention_layernorm.weight"),
                "ln2_bias": g(p + "post_attention_layernorm.bias"),
                "mlp_in_w": g(p + "mlp.dense_h_to_4h.weight").T,
                "mlp_in_b": g(p + "mlp.dense_h_to_4h.bias"),
                "mlp_out_w": g(p + "mlp.dense_4h_to_h.weight").T,
                "mlp_out_b": g(p + "mlp.dense_4h_to_h.bias"),
            }
        )
    return params


def gpt_neox_from_hf_model(hf_model, dtype=np.float32, attention_impl: str = "auto"):
    cfg = gpt_neox_config_from_hf(hf_model.config, attention_impl=attention_impl)
    params = gpt_neox_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# GPT-2 — maps onto the GPT-NeoX machinery: sequential residual, learned
# absolute positions (no rotary), tanh gelu_new, tied lm head.
# --------------------------------------------------------------------------
def gpt2_config_from_hf(hf_config, attention_impl: str = "auto") -> GPTNeoXConfig:
    # Refuse-don't-diverge (same pattern as the OPT-350m / rope_scaling
    # guards): these two flags change attention numerics and the JAX
    # forward does not implement them.
    if getattr(hf_config, "scale_attn_by_inverse_layer_idx", False):
        raise NotImplementedError(
            "gpt2 scale_attn_by_inverse_layer_idx is not implemented"
        )
    if getattr(hf_config, "reorder_and_upcast_attn", False):
        raise NotImplementedError("gpt2 reorder_and_upcast_attn is not implemented")
    return GPTNeoXConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.n_embd,
        num_layers=hf_config.n_layer,
        num_heads=hf_config.n_head,
        intermediate_size=(
            hf_config.n_inner if hf_config.n_inner is not None else 4 * hf_config.n_embd
        ),
        max_position_embeddings=hf_config.n_positions,
        rotary_pct=0.0,
        layer_norm_eps=hf_config.layer_norm_epsilon,
        use_parallel_residual=False,
        learned_positions=True,
        gelu="tanh",
        attention_impl=attention_impl,
    )


def gpt2_params_from_state_dict(
    state: Mapping[str, Any], cfg: GPTNeoXConfig, dtype=np.float32
) -> Dict:
    sd = {}
    for key, val in state.items():
        if key.startswith("transformer."):
            key = key[len("transformer."):]
        sd[key] = _np(val)

    d, hh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def g(name):
        return sd[name].astype(dtype)

    wte = g("wte.weight")
    params: Dict[str, Any] = {
        "embed_in": wte,
        "pos_embed": g("wpe.weight"),
        "final_ln_scale": g("ln_f.weight"),
        "final_ln_bias": g("ln_f.bias"),
        # GPT-2 ties the lm head to wte (lm_head.weight may be absent)
        "embed_out": np.ascontiguousarray(wte.T),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"h.{i}."
        # Conv1D weights are already [in, out]; c_attn out dim is q|k|v
        # concat, each head-major [H, hd].
        params["layers"].append(
            {
                "ln1_scale": g(p + "ln_1.weight"),
                "ln1_bias": g(p + "ln_1.bias"),
                "qkv_w": g(p + "attn.c_attn.weight").reshape(d, 3, hh, hd),
                "qkv_b": g(p + "attn.c_attn.bias").reshape(3, hh, hd),
                "attn_out_w": g(p + "attn.c_proj.weight").reshape(hh, hd, d),
                "attn_out_b": g(p + "attn.c_proj.bias"),
                "ln2_scale": g(p + "ln_2.weight"),
                "ln2_bias": g(p + "ln_2.bias"),
                "mlp_in_w": g(p + "mlp.c_fc.weight"),
                "mlp_in_b": g(p + "mlp.c_fc.bias"),
                "mlp_out_w": g(p + "mlp.c_proj.weight"),
                "mlp_out_b": g(p + "mlp.c_proj.bias"),
            }
        )
    return params


def gpt2_from_hf_model(hf_model, dtype=np.float32, attention_impl: str = "auto"):
    cfg = gpt2_config_from_hf(hf_model.config, attention_impl=attention_impl)
    params = gpt2_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# OPT — sequential residual, learned positions with a +2 index offset,
# ReLU MLP, separate biased projections, tied lm head.
# --------------------------------------------------------------------------
def opt_config_from_hf(hf_config, attention_impl: str = "auto") -> GPTNeoXConfig:
    if not getattr(hf_config, "do_layer_norm_before", True) or (
        getattr(hf_config, "word_embed_proj_dim", hf_config.hidden_size)
        != hf_config.hidden_size
    ):
        # OPT-350m: post-norm + embedding projection — not mapped
        raise NotImplementedError(
            "OPT variants with do_layer_norm_before=False or an embedding "
            "projection (350m) are not supported"
        )
    return GPTNeoXConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.ffn_dim,
        max_position_embeddings=hf_config.max_position_embeddings,
        rotary_pct=0.0,
        layer_norm_eps=1e-5,
        use_parallel_residual=False,
        learned_positions=True,
        position_offset=2,  # OPTLearnedPositionalEmbedding adds 2
        gelu="relu",
        attention_impl=attention_impl,
    )


def opt_params_from_state_dict(
    state: Mapping[str, Any], cfg: GPTNeoXConfig, dtype=np.float32
) -> Dict:
    sd = {}
    for key, val in state.items():
        for prefix in ("model.decoder.", "decoder."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        sd[key] = _np(val)

    d, hh, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def g(name):
        return sd[name].astype(dtype)

    wte = g("embed_tokens.weight")
    params: Dict[str, Any] = {
        "embed_in": wte,
        "pos_embed": g("embed_positions.weight"),
        "final_ln_scale": g("final_layer_norm.weight"),
        "final_ln_bias": g("final_layer_norm.bias"),
        "embed_out": np.ascontiguousarray(wte.T),  # tied head
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        # fuse q|k|v into the [d, 3, H, hd] layout the machinery expects
        qkv_w = np.stack(
            [g(p + f"self_attn.{n}_proj.weight").T.reshape(d, hh, hd) for n in "qkv"],
            axis=1,
        )
        qkv_b = np.stack(
            [g(p + f"self_attn.{n}_proj.bias").reshape(hh, hd) for n in "qkv"], axis=0
        )
        params["layers"].append(
            {
                "ln1_scale": g(p + "self_attn_layer_norm.weight"),
                "ln1_bias": g(p + "self_attn_layer_norm.bias"),
                "qkv_w": np.ascontiguousarray(qkv_w),
                "qkv_b": np.ascontiguousarray(qkv_b),
                "attn_out_w": g(p + "self_attn.out_proj.weight").T.reshape(hh, hd, d),
                "attn_out_b": g(p + "self_attn.out_proj.bias"),
                "ln2_scale": g(p + "final_layer_norm.weight"),
                "ln2_bias": g(p + "final_layer_norm.bias"),
                "mlp_in_w": g(p + "fc1.weight").T,
                "mlp_in_b": g(p + "fc1.bias"),
                "mlp_out_w": g(p + "fc2.weight").T,
                "mlp_out_b": g(p + "fc2.bias"),
            }
        )
    return params


def opt_from_hf_model(hf_model, dtype=np.float32, attention_impl: str = "auto"):
    cfg = opt_config_from_hf(hf_model.config, attention_impl=attention_impl)
    params = opt_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# Llama family (Llama 1/2/3, Mistral, Qwen2/2.5, Qwen3, TinyLlama, Phi-3)
# --------------------------------------------------------------------------
_LLAMA_MODEL_TYPES = (
    "llama", "mistral", "qwen2", "qwen3", "gemma", "gemma2", "olmo", "olmo2", "phi3",
)


def llama_config_from_hf(hf_config, attention_impl: str = "auto") -> LlamaConfig:
    model_type = getattr(hf_config, "model_type", "llama")
    rope_scaling = getattr(hf_config, "rope_scaling", None) or {}
    return LlamaConfig(
        rope_scaling_type=rope_scaling.get("rope_type", rope_scaling.get("type", None)),
        rope_factor=float(rope_scaling.get("factor", 1.0)),
        rope_low_freq_factor=float(rope_scaling.get("low_freq_factor", 1.0)),
        rope_high_freq_factor=float(rope_scaling.get("high_freq_factor", 4.0)),
        rope_original_max_pos=int(
            rope_scaling.get("original_max_position_embeddings", 8192)
        ),
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", hf_config.num_attention_heads),
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        head_dim=getattr(hf_config, "head_dim", None),
        rope_base=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=getattr(hf_config, "rms_norm_eps", 1e-5),
        # Qwen2's QKV bias predates the attention_bias config field.
        attention_bias=getattr(hf_config, "attention_bias", model_type == "qwen2"),
        qk_norm=model_type == "qwen3",
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        attention_impl=attention_impl,
        # Gemma deltas: gelu-tanh MLP, zero-centered RMSNorm weights,
        # sqrt(d) embedding scaling, always-tied head.
        hidden_act="gelu_tanh" if model_type in ("gemma", "gemma2") else "silu",
        rms_norm_offset=model_type in ("gemma", "gemma2"),
        embedding_multiplier=(
            float(hf_config.hidden_size) ** 0.5
            if model_type in ("gemma", "gemma2") else 1.0
        ),
        # Gemma-2: pre+post norms, logit soft-capping, attn scale override.
        attn_logit_softcap=getattr(hf_config, "attn_logit_softcapping", None),
        final_logit_softcap=getattr(hf_config, "final_logit_softcapping", None),
        query_pre_attn_scalar=getattr(hf_config, "query_pre_attn_scalar", None),
        # Gemma-2 slides on alternating layers (layer_types); Mistral v0.1
        # and Phi-3 slide on every layer when sliding_window is set.
        sliding_window=(
            getattr(hf_config, "sliding_window", None)
            if model_type in ("gemma2", "mistral", "phi3") else None
        ),
        sliding_pattern=(
            tuple(t == "sliding_attention" for t in hf_config.layer_types)
            if model_type == "gemma2" and getattr(hf_config, "layer_types", None)
            else (True,) * hf_config.num_hidden_layers
            if model_type in ("mistral", "phi3")
            and getattr(hf_config, "sliding_window", None)
            else None
        ),
        # OLMo-1: non-parametric LayerNorm + optional QKV clipping;
        # OLMo-2: post-output RMSNorm + full-width q/k norm.
        norm_type="layernorm_np" if model_type == "olmo" else "rms",
        norm_placement=(
            "post_output" if model_type == "olmo2"
            else "pre_post" if model_type == "gemma2"
            else "pre"
        ),
        clip_qkv=getattr(hf_config, "clip_qkv", None),
        qk_norm_full=model_type == "olmo2",
    )


def llama_params_from_state_dict(
    state: Mapping[str, Any], cfg: LlamaConfig, dtype=np.float32
) -> Dict:
    sd = {}
    for key, val in state.items():
        if key.startswith("model."):
            key = key[len("model."):]
        sd[key] = _np(val)

    d, h, hkv, hd = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.hd

    def g(name):
        return sd[name].astype(dtype)

    params: Dict[str, Any] = {
        "embed": g("embed_tokens.weight"),
        # OLMo-1's norms are non-parametric: no weights in the checkpoint.
        "final_norm": (
            g("norm.weight") if "norm.weight" in sd
            else np.ones((d,), dtype)
        ),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        if "lm_head.weight" in sd:
            params["lm_head"] = g("lm_head.weight").T
        else:
            # Base model (AutoModel) checkpoints carry no head — fine for
            # embedding use; fall back to tied weights for logits.
            params["lm_head"] = params["embed"].T
    ones_d = np.ones((d,), dtype)
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layer = {
            "input_norm": (
                g(p + "input_layernorm.weight")
                if p + "input_layernorm.weight" in sd else ones_d
            ),
            "o_w": g(p + "self_attn.o_proj.weight").T.reshape(h, hd, d),
            "post_norm": (
                g(p + "post_attention_layernorm.weight")
                if cfg.norm_placement == "pre" and p + "post_attention_layernorm.weight" in sd
                else ones_d
            ),
            "down_w": g(p + "mlp.down_proj.weight").T,
        }
        if p + "self_attn.qkv_proj.weight" in sd:
            # Phi-3 fuses the projections: qkv_proj [(h+2*hkv)*hd, d] and
            # gate_up_proj [2*ff, d] split into the standard llama layout.
            qkv = g(p + "self_attn.qkv_proj.weight")
            q_rows, k_rows = np.split(qkv, [h * hd], axis=0)
            k_rows, v_rows = np.split(k_rows, [hkv * hd], axis=0)
            layer["q_w"] = q_rows.T.reshape(d, h, hd)
            layer["k_w"] = k_rows.T.reshape(d, hkv, hd)
            layer["v_w"] = v_rows.T.reshape(d, hkv, hd)
            gate, up = np.split(g(p + "mlp.gate_up_proj.weight"), 2, axis=0)
            layer["gate_w"] = gate.T
            layer["up_w"] = up.T
        else:
            layer["q_w"] = g(p + "self_attn.q_proj.weight").T.reshape(d, h, hd)
            layer["k_w"] = g(p + "self_attn.k_proj.weight").T.reshape(d, hkv, hd)
            layer["v_w"] = g(p + "self_attn.v_proj.weight").T.reshape(d, hkv, hd)
            layer["gate_w"] = g(p + "mlp.gate_proj.weight").T
            layer["up_w"] = g(p + "mlp.up_proj.weight").T
        if cfg.norm_placement == "post_output":  # OLMo-2
            layer["post_attn_norm"] = g(p + "post_attention_layernorm.weight")
            layer["post_mlp_norm"] = g(p + "post_feedforward_layernorm.weight")
        elif cfg.norm_placement == "pre_post":  # Gemma-2
            layer["post_attn_norm"] = g(p + "post_attention_layernorm.weight")
            layer["post_mlp_norm"] = g(p + "post_feedforward_layernorm.weight")
            layer["post_norm"] = g(p + "pre_feedforward_layernorm.weight")
        if cfg.attention_bias:
            layer["q_b"] = g(p + "self_attn.q_proj.bias").reshape(h, hd)
            layer["k_b"] = g(p + "self_attn.k_proj.bias").reshape(hkv, hd)
            layer["v_b"] = g(p + "self_attn.v_proj.bias").reshape(hkv, hd)
        if cfg.qk_norm_full:  # OLMo-2: weights over the flattened width
            layer["q_norm"] = g(p + "self_attn.q_norm.weight").reshape(h, hd)
            layer["k_norm"] = g(p + "self_attn.k_norm.weight").reshape(hkv, hd)
        elif cfg.qk_norm:
            layer["q_norm"] = g(p + "self_attn.q_norm.weight")
            layer["k_norm"] = g(p + "self_attn.k_norm.weight")
        params["layers"].append(layer)
    return params


def llama_from_hf_model(hf_model, dtype=np.float32, attention_impl: str = "auto"):
    cfg = llama_config_from_hf(hf_model.config, attention_impl=attention_impl)
    params = llama_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# Mamba family (state-spaces/mamba-*): replaces the reference harness's
# CUDA-only mamba_ssm backend (rag-evaluation-harness/lm_eval/models/
# mamba_lm.py) with the TPU-native selective scan in models/mamba.py.
# --------------------------------------------------------------------------
def mamba_config_from_hf(hf_config) -> "MambaConfig":
    from retrieval_scaling_tpu.models.mamba import MambaConfig

    tsr = getattr(hf_config, "time_step_rank", "auto")
    return MambaConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        state_size=getattr(hf_config, "state_size", 16),
        num_layers=hf_config.num_hidden_layers,
        conv_kernel=getattr(hf_config, "conv_kernel", 4),
        expand=getattr(hf_config, "expand", 2),
        time_step_rank=None if tsr == "auto" else int(tsr),
        use_conv_bias=getattr(hf_config, "use_conv_bias", True),
        use_bias=getattr(hf_config, "use_bias", False),
        rms_eps=getattr(hf_config, "layer_norm_epsilon", 1e-5),
        tie_embeddings=getattr(hf_config, "tie_word_embeddings", True),
    )


def mamba_params_from_state_dict(
    state: Mapping[str, Any], cfg: "MambaConfig", dtype=np.float32
) -> Dict[str, Any]:
    def get(name):
        return np.asarray(state[name], dtype=dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"backbone.layers.{i}"
        layer = {
            "norm_scale": get(f"{p}.norm.weight"),
            "in_proj_w": get(f"{p}.mixer.in_proj.weight").T,          # [D, 2*Din]
            # HF depthwise Conv1d weight [Din, 1, K] -> [K, Din]
            "conv_w": get(f"{p}.mixer.conv1d.weight")[:, 0, :].T,
            "x_proj_w": get(f"{p}.mixer.x_proj.weight").T,            # [Din, R+2N]
            "dt_proj_w": get(f"{p}.mixer.dt_proj.weight").T,          # [R, Din]
            "dt_proj_b": get(f"{p}.mixer.dt_proj.bias"),
            "A_log": get(f"{p}.mixer.A_log"),                         # [Din, N]
            "D": get(f"{p}.mixer.D"),
            "out_proj_w": get(f"{p}.mixer.out_proj.weight").T,        # [Din, D]
        }
        if cfg.use_conv_bias:
            layer["conv_b"] = get(f"{p}.mixer.conv1d.bias")
        if cfg.use_bias:
            layer["in_proj_b"] = get(f"{p}.mixer.in_proj.bias")
            layer["out_proj_b"] = get(f"{p}.mixer.out_proj.bias")
        layers.append(layer)

    params: Dict[str, Any] = {
        "embed": get("backbone.embeddings.weight"),
        "layers": layers,
        "final_norm_scale": get("backbone.norm_f.weight"),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight").T
    return params


def mamba_from_hf_model(hf_model, dtype=np.float32):
    cfg = mamba_config_from_hf(hf_model.config)
    params = mamba_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    return params, cfg


# --------------------------------------------------------------------------
# T5 encoder (sentence-transformers GTR family)
# --------------------------------------------------------------------------
def t5_config_from_hf(hf_config, projection_dim: int | None = None) -> "T5EncoderConfig":
    from retrieval_scaling_tpu.models.t5 import T5EncoderConfig

    return T5EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.d_model,
        num_layers=hf_config.num_layers,
        num_heads=hf_config.num_heads,
        head_dim=hf_config.d_kv,
        intermediate_size=hf_config.d_ff,
        relative_buckets=hf_config.relative_attention_num_buckets,
        relative_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        rms_eps=hf_config.layer_norm_epsilon,
        gated_act="gated" in getattr(hf_config, "feed_forward_proj", "relu"),
        projection_dim=projection_dim,
    )


def t5_encoder_params_from_state_dict(state: Mapping[str, Any], cfg, dtype=np.float32) -> Dict:
    sd = {}
    for key, val in state.items():
        if key.startswith("encoder."):
            key = key[len("encoder."):]
        sd[key] = _np(val)

    d, h, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    def g(name):
        return sd[name].astype(dtype)

    params: Dict[str, Any] = {
        "embed": (sd.get("shared.weight", sd.get("embed_tokens.weight"))).astype(dtype),
        "rel_bias": g("block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
        "final_norm": g("final_layer_norm.weight"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"block.{i}.layer."
        layer = {
            "attn_norm": g(p + "0.layer_norm.weight"),
            "q_w": g(p + "0.SelfAttention.q.weight").T.reshape(d, h, hd),
            "k_w": g(p + "0.SelfAttention.k.weight").T.reshape(d, h, hd),
            "v_w": g(p + "0.SelfAttention.v.weight").T.reshape(d, h, hd),
            "o_w": g(p + "0.SelfAttention.o.weight").T.reshape(h, hd, d),
            "ffn_norm": g(p + "1.layer_norm.weight"),
            "wo": g(p + "1.DenseReluDense.wo.weight").T,
        }
        if cfg.gated_act:
            layer["wi_0"] = g(p + "1.DenseReluDense.wi_0.weight").T
            layer["wi_1"] = g(p + "1.DenseReluDense.wi_1.weight").T
        else:
            layer["wi"] = g(p + "1.DenseReluDense.wi.weight").T
        params["layers"].append(layer)
    return params


def t5_encoder_from_hf_model(hf_model, dtype=np.float32, projection: np.ndarray | None = None):
    cfg = t5_config_from_hf(
        hf_model.config,
        projection_dim=projection.shape[1] if projection is not None else None,
    )
    params = t5_encoder_params_from_state_dict(hf_model.state_dict(), cfg, dtype=dtype)
    if projection is not None:
        params["projection"] = np.asarray(projection, dtype)
    return params, cfg


def load_sentence_transformers_projection(model_dir: str) -> np.ndarray | None:
    """Load a sentence-transformers Dense module (GTR's 2_Dense/) if present.

    ST checkpoints store it as ``2_Dense/pytorch_model.bin`` (or
    model.safetensors) holding ``linear.weight`` [out, in].
    """
    import glob as _glob
    import os

    for dense_dir in sorted(_glob.glob(os.path.join(model_dir, "*_Dense"))):
        st_bin = os.path.join(dense_dir, "pytorch_model.bin")
        st_safe = os.path.join(dense_dir, "model.safetensors")
        if os.path.exists(st_safe):
            from safetensors.numpy import load_file

            weights = load_file(st_safe)
        elif os.path.exists(st_bin):
            import torch

            weights = {k: _np(v) for k, v in torch.load(st_bin, map_location="cpu").items()}
        else:
            continue
        for key, val in weights.items():
            if key.endswith("weight"):
                return np.asarray(val).T  # [in, out]
    return None


# --------------------------------------------------------------------------
# Loading helpers
# --------------------------------------------------------------------------
def load_tokenizer(name_or_path: str):
    import transformers

    return transformers.AutoTokenizer.from_pretrained(name_or_path)


def load_hf_encoder(name_or_path: str, pooling: str | None = None, dtype=np.float32):
    """Load a BERT-family encoder checkpoint with torch and convert.

    Pooling dispatch mirrors the reference's name-substring logic
    (reference: src/embed.py:118-133, src/search.py:48-108): contriever-style
    models use masked mean pooling; generic HF encoders use CLS.
    """
    import transformers

    if pooling is None:
        pooling = "mean" if "contriever" in str(name_or_path).lower() else "cls"
    hf = transformers.AutoModel.from_pretrained(name_or_path)
    return bert_from_hf_model(hf, pooling=pooling, dtype=dtype)


# --------------------------------------------------------------------------
# Converted-reader cache: torch conversion of a multi-GB checkpoint costs
# minutes at server boot; the flattened-npz cache loads in seconds.
# --------------------------------------------------------------------------
def _flatten_params(tree, prefix="", out=None):
    if out is None:
        out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten_params(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten_params(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_params(flat: Mapping[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _reader_cfg_classes():
    from retrieval_scaling_tpu.models.mamba import MambaConfig

    return {
        "GPTNeoXConfig": GPTNeoXConfig,
        "LlamaConfig": LlamaConfig,
        "MambaConfig": MambaConfig,
    }


def _save_cached_reader(base: str, params, cfg, revision: str | None = None) -> None:
    import dataclasses
    import json
    import os

    os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
    np.savez(base + ".tmp", **_flatten_params(params))
    os.replace(base + ".tmp.npz", base + ".npz")
    meta = {"family": type(cfg).__name__, "fields": dataclasses.asdict(cfg)}
    if revision:
        meta["revision"] = revision
    with open(base + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(base + ".json.tmp", base + ".json")


def _load_cached_reader(base: str):
    import json

    with open(base + ".json") as f:
        meta = json.load(f)
    fields = meta["fields"]
    for key in ("sliding_pattern",):  # tuples round-trip json as lists
        if fields.get(key) is not None:
            fields[key] = tuple(fields[key])
    cfg = _reader_cfg_classes()[meta["family"]](**fields)
    with np.load(base + ".npz") as data:
        params = _unflatten_params({k: data[k] for k in data.files})
    return params, cfg


def _hub_revision(name_or_path: str) -> str | None:
    """Resolved commit hash of a hub model's config.json in the local hub
    cache (None when unresolvable, e.g. before the first download)."""
    try:
        from huggingface_hub import try_to_load_from_cache

        ref = try_to_load_from_cache(str(name_or_path), "config.json")
        if isinstance(ref, str):
            # .../snapshots/<commit_hash>/config.json
            return os.path.basename(os.path.dirname(ref))
    except Exception:
        pass
    return None


def _reader_cache_base(cache_dir: str, name_or_path: str, dtype) -> str:
    import glob as _glob
    import hashlib

    stamps = []
    if os.path.isdir(str(name_or_path)):
        # Local checkpoints: invalidate on ANY config/weight-file edit, not
        # just config.json — a re-saved model.safetensors must miss the cache.
        for pattern in ("config.json", "*.safetensors", "*.bin", "*.pt"):
            for f in sorted(_glob.glob(os.path.join(str(name_or_path), pattern))):
                st = os.stat(f)
                stamps.append(f"{os.path.basename(f)}:{st.st_mtime_ns}:{st.st_size}")
    # Hub models: the key is name+dtype only (stable across the first two
    # runs — the hub cache is empty before run 1's download, so a key
    # derived from the resolved revision would change between runs);
    # revision staleness is checked against the cached json's "revision"
    # at load time instead.
    key = hashlib.sha1(
        f"{name_or_path}|{np.dtype(dtype).name}|{'|'.join(stamps)}".encode()
    ).hexdigest()[:16]
    return os.path.join(cache_dir, f"reader_{key}")


def load_hf_reader(name_or_path: str, dtype=np.float32, cache_dir: str | None = None):
    """Load any supported causal reader (GPT-NeoX/Pythia, GPT-2, OPT, or
    llama family).

    Mirrors the reference's ``AutoModelForCausalLM`` reader loading
    (reference: src/evaluate_perplexity.py:97-108); dispatch is by HF
    ``model_type``. ``cache_dir`` caches the CONVERTED params (flattened
    npz + config json) so later boots skip the torch load entirely.
    """
    base = None
    is_local = os.path.isdir(str(name_or_path))
    if cache_dir:
        base = _reader_cache_base(cache_dir, name_or_path, dtype)
        if os.path.exists(base + ".npz") and os.path.exists(base + ".json"):
            import json
            import time

            stale = False
            if not is_local:
                # hub staleness: a cached revision that differs from the
                # currently-resolvable one means the branch moved
                with open(base + ".json") as f:
                    cached_rev = json.load(f).get("revision")
                current_rev = _hub_revision(name_or_path)
                stale = bool(cached_rev and current_rev and cached_rev != current_rev)
            if not stale:
                age_h = (time.time() - os.path.getmtime(base + ".npz")) / 3600.0
                logger.info(
                    "Loading converted reader from cache %s (age %.1f h)", base, age_h
                )
                return _load_cached_reader(base)
            logger.info("Converted-reader cache stale (revision moved); reconverting")

    import transformers

    hf = transformers.AutoModelForCausalLM.from_pretrained(name_or_path)
    model_type = getattr(hf.config, "model_type", "gpt_neox")
    if model_type in _LLAMA_MODEL_TYPES:
        out = llama_from_hf_model(hf, dtype=dtype)
    elif model_type == "gpt2":
        out = gpt2_from_hf_model(hf, dtype=dtype)
    elif model_type == "opt":
        out = opt_from_hf_model(hf, dtype=dtype)
    elif model_type == "mamba":
        out = mamba_from_hf_model(hf, dtype=dtype)
    else:
        out = gpt_neox_from_hf_model(hf, dtype=dtype)
    if base is not None:
        # resolve the revision AFTER from_pretrained (which populates the
        # hub cache on a fresh machine)
        revision = None if is_local else _hub_revision(name_or_path)
        _save_cached_reader(base, *out, revision=revision)
    return out


def reader_lm_loss(params, cfg, input_ids, labels):
    """Architecture-dispatching causal LM loss: (sum_loss, n_scored_tokens)."""
    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_lm
    from retrieval_scaling_tpu.models.llama import llama_lm
    from retrieval_scaling_tpu.models.mamba import MambaConfig, mamba_lm

    if isinstance(cfg, LlamaConfig):
        return llama_lm(params, cfg, input_ids, labels)
    if isinstance(cfg, MambaConfig):
        return mamba_lm(params, cfg, input_ids, labels)
    return gpt_neox_lm(params, cfg, input_ids, labels)


def reader_hidden(params, cfg, input_ids):
    """Architecture-dispatching forward to the FINAL-norm hidden states
    (no vocab head) — the blockwise-loss entry point (models/loss.py)."""
    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_forward
    from retrieval_scaling_tpu.models.llama import llama_forward
    from retrieval_scaling_tpu.models.mamba import MambaConfig, mamba_forward

    if isinstance(cfg, LlamaConfig):
        return llama_forward(params, cfg, input_ids)
    if isinstance(cfg, MambaConfig):
        return mamba_forward(params, cfg, input_ids, return_hidden=True)
    return gpt_neox_forward(params, cfg, input_ids, return_hidden=True)


def reader_logits_from_hidden(params, cfg, hidden):
    """Vocab head only (incl. soft-capping / int8-head dispatch)."""
    from retrieval_scaling_tpu.models.gpt_neox import neox_logits
    from retrieval_scaling_tpu.models.llama import llama_logits
    from retrieval_scaling_tpu.models.mamba import MambaConfig, mamba_logits

    if isinstance(cfg, LlamaConfig):
        return llama_logits(params, cfg, hidden)
    if isinstance(cfg, MambaConfig):
        return mamba_logits(params, cfg, hidden)
    return neox_logits(params, hidden)


def reader_logits(params, cfg, input_ids):
    """Architecture-dispatching causal LM forward: logits [B, S, V]."""
    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_forward
    from retrieval_scaling_tpu.models.llama import llama_forward, llama_logits
    from retrieval_scaling_tpu.models.mamba import MambaConfig, mamba_forward

    if isinstance(cfg, LlamaConfig):
        return llama_logits(params, cfg, llama_forward(params, cfg, input_ids))
    if isinstance(cfg, MambaConfig):
        return mamba_forward(params, cfg, input_ids)
    return gpt_neox_forward(params, cfg, input_ids)
