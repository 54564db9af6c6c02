"""Tensor-parallel parameter layouts for reader LMs.

The reference reaches reader TP through vLLM (``tensor_parallel_size``,
reference: lm_eval/models/vllm_causallms.py:34). TPU-native: a
PartitionSpec tree over the mesh ``model`` axis — attention heads and the
FFN hidden dim shard, LayerNorms/embeddings replicate, and the vocab
projection shards its output dim. XLA's SPMD partitioner inserts the
all-reduces (one after attention out-proj, one after mlp down-proj per
layer), exactly the Megatron layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpt_neox_reader_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    def layer_spec(layer):
        spec = {
            "ln1_scale": P(), "ln1_bias": P(),
            "qkv_w": P(None, None, "model", None),
            "qkv_b": P(None, "model", None),
            "attn_out_w": P("model", None, None),
            "attn_out_b": P(),
            "ln2_scale": P(), "ln2_bias": P(),
            "mlp_in_w": P(None, "model"),
            "mlp_in_b": P("model"),
            "mlp_out_w": P("model", None),
            "mlp_out_b": P(),
        }
        return {k: spec[k] for k in layer}

    out = {
        "embed_in": P(),
        "final_ln_scale": P(),
        "final_ln_bias": P(),
        "embed_out": P(None, "model"),
        "layers": [layer_spec(l) for l in params["layers"]],
    }
    if "pos_embed" in params:  # GPT-2 learned positions: replicated
        out["pos_embed"] = P()
    return out


def llama_reader_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    def layer_spec(layer):
        spec = {
            "input_norm": P(),
            "q_w": P(None, "model", None),
            "k_w": P(None, "model", None),
            "v_w": P(None, "model", None),
            "q_b": P("model", None),
            "k_b": P("model", None),
            "v_b": P("model", None),
            "q_norm": P(),
            "k_norm": P(),
            "o_w": P("model", None, None),
            "post_norm": P(),
            "post_attn_norm": P(),
            "post_mlp_norm": P(),
            "gate_w": P(None, "model"),
            "up_w": P(None, "model"),
            "down_w": P("model", None),
        }
        return {k: spec[k] for k in layer}

    out = {
        "embed": P(),
        "final_norm": P(),
        "layers": [layer_spec(l) for l in params["layers"]],
    }
    if "lm_head" in params:
        out["lm_head"] = P(None, "model")
    return out


def reader_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Dispatch on the param-tree structure (GPT-NeoX vs llama family)."""
    if "embed_in" in params:
        return gpt_neox_reader_specs(params)
    if "embed" in params:
        return llama_reader_specs(params)
    raise ValueError(f"unknown reader param tree: {sorted(params)[:5]}")


def _fit_spec(mesh: Mesh, param, spec: P) -> P:
    """Drop sharding on dims the mesh doesn't divide (e.g. GPT-2's odd
    50257-vocab head under model=2) — those leaves replicate instead of
    erroring, so TP works for any checkpoint."""
    shape = getattr(param, "shape", None)
    if shape is None or len(shape) < len(spec):
        return spec
    fitted = []
    for dim, axes in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axes is None:
            fitted.append(None)
            continue
        ax_tuple = axes if isinstance(axes, tuple) else (axes,)
        total = 1
        for a in ax_tuple:
            total *= mesh.shape[a]
        fitted.append(axes if dim % total == 0 else None)
    while fitted and fitted[-1] is None:
        fitted.pop()
    return P(*fitted)


def reader_param_shardings(mesh: Mesh, params: Dict[str, Any]):
    specs = reader_param_specs(params)
    return jax.tree.map(
        lambda p, s: NamedSharding(mesh, _fit_spec(mesh, p, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P),
    )


def shard_reader_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.device_put(params, reader_param_shardings(mesh, params))
