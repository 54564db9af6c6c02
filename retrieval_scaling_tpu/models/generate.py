"""Autoregressive generation for the GPT-NeoX reader with a KV cache.

Needed by the RAG evaluation harness's ``generate_until`` tasks
(reference: rag-evaluation-harness ``lm_eval/models/huggingface.py``
``_model_generate``). TPU-first decode loop:

  * static-shape KV cache of per-layer ``[B, H, max_len, hd]`` buffers:
    prefill populates them with masked one-hot writes (per-row write
    positions, so ragged prompts need no left padding); decode steps write
    in place via per-row dynamic slices aliased with the while-loop carry
    — O(rows) traffic per step, not O(cache);
  * prefill runs the full prompt through one causal forward that also
    populates the cache; decode is a ``lax.while_loop`` of single-token
    steps (stops early when every row hit EOS);
  * greedy or temperature sampling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.models.gpt_neox import (
    GPTNeoXConfig,
    _apply_rotary,
    _layer_norm,
    _rotary_cos_sin,
    neox_attn_out,
    neox_logits,
    neox_mlp,
    neox_qkv,
)
from retrieval_scaling_tpu.models.llama import (
    LlamaConfig,
    _layer_norm_np,
    _qkv as _llama_qkv,
    _rms_norm,
    attn_out_proj as _llama_attn_out,
    llama_logits as _llama_logits,
    llama_mlp as _llama_mlp,
    rotary_cos_sin as _llama_rotary_cos_sin,
)

NEG_INF = -1e30


class KVCache(NamedTuple):
    k: tuple  # L per-layer arrays [B, H, max_len, hd]
    v: tuple
    # int8 KV cache (opt-in): per-(batch, head, slot) dequant scales
    k_scale: tuple | None = None  # L arrays [B, H, max_len] f32
    v_scale: tuple | None = None


def init_cache(cfg, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    """Zeroed KV cache sized for ``cfg`` (GPT-NeoX or llama family).

    Llama-family caches store only ``num_kv_heads`` heads (GQA) — queries
    repeat them at attention time, so cache HBM stays at the grouped size.

    Per-layer buffers (a pytree), NOT one stacked [L, ...] array: a stacked
    cache forces ``jnp.stack`` to rebuild the whole thing every decode step
    (measured 9.2 ms/step at a 512-token Pythia-1B cache — the restack
    traffic dwarfed the weight stream); separate buffers let each layer's
    in-place slice write alias the while-loop carry.
    """
    if isinstance(cfg, LlamaConfig):
        shape = (batch, cfg.num_kv_heads, max_len, cfg.hd)
    else:
        shape = (batch, cfg.num_heads, max_len, cfg.head_dim)
    if dtype == jnp.int8:
        # int8 KV cache: halves the per-step cache read (the long-context
        # decode bottleneck) and doubles context slots per chip; rows are
        # symmetric int8 with per-(b, head, slot) dequant scales.
        zeros = lambda: tuple(jnp.zeros(shape, jnp.int8) for _ in range(cfg.num_layers))
        szeros = lambda: tuple(jnp.zeros(shape[:3], jnp.float32) for _ in range(cfg.num_layers))
        return KVCache(zeros(), zeros(), szeros(), szeros())
    return KVCache(
        tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
    )


def _attention_with_cache(
    q, keys, values, q_pos, key_valid,
    sm_scale=None, logit_cap=None, window=None,
    k_scale=None, v_scale=None, all_visible=False,
):
    """q: [B, H, S, hd]; keys/values: [B, H, M, hd]; q_pos: [B, S];
    key_valid: [B, M] — full mask attention (keys beyond q_pos excluded;
    ``window`` additionally hides keys at positions <= q_pos - window;
    ``logit_cap`` = Gemma-2 tanh soft-capping).

    int8 cache: ``k_scale``/``v_scale`` [B, H, M] dequantize per key slot
    — folded into the SCORES (scores * k_scale) and the PROBS
    (probs * v_scale), so the [M, hd]-sized cache reads stay int8 and no
    dequantized copy ever exists.

    GQA: keys/values may carry fewer heads than q ([B, Hkv, M, hd]).
    Query groups fold into the row axis (HF's kv-major head order makes
    head h = kv * n_rep + r, so a reshape groups the rows exactly) — the
    grouped cache is never repeated in HBM."""
    b, h, sq, hd = q.shape
    hkv = keys.shape[1]
    if hkv != h:
        g = h // hkv
        q2 = q.reshape(b, hkv, g * sq, hd)
        qpos2 = jnp.broadcast_to(q_pos[:, None, :], (b, g, sq)).reshape(b, g * sq)
        out = _attention_with_cache(
            q2, keys, values, qpos2, key_valid,
            sm_scale=sm_scale, logit_cap=logit_cap, window=window,
            k_scale=k_scale, v_scale=v_scale, all_visible=all_visible,
        )
        return out.reshape(b, h, sq, hd)
    if (
        all_visible and k_scale is None
        and keys.shape[2] >= 256 and jax.default_backend() == "tpu"
    ):
        # (>= 256 slots: at tiny caches the XLA chain's intermediates are
        # small and the kernel's per-program overhead isn't worth it)
        # Decode steps (``all_visible``: every query may see every valid
        # key, so key_valid alone is the whole mask): the Pallas flash
        # kernel streams K/V through VMEM once with an online softmax —
        # the XLA path's mask/softmax/probs elementwise chain makes
        # several extra passes over cache-sized intermediates (measured
        # ~2x the K+V read floor at 1024-token caches). Sliding windows
        # fold into the [B, M] key mask (all decode rows share one
        # position), and soft-capping is fused in the kernel, so
        # Mistral/Gemma-2/Phi-3 decode takes this route too.
        from retrieval_scaling_tpu.ops.flash_attention import flash_attention_sharded

        mask = key_valid
        if window is not None:
            key_pos = jnp.arange(keys.shape[2])[None, :]          # [1, M]
            mask = mask & (key_pos > q_pos[:, :1] - window)       # [B, M]
        return flash_attention_sharded(
            q, keys, values, kv_mask=mask,
            sm_scale=sm_scale if sm_scale is not None else q.shape[-1] ** -0.5,
            logit_cap=float(logit_cap) if logit_cap else None,
        )
    # no f32 casts on the operands: bf16 x bf16 -> f32 is the MXU's native
    # mode. For the int8 cache the matmul runs in bf16 REGARDLESS of q's
    # dtype (int8 row values are exact in bf16, and the int8->bf16 convert
    # fuses into the dot operand load — an f32 path would materialize a
    # dequantized cache copy and defeat the halved stream).
    qd = jnp.bfloat16 if k_scale is not None else q.dtype
    scores = jnp.einsum(
        "bhsd,bhmd->bhsm", q.astype(qd), keys.astype(qd),
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    scores = scores * (sm_scale if sm_scale is not None else q.shape[-1] ** -0.5)
    if logit_cap:
        scores = logit_cap * jnp.tanh(scores / logit_cap)
    m = keys.shape[2]
    key_pos = jnp.arange(m)[None, None, None, :]             # [1,1,1,M]
    ok = key_valid[:, None, None, :] & (key_pos <= q_pos[:, None, :, None])
    if window is not None:
        ok = ok & (key_pos > q_pos[:, None, :, None] - window)
    scores = jnp.where(ok, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
        return jnp.einsum(
            "bhsm,bhmd->bhsd", probs.astype(jnp.bfloat16),
            values.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    return jnp.einsum("bhsm,bhmd->bhsd", probs.astype(values.dtype), values)


def _write_kv(cache_k, cache_v, k, v, positions, write_onehot, ks=None, vs=None):
    """Write new K/V ([B, H, S, hd]) into the cache ([B, H, M, hd]).

    Prefill (S > 1): additive one-hot matmul into zeroed slots — pad
    tokens are masked out of ``write_onehot``. Decode (S == 1,
    ``write_onehot is None``): per-row ``dynamic_update_slice`` at each
    row's slot — XLA aliases the while-loop carry and updates in place,
    so the step writes O(1) rows instead of streaming the WHOLE cache
    through HBM (measured: the one-hot write alone cost ~2.6 ms/step at
    a 512-token cache on Pythia-1B/v5e — more than the weight stream).
    """
    quantized = cache_k.dtype == jnp.int8
    if quantized:
        (k, k_sc), (v, v_sc) = _quantize_kv_rows(k), _quantize_kv_rows(v)
    if write_onehot is None:
        def upd(c, u, p):
            return jax.lax.dynamic_update_slice(c, u.astype(c.dtype), (0, p, 0))

        new_k = jax.vmap(upd)(cache_k, k, positions[:, 0])
        new_v = jax.vmap(upd)(cache_v, v, positions[:, 0])
        if quantized:
            def upd2(c, u, p):
                return jax.lax.dynamic_update_slice(c, u, (0, p))

            return new_k, new_v, (
                jax.vmap(upd2)(ks, k_sc, positions[:, 0]),
                jax.vmap(upd2)(vs, v_sc, positions[:, 0]),
            )
        return new_k, new_v, None
    if quantized:
        # one-hot write in f32 (int8 values are exact small integers),
        # then cast back; scales write the same way
        oh = write_onehot.astype(jnp.float32)
        new_k = (cache_k.astype(jnp.float32)
                 + jnp.einsum("bms,bhsd->bhmd", oh, k.astype(jnp.float32))).astype(jnp.int8)
        new_v = (cache_v.astype(jnp.float32)
                 + jnp.einsum("bms,bhsd->bhmd", oh, v.astype(jnp.float32))).astype(jnp.int8)
        new_ks = ks + jnp.einsum("bms,bhs->bhm", oh, k_sc)
        new_vs = vs + jnp.einsum("bms,bhs->bhm", oh, v_sc)
        return new_k, new_v, (new_ks, new_vs)
    new_k = cache_k + jnp.einsum("bms,bhsd->bhmd", write_onehot, k.astype(cache_k.dtype))
    new_v = cache_v + jnp.einsum("bms,bhsd->bhmd", write_onehot, v.astype(cache_v.dtype))
    return new_k, new_v, None


def _quantize_kv_rows(t):
    """[B, H, S, hd] float -> (int8 rows, f32 scales [B, H, S])."""
    tf = t.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(tf), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    return jnp.round(tf / safe[..., None]).astype(jnp.int8), scale


def quantize_decode_params(params, cfg, scheme: str = "int8"):
    """Weight-only int8 reader params (scoring + decode paths).

    Decode throughput is weight-bytes / HBM bandwidth; int8 storage halves
    the stream (and quarters reader HBM vs f32). Projection weights become
    per-output-channel int8 pairs (``<name>@q8`` / ``<name>@s``, reshaped
    2-D); embeddings, norms, and biases stay float. Tied-embedding heads
    are left float (the embedding table is shared with the lookup). Every
    forward (``llama_forward`` / ``gpt_neox_forward`` / the KV-cache
    blocks here) dispatches per-weight, so one quantized param set serves
    loglikelihood scoring and generation. Opt-in — greedy decode can
    diverge from the float model on near-tie logits, so HF-parity paths
    keep bf16.

    ``scheme="int4"``: group-128 4-bit weights (half the int8 stream
    again); weights whose K dim is not group-divisible stay int8.

    ``scheme="bf16"``: NO quantization — a pure 2-D re-layout (bf16
    weights, unit scales) so decode matmuls route through the same
    weight-streaming Pallas kernel, which beats XLA's plain decode dots
    at [B<=32, K] x [K, N] shapes (round-4 on-chip A/B at Pythia-1B b8:
    3.73 vs 3.93 ms/step). Numerics are the bf16 weights unchanged;
    prefill/scoring shapes fall back to a plain MXU dot.
    """
    from retrieval_scaling_tpu.ops.quant_matmul import (
        INT4_GROUP,
        pad_cols_for_stream,
        quantize_weight,
        quantize_weight_int4,
    )

    if scheme not in ("int8", "int4", "bf16"):
        raise ValueError(f"unknown quantization scheme {scheme!r}")
    is_llama = isinstance(cfg, LlamaConfig)
    layer_keys = (
        ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
        if is_llama
        else ("qkv_w", "attn_out_w", "mlp_in_w", "mlp_out_w")
    )

    def _pad_cols(store, name, w2d):
        # Column-pad awkward widths (the vocab head) so the streaming
        # kernel gets full-cap blocks; q8_dot slices the pad back off via
        # the static SHAPE of the @padcols marker (zero-filled columns).
        itemsize = 2 if scheme == "bf16" else 1
        k_rows = w2d.shape[0] // 2 if scheme == "int4" else w2d.shape[0]
        pad = pad_cols_for_stream(k_rows, w2d.shape[1], itemsize)
        if pad and (w2d.shape[1] + pad) % 128 == 0:
            w2d = jnp.pad(w2d, ((0, 0), (0, pad)))
            store[f"{name}@padcols"] = jnp.zeros((pad,), jnp.int8)
        return w2d

    def _store_2d(store, name, w2d):
        w2d = _pad_cols(store, name, w2d)
        if scheme == "int4" and w2d.shape[0] % INT4_GROUP == 0:
            qw4 = quantize_weight_int4(w2d)
            store[f"{name}@q4"] = qw4.packed
            store[f"{name}@s4g"] = qw4.scale
            return
        if scheme == "bf16":
            store[f"{name}@q8"] = w2d.astype(jnp.bfloat16)
            store[f"{name}@s"] = jnp.ones((1, w2d.shape[1]), jnp.float32)
            return
        qw = quantize_weight(w2d)
        store[f"{name}@q8"] = qw.wq
        store[f"{name}@s"] = qw.scale

    def as_2d(w, name):
        if name in ("attn_out_w", "o_w"):
            return w.reshape(-1, w.shape[-1])           # [H*hd, d]
        return w.reshape(w.shape[0], -1)                # [d, ...]

    def quantize_into(store, name):
        _store_2d(store, name, as_2d(store.pop(name), name))

    def fuse_ncat(store, out_name, names):
        # same-K column concat: one stream, callers split output columns
        w2d = jnp.concatenate(
            [as_2d(store.pop(n), n) for n in names], axis=1
        )
        _store_2d(store, out_name, w2d)

    def fuse_kcat(store, out_name, names):
        # row concat with exact per-part scales (q8_splitk_dot sums the
        # two projections in one streamed kernel)
        wa = as_2d(store.pop(names[0]), names[0])
        wb = as_2d(store.pop(names[1]), names[1])
        if scheme == "bf16":
            w2d = jnp.concatenate([wa, wb], axis=0).astype(jnp.bfloat16)
            sa = sb = jnp.ones((1, w2d.shape[1]), jnp.float32)
        else:
            qa, qb = quantize_weight(wa), quantize_weight(wb)
            w2d = jnp.concatenate([qa.wq, qb.wq], axis=0)
            sa, sb = qa.scale, qb.scale
        pad = pad_cols_for_stream(w2d.shape[0], w2d.shape[1], w2d.dtype.itemsize)
        if pad and (w2d.shape[1] + pad) % 128 == 0:
            w2d = jnp.pad(w2d, ((0, 0), (0, pad)))
            sa = jnp.pad(sa, ((0, 0), (0, pad)))
            sb = jnp.pad(sb, ((0, 0), (0, pad)))
            store[f"{out_name}@padcols"] = jnp.zeros((pad,), jnp.int8)
        store[f"{out_name}@q8"] = w2d
        store[f"{out_name}@sa"] = sa
        store[f"{out_name}@sb"] = sb

    # Launch fusion (~60 us marginal per pallas_call on chip — see
    # ops/quant_matmul.py): merge per-layer weight streams so decode
    # issues 2 calls/layer (NeoX parallel residual: qkv|mlp_in dual-input
    # N-concat + attn_out;mlp_out split-K) or 4 (Llama: q|k|v and gate|up
    # N-concats). int4 keeps per-weight streams (its kernel is
    # group-scaled and unfused).
    fuse = scheme in ("int8", "bf16")

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new = dict(layer)
        if fuse and is_llama:
            fuse_ncat(new, "qkv3", ("q_w", "k_w", "v_w"))
            fuse_ncat(new, "gateup", ("gate_w", "up_w"))
            quantize_into(new, "o_w")
            quantize_into(new, "down_w")
        elif fuse and not is_llama and cfg.use_parallel_residual:
            fuse_ncat(new, "qkv_mi", ("qkv_w", "mlp_in_w"))
            fuse_kcat(new, "ao_mo", ("attn_out_w", "mlp_out_w"))
        else:
            for name in layer_keys:
                quantize_into(new, name)
        out["layers"].append(new)
    if is_llama:
        if not cfg.tie_embeddings and "lm_head" in out:
            quantize_into(out, "lm_head")
    else:
        quantize_into(out, "embed_out")
    return out


def _block_with_cache(layer, cfg, x, cache_k, cache_v, positions, key_valid, write_onehot, scales=None, all_visible=None):
    """One transformer block writing its new K/V into the cache.

    positions: [B, S] absolute positions of x's tokens.
    write_onehot: [B, M, S] one-hot of each token's cache slot.
    all_visible: every query may see every valid key (single-token decode);
    None = infer from the write path. Multi-token verify segments
    (speculative decoding) use dus writes but still need the per-query
    ``key_pos <= q_pos`` causal mask.
    Returns (x_out, new_cache_k, new_cache_v).
    """
    if all_visible is None:
        all_visible = write_onehot is None
    act = cfg.gelu
    ln1 = _layer_norm(x, layer["ln1_scale"], layer["ln1_bias"], cfg.layer_norm_eps)
    # Launch fusion (parallel residual + fused qkv|mlp_in storage): ln2
    # depends only on x, so ONE q8_dual_in_dot streams the fused weight
    # once and yields both the qkv projection (from ln1) and the MLP
    # hidden (from ln2) — 2 streaming calls/layer total with the
    # attn_out+mlp_out split-K dot below.
    fused = "qkv_mi@q8" in layer and cfg.use_parallel_residual
    h_act = None
    if fused:
        from retrieval_scaling_tpu.models.gpt_neox import _mlp_act
        from retrieval_scaling_tpu.ops.quant_matmul import (
            q8_dual_in_dot,
            q8_splitk_dot,
        )

        ln2 = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.layer_norm_eps)
        b, s, _ = ln1.shape
        nqkv = layer["qkv_b"].size  # 3 * H * hd
        qkv_flat, mlp_h = q8_dual_in_dot(layer, "qkv_mi", ln1, ln2, nqkv)
        qkv = qkv_flat.reshape(b, s, 3, cfg.num_heads, cfg.head_dim) + layer["qkv_b"][None, None]
        q, k, v = tuple(jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3))
        h_act = _mlp_act(mlp_h + layer["mlp_in_b"], act)
    else:
        q, k, v = neox_qkv(layer, cfg, ln1)  # [B, H, S, hd]

    rot = cfg.rotary_dims
    max_pos = cfg.max_position_embeddings
    cos_all, sin_all = _rotary_cos_sin(max_pos, max(rot, 2), cfg.rotary_base, jnp.float32)
    cos = cos_all[positions]  # [B, S, rot]
    sin = sin_all[positions]

    def rope(t):
        if rot == 0:  # GPT-2: learned positions, no rotary
            return t
        tr = t[..., :rot].astype(jnp.float32)
        half = rot // 2
        t1, t2 = tr[..., :half], tr[..., half:]
        rotated = jnp.concatenate([-t2, t1], axis=-1)
        out = tr * cos[:, None] + rotated * sin[:, None]
        return jnp.concatenate([out.astype(t.dtype), t[..., rot:]], axis=-1)

    q, k = rope(q), rope(k)

    ks, vs = scales if scales is not None else (None, None)
    new_k, new_v, new_scales = _write_kv(cache_k, cache_v, k, v, positions, write_onehot, ks, vs)
    nks, nvs = new_scales if new_scales is not None else (None, None)

    attn = _attention_with_cache(
        q, new_k, new_v, positions, key_valid, k_scale=nks, v_scale=nvs,
        all_visible=all_visible,
    )

    if fused:
        # attn_out + mlp_out as ONE split-K streamed dot (the parallel
        # residual ADDS them anyway); biases applied outside the kernel.
        bb, hh, ss, hd = attn.shape
        attn_flat = jnp.moveaxis(attn, 1, 2).reshape(bb, ss, hh * hd)
        both = q8_splitk_dot(layer, "ao_mo", attn_flat.astype(h_act.dtype), h_act)
        x = x + both + (layer["attn_out_b"] + layer["mlp_out_b"]).astype(x.dtype)
    elif cfg.use_parallel_residual:
        attn_out = neox_attn_out(layer, attn)
        ln2 = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.layer_norm_eps)
        x = x + attn_out + neox_mlp(layer, ln2, act)
    else:
        attn_out = neox_attn_out(layer, attn)
        x = x + attn_out
        ln2b = _layer_norm(x, layer["ln2_scale"], layer["ln2_bias"], cfg.layer_norm_eps)
        x = x + neox_mlp(layer, ln2b, act)
    return x, new_k, new_v, new_scales


def _llama_norm(cfg: LlamaConfig, v, scale):
    if cfg.norm_type == "layernorm_np":
        return _layer_norm_np(v, cfg.rms_eps)
    return _rms_norm(v, scale, cfg.rms_eps, cfg.rms_norm_offset)


def _llama_block_with_cache(layer, cfg: LlamaConfig, x, cache_k, cache_v, positions, key_valid, write_onehot, window=None, scales=None, all_visible=None):
    """Llama-family block writing grouped K/V into the cache — mirrors
    ``llama_forward`` across the family variants (Gemma/Gemma-2/OLMo-1/2:
    norm type/placement, gelu-tanh MLP, soft-capping, sliding windows).

    Cache holds ``num_kv_heads``; queries repeat them at attention time.
    """
    if all_visible is None:
        all_visible = write_onehot is None
    post_only = cfg.norm_placement == "post_output"
    pre_post = cfg.norm_placement == "pre_post"
    h = x if post_only else _llama_norm(cfg, x, layer["input_norm"])
    q, k, v = _llama_qkv(layer, cfg, h)  # q: [B,H,S,hd]; k,v: [B,Hkv,S,hd]

    cos_all, sin_all = _llama_rotary_cos_sin(cache_k.shape[2], cfg.hd, cfg.rope_base, cfg=cfg)
    cos = cos_all[positions]  # [B, S, hd]
    sin = sin_all[positions]

    def rope(t):
        tf = t.astype(jnp.float32)
        half = cfg.hd // 2
        t1, t2 = tf[..., :half], tf[..., half:]
        rotated = jnp.concatenate([-t2, t1], axis=-1)
        return (tf * cos[:, None] + rotated * sin[:, None]).astype(t.dtype)

    q, k = rope(q), rope(k)

    ks, vs = scales if scales is not None else (None, None)
    new_k, new_v, new_scales = _write_kv(cache_k, cache_v, k, v, positions, write_onehot, ks, vs)
    nks, nvs = new_scales if new_scales is not None else (None, None)

    n_rep = cfg.num_heads // cfg.num_kv_heads
    sm_scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None else None
    )
    if write_onehot is None and n_rep > 1 and q.shape[2] == 1:
        # decode-step GQA: fold the query groups into the S axis instead of
        # repeat_kv, which would copy the whole grouped cache n_rep times
        # every step. All n_rep queries share one position -> positions
        # broadcast and the kv head attends its group as S=n_rep rows.
        b_, h_, _, hd_ = q.shape
        q_g = q.reshape(b_, cfg.num_kv_heads, n_rep, hd_)
        attn = _attention_with_cache(
            q_g, new_k, new_v,
            jnp.broadcast_to(positions[:, :1], (b_, n_rep)), key_valid,
            sm_scale=sm_scale, logit_cap=cfg.attn_logit_softcap, window=window,
            k_scale=nks, v_scale=nvs, all_visible=True,
        ).reshape(b_, h_, 1, hd_)
    else:
        # grouped K/V go in directly: _attention_with_cache folds the
        # query groups into the row axis (no n_rep x cache copy)
        attn = _attention_with_cache(
            q, new_k, new_v, positions, key_valid,
            sm_scale=sm_scale, logit_cap=cfg.attn_logit_softcap, window=window,
            k_scale=nks, v_scale=nvs, all_visible=all_visible,
        )
    attn_out = _llama_attn_out(layer, attn)
    if post_only or pre_post:
        attn_out = _llama_norm(cfg, attn_out, layer["post_attn_norm"])
    x = x + attn_out

    h = x if post_only else _llama_norm(cfg, x, layer["post_norm"])
    mlp_out = _llama_mlp(layer, cfg, h)
    if post_only or pre_post:
        mlp_out = _llama_norm(cfg, mlp_out, layer["post_mlp_norm"])
    x = x + mlp_out
    return x, new_k, new_v, new_scales


def forward_with_cache(
    params,
    cfg,
    input_ids: jax.Array,   # [B, S]
    positions: jax.Array,   # [B, S] absolute positions (pad rows repeat last)
    cache: KVCache,
    key_valid: jax.Array,   # [B, M] which cache slots hold real keys AFTER this call
    write_mask: jax.Array | None = None,  # [B, S] tokens that may write (pads must not)
    contiguous_writes: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run a segment, writing K/V at ``positions``; returns (logits, cache).

    Cache writes are additive one-hots into zeroed slots, so tokens beyond a
    row's real length MUST be masked out of ``write_mask`` or they would
    pollute slots that decode writes into later.

    ``contiguous_writes``: positions are per-row contiguous runs
    (``start + arange(S)``), so K/V writes go through the per-row
    ``dynamic_update_slice`` path — REPLACING slot contents instead of
    adding into zeroed ones. Speculative verify segments rely on this to
    overwrite slots holding rejected drafts from the previous step.
    """
    b, s = input_ids.shape
    max_len = cache.k[0].shape[2]
    is_llama = isinstance(cfg, LlamaConfig)
    x = params["embed"][input_ids] if is_llama else params["embed_in"][input_ids]
    if is_llama and cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(cfg.embedding_multiplier, x.dtype)
    if not is_llama and cfg.learned_positions:  # GPT-2 / OPT
        x = x + params["pos_embed"][positions + cfg.position_offset]

    if write_mask is None and (s == 1 or contiguous_writes):
        # decode step / verify segment: per-row in-place slice writes
        write_onehot = None
    else:
        slots = jnp.arange(max_len)[None, :, None]                  # [1, M, 1]
        cdtype = cache.k[0].dtype
        write_onehot = (slots == positions[:, None, :]).astype(cdtype)  # [B, M, S]
        if write_mask is not None:
            write_onehot = write_onehot * write_mask[:, None, :].astype(cdtype)

    quantized = cache.k_scale is not None
    # dus-written multi-token segments still need intra-segment causality
    all_visible = write_onehot is None and s == 1
    new_ks, new_vs, new_kss, new_vss = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        scales = (cache.k_scale[li], cache.v_scale[li]) if quantized else None
        if is_llama:
            window = None
            if (
                cfg.sliding_window is not None
                and cfg.sliding_pattern is not None
                and cfg.sliding_pattern[li]
            ):
                window = cfg.sliding_window
            x, nk, nv, nsc = _llama_block_with_cache(
                layer, cfg, x, cache.k[li], cache.v[li], positions, key_valid,
                write_onehot, window=window, scales=scales, all_visible=all_visible,
            )
        else:
            x, nk, nv, nsc = _block_with_cache(
                layer, cfg, x, cache.k[li], cache.v[li], positions, key_valid,
                write_onehot, scales=scales, all_visible=all_visible,
            )
        new_ks.append(nk)
        new_vs.append(nv)
        if quantized:
            new_kss.append(nsc[0])
            new_vss.append(nsc[1])

    if is_llama:
        x = _llama_norm(cfg, x, params["final_norm"])
        logits = _llama_logits(params, cfg, x)
    else:
        x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], cfg.layer_norm_eps)
        logits = neox_logits(params, x)
    if quantized:
        return logits, KVCache(
            tuple(new_ks), tuple(new_vs), tuple(new_kss), tuple(new_vss)
        )
    return logits, KVCache(tuple(new_ks), tuple(new_vs))


class GenState(NamedTuple):
    cache: KVCache
    tokens: jax.Array      # [B, max_new] generated so far
    last_token: jax.Array  # [B]
    cur_len: jax.Array     # [B] absolute next-write position
    finished: jax.Array    # [B] bool
    step: jax.Array
    rng: jax.Array


def make_generate_fn(cfg, max_new_tokens: int, eos_id: int, temperature: float = 0.0,
                     kv_cache: str | None = None, mesh=None, param_shardings=None):
    """Build a jitted ``(params, prompt_ids, prompt_lens, seed) -> tokens`` fn.

    prompt_ids: [B, S_pad] right-padded; prompt_lens: [B]. Output: [B,
    max_new_tokens] with eos_id after each row finishes.
    ``kv_cache="int8"``: quantized cache (half the per-step cache read,
    2x context slots per chip; opt-in — tiny logit perturbations).
    ``mesh``: data-parallel generation — prompt rows (and the KV cache
    with them) shard over the mesh's ``data`` axis, weights replicate
    (the HF-accelerate DDP analog for generate_until batches).
    ``param_shardings``: tensor-parallel generation — a NamedSharding
    tree (parallel/reader_tp.py Megatron layout) instead of replicated
    weights; the decode forwards are plain einsums, so GSPMD shards the
    per-step matmuls over the mesh 'model' axis and inserts the two
    all-reduces per layer (the vLLM tensor_parallel_size analog).
    """
    if kv_cache not in (None, "", "none", "int8"):
        raise ValueError(f"unknown kv_cache {kv_cache!r}")

    def fn(params, prompt_ids, prompt_lens, seed):
        # Any mesh: decode-step flash (>=256-slot caches) must trace inside
        # the sharding context or GSPMD replicates the pallas_call — under
        # TP that all-gathers the head-sharded KV cache every token; under
        # plain DP it all-gathers the row-sharded batch
        if mesh is not None:
            from retrieval_scaling_tpu.ops.flash_attention import (
                attention_head_sharding,
            )

            with attention_head_sharding(mesh):
                return _fn(params, prompt_ids, prompt_lens, seed)
        return _fn(params, prompt_ids, prompt_lens, seed)

    def _fn(params, prompt_ids, prompt_lens, seed):
        b, s_pad = prompt_ids.shape
        max_len = s_pad + max_new_tokens
        if max_len > cfg.max_position_embeddings:
            # learned-position gathers would silently clamp (GPT-2) and
            # rotary tables would be exceeded; refuse like HF does
            raise ValueError(
                f"prompt ({s_pad}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_position_embeddings ({cfg.max_position_embeddings})"
            )
        embed = params["embed"] if isinstance(cfg, LlamaConfig) else params["embed_in"]
        cache_dtype = jnp.int8 if kv_cache == "int8" else embed.dtype
        cache = init_cache(cfg, b, max_len, dtype=cache_dtype)

        # prefill: positions 0..s_pad-1 (pad tokens write masked-off slots)
        positions = jnp.broadcast_to(jnp.arange(s_pad)[None, :], (b, s_pad))
        key_valid = jnp.arange(max_len)[None, :] < prompt_lens[:, None]
        write_mask = jnp.arange(s_pad)[None, :] < prompt_lens[:, None]
        logits, cache = forward_with_cache(
            params, cfg, prompt_ids, positions, cache, key_valid, write_mask
        )
        # last real token's logits per row
        last_logits = jnp.take_along_axis(logits, (prompt_lens - 1)[:, None, None], axis=1)[:, 0]

        def sample(lg, rng):
            if temperature <= 0.0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            rng_next = jax.random.fold_in(rng, 0)
            return jax.random.categorical(rng_next, lg / temperature, axis=-1).astype(jnp.int32)

        rng0 = jax.random.PRNGKey(seed)
        first = sample(last_logits, rng0)
        tokens0 = jnp.full((b, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(first)
        state = GenState(
            cache=cache,
            tokens=tokens0,
            last_token=first,
            cur_len=prompt_lens,
            finished=first == eos_id,
            step=jnp.ones((), jnp.int32),
            rng=rng0,
        )

        def cond(st: GenState):
            return (st.step < max_new_tokens) & ~jnp.all(st.finished)

        def body(st: GenState):
            positions = st.cur_len[:, None]  # write slot for the new token
            key_valid = jnp.arange(max_len)[None, :] < (st.cur_len + 1)[:, None]
            logits, cache = forward_with_cache(
                params, cfg, st.last_token[:, None], positions, st.cache, key_valid
            )
            rng = jax.random.fold_in(st.rng, st.step)
            nxt = sample(logits[:, 0], rng)
            nxt = jnp.where(st.finished, eos_id, nxt)
            tokens = st.tokens.at[:, st.step].set(nxt)
            return GenState(
                cache=cache,
                tokens=tokens,
                last_token=nxt,
                cur_len=st.cur_len + 1,
                finished=st.finished | (nxt == eos_id),
                step=st.step + 1,
                rng=st.rng,
            )

        final = jax.lax.while_loop(cond, body, state)
        return final.tokens

    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, P("data"))
    rows2d = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(param_shardings if param_shardings is not None else rep,
                      rows2d, rows, rep),
        out_shardings=rows2d,
    )
