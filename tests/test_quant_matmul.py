"""Int8 fused quantized matmul: numerics vs f32 reference, Pallas-interpret
vs XLA-fallback parity, shape fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.ops.quant_matmul import (
    BM,
    QuantizedWeight,
    int8_matmul,
    quantize_weight,
)


def _cosine_rows(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    return num / den


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32))
    qw = quantize_weight(w)
    assert qw.wq.dtype == jnp.int8 and qw.wq.shape == (128, 256)
    deq = qw.wq.astype(jnp.float32) * qw.scale
    rel = np.abs(np.asarray(deq - w)) / np.abs(np.asarray(w)).max()
    assert rel.max() < 1 / 127


@pytest.mark.parametrize("activation", ["none", "gelu_tanh"])
def test_int8_matmul_matches_f32_reference(activation):
    rng = np.random.RandomState(1)
    m, k, n = 2 * BM, 256, 384
    x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)

    ref = jnp.dot(x.astype(jnp.float32), w) + bias
    if activation == "gelu_tanh":
        ref = jax.nn.gelu(ref, approximate=True)

    out = int8_matmul(
        x, quantize_weight(w), bias, activation=activation, impl="xla",
        out_dtype=jnp.float32,
    )
    cos = _cosine_rows(out, ref)
    assert cos.min() > 0.999, cos.min()


def test_pallas_interpret_matches_xla_fallback():
    rng = np.random.RandomState(2)
    m, k, n = BM, 128, 256
    x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    qw = quantize_weight(jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05))
    bias = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)

    out_xla = int8_matmul(x, qw, bias, impl="xla", out_dtype=jnp.float32)
    out_pl = int8_matmul(
        x, qw, bias, impl="pallas", interpret=True, out_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pl), rtol=2e-5, atol=2e-5
    )


def test_residual_ln_interpret_matches_xla():
    from retrieval_scaling_tpu.ops.quant_matmul import int8_matmul_residual_ln

    rng = np.random.RandomState(4)
    m, n, k = BM, 256, 128
    h = jnp.asarray(rng.randn(m, n).astype(np.float32), jnp.bfloat16)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    qw = quantize_weight(jnp.asarray(rng.randn(n, k).astype(np.float32) * 0.05))
    bias = jnp.asarray(rng.randn(k).astype(np.float32) * 0.1)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(k).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(k).astype(np.float32))

    out_xla = int8_matmul_residual_ln(h, x, qw, bias, g, b, impl="xla")
    out_pl = int8_matmul_residual_ln(h, x, qw, bias, g, b, impl="pallas", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_xla, np.float32), np.asarray(out_pl, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 outputs
    )

    # reference math: LayerNorm(x + h @ deq(w) + bias)
    y = (
        jnp.dot(h.astype(jnp.float32), qw.wq.astype(jnp.float32) * qw.scale)
        + bias
        + x.astype(jnp.float32)
    )
    mu = y.mean(axis=1, keepdims=True)
    var = ((y - mu) ** 2).mean(axis=1, keepdims=True)
    ref = (y - mu) / jnp.sqrt(var + 1e-12) * g + b
    cos = _cosine_rows(np.asarray(out_xla, np.float32), np.asarray(ref))
    assert cos.min() > 0.999, cos.min()


def test_batch_shape_and_fallback():
    """Leading dims flatten; M not divisible by BM takes the XLA path."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 7, 64).astype(np.float32), jnp.bfloat16)
    qw = quantize_weight(jnp.asarray(rng.randn(64, 96).astype(np.float32)))
    out = int8_matmul(x, qw, out_dtype=jnp.float32)
    assert out.shape == (3, 7, 96)
    ref = jnp.einsum(
        "bsk,kn->bsn", x.astype(jnp.float32), qw.wq.astype(jnp.float32) * qw.scale
    )
    assert _cosine_rows(out.reshape(-1, 96), ref.reshape(-1, 96)).min() > 0.999


def test_quantized_bert_embeddings_match_float():
    """int8-projection BERT embeddings stay in the float model's space."""
    from retrieval_scaling_tpu.models.bert import (
        BertConfig,
        contriever_embed,
        init_bert_params,
        quantize_bert_params,
    )

    cfg = BertConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=64,
    )
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_bert_params(params)
    assert qparams["layers"][0]["mlp_in_wq"].dtype == jnp.int8
    assert "mlp_in_w" not in qparams["layers"][0]
    # attention stays bf16 (int8 Pallas there measures net-negative)
    assert "qkv_w" in qparams["layers"][0]

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 128, (4, 24)), jnp.int32)
    mask = jnp.asarray(rng.rand(4, 24) < 0.9, jnp.int32).at[:, 0].set(1)

    ref = contriever_embed(params, cfg, ids, mask)
    out = contriever_embed(qparams, cfg, ids, mask)
    cos = _cosine_rows(out, ref)
    assert cos.min() > 0.995, cos.min()


def test_encoder_quantize_wiring():
    """JaxEncoder(quantize='int8') quantizes BERT params and still encodes."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from helpers import make_word_tokenizer

    from retrieval_scaling_tpu.models.bert import BertConfig, init_bert_params
    from retrieval_scaling_tpu.search.encoder import EncodeOptions, JaxEncoder

    tok = make_word_tokenizer(["alpha beta gamma delta epsilon"])
    cfg = BertConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=1,
        num_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    params = init_bert_params(cfg, jax.random.PRNGKey(1))
    enc_f = JaxEncoder(params, cfg, tok)
    enc_q = JaxEncoder(params, cfg, tok, quantize="int8")
    texts = ["alpha beta gamma", "delta epsilon"]
    a = enc_f.encode(texts, EncodeOptions(batch_size=2, maxlength=32))
    b = enc_q.encode(texts, EncodeOptions(batch_size=2, maxlength=32))
    assert _cosine_rows(a, b).min() > 0.99


def test_int8_decode_matmul_matches_reference():
    from retrieval_scaling_tpu.ops.quant_matmul import int8_decode_matmul

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 128).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(128, 512).astype(np.float32) * 0.05)
    qw = quantize_weight(w)
    out_pl = int8_decode_matmul(x, qw, impl="pallas", interpret=True, out_dtype=jnp.float32)
    assert out_pl.shape == (8, 512)
    ref = jnp.dot(x.astype(jnp.float32), qw.wq.astype(jnp.float32) * qw.scale)
    assert _cosine_rows(out_pl, ref).min() > 0.999


@pytest.mark.parametrize("family", ["gpt_neox", "llama"])
def test_decode_quantized_logits_match_float(family):
    from retrieval_scaling_tpu.models.generate import (
        forward_with_cache,
        init_cache,
        quantize_decode_params,
    )

    rng = np.random.RandomState(6)
    if family == "gpt_neox":
        from retrieval_scaling_tpu.models.gpt_neox import (
            GPTNeoXConfig,
            init_gpt_neox_params,
        )

        cfg = GPTNeoXConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=64, rotary_pct=0.25,
        )
        params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    else:
        from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, max_position_embeddings=64,
            tie_embeddings=False,
        )
        params = init_llama_params(cfg, jax.random.PRNGKey(0))

    qparams = quantize_decode_params(params, cfg)
    assert "layers" in qparams and any(k.endswith("@q8") for k in qparams["layers"][0])

    b, s, m = 2, 8, 16
    ids = jnp.asarray(rng.randint(0, 256, (b, s)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    key_valid = jnp.arange(m)[None, :] < s
    cache = init_cache(cfg, b, m, dtype=jnp.float32)

    logits_f, _ = forward_with_cache(params, cfg, ids, pos, cache, key_valid)
    logits_q, _ = forward_with_cache(qparams, cfg, ids, pos, cache, key_valid)
    cos = _cosine_rows(
        np.asarray(logits_q, np.float32).reshape(-1, 256),
        np.asarray(logits_f, np.float32).reshape(-1, 256),
    )
    assert cos.min() > 0.99, cos.min()


def test_generate_fn_runs_with_quantized_params():
    from retrieval_scaling_tpu.models.generate import (
        make_generate_fn,
        quantize_decode_params,
    )
    from retrieval_scaling_tpu.models.gpt_neox import (
        GPTNeoXConfig,
        init_gpt_neox_params,
    )

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=64, rotary_pct=0.25,
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    qparams = quantize_decode_params(params, cfg)
    gen = make_generate_fn(cfg, max_new_tokens=4, eos_id=-1)
    rng = np.random.RandomState(7)
    ids = jnp.asarray(rng.randint(0, 128, (2, 6)), jnp.int32)
    lens = jnp.full((2,), 6, jnp.int32)
    toks = gen(qparams, ids, lens, jnp.zeros((), jnp.uint32))
    out = np.asarray(jax.tree.leaves(toks)[0])
    assert out.shape[-1] == 4


@pytest.mark.parametrize("family", ["gpt_neox", "llama"])
def test_scoring_forward_quantized_matches_float(family):
    """The full-sequence (scoring) forwards dispatch per-weight too, so one
    quantized param set serves loglikelihood AND generation."""
    from retrieval_scaling_tpu.models.generate import quantize_decode_params
    from retrieval_scaling_tpu.models.hf_convert import reader_logits

    rng = np.random.RandomState(8)
    if family == "gpt_neox":
        from retrieval_scaling_tpu.models.gpt_neox import (
            GPTNeoXConfig,
            init_gpt_neox_params,
        )

        cfg = GPTNeoXConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=64, rotary_pct=0.25,
            attention_impl="xla",
        )
        params = init_gpt_neox_params(cfg, jax.random.PRNGKey(2))
    else:
        from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, max_position_embeddings=64,
            tie_embeddings=False, attention_impl="xla",
        )
        params = init_llama_params(cfg, jax.random.PRNGKey(2))

    qparams = quantize_decode_params(params, cfg)
    ids = jnp.asarray(rng.randint(0, 256, (2, 12)), jnp.int32)
    logits_f = reader_logits(params, cfg, ids)
    logits_q = reader_logits(qparams, cfg, ids)
    cos = _cosine_rows(
        np.asarray(logits_q, np.float32).reshape(-1, 256),
        np.asarray(logits_f, np.float32).reshape(-1, 256),
    )
    assert cos.min() > 0.99, cos.min()


def test_jax_reader_lm_int8_backend():
    """JaxReaderLM(quantization='int8'): loglikelihood tracks the float
    backend and generation runs off the quantized params."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_word_tokenizer, tiny_reader
    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    texts = [f"question {i} answer {i}" for i in range(8)]
    tokenizer = make_word_tokenizer(texts)
    reader = tiny_reader(tokenizer)
    lm_f = JaxReaderLM(reader.params, reader.cfg, tokenizer, batch_size=4)
    lm_q = JaxReaderLM(
        reader.params, reader.cfg, tokenizer, batch_size=4, quantization="int8"
    )
    assert any(k.endswith("@q8") for k in lm_q.params["layers"][0])

    pairs = [(f"question {i}", f" answer {i}") for i in range(6)]
    ll_f = lm_f.loglikelihood(pairs)
    ll_q = lm_q.loglikelihood(pairs)
    for (a, _), (b, _) in zip(ll_f, ll_q):
        assert abs(a - b) < 0.15 * max(abs(a), 1.0), (a, b)

    reqs = [{"context": "question 3", "gen_kwargs": {"max_gen_toks": 4}}]
    out = lm_q.generate_until(reqs)
    assert len(out) == 1 and isinstance(out[0], str)

    with pytest.raises(ValueError):
        JaxReaderLM(reader.params, reader.cfg, tokenizer, quantization="int2")


def test_int8_decode_matmul_mid_and_large_batches():
    """m in (32, 128] stays on the weight-streaming kernel; larger ragged m
    pads up to the prefill kernel's block instead of the XLA dequant path."""
    from retrieval_scaling_tpu.ops.quant_matmul import int8_decode_matmul

    rng = np.random.RandomState(9)
    w = jnp.asarray(rng.randn(128, 512).astype(np.float32) * 0.05)
    qw = quantize_weight(w)
    ref_w = qw.wq.astype(jnp.float32) * qw.scale
    for m in (64, 100, 300):
        x = jnp.asarray(rng.randn(m, 128).astype(np.float32))
        out = int8_decode_matmul(x, qw, interpret=True, out_dtype=jnp.float32)
        assert out.shape == (m, 512)
        ref = jnp.dot(x, ref_w)
        assert _cosine_rows(out, ref).min() > 0.999, m


def test_int4_decode_matmul_matches_dequant():
    from retrieval_scaling_tpu.ops.quant_matmul import (
        _int4_unpack,
        int4_decode_matmul,
        quantize_weight_int4,
    )

    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randn(256, 512).astype(np.float32) * 0.05)
    qw = quantize_weight_int4(w)
    assert qw.packed.shape == (128, 512) and qw.scale.shape == (2, 512)
    # dequant reconstruction error bounded by the group scale
    wq = np.asarray(_int4_unpack(qw.packed), np.float32)
    recon = wq.reshape(2, 128, 512) * np.asarray(qw.scale)[:, None, :]
    assert np.abs(recon.reshape(256, 512) - np.asarray(w)).max() <= np.asarray(qw.scale).max() * 0.51

    x = jnp.asarray(rng.randn(8, 256).astype(np.float32))
    out_k = int4_decode_matmul(x, qw, interpret=True, out_dtype=jnp.float32)
    ref = jnp.dot(x, jnp.asarray(recon.reshape(256, 512)))
    assert _cosine_rows(out_k, ref).min() > 0.999
    # XLA fallback path (large m)
    x_big = jnp.asarray(rng.randn(300, 256).astype(np.float32))
    out_big = int4_decode_matmul(x_big, qw, interpret=False, out_dtype=jnp.float32)
    ref_big = jnp.dot(x_big, jnp.asarray(recon.reshape(256, 512)))
    assert _cosine_rows(out_big, ref_big).min() > 0.999


def test_decode_int4_logits_track_float():
    from retrieval_scaling_tpu.models.generate import (
        forward_with_cache,
        init_cache,
        quantize_decode_params,
    )
    from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=512, max_position_embeddings=64,
        tie_embeddings=False,
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(4))
    qparams = quantize_decode_params(params, cfg, scheme="int4")
    assert any(k.endswith("@q4") for k in qparams["layers"][0])

    rng = np.random.RandomState(12)
    b, s, m = 2, 8, 16
    ids = jnp.asarray(rng.randint(0, 256, (b, s)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    key_valid = jnp.arange(m)[None, :] < s
    cache = init_cache(cfg, b, m, dtype=jnp.float32)
    lf, _ = forward_with_cache(params, cfg, ids, pos, cache, key_valid)
    lq, _ = forward_with_cache(qparams, cfg, ids, pos, cache, key_valid)
    cos = _cosine_rows(
        np.asarray(lq, np.float32).reshape(-1, 256),
        np.asarray(lf, np.float32).reshape(-1, 256),
    )
    # group-128 RTN int4 carries ~13% weight noise; ~0.96 logits cosine is
    # the inherent quality on 2-layer random weights (opt-in tradeoff)
    assert cos.min() > 0.95, cos.min()

    with pytest.raises(ValueError):
        quantize_decode_params(params, cfg, scheme="int2")


def test_int8_matmul_batch_sharded_matches_plain():
    """Under an active DP sharding context the int8 matmuls shard their
    rows via shard_map (GSPMD would replicate the pallas_call) and match
    the unsharded result exactly."""
    import jax

    from retrieval_scaling_tpu.ops.flash_attention import attention_head_sharding
    from retrieval_scaling_tpu.ops.quant_matmul import (
        int8_matmul,
        int8_matmul_residual_ln,
        quantize_weight,
    )
    from retrieval_scaling_tpu.parallel.mesh import build_mesh

    rng = np.random.RandomState(5)
    m, k, n = 2048, 128, 256  # per-shard 256 rows keeps the pallas path (BM)
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)
    qw = quantize_weight(w)
    plain = np.asarray(int8_matmul(x, qw, interpret=True))
    mesh = build_mesh(data_axis=8, model_axis=1)
    with attention_head_sharding(mesh, head_axis=None):
        sharded = np.asarray(int8_matmul(x, qw, interpret=True))
    np.testing.assert_allclose(sharded, plain, atol=1e-5, rtol=1e-5)

    h = jnp.asarray(rng.randn(m, n), jnp.float32)
    res = jnp.asarray(rng.randn(m, k), jnp.float32)
    qw2 = quantize_weight(jnp.asarray(rng.randn(n, k) * 0.05, jnp.float32))
    bias = jnp.asarray(rng.randn(k), jnp.float32)
    g = jnp.ones((k,), jnp.float32)
    b = jnp.zeros((k,), jnp.float32)
    plain2 = np.asarray(
        int8_matmul_residual_ln(h, res, qw2, bias, g, b, interpret=True)
    )
    with attention_head_sharding(mesh, head_axis=None):
        sharded2 = np.asarray(
            int8_matmul_residual_ln(h, res, qw2, bias, g, b, interpret=True)
        )
    np.testing.assert_allclose(sharded2, plain2, atol=1e-5, rtol=1e-5)


def test_int8_decode_matmul_context_not_baked_into_jit_cache():
    """int8_decode_matmul routes prefill-sized calls through int8_matmul,
    whose sharding-context read must happen per call — a cached no-context
    trace at the same shape must not swallow a later in-context call
    (and vice versa)."""
    import jax

    from retrieval_scaling_tpu.ops.flash_attention import attention_head_sharding
    from retrieval_scaling_tpu.ops.quant_matmul import (
        int8_decode_matmul,
        quantize_weight,
    )
    from retrieval_scaling_tpu.parallel.mesh import build_mesh

    rng = np.random.RandomState(6)
    m, k, n = 2048, 128, 256
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    qw = quantize_weight(jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32))
    mesh = build_mesh(data_axis=8, model_axis=1)

    # no-context first: traces the unsharded path at this shape
    plain = int8_decode_matmul(x, qw, interpret=True)
    assert "data" not in str(plain.sharding)
    # same shape inside the context must still shard
    with attention_head_sharding(mesh, head_axis=None):
        sharded = int8_decode_matmul(x, qw, interpret=True)
    assert "data" in str(sharded.sharding), sharded.sharding
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(plain), atol=1e-5, rtol=1e-5
    )
    # and a later no-context call must not inherit the sharded trace
    plain2 = int8_decode_matmul(x, qw, interpret=True)
    assert "data" not in str(plain2.sharding)


def test_q8_dual_in_dot_kernel_matches_reference():
    """The dual-input fused stream (NeoX parallel-residual qkv|mlp_in):
    interpret-mode kernel vs the two column-slice dequant dots."""
    from retrieval_scaling_tpu.ops.quant_matmul import q8_dual_in_dot

    rng = np.random.RandomState(11)
    k, n, n_split, b = 128, 640, 384, 4
    w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)
    qw = quantize_weight(w)
    store = {"f@q8": qw.wq, "f@s": qw.scale}
    x1 = jnp.asarray(rng.randn(b, 1, k), jnp.float32)
    x2 = jnp.asarray(rng.randn(b, 1, k), jnp.float32)

    y1, y2 = q8_dual_in_dot(store, "f", x1, x2, n_split, out_dtype=jnp.float32, interpret=True)
    deq = qw.wq.astype(jnp.float32) * qw.scale
    ref1 = jnp.einsum("bsk,kn->bsn", x1, deq[:, :n_split])
    ref2 = jnp.einsum("bsk,kn->bsn", x2, deq[:, n_split:])
    assert y1.shape == (b, 1, n_split) and y2.shape == (b, 1, n - n_split)
    # kernel runs the dot in bf16 -> compare by row cosine
    assert _cosine_rows(np.asarray(y1).reshape(b, -1), np.asarray(ref1).reshape(b, -1)).min() > 0.999
    assert _cosine_rows(np.asarray(y2).reshape(b, -1), np.asarray(ref2).reshape(b, -1)).min() > 0.999

    # padcols marker: trailing pad columns sliced off y2 only
    pad = 128
    store_p = {
        "f@q8": jnp.pad(qw.wq, ((0, 0), (0, pad))),
        "f@s": jnp.pad(qw.scale, ((0, 0), (0, pad))),
        "f@padcols": jnp.zeros((pad,), jnp.int8),
    }
    p1, p2 = q8_dual_in_dot(store_p, "f", x1, x2, n_split, out_dtype=jnp.float32, interpret=True)
    assert p1.shape == (b, 1, n_split) and p2.shape == (b, 1, n - n_split)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(y2), atol=1e-5, rtol=1e-5)


def test_q8_splitk_dot_kernel_matches_reference():
    """The split-K fused stream (NeoX attn_out + mlp_out summed):
    interpret-mode kernel vs two dequant dots added."""
    from retrieval_scaling_tpu.ops.quant_matmul import q8_splitk_dot

    rng = np.random.RandomState(12)
    ka, kb, n, b = 128, 256, 384, 4
    wa = jnp.asarray(rng.randn(ka, n) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.randn(kb, n) * 0.05, jnp.float32)
    qa, qb = quantize_weight(wa), quantize_weight(wb)
    store = {
        "g@q8": jnp.concatenate([qa.wq, qb.wq], axis=0),
        "g@sa": qa.scale,
        "g@sb": qb.scale,
    }
    xa = jnp.asarray(rng.randn(b, 1, ka), jnp.float32)
    xb = jnp.asarray(rng.randn(b, 1, kb), jnp.float32)

    out = q8_splitk_dot(store, "g", xa, xb, out_dtype=jnp.float32, interpret=True)
    deq_a = qa.wq.astype(jnp.float32) * qa.scale
    deq_b = qb.wq.astype(jnp.float32) * qb.scale
    ref = jnp.einsum("bsk,kn->bsn", xa, deq_a) + jnp.einsum("bsk,kn->bsn", xb, deq_b)
    assert out.shape == (b, 1, n)
    assert _cosine_rows(np.asarray(out).reshape(b, -1), np.asarray(ref).reshape(b, -1)).min() > 0.999


def test_fused_decode_block_calls_dual_in_and_splitk(monkeypatch):
    """The quantized NeoX decode block must route through the launch-fused
    kernels (not dead code): spy on q8_dual_in_dot / q8_splitk_dot and run
    a decode step with fused int8 params."""
    from retrieval_scaling_tpu.models.generate import (
        forward_with_cache,
        init_cache,
        quantize_decode_params,
    )
    from retrieval_scaling_tpu.models.gpt_neox import (
        GPTNeoXConfig,
        init_gpt_neox_params,
    )
    from retrieval_scaling_tpu.ops import quant_matmul as qm

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, max_position_embeddings=32, rotary_pct=0.25,
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(3))
    qparams = quantize_decode_params(params, cfg)
    assert "qkv_mi@q8" in qparams["layers"][0]
    assert "ao_mo@q8" in qparams["layers"][0]

    calls = {"dual": 0, "splitk": 0}
    real_dual, real_splitk = qm.q8_dual_in_dot, qm.q8_splitk_dot

    def spy_dual(*a, **kw):
        calls["dual"] += 1
        return real_dual(*a, **kw)

    def spy_splitk(*a, **kw):
        calls["splitk"] += 1
        return real_splitk(*a, **kw)

    monkeypatch.setattr(qm, "q8_dual_in_dot", spy_dual)
    monkeypatch.setattr(qm, "q8_splitk_dot", spy_splitk)

    b, m = 2, 8
    cache = init_cache(cfg, b, m, dtype=jnp.float32)
    pos = jnp.zeros((b, 1), jnp.int32)
    key_valid = jnp.arange(m)[None, :] < 1
    ids = jnp.zeros((b, 1), jnp.int32)
    logits, _ = forward_with_cache(qparams, cfg, ids, pos, cache, key_valid)
    assert logits.shape == (b, 1, 128)
    assert calls["dual"] == cfg.num_layers, calls
    assert calls["splitk"] == cfg.num_layers, calls
