"""Numeric parity of the llama-family JAX model against HF torch.

Covers Llama (GQA), Qwen2 (QKV bias), Qwen3 (qk-norm, decoupled head_dim),
the embedding path (GRIT-style bidirectional + last-token pooling), the
architecture-dispatching reader helpers, and KV-cache generation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from retrieval_scaling_tpu.models.hf_convert import (  # noqa: E402
    llama_from_hf_model,
    reader_lm_loss,
    reader_logits,
)
from retrieval_scaling_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    init_llama_params,
    llama_embed,
    llama_forward,
    llama_lm,
    llama_logits,
)


def _tiny_llama_hf(**over):
    kw = dict(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    kw.update(over)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(transformers.LlamaConfig(**kw))
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_llama():
    return _tiny_llama_hf()


def _ids(rng, b=2, s=12, v=128):
    return rng.randint(3, v, (b, s)).astype(np.int32)


def test_llama_logits_parity(tiny_llama, rng):
    params, cfg = llama_from_hf_model(tiny_llama)
    assert cfg.num_kv_heads == 2
    ids = _ids(rng)
    with torch.no_grad():
        ref = tiny_llama(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_llama_loss_parity(tiny_llama, rng):
    params, cfg = llama_from_hf_model(tiny_llama)
    ids = _ids(rng)
    labels = ids.copy()
    labels[:, :5] = -100
    with torch.no_grad():
        out = tiny_llama(torch.tensor(ids.astype(np.int64)), labels=torch.tensor(labels.astype(np.int64)))
    loss_sum, n_tok = llama_lm(params, cfg, jnp.asarray(ids), jnp.asarray(labels))
    got = float(loss_sum) / float(n_tok)
    np.testing.assert_allclose(got, float(out.loss), atol=1e-4, rtol=1e-4)


def test_qwen2_bias_parity(rng):
    torch.manual_seed(1)
    hf = transformers.Qwen2ForCausalLM(
        transformers.Qwen2Config(
            vocab_size=96,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            intermediate_size=48,
            max_position_embeddings=64,
            tie_word_embeddings=False,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.attention_bias
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_qwen3_qknorm_parity(rng):
    torch.manual_seed(2)
    hf = transformers.Qwen3ForCausalLM(
        transformers.Qwen3Config(
            vocab_size=96,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,  # decoupled from hidden_size // heads
            intermediate_size=48,
            max_position_embeddings=64,
            tie_word_embeddings=True,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.qk_norm and cfg.hd == 16 and cfg.tie_embeddings
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids))))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_reader_dispatch_matches_llama(tiny_llama, rng):
    params, cfg = llama_from_hf_model(tiny_llama)
    ids = jnp.asarray(_ids(rng))
    labels = jnp.asarray(_ids(rng))
    direct = llama_lm(params, cfg, ids, labels)
    via = reader_lm_loss(params, cfg, ids, labels)
    np.testing.assert_allclose(float(direct[0]), float(via[0]))
    np.testing.assert_allclose(
        np.asarray(reader_logits(params, cfg, ids)),
        np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, ids))),
    )


def test_llama_embed_pooling(rng):
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2, num_kv_heads=1,
        intermediate_size=32, max_position_embeddings=32, attention_impl="xla",
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.randint(3, 64, (2, 8)), jnp.int32)
    mask = jnp.asarray([[1] * 8, [1] * 5 + [0] * 3], jnp.int32)

    emb_last = llama_embed(params, cfg, ids, mask, pooling="last", normalize=True)
    assert emb_last.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb_last), axis=-1), 1.0, atol=1e-5)

    # Row 1's last-token embedding must depend only on its real (unpadded) prefix.
    hidden = llama_forward(params, cfg, ids, mask)
    np.testing.assert_allclose(
        np.asarray(emb_last[1]),
        np.asarray(hidden[1, 4] / jnp.linalg.norm(hidden[1, 4].astype(jnp.float32))),
        atol=1e-5,
    )

    emb_mean = llama_embed(params, cfg, ids, mask, pooling="mean", normalize=False, bidirectional=True)
    ref_mean = np.asarray(
        llama_forward(params, cfg, ids, mask, bidirectional=True)[1, :5].mean(axis=0)
    )
    np.testing.assert_allclose(np.asarray(emb_mean[1]), ref_mean, atol=1e-5)


def test_llama_generate_greedy_matches_hf(tiny_llama, rng):
    from retrieval_scaling_tpu.models.generate import make_generate_fn

    params, cfg = llama_from_hf_model(tiny_llama)
    prompts = _ids(rng, b=2, s=6)
    lens = np.asarray([6, 4], np.int32)
    max_new = 5
    eos = 0

    gen = make_generate_fn(cfg, max_new, eos_id=eos)
    got = np.asarray(gen(params, jnp.asarray(prompts), jnp.asarray(lens), 0))

    for row in range(2):
        ids = torch.tensor(prompts[row, : lens[row]].astype(np.int64))[None]
        with torch.no_grad():
            ref = tiny_llama.generate(
                ids, max_new_tokens=max_new, do_sample=False, eos_token_id=eos,
                pad_token_id=eos,
            )[0, lens[row]:].numpy()
        ref_padded = np.full(max_new, eos, np.int64)
        ref_padded[: len(ref)] = ref
        stop = np.where(ref_padded == eos)[0]
        upto = int(stop[0]) if len(stop) else max_new
        np.testing.assert_array_equal(got[row, :upto], ref_padded[:upto])


def test_encoder_dispatch_decoder_family(tmp_path, rng):
    """load_encoder routes llama-family checkpoints to the decoder embedder."""
    hf = _tiny_llama_hf(tie_word_embeddings=True)
    # Save model + a local word-level tokenizer so loading stays offline.
    mdir = tmp_path / "tiny-GRIT-model"
    hf.save_pretrained(mdir)

    from tests.helpers import make_word_tokenizer

    make_word_tokenizer(["hello world a longer piece of text here"]).save_pretrained(mdir)

    from retrieval_scaling_tpu.search.encoder import EncodeOptions, load_encoder

    enc = load_encoder(str(mdir), attention_impl="xla", dtype=jnp.float32)
    out = enc.encode(["hello world", "a longer piece of text here"], EncodeOptions(batch_size=2, maxlength=16))
    assert out.shape == (2, 32)
    assert np.isfinite(out).all()


def test_encoder_out_dim_truncation(tmp_path, rng):
    """Matryoshka out_dim truncation renormalizes on the truncated dims."""
    from tests.helpers import make_word_tokenizer, tiny_encoder

    tok = make_word_tokenizer(["alpha beta gamma delta epsilon"])
    enc = tiny_encoder(tok)  # hidden 32
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    full = enc.encode(["alpha beta", "gamma delta epsilon"], EncodeOptions(batch_size=2, maxlength=16, normalize_emb=True))
    trunc = enc.encode(["alpha beta", "gamma delta epsilon"], EncodeOptions(batch_size=2, maxlength=16, normalize_emb=True, out_dim=16))
    assert full.shape == (2, 32) and trunc.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(trunc.astype(np.float32), axis=-1), 1.0, atol=1e-2)
    # direction agrees with truncation of the unnormalized embedding
    raw = enc.encode(["alpha beta"], EncodeOptions(batch_size=2, maxlength=16))
    want = raw[0, :16] / np.linalg.norm(raw[0, :16].astype(np.float32))
    got = trunc[0].astype(np.float32)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-2)


def test_llama3_rope_scaling_parity(rng):
    """HF rope_scaling (Llama-3.1 NTK-by-parts) reproduces in logits."""
    torch.manual_seed(7)
    hf = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=96,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            intermediate_size=48,
            max_position_embeddings=128,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 4.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 32,
            },
            tie_word_embeddings=False,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.rope_scaling_type == "llama3" and cfg.rope_factor == 4.0
    ids = _ids(rng, b=2, s=48, v=96)  # beyond original_max positions
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids))))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_gemma_parity(rng):
    """Gemma deltas: gelu-tanh MLP, zero-centered RMSNorm (+1 offset),
    sqrt(d) embedding scaling, tied head (reference reader contract:
    any HF causal LM, src/evaluate_perplexity.py:97-108)."""
    torch.manual_seed(3)
    hf = transformers.GemmaForCausalLM(
        transformers.GemmaConfig(
            vocab_size=96,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            intermediate_size=48,
            max_position_embeddings=64,
            hidden_act="gelu_pytorch_tanh",
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.rms_norm_offset
    assert abs(cfg.embedding_multiplier - 32 ** 0.5) < 1e-6
    assert cfg.tie_embeddings
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_olmo1_parity(rng):
    """OLMo-1: non-parametric LayerNorm + QKV clipping."""
    torch.manual_seed(4)
    hf = transformers.OlmoForCausalLM(
        transformers.OlmoConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            intermediate_size=48, max_position_embeddings=64,
            clip_qkv=8.0,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.norm_type == "layernorm_np"
    assert cfg.clip_qkv == 8.0
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_olmo2_parity(rng):
    """OLMo-2: post-output RMSNorm placement + full-width q/k RMSNorm."""
    torch.manual_seed(5)
    hf = transformers.Olmo2ForCausalLM(
        transformers.Olmo2Config(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=48, max_position_embeddings=64,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.norm_placement == "post_output"
    assert cfg.qk_norm_full
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gemma2_parity(rng):
    """Gemma-2: pre+post sublayer norms, attention/final logit
    soft-capping, query_pre_attn_scalar attention scale. (Sliding-window
    layers degenerate to full causal attention at S < window, which holds
    for every sequence this reader serves at 4096-token windows.)"""
    torch.manual_seed(6)
    hf = transformers.Gemma2ForCausalLM(
        transformers.Gemma2Config(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=48, max_position_embeddings=64,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            query_pre_attn_scalar=16,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.norm_placement == "pre_post"
    assert cfg.attn_logit_softcap == 50.0
    assert cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 16
    ids = _ids(rng, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_gemma2_sliding_window_parity(rng):
    """Interleaved sliding-window layers (HF layer_types) must match HF
    logits for sequences LONGER than the window — the local mask really
    masks."""
    torch.manual_seed(7)
    hf = transformers.Gemma2ForCausalLM(
        transformers.Gemma2Config(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=48, max_position_embeddings=64,
            sliding_window=8,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.sliding_window == 8
    assert cfg.sliding_pattern == (True, False)  # even layers sliding
    ids = _ids(rng, s=24, v=96)  # 3x the window
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    # sanity: with the pattern disabled, long-range logits would differ
    import dataclasses

    cfg_nowin = dataclasses.replace(cfg, sliding_pattern=None)
    got_nowin = np.asarray(
        llama_logits(params, cfg_nowin, llama_forward(params, cfg_nowin, jnp.asarray(ids)))
    )
    assert np.abs(got_nowin - ref).max() > 1e-3


def test_mistral_sliding_window_parity(rng):
    """Mistral v0.1 slides on EVERY layer; logits must match HF beyond
    the window."""
    torch.manual_seed(8)
    hf = transformers.MistralForCausalLM(
        transformers.MistralConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=48, max_position_embeddings=64,
            sliding_window=8,
        )
    )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.sliding_window == 8
    assert cfg.sliding_pattern == (True, True)
    ids = _ids(rng, s=24, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_phi3_parity(rng):
    """Phi-3: fused qkv_proj / gate_up_proj split into the llama layout."""
    torch.manual_seed(4)
    hf = transformers.Phi3ForCausalLM(
        transformers.Phi3Config(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64, rope_theta=10000.0, rms_norm_eps=1e-5,
            tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        )
    ).eval()
    params, cfg = llama_from_hf_model(hf)
    assert "q_w" in params["layers"][0] and params["layers"][0]["q_w"].shape == (32, 4, 8)
    ids = _ids(rng)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids))))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_unsupported_rope_scaling_raises(rng):
    from retrieval_scaling_tpu.models.llama import rope_inv_freq
    import dataclasses

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
        rope_scaling_type="longrope",
    )
    with pytest.raises(NotImplementedError):
        rope_inv_freq(cfg)


def test_phi3_sliding_window_parity(rng):
    """Phi-3 slides on EVERY layer (like Mistral v0.1); logits must match
    HF beyond the window."""
    torch.manual_seed(9)
    hf = transformers.Phi3ForCausalLM(
        transformers.Phi3Config(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=48,
            max_position_embeddings=64, sliding_window=8,
            tie_word_embeddings=False,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        )
    ).eval()
    params, cfg = llama_from_hf_model(hf)
    assert cfg.sliding_window == 8
    assert cfg.sliding_pattern == (True, True)
    ids = _ids(rng, s=24, v=96)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        llama_logits(params, cfg, llama_forward(params, cfg, jnp.asarray(ids)))
    )
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
