import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.models.generate import (
    forward_with_cache,
    init_cache,
    make_generate_fn,
)
from retrieval_scaling_tpu.models.gpt_neox import (
    GPTNeoXConfig,
    gpt_neox_forward,
    init_gpt_neox_params,
)

CFG = GPTNeoXConfig(
    vocab_size=97,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    attention_impl="xla",
)


@pytest.fixture(scope="module")
def params():
    return init_gpt_neox_params(CFG, jax.random.PRNGKey(0))


def test_cached_forward_matches_full_forward(params):
    """Prefill+cache logits must equal the plain causal forward."""
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 97, (2, 12)), jnp.int32)
    full_logits = gpt_neox_forward(params, CFG, ids)

    cache = init_cache(CFG, 2, 20, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(12)[None], (2, 12))
    key_valid = jnp.arange(20)[None, :] < 12
    cached_logits, cache = forward_with_cache(params, CFG, ids, positions, cache, key_valid)
    np.testing.assert_allclose(
        np.asarray(cached_logits), np.asarray(full_logits), atol=2e-4, rtol=1e-3
    )


def test_incremental_decode_matches_full_forward(params):
    """Token-by-token decoding with cache == full forward on the same text."""
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 97, (1, 10)), jnp.int32)
    full_logits = gpt_neox_forward(params, CFG, ids)

    cache = init_cache(CFG, 1, 16, dtype=jnp.float32)
    # prefill first 6 tokens
    pos = jnp.arange(6)[None]
    kv = jnp.arange(16)[None, :] < 6
    logits, cache = forward_with_cache(params, CFG, ids[:, :6], pos, cache, kv)
    np.testing.assert_allclose(np.asarray(logits[0, -1]), np.asarray(full_logits[0, 5]), atol=2e-4, rtol=1e-3)
    # decode tokens 6..9 one at a time
    for t in range(6, 10):
        kv = jnp.arange(16)[None, :] < (t + 1)
        logits, cache = forward_with_cache(
            params, CFG, ids[:, t : t + 1], jnp.asarray([[t]]), cache, kv
        )
        np.testing.assert_allclose(
            np.asarray(logits[0, 0]), np.asarray(full_logits[0, t]), atol=3e-4, rtol=1e-3
        )


def test_greedy_generation_deterministic_and_stops(params):
    rng = np.random.RandomState(2)
    prompts = jnp.asarray(rng.randint(1, 97, (2, 8)), jnp.int32)
    lens = jnp.asarray([8, 5], jnp.int32)
    gen = make_generate_fn(CFG, max_new_tokens=6, eos_id=0)
    out1 = np.asarray(gen(params, prompts, lens, 0))
    out2 = np.asarray(gen(params, prompts, lens, 123))  # greedy ignores seed
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == (2, 6)

    # ragged prompts: row 1 conditions only on its first 5 tokens
    prompts_b = prompts.at[1, 5:].set(93)  # change pad region only
    out3 = np.asarray(gen(params, prompts_b, lens, 0))
    np.testing.assert_array_equal(out1[1], out3[1])


def test_greedy_matches_argmax_of_full_forward(params):
    """First generated token == argmax of the last prompt position."""
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(1, 97, (1, 7)), jnp.int32)
    logits = gpt_neox_forward(params, CFG, ids)
    expect = int(jnp.argmax(logits[0, -1]))
    gen = make_generate_fn(CFG, max_new_tokens=3, eos_id=0)
    out = np.asarray(gen(params, ids, jnp.asarray([7], jnp.int32), 0))
    assert out[0, 0] == expect


def test_sampled_generation_varies_with_seed(params):
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(1, 97, (1, 6)), jnp.int32)
    gen = make_generate_fn(CFG, max_new_tokens=8, eos_id=0, temperature=1.0)
    a = np.asarray(gen(params, ids, jnp.asarray([6], jnp.int32), 0))
    b = np.asarray(gen(params, ids, jnp.asarray([6], jnp.int32), 1))
    assert not np.array_equal(a, b)


@pytest.mark.parametrize("family", ["gemma2", "olmo2", "olmo1", "gemma", "mistral_swa", "phi3"])
def test_family_variant_generation_matches_hf(family):
    """Greedy KV-cache generation must reproduce HF .generate for the
    architecture variants (soft-capping, pre/post norms, norm offsets,
    embedding scaling, sliding windows) — a silently-wrong cache block
    would otherwise only show up as bad generations."""
    torch = pytest.importorskip("torch")
    import transformers

    from retrieval_scaling_tpu.models.hf_convert import llama_from_hf_model

    torch.manual_seed(11)
    kw = dict(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=48, max_position_embeddings=64,
    )
    if family == "gemma2":
        hf = transformers.Gemma2ForCausalLM(
            transformers.Gemma2Config(head_dim=16, sliding_window=8, **kw)
        )
    elif family == "gemma":
        hf = transformers.GemmaForCausalLM(
            transformers.GemmaConfig(head_dim=16, **kw)
        )
    elif family == "olmo2":
        hf = transformers.Olmo2ForCausalLM(transformers.Olmo2Config(**kw))
    elif family == "olmo1":
        hf = transformers.OlmoForCausalLM(
            transformers.OlmoConfig(clip_qkv=8.0, **{**kw, "num_key_value_heads": 4})
        )
    elif family == "phi3":
        hf = transformers.Phi3ForCausalLM(
            transformers.Phi3Config(
                pad_token_id=0, bos_token_id=1, eos_token_id=2,
                attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0, **kw,
            )
        )
    else:  # mistral with sliding window
        hf = transformers.MistralForCausalLM(
            transformers.MistralConfig(sliding_window=8, **kw)
        )
    hf.eval()
    params, cfg = llama_from_hf_model(hf)

    rng = np.random.RandomState(4)
    prompt = rng.randint(2, 96, (1, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt.astype(np.int64)), max_new_tokens=5,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, 12:].numpy()

    gen = make_generate_fn(cfg, max_new_tokens=5, eos_id=0)
    params_j = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    out = np.asarray(gen(params_j, jnp.asarray(prompt), jnp.asarray([12], jnp.int32), 0))
    np.testing.assert_array_equal(out[0], ref)


def test_int8_kv_cache_matches_float_cache():
    """kv_cache='int8': logits from the quantized cache track the float
    cache closely; generation runs end to end."""
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import (
        forward_with_cache,
        init_cache,
        make_generate_fn,
    )
    from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_position_embeddings=64,
        tie_embeddings=False,
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(7)
    b, s, m = 2, 10, 16
    ids = jnp.asarray(rng.randint(0, 256, (b, s)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    key_valid = jnp.arange(m)[None, :] < s

    logits_f, cache_f = forward_with_cache(
        params, cfg, ids, pos, init_cache(cfg, b, m, dtype=jnp.float32), key_valid
    )
    logits_q, cache_q = forward_with_cache(
        params, cfg, ids, pos, init_cache(cfg, b, m, dtype=jnp.int8), key_valid
    )
    assert cache_q.k[0].dtype == jnp.int8 and cache_q.k_scale is not None
    a = np.asarray(logits_f, np.float32).reshape(-1, 256)
    bq = np.asarray(logits_q, np.float32).reshape(-1, 256)
    cos = (a * bq).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(bq, axis=1) + 1e-9)
    assert cos.min() > 0.999, cos.min()

    # decode step off the quantized cache (in-place slice writes + scales)
    nxt = jnp.argmax(logits_q[:, s - 1], axis=-1).astype(jnp.int32)[:, None]
    pos1 = jnp.full((b, 1), s, jnp.int32)
    kv1 = jnp.arange(m)[None, :] < (s + 1)
    step_logits, cache_q2 = forward_with_cache(params, cfg, nxt, pos1, cache_q, kv1)
    assert np.isfinite(np.asarray(step_logits)).all()

    gen = make_generate_fn(cfg, max_new_tokens=4, eos_id=-1, kv_cache="int8")
    lens = jnp.full((b,), s, jnp.int32)
    toks = np.asarray(gen(params, ids, lens, 0))
    assert toks.shape == (b, 4)

    with pytest.raises(ValueError):
        make_generate_fn(cfg, 4, -1, kv_cache="fp4")
