"""Prompt-lookup speculative decoding: exact greedy equivalence.

The speculative engine must emit token-for-token what sequential greedy
decode emits — on repetitive prompts (real draft acceptance), random
prompts (rejections), eos mid-stream, ragged prompt lengths, GQA llama
configs, and the int8 KV cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.models.generate import make_generate_fn
from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params
from retrieval_scaling_tpu.models.speculative import (
    _draft_ngram,
    make_speculative_generate_fn,
)

NEOX = GPTNeoXConfig(
    vocab_size=61,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=128,
    attention_impl="xla",
)
LLAMA = LlamaConfig(
    vocab_size=61,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,  # GQA: exercises the decode-fold guard for S > 1
    intermediate_size=64,
    max_position_embeddings=128,
    attention_impl="xla",
)


def _params(cfg):
    if isinstance(cfg, LlamaConfig):
        return init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return init_gpt_neox_params(cfg, jax.random.PRNGKey(0))


def _prompts(kind, vocab, rows=3):
    rng = np.random.RandomState(7)
    lens = np.array([16, 9, 13][:rows])
    ids = rng.randint(1, vocab, (rows, 16)).astype(np.int32)
    if kind == "repetitive":
        # rows repeat a short phrase — the n-gram drafter should fire
        phrase = rng.randint(1, vocab, 4)
        for r in range(rows):
            reps = np.tile(phrase, 5)[: lens[r]]
            ids[r, : lens[r]] = reps
    for r in range(rows):
        ids[r, lens[r]:] = 0
    return jnp.asarray(ids), jnp.asarray(lens.astype(np.int32))


@pytest.mark.parametrize("cfg", [NEOX, LLAMA], ids=["neox", "llama-gqa"])
@pytest.mark.parametrize("kind", ["repetitive", "random"])
@pytest.mark.parametrize("draft_len", [3, 7])
def test_speculative_matches_sequential_greedy(cfg, kind, draft_len):
    params = _params(cfg)
    ids, lens = _prompts(kind, cfg.vocab_size)
    max_new = 12
    ref_fn = make_generate_fn(cfg, max_new_tokens=max_new, eos_id=0)
    spec_fn = make_speculative_generate_fn(
        cfg, max_new_tokens=max_new, eos_id=0, draft_len=draft_len
    )
    ref = np.asarray(ref_fn(params, ids, lens, 0))
    got = np.asarray(spec_fn(params, ids, lens, 0))
    np.testing.assert_array_equal(got, ref)


def test_speculative_with_real_eos_cut():
    """Force an eos the model actually produces: run once, pick the 3rd
    generated token as eos, and check both engines cut identically."""
    params = _params(NEOX)
    ids, lens = _prompts("random", NEOX.vocab_size)
    probe = np.asarray(make_generate_fn(NEOX, 8, eos_id=-1)(params, ids, lens, 0))
    eos = int(probe[0, 3])
    ref = np.asarray(make_generate_fn(NEOX, 8, eos_id=eos)(params, ids, lens, 0))
    got = np.asarray(
        make_speculative_generate_fn(NEOX, 8, eos_id=eos)(params, ids, lens, 0)
    )
    np.testing.assert_array_equal(got, ref)


def test_speculative_max_new_one():
    params = _params(NEOX)
    ids, lens = _prompts("random", NEOX.vocab_size)
    ref = np.asarray(make_generate_fn(NEOX, 1, eos_id=0)(params, ids, lens, 0))
    got = np.asarray(make_speculative_generate_fn(NEOX, 1, eos_id=0)(params, ids, lens, 0))
    np.testing.assert_array_equal(got, ref)


def test_speculative_with_int8_weight_quant():
    """Weight-only int8 readers (the fast decode config) compose with the
    speculative engine: same tokens as static decode on the same
    quantized params."""
    from retrieval_scaling_tpu.models.generate import quantize_decode_params

    params = _params(LLAMA)
    qparams = jax.jit(lambda p: quantize_decode_params(p, LLAMA))(params)
    ids, lens = _prompts("repetitive", LLAMA.vocab_size)
    ref = np.asarray(make_generate_fn(LLAMA, 10, eos_id=0)(qparams, ids, lens, 0))
    got = np.asarray(
        make_speculative_generate_fn(LLAMA, 10, eos_id=0)(qparams, ids, lens, 0)
    )
    np.testing.assert_array_equal(got, ref)


def test_speculative_int8_kv_matches_static_int8():
    params = _params(LLAMA)
    ids, lens = _prompts("repetitive", LLAMA.vocab_size)
    ref = np.asarray(
        make_generate_fn(LLAMA, 10, eos_id=0, kv_cache="int8")(params, ids, lens, 0)
    )
    got = np.asarray(
        make_speculative_generate_fn(LLAMA, 10, eos_id=0, kv_cache="int8")(
            params, ids, lens, 0
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_sampled_speculative_matches_sequential_distribution():
    """Speculative rejection sampling is distribution-identical to
    sequential ancestral sampling: the joint empirical distribution of the
    first two sampled tokens matches the static sampler's within a total-
    variation tolerance. Deterministic: fixed model, fixed seed set."""
    cfg = GPTNeoXConfig(
        vocab_size=8, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=64, attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(2))
    bsz, calls, temp = 150, 64, 1.3
    ids = jnp.asarray(np.tile([3, 5, 2, 6], (bsz, 1)), jnp.int32)
    lens = jnp.full((bsz,), 4, jnp.int32)
    static_fn = make_generate_fn(cfg, 2, eos_id=-1, temperature=temp)
    spec_fn = make_speculative_generate_fn(
        cfg, 2, eos_id=-1, draft_len=3, temperature=temp
    )

    def joint_counts(fn, seed_base):
        counts = np.zeros((8, 8), np.int64)
        for s in range(calls):
            toks = np.asarray(fn(params, ids, lens, seed_base + s))
            np.add.at(counts, (toks[:, 0], toks[:, 1]), 1)
        return counts / counts.sum()

    p_static = joint_counts(static_fn, 0)
    p_spec = joint_counts(spec_fn, 10_000)
    tv = 0.5 * np.abs(p_static - p_spec).sum()
    # measured: TV tracks the 1/sqrt(N) two-sample noise floor (~0.046 at
    # this N), confirming identical distributions; 0.06 gives headroom
    assert tv < 0.06, f"total variation {tv:.3f} too large"
    # and the sampled path really is stochastic across seeds
    one = np.asarray(spec_fn(params, ids, lens, 0))
    two = np.asarray(spec_fn(params, ids, lens, 1))
    assert not np.array_equal(one, two)


def _tiny_lm(gen_engine=None, **kw):
    from tests.helpers import make_word_tokenizer

    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    corpus = " ".join(f"w{i}" for i in range(60))
    tok = make_word_tokenizer([corpus])
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=128,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    return JaxReaderLM(params, cfg, tok, batch_size=2, gen_engine=gen_engine, **kw)


def test_generate_until_honors_sampling_kwargs():
    """temperature>0 + do_sample produces sampled (non-greedy) text; the
    same request with do_sample=False matches greedy; batches never span a
    temperature boundary (reference backends pass sampling kwargs through)."""
    lm = _tiny_lm()
    base = {"context": "w1 w2 w3", "gen_kwargs": {"until": [], "max_gen_toks": 10}}
    hot = {"context": "w1 w2 w3",
           "gen_kwargs": {"until": [], "max_gen_toks": 10, "temperature": 5.0}}
    cold = {"context": "w1 w2 w3",
            "gen_kwargs": {"until": [], "max_gen_toks": 10, "temperature": 5.0,
                           "do_sample": False}}
    # mixed batch: the greedy and hot requests must not share a batch
    out = lm.generate_until([base, hot, cold, hot])
    greedy_text = lm.generate_until([base])[0]
    assert out[0] == greedy_text
    assert out[2] == greedy_text  # do_sample=False overrides temperature
    # at temperature 5 on a random model, matching greedy for 10 tokens is
    # vanishingly unlikely; two hot requests in one batch also differ
    assert out[1] != greedy_text or out[3] != greedy_text


def test_continuous_engine_routes_sampled_requests():
    """The greedy slot-pool engine must not silently drop temperature."""
    lm = _tiny_lm(gen_engine="continuous")
    base = {"context": "w4 w5 w6", "gen_kwargs": {"until": [], "max_gen_toks": 8}}
    hot = {"context": "w4 w5 w6",
           "gen_kwargs": {"until": [], "max_gen_toks": 8, "temperature": 5.0}}
    out = lm.generate_until([base, hot])
    greedy_text = lm.generate_until([base])[0]
    assert out[0] == greedy_text
    assert out[1] != greedy_text


def test_draft_ngram_picks_latest_match():
    # history: 5 6 7 9 5 6 8 2 | tail bigram (5, 6) at positions 4-5?  No:
    # last_token = 6 stored at cur_len = 5; matches at p=0 and p=4; p=4 is
    # the trivial self-match (excluded) -> p=0, continuation 7 9 2...
    hist = jnp.asarray([[5, 6, 7, 9, 5, 6, -1, -1]], jnp.int32)
    draft = _draft_ngram(hist, jnp.asarray([6]), jnp.asarray([5]), ngram=2, draft_len=3)
    np.testing.assert_array_equal(np.asarray(draft)[0], [7, 9, 5])

    # two real matches: latest non-self one wins
    hist2 = jnp.asarray([[5, 6, 1, 5, 6, 2, 5, 6, -1, -1]], jnp.int32)
    draft2 = _draft_ngram(hist2, jnp.asarray([6]), jnp.asarray([7]), ngram=2, draft_len=2)
    np.testing.assert_array_equal(np.asarray(draft2)[0], [2, 5])


def test_speculative_rejects_sampling_config():
    with pytest.raises(ValueError):
        make_speculative_generate_fn(NEOX, 4, eos_id=0, draft_len=0)


def test_jax_reader_lm_speculative_engine():
    """JaxReaderLM(gen_engine=speculative) produces the same texts as the
    static engine, including stop-string truncation and per-request
    max_gen_toks."""
    from tests.helpers import make_word_tokenizer

    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    corpus = " ".join(f"w{i}" for i in range(60))
    tok = make_word_tokenizer([corpus])
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=128,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    lm_static = JaxReaderLM(params, cfg, tok, batch_size=2)
    lm_spec = JaxReaderLM(
        params, cfg, tok, batch_size=2, gen_engine="speculative", draft_len=4
    )
    reqs = [
        {"context": f"w{i} w{i+1} w{i+2} w{i} w{i+1}",
         "gen_kwargs": {"until": ["\n"], "max_gen_toks": 6 + 2 * (i % 3)}}
        for i in range(5)
    ]
    out_static = lm_static.generate_until(reqs)
    assert lm_spec.generate_until(reqs) == out_static

    # the combined engine (continuous batching x speculative rounds)
    lm_cb_spec = JaxReaderLM(
        params, cfg, tok, batch_size=2, gen_engine="continuous_spec", draft_len=4
    )
    assert lm_cb_spec.generate_until(reqs) == out_static


# ---- scripted emission (the RAG copy-rate measurement harness) -----------

def test_scripted_emission_emits_exactly_the_script():
    params = _params(NEOX)
    ids, lens = _prompts("random", NEOX.vocab_size)
    max_new = 12
    fn = make_speculative_generate_fn(
        NEOX, max_new, eos_id=0, draft_len=4, with_stats=True, scripted=True
    )
    rng = np.random.RandomState(3)
    script = rng.randint(1, NEOX.vocab_size, (3, max_new)).astype(np.int32)
    toks, rounds, emitted = fn(params, ids, lens, 0, jnp.asarray(script))
    assert np.array_equal(np.asarray(toks), script)


def test_scripted_copy_structure_raises_acceptance():
    """A script that copies prompt spans must accept more tokens/round than
    a novel-token script — the property the RAG bench measures."""
    params = _params(NEOX)
    rng = np.random.RandomState(5)
    b, plen, max_new = 3, 16, 24
    ids = jnp.asarray(rng.randint(1, NEOX.vocab_size, (b, plen)), jnp.int32)
    lens = jnp.full((b,), plen, jnp.int32)
    fn = make_speculative_generate_fn(
        NEOX, max_new, eos_id=0, draft_len=4, with_stats=True, scripted=True
    )

    ids_np = np.asarray(ids)
    copy_script = np.zeros((b, max_new), np.int32)
    for r in range(b):
        # continuation = verbatim copies of prompt spans (RAG-like)
        pos = 0
        while pos < max_new:
            start = rng.randint(0, plen - 8)
            span = ids_np[r, start : start + min(8, max_new - pos)]
            copy_script[r, pos : pos + len(span)] = span
            pos += len(span)
    novel_script = rng.randint(1, NEOX.vocab_size, (b, max_new)).astype(np.int32)

    toks_c, rounds_c, emitted_c = fn(params, ids, lens, 0, jnp.asarray(copy_script))
    toks_n, rounds_n, emitted_n = fn(params, ids, lens, 0, jnp.asarray(novel_script))
    assert np.array_equal(np.asarray(toks_c), copy_script)
    tpr_copy = float(emitted_c) / (b * max(int(rounds_c), 1))
    tpr_novel = float(emitted_n) / (b * max(int(rounds_n), 1))
    assert tpr_copy > tpr_novel, (tpr_copy, tpr_novel)
    assert tpr_copy >= 2.0, tpr_copy  # span copying must actually pay


# ------------------------------------------------- induction copy reader
def test_induction_batch_structure():
    """Every row contains repeated spans (the induction-solvable signal)
    but rows must NOT be globally periodic: a periodic row admits a
    per-row period-detector shortcut that solves the curriculum without
    content matching — trained to loss 0.009 it transferred 0.001 copy
    fidelity to rag-shaped prompts (round-5 on-chip measurement)."""
    from retrieval_scaling_tpu.models.induction import make_induction_batch

    rng = np.random.RandomState(0)
    ids = make_induction_batch(rng, 64, 96, 8192, min_offset=8)
    periodic = 0
    with_span = 0
    for r in range(64):
        row = ids[r]
        for off in range(8, 96 - 7):
            if (row[off:] == row[:-off]).all():
                periodic += 1
                break
        # a repeated span of length >= 8 exists somewhere (content match)
        found = False
        for t in range(96 - 8):
            window = row[t : t + 8]
            for u in range(t + 8, 96 - 7):
                if (row[u : u + 8] == window).all():
                    found = True
                    break
            if found:
                break
        with_span += found
    assert with_span >= 60, with_span      # spans are the curriculum
    assert periodic <= 8, periodic         # the shortcut is gone


def test_rag_shaped_prompts_reopen_context_span():
    from retrieval_scaling_tpu.models.induction import rag_shaped_prompts

    rng = np.random.RandomState(1)
    ids, answer = rag_shaped_prompts(rng, 16, 512, n_ctx=3, ctx_len=24, q_len=6)
    assert ids.shape == (16, 3 * 24 + 6) and answer.shape == (16, 18)
    for r in range(16):
        q = ids[r, -6:]
        # the question must be the prefix of exactly one context, and the
        # answer its continuation
        hit = False
        for c in range(3):
            s = c * 24
            if (ids[r, s : s + 6] == q).all():
                np.testing.assert_array_equal(answer[r], ids[r, s + 6 : s + 24])
                hit = True
        assert hit


def test_induction_training_smoke_and_engine_parity():
    """A short training run must produce finite decreasing loss and a
    reader the speculative engine decodes token-exactly vs static greedy
    (full acceptance quality is gated by the driver bench, which trains to
    convergence on-chip)."""
    from retrieval_scaling_tpu.models.induction import (
        rag_shaped_prompts,
        train_induction_reader,
    )

    cfg = GPTNeoXConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=128,
    )
    params, loss = train_induction_reader(cfg, steps=30, batch=8, seq_len=48, lr=5e-3)
    assert np.isfinite(loss) and loss < np.log(64) + 0.5

    rng = np.random.RandomState(0)
    ids, _ = rag_shaped_prompts(rng, 4, cfg.vocab_size, n_ctx=2, ctx_len=16, q_len=5)
    lens = jnp.full((4,), ids.shape[1], jnp.int32)
    static = np.asarray(make_generate_fn(cfg, 8, eos_id=-1)(params, jnp.asarray(ids), lens, 0))
    toks, rounds, emitted = make_speculative_generate_fn(
        cfg, 8, eos_id=-1, draft_len=4, with_stats=True
    )(params, jnp.asarray(ids), lens, 0)
    np.testing.assert_array_equal(np.asarray(toks), static)
    assert int(emitted) >= 4 * 8  # every row emitted its budget
