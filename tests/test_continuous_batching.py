"""Continuous-batching generation engine (the vLLM analog; reference bar:
rag-evaluation-harness/lm_eval/models/vllm_causallms.py:48)."""

import jax
import urllib.error
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.models.continuous_batching import ContinuousBatcher
from retrieval_scaling_tpu.models.generate import make_generate_fn
from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params

CFG = GPTNeoXConfig(
    vocab_size=97,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=128,
    attention_impl="xla",
)
EOS = 0


@pytest.fixture(scope="module")
def params():
    return init_gpt_neox_params(CFG, jax.random.PRNGKey(0))


def _static_reference(params, prompt, max_new):
    """Single-request greedy generation via the static path."""
    gen = make_generate_fn(CFG, max_new_tokens=max_new, eos_id=EOS)
    ids = jnp.asarray([prompt], jnp.int32)
    lens = jnp.asarray([len(prompt)], jnp.int32)
    toks = np.asarray(gen(params, ids, lens, 0))[0].tolist()
    return toks[:max_new]


def _trim(toks):
    return toks[: toks.index(EOS)] if EOS in toks else toks


def test_matches_static_greedy_mixed_lengths(params):
    """Token-exact greedy parity with the static engine on a mixed-length
    workload, with fewer slots than requests (forces slot reuse)."""
    rng = np.random.RandomState(0)
    requests = []
    for i in range(7):
        plen = int(rng.randint(3, 20))
        prompt = rng.randint(1, 97, plen).tolist()
        requests.append((prompt, int(rng.choice([4, 8, 12]))))

    engine = ContinuousBatcher(params, CFG, EOS, slots=3, max_len=64, chunk=4)
    outs = engine.generate(requests)

    for (prompt, max_new), out in zip(requests, outs):
        ref = _trim(_static_reference(params, prompt, max_new))
        assert out == ref, (prompt, out, ref)


def test_early_finisher_frees_slot(params):
    """A request hitting its token budget early must not block others: all
    requests complete and match the static reference."""
    rng = np.random.RandomState(1)
    long_prompt = rng.randint(1, 97, 30).tolist()
    short_prompt = rng.randint(1, 97, 4).tolist()
    requests = [(long_prompt, 16), (short_prompt, 2), (short_prompt, 16),
                (long_prompt, 2)]
    engine = ContinuousBatcher(params, CFG, EOS, slots=2, max_len=64, chunk=8)
    outs = engine.generate(requests)
    for (prompt, max_new), out in zip(requests, outs):
        assert out == _trim(_static_reference(params, prompt, max_new))
        assert len(out) <= max_new


def test_stop_check_terminates_early(params):
    rng = np.random.RandomState(2)
    prompt = rng.randint(1, 97, 8).tolist()
    engine = ContinuousBatcher(params, CFG, EOS, slots=2, max_len=64, chunk=4)
    full = engine.generate([(prompt, 24)])[0]
    if len(full) < 6:
        pytest.skip("model emits eos too early for this seed")

    target = full[:5]

    def stop_check(i, toks):
        return toks[: len(target)] == target and len(toks) >= len(target)

    stopped = engine.generate([(prompt, 24)], stop_check)[0]
    # stop fires at a chunk boundary: the stop point must be covered, with
    # at most one extra chunk of overshoot
    assert stopped[:5] == target
    assert len(stopped) <= len(target) + engine.chunk


def test_pool_reuse_across_calls(params):
    """Back-to-back generate() calls reuse the pool; stale K/V from the
    first call must not leak into the second."""
    rng = np.random.RandomState(3)
    engine = ContinuousBatcher(params, CFG, EOS, slots=2, max_len=64, chunk=4)
    first_requests = [(rng.randint(1, 97, 40).tolist(), 8) for _ in range(2)]
    engine.generate(first_requests)
    prompt = rng.randint(1, 97, 5).tolist()
    out = engine.generate([(prompt, 8)])[0]
    assert out == _trim(_static_reference(params, prompt, 8))


def test_speculative_cb_matches_plain_cb(params):
    """The speculative slot-pool engine emits the same token streams as the
    plain chunked engine (both exact greedy) on a mixed-length workload
    with slot churn, and reports acceptance stats."""
    rng = np.random.RandomState(11)
    reqs = [
        (rng.randint(1, 97, int(L)).tolist(), int(m))
        for L, m in zip([9, 30, 5, 17, 12], [8, 5, 12, 7, 9])
    ]
    plain = ContinuousBatcher(params, CFG, EOS, slots=2, max_len=96, chunk=8)
    spec = ContinuousBatcher(
        params, CFG, EOS, slots=2, max_len=96, chunk=8,
        speculative=True, draft_len=4,
    )
    out_plain = plain.generate(reqs)
    out_spec = spec.generate(reqs)
    assert out_spec == out_plain
    assert spec.stats["spec_rounds"] > 0
    assert spec.stats["spec_emitted"] >= spec.stats["spec_rounds"]


def test_speculative_cb_slot_reuse_isolated(params):
    """A reused slot's drafter history and cache must not leak the prior
    request (same guarantee the plain engine pins for the pool)."""
    rng = np.random.RandomState(3)
    spec = ContinuousBatcher(
        params, CFG, EOS, slots=2, max_len=96, chunk=8,
        speculative=True, draft_len=4,
    )
    first_requests = [(rng.randint(1, 97, 40).tolist(), 8) for _ in range(2)]
    spec.generate(first_requests)
    prompt = rng.randint(1, 97, 5).tolist()
    out = spec.generate([(prompt, 8)])[0]
    assert out == _trim(_static_reference(params, prompt, 8))


def test_speculative_cb_stop_strings(params):
    """stop_check fires on the spec engine's per-chunk cadence too."""
    rng = np.random.RandomState(5)
    prompt = rng.randint(1, 97, 12).tolist()
    spec = ContinuousBatcher(
        params, CFG, EOS, slots=1, max_len=96, chunk=8,
        speculative=True, draft_len=3,
    )
    ref = spec.generate([(prompt, 20)])[0]
    if len(ref) < 3:
        pytest.skip("reference generation too short to stop mid-way")
    needle = ref[2]
    spec2 = ContinuousBatcher(
        params, CFG, EOS, slots=1, max_len=96, chunk=8,
        speculative=True, draft_len=3,
    )
    out = spec2.generate(
        [(prompt, 20)], stop_check=lambda i, toks: needle in toks
    )[0]
    assert needle in out
    # the stop fires at a chunk boundary; everything before it is exact
    assert out == ref[: len(out)]


def test_jax_reader_lm_continuous_engine(tmp_path):
    """JaxReaderLM(gen_engine=continuous) produces the same texts as the
    static engine, including stop-string truncation."""
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
    reader_params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    lm_static = JaxReaderLM(reader_params, cfg, tok, batch_size=2)
    lm_cont = JaxReaderLM(
        reader_params, cfg, tok, batch_size=2, gen_engine="continuous"
    )
    reqs = [
        {"context": f"w{i} w{i+1} w{i+2}",
         "gen_kwargs": {"until": ["\n"], "max_gen_toks": 6 + 2 * (i % 3)}}
        for i in range(5)
    ]
    out_static = lm_static.generate_until(reqs)
    out_cont = lm_cont.generate_until(reqs)
    assert out_cont == out_static


# ---------------------------------------------------------------- service
def _make_service(slots=2, chunk=4):
    from tests.helpers import make_word_tokenizer

    from retrieval_scaling_tpu.serve.generation import GenerationService

    corpus = " ".join(f"w{i}" for i in range(60))
    tok = make_word_tokenizer([corpus])
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=128,
        attention_impl="xla",
    )
    svc_params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    return GenerationService(svc_params, cfg, tok, slots=slots, max_len=96, chunk=chunk), tok


def test_generation_service_concurrent_requests():
    """Concurrent submitters share the background decode loop; every
    request resolves with bounded token counts."""
    import threading

    svc, tok = _make_service()
    try:
        results = {}

        def run(i):
            results[i] = svc.generate(f"w{i} w{i+1}", max_tokens=6)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 5
        for out in results.values():
            assert out["n_tokens"] <= 6
            assert isinstance(out["text"], str)
        # determinism: same prompt -> same completion regardless of batching
        again = svc.generate("w1 w2", max_tokens=6)
        assert again == svc.generate("w1 w2", max_tokens=6)
    finally:
        svc.shutdown()


def test_generation_service_tensor_parallel_matches_single_device():
    """Serving generation with Megatron-sharded reader weights
    (serve.generation_tensor_parallel) emits identical text."""
    from tests.helpers import make_word_tokenizer

    from retrieval_scaling_tpu.parallel.mesh import build_mesh
    from retrieval_scaling_tpu.parallel.reader_tp import shard_reader_params
    from retrieval_scaling_tpu.serve.generation import GenerationService

    corpus = " ".join(f"w{i}" for i in range(60))
    tok = make_word_tokenizer([corpus])
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=128,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    mesh = build_mesh(data_axis=1, model_axis=2, devices=jax.devices()[:2])
    svc = GenerationService(params, cfg, tok, slots=2, max_len=96, chunk=4)
    svc_tp = GenerationService(
        shard_reader_params(mesh, params), cfg, tok, slots=2, max_len=96, chunk=4
    )
    try:
        for prompt in ("w1 w2", "w5 w6 w7"):
            assert svc.generate(prompt, max_tokens=6) == svc_tp.generate(
                prompt, max_tokens=6
            )
    finally:
        svc.shutdown()
        svc_tp.shutdown()


def test_http_generate_route():
    import json
    import urllib.request

    from retrieval_scaling_tpu.serve.http_server import SearchAPIServer, find_free_port

    svc, _ = _make_service()

    class FakeEngine:
        def search(self, q, n):
            return {"scores": [], "passages": [], "IDs": []}

        class batcher:
            queue_size = 0
            current = None

    server = SearchAPIServer({"wiki": FakeEngine()}, generator=svc)
    port = server.serve(port=find_free_port(7700, 7750), block=False)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "w3 w4", "max_tokens": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=90) as resp:
            out = json.loads(resp.read())
        assert "text" in out and out["n_tokens"] <= 5

        # no generator configured -> clean error, not a crash
        server.generator = None
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req2, timeout=30)
            raise AssertionError("expected HTTP error")
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        server.shutdown()
        svc.shutdown()
