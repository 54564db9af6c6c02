"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import json

import numpy as np
import pytest

from tests.helpers import make_word_tokenizer, tiny_encoder


# ---------------------------------------------------------------- out_dim
def test_query_embeddings_truncated_to_projection_size(tmp_path):
    """high: queries must be truncated to projection_size like passages
    (reference truncates both sides: src/embed.py:62, src/search.py:78)."""
    from retrieval_scaling_tpu.config import config_from_dict
    from retrieval_scaling_tpu.search.driver import embed_eval_queries

    tok = make_word_tokenizer(["alpha beta gamma delta"])
    enc = tiny_encoder(tok, hidden=32)
    cfg = config_from_dict(
        {
            "datastore": {"index": {"projection_size": 16}},
            "evaluation": {"search": {"question_maxlength": 16}},
        }
    )
    embs = embed_eval_queries(cfg, ["alpha beta", "gamma delta"], enc)
    assert embs.shape == (2, 16)

    # projection_size >= hidden size: no truncation
    cfg2 = config_from_dict(
        {
            "datastore": {"index": {"projection_size": 32}},
            "evaluation": {"search": {"question_maxlength": 16}},
        }
    )
    embs2 = embed_eval_queries(cfg2, ["alpha beta"], enc)
    assert embs2.shape == (1, 32)


# ---------------------------------------------------------------- e5 detect
def test_embedder_family_hub_id_detection(tmp_path):
    """medium: 'intfloat/e5-base-v2'-style ids must get the E5 treatment
    (prefixes + L2 norm); '/' is a token boundary. (The test name avoids
    the family token since tmp_path includes it.)"""
    import jax.numpy as jnp
    import transformers

    from retrieval_scaling_tpu.search.encoder import load_encoder

    d = tmp_path / "intfloat" / "e5-base-v2"
    d.mkdir(parents=True)
    tok = make_word_tokenizer(["alpha beta gamma"])
    bert = transformers.BertModel(
        transformers.BertConfig(
            vocab_size=tok.vocab_size + 10,
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
        )
    )
    bert.save_pretrained(d)
    tok.save_pretrained(d)

    enc = load_encoder(str(d), dtype=jnp.float32, attention_impl="xla")
    assert enc.query_prefix == "query: "
    assert enc.passage_prefix == "passage: "
    assert enc.force_normalize

    # ...and a non-e5 name must NOT match (substring tests would).
    d2 = tmp_path / "opene5less-model"
    d2.mkdir()
    bert.save_pretrained(d2)
    tok.save_pretrained(d2)
    enc2 = load_encoder(str(d2), dtype=jnp.float32, attention_impl="xla")
    assert enc2.query_prefix == ""


# ---------------------------------------------------------------- encode_pair
class _BosTokenizer:
    """Llama-style: prepends BOS unless add_special_tokens=False."""

    BOS = 99

    def __call__(self, text, add_special_tokens=True):
        ids = [hash(w) % 90 + 1 for w in text.split()]
        if add_special_tokens:
            ids = [self.BOS] + ids
        return {"input_ids": ids}


def test_encode_pair_no_midsequence_bos():
    """medium: the continuation must not carry a spurious BOS; encode the
    pair jointly and split (reference: lm-eval _encode_pair)."""
    from retrieval_scaling_tpu.rag_eval.models import encode_pair

    tok = _BosTokenizer()
    ctx_ids, cont_ids = encode_pair(tok, "the quick brown", " fox jumps", eos_id=0)
    assert tok.BOS not in cont_ids
    whole = tok("the quick brown fox jumps")["input_ids"]
    assert ctx_ids + cont_ids == whole

    # trailing context whitespace moves onto the continuation
    ctx_ids2, cont_ids2 = encode_pair(tok, "the quick brown ", "fox", eos_id=0)
    assert ctx_ids2 + cont_ids2 == tok("the quick brown fox")["input_ids"]

    # empty context scores from an EOS anchor
    ctx_ids3, cont_ids3 = encode_pair(tok, "", "fox", eos_id=7)
    assert ctx_ids3 == [7]
    assert tok.BOS not in cont_ids3


# ---------------------------------------------------------------- doc_target
def test_doc_target_resolves_index_to_choice_text(tmp_path):
    """low: multiple-choice targets stored as a gold index (bare key or
    template) must render as the gold choice TEXT for fewshot targets."""
    from retrieval_scaling_tpu.rag_eval.tasks import Task, TaskConfig

    d = tmp_path / "toy_mc"
    d.mkdir()
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps({"question": "q0", "choices": ["cat", "dog", "owl"], "label": 2}) + "\n")

    # bare-key index target
    cfg = TaskConfig(
        task="toy_mc",
        dataset_path="toy_mc",
        output_type="multiple_choice",
        doc_to_text="Q: {question}\nA:",
        doc_to_target="label",
        doc_to_choice="choices",
    )
    task = Task(cfg, data_root=str(tmp_path))
    assert task.doc_target(task.docs[0]) == "owl"

    # template index target
    cfg2 = TaskConfig(
        task="toy_mc",
        dataset_path="toy_mc",
        output_type="multiple_choice",
        doc_to_text="Q: {question}\nA:",
        doc_to_target="{label}",
        doc_to_choice="choices",
    )
    task2 = Task(cfg2, data_root=str(tmp_path))
    assert task2.doc_target(task2.docs[0]) == "owl"

    # text target that is already a choice passes through
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps({"question": "q0", "choices": ["cat", "dog"], "gold_text": "dog"}) + "\n")
    cfg3 = TaskConfig(
        task="toy_mc",
        dataset_path="toy_mc",
        output_type="multiple_choice",
        doc_to_text="Q: {question}\nA:",
        doc_to_target="{gold_text}",
        doc_to_choice="choices",
    )
    task3 = Task(cfg3, data_root=str(tmp_path))
    assert task3.doc_target(task3.docs[0]) == "dog"


# ================================================================ round 3
# ---------------------------------------------------------------- cache key
def test_reader_cache_key_tracks_weight_files(tmp_path):
    """medium: converted-reader cache key must change when a local
    checkpoint's WEIGHT file changes, even if config.json is untouched."""
    import os
    import time

    from retrieval_scaling_tpu.models.hf_convert import _reader_cache_base

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "config.json").write_text("{}")
    (ckpt / "model.safetensors").write_bytes(b"aaaa")
    cache = str(tmp_path / "cache")

    key1 = _reader_cache_base(cache, str(ckpt), np.float32)
    # re-save the weights; backdate-proof by bumping mtime explicitly
    (ckpt / "model.safetensors").write_bytes(b"bbbbbb")
    os.utime(ckpt / "model.safetensors", (time.time() + 5, time.time() + 5))
    key2 = _reader_cache_base(cache, str(ckpt), np.float32)
    assert key1 != key2

    # dtype still differentiates
    key3 = _reader_cache_base(cache, str(ckpt), np.float16)
    assert key3 != key2


# ---------------------------------------------------------------- vmem gate
def test_int8_residual_ln_auto_gates_on_vmem(monkeypatch):
    """low: impl='auto' must not schedule a reader-sized [N, K] weight
    resident in VMEM; it falls back to the XLA path."""
    import jax.numpy as jnp

    from retrieval_scaling_tpu.ops import quant_matmul as qm

    rng = np.random.default_rng(0)
    n, k, m = 8192, 2048, qm.BM  # _resident_ok(8192, 2048) is False
    assert not qm._resident_ok(n, k)
    h = jnp.asarray(rng.standard_normal((m, n)), jnp.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    qw = qm.quantize_weight(jnp.asarray(w))
    bias = jnp.zeros((k,), jnp.float32)
    g = jnp.ones((k,), jnp.float32)
    b = jnp.zeros((k,), jnp.float32)

    calls = []
    real = qm.pl.pallas_call

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(qm.pl, "pallas_call", spy)
    out = qm.int8_matmul_residual_ln(h, x, qw, bias, g, b, impl="auto", interpret=True)
    assert not calls, "auto path must not build a pallas kernel for oversized weights"
    assert out.shape == (m, k)

    # small (encoder-sized) weights still take the kernel under interpret
    n2, k2 = 512, 256
    assert qm._resident_ok(n2, k2)
    qw2 = qm.quantize_weight(jnp.asarray(w[:n2, :k2]))
    qm.int8_matmul_residual_ln(
        h[:, :n2], x[:, :k2], qw2, bias[:k2], g[:k2], b[:k2],
        impl="auto", interpret=True,
    )
    assert calls


# ---------------------------------------------------------------- anthropic
def test_anthropic_backend_retries_and_temperature(monkeypatch):
    """low: 429/529 responses retry with backoff; gen_kwargs temperature is
    honored in the payload."""
    import io
    import json as _json
    import urllib.error
    import urllib.request

    from retrieval_scaling_tpu.rag_eval.models import AnthropicCompatLM

    lm = AnthropicCompatLM(base_url="https://fake", model="m", api_key="k")

    attempts = []
    payloads = []

    def fake_urlopen(req, timeout=None):
        body = _json.loads(req.data.decode())
        payloads.append(body)
        if len(attempts) < 2:
            attempts.append(1)
            raise urllib.error.HTTPError(
                req.full_url, 429, "rate limited", {"retry-after": "0"}, io.BytesIO(b"")
            )
        resp = io.BytesIO(
            _json.dumps(
                {"content": [{"type": "text", "text": "hi there\nrest"}]}
            ).encode()
        )
        resp.read = resp.read  # file-like
        return _FakeResp(resp)

    class _FakeResp:
        def __init__(self, buf):
            self._buf = buf

        def read(self):
            return self._buf.read()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    monkeypatch.setattr("time.sleep", lambda s: None)

    out = lm.generate_until(
        [{"context": "q", "gen_kwargs": {"until": ["\n"], "max_gen_toks": 8,
                                         "temperature": 0.7}}]
    )
    assert out == ["hi there"]
    assert len(attempts) == 2  # two 429s then success
    assert payloads[-1]["temperature"] == 0.7

    # non-retryable status raises immediately
    def fake_urlopen_401(req, timeout=None):
        raise urllib.error.HTTPError(req.full_url, 401, "no", {}, io.BytesIO(b""))

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen_401)
    with pytest.raises(urllib.error.HTTPError):
        lm.generate_until([{"context": "q", "gen_kwargs": {}}])


# ---------------------------------------------------------------- gpt2 flags
def test_gpt2_exotic_attention_flags_refused():
    """low: scale_attn_by_inverse_layer_idx / reorder_and_upcast_attn change
    numerics the JAX forward doesn't implement -> refuse, don't diverge."""
    import transformers

    from retrieval_scaling_tpu.models.hf_convert import gpt2_config_from_hf

    base = dict(
        vocab_size=64, n_embd=32, n_layer=1, n_head=4, n_positions=64,
        n_inner=None, layer_norm_epsilon=1e-5,
    )
    cfg = transformers.GPT2Config(**base)
    gpt2_config_from_hf(cfg)  # fine

    with pytest.raises(NotImplementedError):
        gpt2_config_from_hf(
            transformers.GPT2Config(**base, scale_attn_by_inverse_layer_idx=True)
        )
    with pytest.raises(NotImplementedError):
        gpt2_config_from_hf(
            transformers.GPT2Config(**base, reorder_and_upcast_attn=True)
        )
