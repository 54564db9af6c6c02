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
