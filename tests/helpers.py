"""Test fixtures: tiny local tokenizers and models (no network access)."""

from __future__ import annotations

import jax
import numpy as np


def make_word_tokenizer(texts, extra_tokens=()):
    """Whitespace word-level fast tokenizer built from the given texts."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"[PAD]": 0, "[UNK]": 1, "<|endoftext|>": 2}
    for text in texts:
        for word in text.split():
            for piece in _whitespace_pieces(word):
                if piece not in vocab:
                    vocab[piece] = len(vocab)
    for tok in extra_tokens:
        if tok not in vocab:
            vocab[tok] = len(vocab)

    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="[PAD]",
        unk_token="[UNK]",
        eos_token="<|endoftext|>",
    )


def _whitespace_pieces(word: str):
    """Mimic the Whitespace pre-tokenizer's split (words vs punctuation runs)."""
    import re

    return re.findall(r"\w+|[^\w\s]+", word)


def tiny_encoder(tokenizer, hidden=32, mesh=None):
    from retrieval_scaling_tpu.models.bert import BertConfig, init_bert_params
    from retrieval_scaling_tpu.search.encoder import JaxEncoder
    import jax.numpy as jnp

    cfg = BertConfig(
        vocab_size=tokenizer.vocab_size + 10,
        hidden_size=hidden,
        num_layers=2,
        num_heads=4,
        intermediate_size=hidden * 2,
        max_position_embeddings=512,
        pooling="mean",
        attention_impl="xla",
    )
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    return JaxEncoder(params, cfg, tokenizer, mesh=mesh, dtype=jnp.float32)


def tiny_reader(tokenizer, hidden=32, batch_size=4):
    from retrieval_scaling_tpu.evals.perplexity import JaxReader
    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    import jax.numpy as jnp

    cfg = GPTNeoXConfig(
        vocab_size=tokenizer.vocab_size + 10,
        hidden_size=hidden,
        num_layers=2,
        num_heads=4,
        intermediate_size=hidden * 2,
        max_position_embeddings=128,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(1))
    return JaxReader(params, cfg, tokenizer, batch_size=batch_size, dtype=jnp.float32)


def write_corpus_jsonl(path, num_docs=30, words_per_doc=40, seed=0):
    import json

    rng = np.random.RandomState(seed)
    vocab = [f"word{i}" for i in range(200)]
    with open(path, "w") as f:
        for i in range(num_docs):
            words = rng.choice(vocab, size=words_per_doc)
            f.write(json.dumps({"text": " ".join(words), "doc": i}) + "\n")
    return path
