import json
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.config import config_from_dict
from retrieval_scaling_tpu.data.chunking import (
    fixed_size_chunks,
    semantic_chunks,
    split_text_into_chunks,
)
from retrieval_scaling_tpu.data.passages import (
    PassageStore,
    build_passage_position_map,
)
from retrieval_scaling_tpu.data.sharding import (
    load_jsonl_shard,
    shard_byte_ranges,
)
from retrieval_scaling_tpu.data.eval_data import stride_windows


# ---------------------------------------------------------------- chunking
def test_fixed_size_chunking_basic():
    text = " ".join(f"w{i}" for i in range(10))
    chunks = fixed_size_chunks(text, chunk_size=4)
    assert chunks == ["w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9"]


def test_fixed_size_merges_short_tail():
    text = " ".join(f"w{i}" for i in range(9))
    chunks = fixed_size_chunks(text, chunk_size=4, min_chunk_size=2)
    # tail "w8" (1 word < 2) merges into previous chunk
    assert chunks == ["w0 w1 w2 w3", "w4 w5 w6 w7 w8"]


def test_fixed_size_drop_last():
    text = " ".join(f"w{i}" for i in range(10))
    chunks = fixed_size_chunks(text, chunk_size=4, keep_last=False)
    assert chunks == ["w0 w1 w2 w3", "w4 w5 w6 w7"]


def test_semantic_chunks_respect_budget_and_sentences():
    text = "One two three. Four five six. Seven eight nine ten eleven."
    chunks = semantic_chunks(text, chunk_size=7)
    assert all(len(c.split()) <= 7 for c in chunks)
    # sentences are kept intact when they fit
    assert chunks[0] == "One two three. Four five six."


def test_semantic_chunks_split_overlong_sentence():
    text = " ".join(f"w{i}" for i in range(30))
    chunks = semantic_chunks(text, chunk_size=8)
    assert sum(len(c.split()) for c in chunks) == 30


def test_passthrough_strategy():
    assert split_text_into_chunks("a b c", None) == ["a b c"]
    assert split_text_into_chunks("a b c", 2, strategy=None) == ["a b c"]


# ---------------------------------------------------------------- sharding
def _write_corpus(tmp_path, num_docs=50, words_per_doc=10):
    path = tmp_path / "corpus.jsonl"
    with open(path, "w") as f:
        for i in range(num_docs):
            doc = {"text": " ".join(f"d{i}w{j}" for j in range(words_per_doc)), "meta": i}
            f.write(json.dumps(doc) + "\n")
    return str(path)


def test_byte_ranges_cover_corpus_exactly(tmp_path):
    path = _write_corpus(tmp_path)
    total = os.path.getsize(path)
    covered = []
    for shard in range(4):
        for rng in shard_byte_ranges(path, 4, shard):
            covered.append((rng.start, rng.end))
    covered.sort()
    assert covered[0][0] == 0
    assert covered[-1][1] == total
    for (s0, e0), (s1, e1) in zip(covered, covered[1:]):
        assert e0 == s1  # contiguous, no gaps/overlaps


def test_sharded_load_covers_all_docs_once(tmp_path):
    path = _write_corpus(tmp_path, num_docs=40)
    num_shards = 4
    seen = []
    for shard in range(num_shards):
        args = config_from_dict(
            {
                "raw_data_path": path,
                "num_shards": num_shards,
                "chunk_size": 256,
                "passages_dir": None,
                "use_passage_pos_id_map": False,
            }
        )
        passages = load_jsonl_shard(args, shard)
        for p in passages:
            assert p["shard_id"] == shard
            seen.append(p["meta"])
    assert sorted(seen) == list(range(40))


def test_shard_caching_and_pos_map(tmp_path):
    path = _write_corpus(tmp_path, num_docs=20, words_per_doc=30)
    passages_dir = str(tmp_path / "passages")
    num_shards = 2
    for shard in range(num_shards):
        args = config_from_dict(
            {
                "raw_data_path": path,
                "num_shards": num_shards,
                "chunk_size": 8,
                "passages_dir": passages_dir,
                "use_passage_pos_id_map": True,
            }
        )
        passages = load_jsonl_shard(args, shard)
        assert passages, "shard should not be empty"
        # ids are per-shard incremental
        assert [p["id"] for p in passages] == list(range(len(passages)))

    # pos map built once all shards cached
    assert os.path.exists(os.path.join(passages_dir, "passage_pos_id_map.pkl"))

    store = PassageStore.from_passages_dir(passages_dir)
    assert store.shard_ids == [0, 1]
    p = store.fetch(1, 3)
    assert p["shard_id"] == 1 and p["id"] == 3

    # reload path returns cached jsonl
    args = config_from_dict(
        {
            "raw_data_path": path,
            "num_shards": num_shards,
            "chunk_size": 8,
            "passages_dir": passages_dir,
            "use_passage_pos_id_map": True,
        }
    )
    again = load_jsonl_shard(args, 0)
    assert again[0]["text"]


def test_passage_store_reference_pickle_interop(tmp_path):
    path = _write_corpus(tmp_path, num_docs=10, words_per_doc=12)
    passages_dir = str(tmp_path / "p")
    args = config_from_dict(
        {
            "raw_data_path": path,
            "num_shards": 1,
            "chunk_size": 6,
            "passages_dir": passages_dir,
            "use_passage_pos_id_map": True,
        }
    )
    load_jsonl_shard(args, 0)
    pkl = os.path.join(passages_dir, "passage_pos_id_map.pkl")
    # load via the reference nested-dict pickle format
    store = PassageStore.from_reference_pickle(pkl)
    got = store.fetch(0, 5)
    assert got["id"] == 5
    batch = store.fetch_many([(0, 3), (0, 0), (0, 7)])
    assert [b["id"] for b in batch] == [3, 0, 7]


# ---------------------------------------------------------------- eval data
def test_stride_windows_scoring_semantics():
    ids = np.arange(100, dtype=np.int64)
    pad = -7
    inputs, targets = stride_windows(ids, max_seq_length=32, stride=16, pad_token_id=pad)
    assert inputs.shape == targets.shape
    assert inputs.shape[1] == 32
    # first window scores everything: targets are inputs shifted by one
    np.testing.assert_array_equal(targets[0], ids[1:33])
    # subsequent windows mask the overlapping prefix
    w1_inputs, w1_targets = inputs[1], targets[1]
    np.testing.assert_array_equal(w1_inputs, ids[16:48])
    assert (w1_targets[:16] == pad).all()
    np.testing.assert_array_equal(w1_targets[16:], ids[33:49])
    # token coverage: every position scored exactly once
    scored = [t for row in targets for t in row.tolist() if t != pad]
    assert scored == list(range(1, 100))
