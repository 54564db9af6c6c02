import json
import os

import pytest
import numpy as np

from retrieval_scaling_tpu.config import config_from_dict
from retrieval_scaling_tpu.search.bm25 import BM25Index, analyze, build_bm25_index


def test_analyze_stems_and_stops():
    toks = analyze("The RUNNING dogs and cats are runs!")
    assert "the" not in toks and "and" not in toks and "are" not in toks
    assert "runn" in toks or "run" in toks  # "running" stemmed
    assert "dog" in toks and "cat" in toks


def test_bm25_ranks_relevant_docs_first():
    docs = [
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaped across a sleepy canine",
        "stock markets rallied on tuesday as investors cheered",
        "the fox population in urban areas is growing",
        "dogs are popular pets in many households",
    ]
    index = BM25Index.build(docs)
    scores, ids = index.search("fox dog", k=5)
    assert ids[0] == 0  # contains both terms
    assert set(ids[:3]) <= {0, 3, 4, 1}
    assert (np.diff(scores) <= 1e-6).all()


def test_bm25_idf_prefers_rare_terms():
    docs = ["common word filler"] * 20 + ["common rareterm appears here"]
    index = BM25Index.build(docs)
    scores, ids = index.search("rareterm", k=3)
    assert ids[0] == 20
    s2, ids2 = index.search("common", k=3)
    assert scores[0] > s2[0]  # rare term scores higher than ubiquitous term


def test_bm25_save_load_roundtrip(tmp_path):
    docs = [f"document number {i} about topic{i % 5}" for i in range(50)]
    index = BM25Index.build(docs)
    path = str(tmp_path / "bm25.npz")
    index.save(path)
    loaded = BM25Index.load(path)
    q = "topic3 document"
    s1, i1 = index.search(q, 10)
    s2, i2 = loaded.search(q, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_build_bm25_pipeline(tmp_path):
    corpus = tmp_path / "corpus.jsonl"
    with open(corpus, "w") as f:
        for i in range(30):
            f.write(json.dumps({"text": f"passage about subject{i % 6} item {i}"}) + "\n")
    cfg = config_from_dict(
        {
            "datastore": {
                "datastore_root_dir": str(tmp_path / "out"),
                "domain": "test",
                "embedding": {
                    "raw_data_path": str(corpus),
                    "num_shards": 1,
                    "chunk_size": 64,
                    "passages_dir": str(tmp_path / "psg"),
                    "use_passage_pos_id_map": True,
                },
                "index": {"index_shard_ids": [0]},
            }
        }
    )
    index = build_bm25_index(cfg)
    scores, ids = index.search("subject3", k=5)
    assert len(ids) == 5
    # all hits mention subject3
    docs_path = os.path.join(
        str(tmp_path / "out"), "bm25", "test", "1-shards", "0", "bm25_docs.jsonl"
    )
    with open(docs_path) as f:
        docs = [json.loads(line) for line in f]
    for i in ids:
        assert "subject3" in docs[int(i)]["contents"]
    # second call loads from disk
    again = build_bm25_index(cfg)
    s2, i2 = again.search("subject3", k=5)
    np.testing.assert_array_equal(ids, i2)


def test_embedding_skipped_for_sparse_retriever(tmp_path):
    """model.sparse_retriever short-circuits the dense embedding stage
    (reference: src/embed.py:112-114) — no encoder load, no output dir."""
    from retrieval_scaling_tpu.config import load_config
    from retrieval_scaling_tpu.pipeline.embed import generate_passage_embeddings

    cfg = load_config(
        "default",
        overrides=[
            "model.sparse_retriever=bm25",
            "datastore.domain=d",
            "evaluation.domain=e",
            "evaluation.data.eval_data=x",
            "evaluation.results_only_log_file=r",
            f"datastore.datastore_root_dir={tmp_path}/out",
            "datastore.raw_data_path=missing.jsonl",
        ],
    )
    generate_passage_embeddings(cfg)  # must not touch the encoder or data
    import os

    assert not os.path.exists(f"{tmp_path}/out")


def test_porter_stemmer_classic_vectors():
    """Canonical examples from Porter (1980) — the analysis chain must match
    Lucene's Porter stemmer (reference: pyserini default analyzer,
    src/index.py:118-155)."""
    from retrieval_scaling_tpu.utils.porter import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
        "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "homologou": "homolog", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    for word, expect in vectors.items():
        assert porter_stem(word) == expect, (word, porter_stem(word), expect)


def test_analysis_uses_porter():
    from retrieval_scaling_tpu.search.bm25 import analyze

    assert analyze("The conflated operators are hopping") == ["conflat", "oper", "hop"]


def test_analyzer_version_mismatch_rejected(tmp_path):
    """A persisted index stores analyzed terms; loading one built with a
    different analyzer (e.g. the round-1 light stemmer) must fail loudly
    instead of silently missing every stem-divergent term."""
    import numpy as np
    import pytest

    docs = [f"running dogs {i}" for i in range(4)]
    index = BM25Index.build(docs)
    path = str(tmp_path / "bm25.npz")
    index.save(path)
    assert BM25Index.load(path).n_docs == 4  # same version loads

    data = dict(np.load(path))
    data["analyzer_version"] = np.int64(1)
    np.savez(path[:-4], **data)
    with pytest.raises(ValueError, match="analyzer version"):
        BM25Index.load(path)

    # pre-versioning files (no field) are treated as version 1
    del data["analyzer_version"]
    np.savez(path[:-4], **data)
    with pytest.raises(ValueError, match="analyzer version"):
        BM25Index.load(path)


# ---- BM25Searcher option-tail parity (reference: src/index.py:118-155) ----

def _block_store():
    """4 sequential token blocks, BM25-indexed on their text field."""
    blocks = [
        {"id": i, "contents": txt, "input_ids": list(range(i * 10, i * 10 + 3))}
        for i, txt in enumerate([
            "alpha fox block zero",
            "bravo fox block one",
            "charlie dog block two",
            "delta dog block three",
        ])
    ]
    raw_docs = [json.dumps(b) for b in blocks]
    index = BM25Index.build([b["contents"] for b in blocks])
    from retrieval_scaling_tpu.search.bm25 import BM25Searcher

    return BM25Searcher(index, raw_docs), blocks


def test_searcher_raw_default_matches_index():
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=2)
    assert out[0] == json.dumps(blocks[0])
    assert all(isinstance(o, str) for o in out)


def test_searcher_continuation_concats_next_block():
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=1, continuation=True)
    assert out == [json.dumps(blocks[0]) + json.dumps(blocks[1])]


def test_searcher_continuation_last_block_skips():
    searcher, blocks = _block_store()
    out = searcher.search("delta three", k=1, continuation=True)
    # doc 3 is the last block: continuation skipped, raw returned alone
    assert out == [json.dumps(blocks[3])]


def test_searcher_shift_returns_next_block():
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=1, shift=True)
    assert out == [json.dumps(blocks[1])]


def test_searcher_shift_past_end_drops_hit():
    searcher, blocks = _block_store()
    out = searcher.search("delta three", k=1, shift=True)
    assert out == []


def test_searcher_tokenized_input_ids():
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=1, raw_only=False)
    assert out == [blocks[0]["input_ids"]]


def test_searcher_tokenized_continuation_concat():
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=1, raw_only=False, continuation=True)
    assert out == [blocks[0]["input_ids"] + blocks[1]["input_ids"]]


def test_searcher_shift_continuation_reference_quirk():
    # reference quirk: continuation always concats original_docid+1, so
    # shift+continuation doubles the shifted block (src/index.py:130)
    searcher, blocks = _block_store()
    out = searcher.search("alpha fox", k=1, shift=True, continuation=True)
    assert out == [json.dumps(blocks[1]) + json.dumps(blocks[1])]


def test_searcher_doc_count_mismatch_rejected():
    from retrieval_scaling_tpu.search.bm25 import BM25Searcher

    index = BM25Index.build(["one doc"])
    with pytest.raises(ValueError):
        BM25Searcher(index, [])
