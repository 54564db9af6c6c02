"""End-to-end pipeline slice: chunk -> embed -> index -> search -> merge -> PPL.

The quick-start flow (reference: README.md:77-113) on a tiny corpus with
tiny random-weight models — validates every stage contract end to end.
"""

import json
import math
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.config import load_config
from retrieval_scaling_tpu.evals.perplexity import build_doc_prompts, evaluate_perplexity
from retrieval_scaling_tpu.pipeline.embed import generate_passage_embeddings
from retrieval_scaling_tpu.pipeline.index_build import build_dense_index
from retrieval_scaling_tpu.search.driver import (
    get_merged_search_output_path,
    get_search_output_path,
    search_dense_topk,
)

from helpers import make_word_tokenizer, tiny_encoder, tiny_reader, write_corpus_jsonl


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    corpus = write_corpus_jsonl(str(root / "corpus.jsonl"), num_docs=40, words_per_doc=60)

    # eval data shares vocabulary with the corpus
    eval_path = str(root / "eval.jsonl")
    rng = np.random.RandomState(7)
    with open(eval_path, "w") as f:
        for _ in range(3):
            words = rng.choice([f"word{i}" for i in range(200)], size=120)
            f.write(json.dumps({"text": " ".join(words)}) + "\n")

    texts = []
    for p in (corpus, eval_path):
        with open(p) as f:
            texts.extend(json.loads(line)["text"] for line in f)
    tokenizer = make_word_tokenizer(texts)

    cfg = load_config(
        "default",
        overrides=[
            "datastore.domain=testdomain",
            "evaluation.domain=testeval",
            f"datastore.raw_data_path={corpus}",
            f"datastore.datastore_root_dir={root}/scaling_out",
            "datastore.chunk_size=16",
            "datastore.embedding.num_shards=2",
            "datastore.embedding.shard_ids=[0,1]",
            "datastore.index.index_shard_ids=[[0],[1]]",
            f"evaluation.data.eval_data={eval_path}",
            "evaluation.data.max_eval_data_seq_length=32",
            "evaluation.data.eval_stride=16",
            "evaluation.search.n_docs=4",
            "evaluation.concate_k=2",
            f"evaluation.results_only_log_file={root}/results.log",
            "tasks.eval.task_name=perplexity",
        ],
    )
    encoder = tiny_encoder(tokenizer)
    reader = tiny_reader(tokenizer)
    # Run the build stages once up front (each is idempotent via
    # skip-if-exists) so every test in this module is self-contained —
    # required when pytest-xdist schedules tests on different workers.
    generate_passage_embeddings(cfg, encoder=encoder)
    build_dense_index(cfg)
    search_dense_topk(cfg, encoder=encoder, tokenizer=tokenizer)
    return cfg, encoder, reader, tokenizer


def test_stage1_embedding(pipeline_env):
    cfg, encoder, _, _ = pipeline_env
    generate_passage_embeddings(cfg, encoder=encoder)
    emb_dir = cfg.datastore.embedding.embedding_dir
    files = sorted(f for f in os.listdir(emb_dir) if f.endswith(".pkl"))
    assert files == ["passages_00.pkl", "passages_01.pkl"]
    import pickle

    with open(os.path.join(emb_dir, "passages_00.pkl"), "rb") as f:
        ids, emb = pickle.load(f)
    assert emb.shape[1] == 32 and emb.dtype == np.float16
    assert list(ids) == list(range(len(ids)))

    # idempotence: second run is a no-op (use_saved_if_exists)
    before = os.path.getmtime(os.path.join(emb_dir, "passages_00.pkl"))
    generate_passage_embeddings(cfg, encoder=encoder)
    assert os.path.getmtime(os.path.join(emb_dir, "passages_00.pkl")) == before


def test_stage2_index_build(pipeline_env):
    cfg, _, _, _ = pipeline_env
    build_dense_index(cfg)
    emb_dir = cfg.datastore.embedding.embedding_dir
    for group in ("0", "1"):
        assert os.path.exists(os.path.join(emb_dir, "index_Flat", group, "index_Flat.tpu.npz"))


def test_stage3_search_and_merge(pipeline_env):
    cfg, encoder, _, tokenizer = pipeline_env
    search_dense_topk(cfg, encoder=encoder, tokenizer=tokenizer)

    for group in ([0], [1]):
        path = get_search_output_path(cfg, group)
        assert os.path.exists(path)

    merged_path = get_merged_search_output_path(cfg)
    assert os.path.exists(merged_path)
    with open(merged_path) as f:
        rows = [json.loads(line) for line in f]
    # first ppl window has no query -> ctxs [] after merge normalization
    assert any(ex.get("raw_query") for ex in rows)
    scored = [ex for ex in rows if ex["ctxs"]]
    assert scored, "no example got ctxs"
    ex = scored[0]
    assert len(ex["ctxs"]) == 4
    ctx = ex["ctxs"][0]
    assert set(ctx) >= {"id", "source", "retrieval text", "retrieval score"}
    assert ctx["source"] == "testdomain"
    # merged results are score-desc across both shard groups
    scores = [float(c["retrieval score"]) for c in ex["ctxs"]]
    assert scores == sorted(scores, reverse=True)
    shards_seen = {c["id"][0] for c in ex["ctxs"]}
    assert shards_seen <= {0, 1}


def test_stage4_perplexity(pipeline_env):
    cfg, _, reader, _ = pipeline_env
    out = evaluate_perplexity(cfg, reader=reader)
    assert out.perplexity > 0 and math.isfinite(out.perplexity)
    assert abs(out.bit_per_byte - math.log2(out.perplexity) / 8) < 1e-9

    # retrieval-on vs retrieval-off paths both run; prompts actually differ
    eval_data_path = get_merged_search_output_path(cfg)
    with open(eval_data_path) as f:
        rows = [json.loads(line) for line in f]
    ctxs_prompts, _, _ = build_doc_prompts(rows, cfg.evaluation)
    for ex, prompt in zip(rows[1:], ctxs_prompts):
        if ex["ctxs"]:
            assert prompt.endswith(ex["raw_query"])
            assert len(prompt) > len(ex["raw_query"])
            # reverse-relevance order: most relevant doc is immediately before query
            top_text = ex["ctxs"][0]["retrieval text"]
            assert prompt.rindex(top_text) > -1


def test_reverse_order_prepend_semantics():
    eval_data = [
        {"raw_inputs": "q a", "raw_query": "q"},  # first window skipped
        {
            "raw_inputs": "query answer",
            "raw_query": "query ",
            "ctxs": [
                {"retrieval text": "DOC1", "retrieval score": "9"},
                {"retrieval text": "DOC2", "retrieval score": "5"},
            ],
        },
    ]
    from retrieval_scaling_tpu.config import config_from_dict

    args = config_from_dict({"concate_k": 2})
    contexts, answers, _ = build_doc_prompts(eval_data, args)
    # most relevant (DOC1) closest to the query: "DOC2 \nDOC1 \nquery"
    assert contexts == ["DOC2 \nDOC1 \nquery "]
    assert answers == ["answer"]


def test_stage4b_calibration(pipeline_env, tmp_path):
    """perplexity_calibration: per-doc losses + scores pkl, min-loss PPL
    (reference: src/evaluate_perplexity.py:219-324)."""
    import copy
    import math
    import pickle

    from retrieval_scaling_tpu.evals.perplexity import evaluate_calibration

    cfg, _, reader, _ = pipeline_env
    cfg_cal = copy.deepcopy(cfg)
    cfg_cal.tasks.eval.task_name = "perplexity_calibration"
    cfg_cal.evaluation.calibration_out_dir = str(tmp_path / "cal")
    out = evaluate_calibration(cfg_cal, reader=reader)
    assert out.perplexity > 0 and math.isfinite(out.perplexity)
    with open(tmp_path / "cal" / "calibration_losses.pkl", "rb") as f:
        by_example = pickle.load(f)
    assert by_example
    for pairs in by_example.values():
        assert pairs and all(math.isfinite(loss) for loss, _ in pairs)
