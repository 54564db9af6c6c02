import json
import os

import numpy as np

from retrieval_scaling_tpu.utils.extract_results import parse_results_log, scaling_table
from retrieval_scaling_tpu.utils.retrieval_paths import merged_result_path, write_retrieval_paths
from retrieval_scaling_tpu.utils.subsample_data import dedup_eval_data, subsample_jsonl
from retrieval_scaling_tpu.utils.text_normalize import normalize, strip_accents
from retrieval_scaling_tpu.utils.timing import Logger, time_exec


def test_time_exec_returns_result_and_seconds():
    @time_exec
    def add(a, b):
        return a + b

    result, seconds = add(2, 3)
    assert result == 5 and seconds >= 0


def test_logger_appends_tsv(tmp_path):
    log = Logger(str(tmp_path / "log.tsv"))
    log.log("a", 1, 2.5)
    log.log("b", 2, 3.5)
    lines = open(tmp_path / "log.tsv").read().splitlines()
    assert lines == ["a\t1\t2.5", "b\t2\t3.5"]


def test_text_normalize():
    assert strip_accents("café naïve") == "cafe naive"
    assert normalize("“quoted” — text  here") == '"quoted" - text here'


def test_subsample_ratio(tmp_path):
    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        for i in range(2000):
            f.write(json.dumps({"i": i}) + "\n")
    kept = subsample_jsonl(str(src), str(tmp_path / "out.jsonl"), 0.25, seed=0)
    assert 400 < kept < 600
    # deterministic
    kept2 = subsample_jsonl(str(src), str(tmp_path / "out2.jsonl"), 0.25, seed=0)
    assert kept == kept2


def test_dedup_eval_data(tmp_path):
    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        for i in [1, 2, 1, 3, 2]:
            f.write(json.dumps({"q": i}) + "\n")
    kept = dedup_eval_data(str(src), str(tmp_path / "out.jsonl"))
    assert kept == 3


def test_parse_results_log_mixed_formats(tmp_path):
    log = tmp_path / "results.log"
    with open(log, "w") as f:
        f.write(
            "Domain = c4\t DS_domain = wiki\tconcate_k = 3\tavg Loss = 2.5000"
            "\tperplexity = 12.1825\tbpb = 0.4509\ttotal shards = 8\tsampled shards = 2\n"
        )
        f.write(
            "Domain = c4\t DS_domain = wiki\tconcate_k = 3\tavg Loss = 2.4000"
            "\tperplexity = 11.0232\tbpb = 0.4325\ttotal shards = 8\tsampled shards = 4\n"
        )
        f.write(json.dumps({"results": {"nq_open": {"exact_match": 0.31, "n-doc": 3}}}) + "\n")
    df = parse_results_log(str(log))
    assert len(df) == 3
    ppl = df["perplexity"].dropna()
    assert len(ppl) == 2 and abs(ppl.iloc[0] - 12.1825) < 1e-6

    table = scaling_table(df, x="sampled shards", y="perplexity", group="concate_k")
    assert list(table["sampled shards"]) == [2.0, 4.0]
    assert table["perplexity"].iloc[1] < table["perplexity"].iloc[0]  # scaling improves ppl


def test_retrieval_paths(tmp_path):
    domains = {"wiki": (2, 256), "books": (1, 256)}
    # create the expected files for wiki only
    p = merged_result_path(str(tmp_path), "enc", "wiki", 256, 2, 10, "eval.jsonl", [[0], [1]])
    os.makedirs(os.path.dirname(p), exist_ok=True)
    open(p, "w").write("{}\n")
    out_txt = str(tmp_path / "paths.txt")
    paths = write_retrieval_paths(
        out_txt, str(tmp_path), "enc", "eval.jsonl", domains, n_docs=10
    )
    assert paths == [p]
    assert open(out_txt).read().strip() == p
    assert "wiki_datastore-256_chunk_size-1of2_shards" in p


def test_dedup_eval_data(tmp_path):
    from retrieval_scaling_tpu.utils.dedup_eval_data import dedup_file

    p = tmp_path / "in.jsonl"
    rows = [{"q": "a", "x": 1}, {"x": 1, "q": "a"}, {"q": "b"}]
    p.write_text("\n".join(__import__("json").dumps(r) for r in rows) + "\n")
    out = tmp_path / "out.jsonl"
    removed = dedup_file(str(p), str(out))
    assert removed == 1  # key order doesn't defeat exact dedup
    assert len(out.read_text().splitlines()) == 2


def test_calibration_analysis(tmp_path):
    """Calibration summary/plots + per-shard variance
    (reference: utils/extract_results.py:251-425)."""
    import pickle

    import numpy as np
    import pandas as pd

    from retrieval_scaling_tpu.utils.extract_results import (
        calibration_matrices,
        calibration_summary,
        load_calibration,
        per_shard_variance,
        plot_calibration,
        plot_per_sample_losses,
        plot_per_shard_variance,
        plot_top1_vs_gold,
    )

    rng = np.random.RandomState(0)
    by_example = {
        i: [(float(2.0 + rng.rand()), float(40 - j)) for j in range(5)]
        for i in range(20)
    }
    losses, scores = calibration_matrices(by_example)
    assert losses.shape == (20, 5) and scores.shape == (20, 5)

    summary = calibration_summary(by_example)
    assert summary["ppl_gold"] <= summary["ppl_top1"]
    assert summary["n_examples"] == 20

    for mode in ("ci", "mean", "all"):
        out = tmp_path / f"cal_{mode}.png"
        plot_calibration(by_example, str(out), mode=mode)
        assert out.exists()
    plot_per_sample_losses(by_example, str(tmp_path / "per_sample.png"))
    assert (tmp_path / "per_sample.png").exists()

    paths = {}
    for n in (1, 2, 4):
        p = tmp_path / f"cal_{n}.pkl"
        with open(p, "wb") as f:
            pickle.dump(by_example, f)
        paths[n] = str(p)
    df = plot_top1_vs_gold(paths, str(tmp_path / "scaling.png"), closed_book_ppl=15.0)
    assert list(df["n_shards"]) == [1, 2, 4]
    assert load_calibration(paths[1]).keys() == by_example.keys()

    # per-shard variance over shard subsets of the same size
    rows = []
    for shards in ("[0]", "[1]", "[2]", "[0, 1]", "[2, 3]"):
        rows.append({"perplexity": 10 + len(shards), "all shards": shards})
    vdf = per_shard_variance(pd.DataFrame(rows))
    assert set(vdf["n_shards"]) == {1, 2}
    assert (vdf[vdf["n_shards"] == 1]["count"] == 3).all()
    plot_per_shard_variance(pd.DataFrame(rows), str(tmp_path / "var.png"))
    assert (tmp_path / "var.png").exists()


def test_lm_eval_results_table(tmp_path):
    import json as _json

    from retrieval_scaling_tpu.utils.extract_results import lm_eval_results_table

    for sub, acc in (("run1", 0.5), ("run2", 0.7)):
        d = tmp_path / sub
        d.mkdir()
        with open(d / "out.json", "w") as f:
            _json.dump(
                {
                    "results": {"nq_open": {"exact_match": acc, "n-doc": 3, "samples": 10}},
                    "groups": {"mmlu": {"acc": acc / 2, "n-doc": 3, "samples": 20}},
                },
                f,
            )
    df = lm_eval_results_table(str(tmp_path))
    assert len(df) == 4
    assert set(df["task"]) == {"nq_open", "group:mmlu"}
    nq = df[df["task"] == "nq_open"].sort_values("exact_match")
    assert list(nq["exact_match"]) == [0.5, 0.7]
    only_mmlu = lm_eval_results_table(str(tmp_path), task_filter="mmlu")
    assert set(only_mmlu["task"]) == {"group:mmlu"}
