"""Bootstrap stderr, per-sample logging, predict_only, and per-task metric
options (reference: lm_eval/api/metrics.py:233-472, __main__.py --log_samples /
--predict_only, tasks/nq_open/nq_open.yaml metric options)."""

import json
import math
import os

import pytest

from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
from retrieval_scaling_tpu.rag_eval.metrics import (
    bootstrap_stderr,
    exact_match,
    mean_stderr,
    pooled_sample_stderr,
)
from retrieval_scaling_tpu.rag_eval.tasks import TaskConfig


class EchoLM:
    """Returns a canned generation; deterministic loglikelihoods by length."""

    def __init__(self, text="yes"):
        self.text = text

    def generate_until(self, reqs):
        return [self.text for _ in reqs]

    def loglikelihood(self, pairs):
        return [(-float(len(cont)), True) for _, cont in pairs]

    def loglikelihood_rolling(self, texts):
        return [-1.0 * len(t.split()) for t in texts]


def _write_task(tmp_path, rows, name="toy"):
    d = tmp_path / name
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "test.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return d


# ---------------------------------------------------------------- stderr fns
def test_mean_stderr_analytic():
    vals = [0.0, 1.0, 0.0, 1.0]
    # sample stddev = sqrt(1/3); stderr = that / 2
    assert mean_stderr(vals) == pytest.approx(math.sqrt(1 / 3) / 2)
    assert mean_stderr([1.0]) == 0.0


def test_bootstrap_stderr_deterministic_by_seed():
    vals = [float(i % 3 == 0) for i in range(50)]
    agg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    a = bootstrap_stderr(agg, vals, iters=200, seed=7)
    b = bootstrap_stderr(agg, vals, iters=200, seed=7)
    c = bootstrap_stderr(agg, vals, iters=200, seed=8)
    assert a == b  # pinned by seed
    assert a != c
    # bootstrap of the mean approximates the analytic stderr
    assert a == pytest.approx(mean_stderr(vals), rel=0.35)


def test_pooled_sample_stderr():
    # one subtask == plain stderr passthrough shape
    assert pooled_sample_stderr([0.1], [100]) == pytest.approx(
        math.sqrt((99 * 0.01 * 100) / 99 / 100)
    )
    assert pooled_sample_stderr([0.0, 0.0], [10, 10]) == 0.0


# ---------------------------------------------------------------- e2e stderr
def test_results_carry_stderr_columns(tmp_path):
    rows = [{"question": f"q{i}", "answer": ["yes" if i % 2 else "no"]} for i in range(8)]
    _write_task(tmp_path, rows)
    cfg = TaskConfig(
        task="toy", dataset_path="toy", output_type="generate_until",
        doc_to_text="Q: {question}\nA:", doc_to_target="{answer[0]}",
        metric_list=["exact_match"],
    )
    res = simple_evaluate(EchoLM("yes"), [cfg], data_root=str(tmp_path))
    row = res["results"]["toy"]
    assert row["exact_match"] == 0.5
    assert row["exact_match_stderr"] == pytest.approx(mean_stderr([0.0, 1.0] * 4))

    # bootstrap_iters=0 disables stderr entirely
    res0 = simple_evaluate(EchoLM("yes"), [cfg], data_root=str(tmp_path), bootstrap_iters=0)
    assert "exact_match_stderr" not in res0["results"]["toy"]


def test_group_rollup_pools_stderr(tmp_path):
    import retrieval_scaling_tpu.rag_eval.tasks as tasks_mod

    for sub in ("a", "b"):
        rows = [{"question": f"{sub}{i}", "answer": ["yes" if i % 2 else "no"]} for i in range(6)]
        _write_task(tmp_path, rows, name=f"toy_{sub}")
        with open(tmp_path / f"toy_{sub}.yaml", "w") as f:
            yamltext = (
                f"task: toy_{sub}\ndataset_path: toy_{sub}\ntest_split: test\n"
                "output_type: generate_until\n"
                "doc_to_text: \"Q: {question}\\nA:\"\n"
                "doc_to_target: \"{answer[0]}\"\nmetric_list: [exact_match]\n"
            )
            f.write(yamltext)
    tasks_mod.register_task_dir(str(tmp_path))
    tasks_mod.GROUPS["toy_group"] = ["toy_a", "toy_b"]
    try:
        res = simple_evaluate(EchoLM("yes"), ["toy_group"], data_root=str(tmp_path))
        grp = res["groups"]["toy_group"]
        assert "exact_match" in grp
        assert grp["exact_match_stderr"] == pytest.approx(
            pooled_sample_stderr(
                [res["results"]["toy_a"]["exact_match_stderr"],
                 res["results"]["toy_b"]["exact_match_stderr"]],
                [6, 6],
            )
        )
    finally:
        tasks_mod.GROUPS.pop("toy_group")
        tasks_mod._EXTRA_DIRS.remove(str(tmp_path))


# ---------------------------------------------------------------- samples
def test_log_samples_written(tmp_path):
    rows = [{"question": f"q{i}", "answer": ["yes"]} for i in range(3)]
    _write_task(tmp_path, rows)
    cfg = TaskConfig(
        task="toy", dataset_path="toy", output_type="generate_until",
        doc_to_text="Q: {question}\nA:", doc_to_target="{answer[0]}",
        metric_list=["exact_match"],
    )
    out = str(tmp_path / "samples")
    res = simple_evaluate(
        EchoLM("yes"), [cfg], data_root=str(tmp_path),
        log_samples=True, samples_save_dir=out,
    )
    recs = res["samples"]["toy"]
    assert len(recs) == 3
    assert recs[0]["prediction"] == "yes"
    assert recs[0]["metrics"]["exact_match"] == 1.0
    assert recs[0]["context"].startswith("Q: q0")
    path = os.path.join(out, "samples_toy.jsonl")
    with open(path) as f:
        on_disk = [json.loads(line) for line in f]
    assert len(on_disk) == 3 and on_disk[1]["doc_id"] == 1


def test_predict_only_skips_metrics(tmp_path):
    rows = [{"question": "q", "answer": ["yes"]}]
    _write_task(tmp_path, rows)
    cfg = TaskConfig(
        task="toy", dataset_path="toy", output_type="generate_until",
        doc_to_text="{question}", doc_to_target="{answer[0]}",
    )
    res = simple_evaluate(EchoLM("out"), [cfg], data_root=str(tmp_path), predict_only=True)
    row = res["results"]["toy"]
    assert "exact_match" not in row
    assert res["samples"]["toy"][0]["prediction"] == "out"


# ---------------------------------------------------------------- options
def test_exact_match_metric_options():
    # legacy default: SQuAD normalization strips articles
    assert exact_match("the cat", ["cat"]) == 1.0
    # reference options: only the configured regexes are stripped
    opts = dict(ignore_case=True, ignore_punctuation=True, regexes_to_ignore=None)
    assert exact_match("The Cat!", ["the cat"], **opts) == 1.0
    assert exact_match("a cat", ["cat"], **opts) == 0.0  # article NOT stripped
    assert exact_match(
        "The Cat", ["Cat"], ignore_case=False, ignore_punctuation=False,
        regexes_to_ignore=["\\b(?:The |the |An |A |a |an )"],
    ) == 1.0


def test_task_metric_options_from_yaml(tmp_path):
    rows = [{"question": "q0", "answer": ["US"]}]
    _write_task(tmp_path, rows)
    cfg = TaskConfig(
        task="toy", dataset_path="toy", output_type="generate_until",
        doc_to_text="{question}", doc_to_target="{answer[0]}",
        metric_list=[{
            "metric": "exact_match", "ignore_case": True,
            "ignore_punctuation": True, "unknown_option": 1,
        }],
    )
    # dict entries normalize: names in metric_list, kwargs in metric_options
    assert cfg.metric_list == ["exact_match"]
    assert cfg.metric_options["exact_match"]["ignore_case"] is True
    res = simple_evaluate(EchoLM("u.s."), [cfg], data_root=str(tmp_path), bootstrap_iters=0)
    assert res["results"]["toy"]["exact_match"] == 1.0  # case+punct ignored

    # dataclasses.replace must preserve the parsed options
    import dataclasses

    cfg2 = dataclasses.replace(cfg, num_fewshot=2)
    assert cfg2.metric_options["exact_match"]["ignore_case"] is True


def test_nq_open_yaml_carries_reference_fidelity():
    from retrieval_scaling_tpu.rag_eval.tasks import get_task

    cfg = get_task("nq_open")
    assert cfg.description == "Answer these questions:\n\n"
    assert cfg.metric_options["exact_match"]["ignore_case"] is True
    assert cfg.hf_path == "nq_open"


# ---------------------------------------------------------------- rouge
def test_rouge_metrics():
    from retrieval_scaling_tpu.rag_eval.metrics import METRICS, rouge_l, rouge_n

    # identical texts -> 1.0 everywhere
    assert rouge_n("the cat sat on the mat", ["the cat sat on the mat"], 1) == 1.0
    assert rouge_n("the cat sat on the mat", ["the cat sat on the mat"], 2) == 1.0
    assert rouge_l("the cat sat on the mat", ["the cat sat on the mat"]) == 1.0
    # disjoint -> 0
    assert METRICS["rouge1"]("alpha beta", ["gamma delta"]) == 0.0
    # hand-computed rouge-1: pred {a,b,c}, ref {a,b,d} -> overlap 2,
    # p = 2/3, r = 2/3, f = 2/3
    assert METRICS["rouge1"]("aaaa bbbb cccc", ["aaaa bbbb dddd"]) == pytest.approx(2 / 3)
    # rouge-L respects order: "a b c" vs "c b a" -> LCS 1 of 3
    assert rouge_l("aaaa bbbb cccc", ["cccc bbbb aaaa"]) == pytest.approx(1 / 3)
    # stemming folds inflections (Porter): running ~ run
    assert METRICS["rouge1"]("running quickly", ["runs quickly"]) == pytest.approx(1.0)
    # multi-reference: best reference wins
    assert METRICS["rouge1"]("aaaa bbbb", ["zzzz", "aaaa bbbb"]) == 1.0


def test_scrolls_tasks_resolve_and_score(tmp_path):
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
    from retrieval_scaling_tpu.rag_eval.models import EchoAnswerLM
    from retrieval_scaling_tpu.rag_eval.tasks import GROUPS, get_task

    assert "scrolls" in GROUPS
    cfg = get_task("scrolls_govreport")
    assert cfg.metric_list == ["rouge1", "rouge2", "rougeL"]

    d = tmp_path / "scrolls_govreport"
    d.mkdir()
    with open(d / "validation.jsonl", "w") as f:
        f.write(json.dumps({"input": "A long government report body.",
                            "answers": ["the report summary"]}) + "\n")
    lm = EchoAnswerLM(lambda ctx: "the report summary")
    res = simple_evaluate(lm, ["scrolls_govreport"], data_root=str(tmp_path),
                          bootstrap_iters=0)
    row = res["results"]["scrolls_govreport"]
    assert row["rouge1"] == 1.0 and row["rougeL"] == 1.0


def test_scrolls_shims():
    from retrieval_scaling_tpu.rag_eval import ingest

    row = {"id": "1", "pid": "1", "input": "What happened?\n\nThe long doc.",
           "output": "a thing"}
    doc = ingest.PROCESS_DOCS["scrolls_prepended"](row)
    assert doc == {"question": "What happened?", "text": "The long doc.",
                   "answers": ["a thing"]}

    qrow = {"id": "1", "pid": "1",
            "input": "Which?\n\n (A) cat (B) dog (C) owl (D) fox\n\nStory body.",
            "output": "dog"}
    qdoc = ingest.PROCESS_DOCS["scrolls_quality"](qrow)
    assert qdoc["choices"] == ["cat", "dog", "owl", "fox"]
    assert qdoc["gold"] == 1 and qdoc["text"] == "Story body."

    crow = {"id": "1", "pid": "1", "input": "Hyp.\n\nContract text.",
            "output": "Entailment"}
    cdoc = ingest.PROCESS_DOCS["scrolls_contractnli"](crow)
    assert cdoc["gold"] == 1

    # unanswerable/missing outputs drop
    assert ingest.PROCESS_DOCS["scrolls_summary"]({"input": "x", "output": None}) is None


# ---------------------------------------------------------------- wave-5 metrics
def test_smoothed_bleu_4():
    from retrieval_scaling_tpu.rag_eval.metrics import METRICS, smoothed_bleu_4

    assert "smoothed_bleu_4" in METRICS
    # exact match -> all precisions 1 except the smoothed ones stay <1
    # for short sentences; a long identical sentence approaches 100.
    long = " ".join(f"tok{i}" for i in range(40))
    assert smoothed_bleu_4(long, [long]) == pytest.approx(100.0, abs=5.0)
    # no unigram overlap -> 0
    assert smoothed_bleu_4("aaa bbb", ["ccc ddd"]) == 0.0
    # empty prediction -> 0
    assert smoothed_bleu_4("", ["ref text"]) == 0.0
    # multi-reference takes the best
    s_multi = smoothed_bleu_4("a b c d", ["x y z", "a b c d"])
    assert s_multi == pytest.approx(smoothed_bleu_4("a b c d", ["a b c d"]))


def test_eqbench_metrics():
    from retrieval_scaling_tpu.rag_eval.metrics import eqbench, percent_parseable

    ref = json.dumps({
        "emotion1": "Surprise", "emotion1_score": 3,
        "emotion2": "Anger", "emotion2_score": 7,
        "emotion3": "Joy", "emotion3_score": 0,
        "emotion4": "Fear", "emotion4_score": 2,
    })
    exact = "Surprise: 3\nAnger: 7\nJoy: 0\nFear: 2"
    assert percent_parseable(exact, [ref]) == 100.0
    assert eqbench(exact, [ref]) == pytest.approx(100.0)
    # garbage generations aren't parseable and score 0
    assert percent_parseable("no emotions here", [ref]) == 0.0
    assert eqbench("no emotions here", [ref]) == 0.0
    # off-by-large answers lose points
    off = "Surprise: 10\nAnger: 0\nJoy: 10\nFear: 10"
    assert eqbench(off, [ref]) < 50.0


def test_multiclass_f1_pairs():
    from retrieval_scaling_tpu.rag_eval.metrics import (
        f1_macro_pairs, f1_micro_pairs, f1_vaxx_pairs)

    # perfect 3-class predictions
    perfect = [(0, 0), (1, 1), (2, 2)]
    assert f1_macro_pairs(perfect) == 1.0
    assert f1_micro_pairs(perfect) == 1.0
    assert f1_vaxx_pairs(perfect) == 1.0
    # hand check vs sklearn: golds [0,0,1,1], preds [0,1,1,1]
    # class0: tp1 fp0 fn1 -> f1 2/3; class1: tp2 fp1 fn0 -> f1 4/5
    pairs = [(0, 0), (1, 0), (1, 1), (1, 1)]
    assert f1_macro_pairs(pairs) == pytest.approx((2 / 3 + 4 / 5) / 2)
    assert f1_micro_pairs(pairs) == pytest.approx(3 / 4)
    # vaxx ignores class 1 entirely
    vx = [(0, 0), (1, 2), (2, 2), (1, 1)]
    # class0: tp1 -> f1 1.0; class2: tp1 fp0 fn1 -> 2/3
    assert f1_vaxx_pairs(vx) == pytest.approx((1.0 + 2 / 3) / 2)


def test_toxicity_metric_with_injected_scorer():
    from retrieval_scaling_tpu.rag_eval import metrics as M

    M.set_toxicity_scorer(lambda text: 0.9 if "bad" in text else 0.1)
    try:
        assert M.METRICS["perspective_api_toxicity_score"]("bad words", [""]) == 0.9
        assert M.METRICS["score"]("bad words", [""]) == 1.0
        assert M.METRICS["score"]("nice words", [""]) == 0.0
    finally:
        M.set_toxicity_scorer(None)


def test_kobest_f1_macro_end_to_end(tmp_path):
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
    from retrieval_scaling_tpu.rag_eval.models import DummyLM
    from retrieval_scaling_tpu.rag_eval.tasks import get_task

    cfg = get_task("kobest_boolq")
    assert "f1_macro" in cfg.metric_list

    d = tmp_path / "kobest" / "boolq"
    d.mkdir(parents=True)
    for split in ("test", "train"):
        with open(d / f"{split}.jsonl", "w") as f:
            for i in range(4):
                f.write(json.dumps({
                    "paragraph": f"문단 {i}", "question": f"질문 {i}?",
                    "gold": i % 2}) + "\n")
    res = simple_evaluate(DummyLM(), ["kobest_boolq"], data_root=str(tmp_path),
                          bootstrap_iters=10)
    row = res["results"]["kobest_boolq"]
    assert "f1_macro" in row and 0.0 <= row["f1_macro"] <= 1.0
    assert "f1_macro_stderr" in row
