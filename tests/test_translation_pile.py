"""GPT-3-style translation suite + Pile perplexity family (reference:
lm_eval/tasks/translation/ generated wmt14/wmt16/iwslt2017 tasks with
sacrebleu bleu/ter/chrf; lm_eval/tasks/pile/pile_<subset>.yaml)."""

import json

import pytest

from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
from retrieval_scaling_tpu.rag_eval.metrics import (
    corpus_bleu,
    corpus_chrf,
    corpus_ter,
)
from retrieval_scaling_tpu.rag_eval.tasks import (
    GROUPS,
    PILE_SUBSETS,
    Task,
    expand_task_list,
    get_task,
)


# -------------------------------------------------------------- MT metrics
def _fuzz_pairs(n=25):
    import random

    rng = random.Random(0)
    vocab = ("the a cat dog sat ran on under mat rug quickly 42 3.14 it's "
             "don't hello , . ! ? ( )").split()

    def sent(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    preds, refs1, refs2 = [], [], []
    for _ in range(n):
        r = sent(rng.randint(3, 15))
        toks = r.split()
        if len(toks) > 3 and rng.random() < 0.7:
            i = rng.randrange(len(toks) - 1)
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
        if rng.random() < 0.5:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        preds.append(" ".join(toks))
        refs1.append(r)
        refs2.append(sent(rng.randint(3, 15)))
    return preds, refs1, refs2


def test_corpus_mt_metrics_match_sacrebleu():
    """bleu/ter/chrf must agree with sacrebleu's corpus scorers exactly
    (multi-reference, punctuation, case, shifts)."""
    sacrebleu = pytest.importorskip("sacrebleu")
    preds, refs1, refs2 = _fuzz_pairs()
    pairs = [(p, [a, b]) for p, a, b in zip(preds, refs1, refs2)]
    assert corpus_bleu(pairs) == pytest.approx(
        sacrebleu.corpus_bleu(preds, [refs1, refs2]).score
    )
    assert corpus_ter(pairs) == pytest.approx(
        sacrebleu.corpus_ter(preds, [refs1, refs2]).score
    )
    assert corpus_chrf(pairs) == pytest.approx(
        sacrebleu.corpus_chrf(preds, [refs1, refs2]).score
    )


def test_ter_counts_block_shifts():
    # one block shift (cost 1) instead of two substitutions (cost 2):
    # tercom semantics; sacrebleu gives the same 1/6
    assert corpus_ter([("sat the cat on the mat",
                        ["the cat sat on the mat"])]) == pytest.approx(100 / 6)


def test_ter_identical_and_empty():
    assert corpus_ter([("same words here", ["same words here"])]) == 0.0
    assert corpus_chrf([("abc", ["abc"])]) == 100.0


# -------------------------------------------------------------- translation
TRANSLATION_TASKS = {
    "wmt14_en_fr": ("en", "English", "fr", "French", "wmt14", "fr-en"),
    "wmt14_fr_en": ("fr", "French", "en", "English", "wmt14", "fr-en"),
    "wmt16_de_en": ("de", "German", "en", "English", "wmt16", "de-en"),
    "wmt16_en_de": ("en", "English", "de", "German", "wmt16", "de-en"),
    "wmt16_en_ro": ("en", "English", "ro", "Romanian", "wmt16", "ro-en"),
    "wmt16_ro_en": ("ro", "Romanian", "en", "English", "wmt16", "ro-en"),
    "iwslt2017_ar_en": ("ar", "Arabic", "en", "English", "iwslt2017",
                        "iwslt2017-en-ar"),
    "iwslt2017_en_ar": ("en", "English", "ar", "Arabic", "iwslt2017",
                        "iwslt2017-en-ar"),
}


@pytest.mark.parametrize("name", sorted(TRANSLATION_TASKS))
def test_translation_prompt_and_wiring(name, tmp_path):
    src, src_name, tgt, tgt_name, hf_path, hf_name = TRANSLATION_TASKS[name]
    cfg = get_task(name)
    assert cfg.hf_path == hf_path and cfg.hf_name == hf_name
    assert cfg.metric_list == ["bleu", "ter", "chrf"]
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    doc = {"translation": {src: f"src text {src}", tgt: f"tgt text {tgt}"}}
    (d / "test.jsonl").write_text(json.dumps(doc) + "\n")
    task = Task(cfg, data_root=str(tmp_path))
    # reference: translation/utils.py generated doc_to_text/doc_to_target
    assert task.doc_text(task.docs[0]) == (
        f"{src_name} phrase: src text {src}\n{tgt_name} phrase:"
    )
    assert task.doc_target(task.docs[0]) == f" tgt text {tgt}"
    # hyphenated reference task name resolves as an alias
    assert get_task(name.replace("_", "-")).task == name


def test_translation_groups():
    assert GROUPS["gpt3_translation_benchmarks"] == (
        GROUPS["wmt14"] + GROUPS["wmt16"]
    )
    assert len(GROUPS["translation"]) == 8
    ordered, groups = expand_task_list(["translation"])
    assert len([t for t in ordered if isinstance(t, str)]) == 8


def test_translation_scores_all_three_corpus_metrics(tmp_path):
    cfg = get_task("wmt14_fr_en")
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    rows = [
        {"translation": {"fr": "le chat", "en": "the cat sat"}},
        {"translation": {"fr": "bonjour", "en": "hello world"}},
    ]
    (d / "test.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows)
    )

    class FixedLM:
        def generate_until(self, reqs):
            return ["the cat sat", "goodbye world"]

    res = simple_evaluate(FixedLM(), ["wmt14_fr_en"], data_root=str(tmp_path),
                          bootstrap_iters=0)
    row = res["results"]["wmt14_fr_en"]
    assert set(row) >= {"bleu", "ter", "chrf"}
    pairs = [("the cat sat", [" the cat sat"]), ("goodbye world", [" hello world"])]
    assert row["bleu"] == pytest.approx(corpus_bleu(pairs))
    assert row["ter"] == pytest.approx(corpus_ter(pairs))
    assert row["chrf"] == pytest.approx(corpus_chrf(pairs))
    assert 0.0 < row["chrf"] < 100.0


# -------------------------------------------------------------------- pile
def test_pile_family_covers_reference_subsets(tmp_path):
    # reference: lm_eval/tasks/pile/ — 22 per-source yamls
    assert len(PILE_SUBSETS) == 22
    assert len(GROUPS["pile"]) == 22
    cfg = get_task("pile_dm-mathematics")
    assert cfg.output_type == "loglikelihood_rolling"
    assert cfg.hf_path == "EleutherAI/pile"
    assert cfg.hf_name == "pile_dm-mathematics"
    assert cfg.test_split == "train"
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    (d / "train.jsonl").write_text(json.dumps({"text": "one two three"}) + "\n")

    class RollLM:
        def loglikelihood_rolling(self, texts):
            return [-3.0 for _ in texts]

    res = simple_evaluate(RollLM(), ["pile_dm-mathematics"],
                          data_root=str(tmp_path), bootstrap_iters=0)
    row = res["results"]["pile_dm-mathematics"]
    import math

    assert row["word_perplexity"] == pytest.approx(math.exp(3.0 / 3))
    assert row["bits_per_byte"] == pytest.approx(3.0 / 13 / math.log(2))


# ---------------------------------------------------------- scrolls qasper
def test_scrolls_qasper_hybrid_scoring(tmp_path):
    """Yes/no docs score loglikelihood(" yes") vs (" no"); freeform docs
    generate (empty -> "Unanswerable"); all pool into token F1 (reference:
    scrolls/task.py Qasper construct_requests/process_results)."""
    cfg = get_task("scrolls_qasper")
    assert cfg.output_type == "hybrid_yes_no"
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    rows = [
        {"text": "paper body", "question": "Is it supervised?",
         "answers": ["Yes."], "is_yes_no": True},
        {"text": "paper body", "question": "What dataset?",
         "answers": ["the squad dataset"], "is_yes_no": False},
        {"text": "paper body", "question": "What metric?",
         "answers": ["Unanswerable"], "is_yes_no": False},
    ]
    (d / "validation.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows)
    )

    seen_ll, seen_gen = [], []

    class HybridLM:
        def loglikelihood(self, pairs):
            seen_ll.extend(pairs)
            # prefer " yes"
            return [(0.0 if cont == " yes" else -5.0, False)
                    for _, cont in pairs]

        def generate_until(self, reqs):
            seen_gen.extend(r["context"] for r in reqs)
            # first freeform doc answered, second left empty
            return ["the squad dataset", "   "]

    res = simple_evaluate(HybridLM(), ["scrolls_qasper"],
                          data_root=str(tmp_path), bootstrap_iters=0)
    # the yes/no doc produced exactly the two polarity continuations
    assert sorted(c for _, c in seen_ll) == [" no", " yes"]
    assert len(seen_gen) == 2
    # yes/no: "yes" vs "Yes." F1=1; freeform exact F1=1; empty ->
    # "Unanswerable" vs "Unanswerable" F1=1
    assert res["results"]["scrolls_qasper"]["f1"] == 1.0


def test_scrolls_qasper_shim_flags_yes_no():
    from retrieval_scaling_tpu.rag_eval import ingest

    row = {"input": "Is it fast?\n\nLong paper text", "output": "Yes."}
    doc = ingest.PROCESS_DOCS["scrolls_qasper"](row)
    assert doc["is_yes_no"] is True
    assert doc["question"] == "Is it fast?"
    row2 = {"input": "What model?\n\nLong paper text", "output": "BERT base"}
    assert ingest.PROCESS_DOCS["scrolls_qasper"](row2)["is_yes_no"] is False


# ------------------------------------------------------------------ unitxt
def test_unitxt_suite_registry():
    """18 recipe-driven tasks (reference: lm_eval/tasks/unitxt/*.yaml),
    reachable under both unitxt_<name> and the reference's bare names."""
    assert len(GROUPS["unitxt"]) == 18
    cfg = get_task("ag_news")  # bare reference name -> alias
    assert cfg.task == "unitxt_ag_news"
    assert cfg.hf_path == "unitxt/data"
    assert cfg.hf_name == (
        "card=cards.ag_news,template=templates.classification.multi_class.title"
    )
    assert cfg.metric_list == ["f1_micro", "exact_match", "f1_macro"]
    assert get_task("coedit_gec").metric_list[0] == "char_edit_dist_accuracy"


def test_unitxt_metric_implementations():
    from retrieval_scaling_tpu.rag_eval.metrics import (
        char_edit_dist_accuracy,
        f1_multi_label_pairs,
        ner_span_f1_pairs,
        parse_float,
        spearman_pairs,
    )

    # spearman vs scipy on a tied, noisy sample
    scipy_stats = pytest.importorskip("scipy.stats")
    import random

    rng = random.Random(3)
    xs = [rng.randint(0, 5) / 2 for _ in range(40)]
    ys = [x + rng.random() for x in xs]
    ours = spearman_pairs(list(zip(xs, ys)))
    assert ours == pytest.approx(scipy_stats.spearmanr(xs, ys).statistic)
    assert spearman_pairs([(1.0, 1.0)]) == 0.0  # degenerate

    assert parse_float("The similarity is 3.5 out of 5") == 3.5
    assert parse_float("no number") == 0.0

    # multi-label micro F1 over comma-separated label sets
    pairs = [("limitation of liability, unilateral termination",
              "limitation of liability"),
             ("none", "none")]
    # tp=2 (liability + none), fp=1, fn=0 -> 2*2/(4+1+0)
    assert f1_multi_label_pairs(pairs) == pytest.approx(4 / 5)

    # NER span F1 over "entity: type" renders
    pairs = [("boston: city, tuesday: day", "boston: city, denver: city")]
    assert ner_span_f1_pairs(pairs) == pytest.approx(0.5)

    # char edit distance accuracy, best reference
    assert char_edit_dist_accuracy("abcd", ["abcd"]) == 1.0
    assert char_edit_dist_accuracy("abcd", ["abce", "zzzz"]) == 0.75


def test_unitxt_classification_scores_end_to_end(tmp_path):
    cfg = get_task("unitxt_ag_news")
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    rows = [
        {"source": "Classify: stocks rally", "target": "Business"},
        {"source": "Classify: cup final tonight", "target": "Sports"},
    ]
    (d / "test.jsonl").write_text("".join(json.dumps(r) + "\n" for r in rows))

    class ClsLM:
        def generate_until(self, reqs):
            # noisy second line must be dropped by the first-line filter;
            # case differences must not count as errors
            return ["business\nextra junk", "World"]

    res = simple_evaluate(ClsLM(), ["unitxt_ag_news"], data_root=str(tmp_path),
                          bootstrap_iters=0)
    row = res["results"]["unitxt_ag_news"]
    assert row["exact_match"] == 0.5
    assert row["f1_micro"] == 0.5
    # macro over {business, sports, world}: [1.0, 0, 0] -> 1/3
    assert row["f1_macro"] == pytest.approx(1 / 3)


def test_unitxt_stsb_spearman_end_to_end(tmp_path):
    cfg = get_task("unitxt_stsb")
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    rows = [{"source": f"pair {i}", "target": str(float(i))} for i in range(5)]
    (d / "test.jsonl").write_text("".join(json.dumps(r) + "\n" for r in rows))

    class RegLM:
        def generate_until(self, reqs):
            # monotonically increasing -> perfect rank correlation
            return [f"score: {i * 0.8:.1f}" for i in range(5)]

    res = simple_evaluate(RegLM(), ["unitxt_stsb"], data_root=str(tmp_path),
                          bootstrap_iters=0)
    assert res["results"]["unitxt_stsb"]["spearman"] == pytest.approx(1.0)


def test_ter_hard_fuzz_close_to_sacrebleu_and_fast():
    """Heavy block-shuffle corruption: the greedy shift search may pick
    different (sometimes better) shift sequences than tercom, but corpus
    scores stay within a few percent — and the memoized per-pair stats
    keep re-scoring (bootstrap resampling) effectively free."""
    sacrebleu = pytest.importorskip("sacrebleu")
    import random
    import time

    from retrieval_scaling_tpu.rag_eval.metrics import _ter_pair_stats

    rng = random.Random(0)
    vocab = ("the a cat dog sat ran on under mat rug quickly 42 3.14 it's "
             "don't hello , . ! ? ( )").split()

    def sent(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    preds, refs = [], []
    for _ in range(30):
        r = sent(rng.randint(8, 40))
        toks = r.split()
        if len(toks) > 8 and rng.random() < 0.6:
            n = rng.randint(2, 4)
            i = rng.randrange(len(toks) - n)
            blk = toks[i:i + n]
            del toks[i:i + n]
            j = rng.randrange(len(toks) + 1)
            toks[j:j] = blk
        if rng.random() < 0.6:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        preds.append(" ".join(toks))
        refs.append(r)
    _ter_pair_stats.cache_clear()
    pairs = [(p, [r]) for p, r in zip(preds, refs)]
    ours = corpus_ter(pairs)
    sacre = sacrebleu.corpus_ter(preds, [refs]).score
    assert ours == pytest.approx(sacre, rel=0.05)
    # memoized: the bootstrap path re-scores resamples at ~zero cost
    t0 = time.perf_counter()
    corpus_ter(pairs)
    assert time.perf_counter() - t0 < 0.05
