import json
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.rag_eval.evaluator import (
    extract_question_from_fewshot_prompt,
    hash_retrieval_results,
    simple_evaluate,
)
from retrieval_scaling_tpu.rag_eval.metrics import exact_match, f1_score
from retrieval_scaling_tpu.rag_eval.models import DummyLM, EchoAnswerLM, JaxReaderLM
from retrieval_scaling_tpu.rag_eval.tasks import Task, TaskConfig, get_task, list_tasks

from helpers import make_word_tokenizer


# ---------------------------------------------------------------- metrics
def test_exact_match_normalization():
    assert exact_match("The Eagles!", ["eagles"]) == 1.0
    assert exact_match("the answer is paris", ["Paris"]) == 0.0
    assert f1_score("paris france", ["paris"]) > 0.5


# ---------------------------------------------------------------- tasks
def _write_task_data(tmp_path, n=6):
    d = tmp_path / "nq_open"
    d.mkdir(exist_ok=True)
    with open(d / "validation.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({"question": f"what is item {i}", "answer": [f"thing{i}"]}) + "\n")
    return str(tmp_path)


def test_builtin_tasks_registered():
    names = list_tasks()
    assert {"nq_open", "triviaqa", "hotpotqa", "mmlu"} <= set(names)


def test_task_prompt_building(tmp_path):
    root = _write_task_data(tmp_path)
    cfg = get_task("nq_open")
    task = Task(cfg, data_root=root)
    reqs = task.build_requests()
    assert len(reqs) == 6
    # reference fidelity: nq_open carries the "Answer these questions:"
    # description prefix (reference: lm_eval/tasks/nq_open/nq_open.yaml:6)
    assert reqs[0]["context"] == "Answer these questions:\n\nQ: what is item 0?\nA:"
    assert reqs[0]["gen_kwargs"]["until"] == ["\n", ".", ","]


def test_fewshot_context_uses_delimiter(tmp_path):
    root = _write_task_data(tmp_path)
    cfg = get_task("nq_open")
    task = Task(cfg, data_root=root)
    ctx = task.fewshot_context(task.docs[0], num_fewshot=2)
    parts = ctx.split("\n\n")
    assert len(parts) == 4  # description + 2 shots + the doc's own prompt
    assert parts[0] == "Answer these questions:"
    assert parts[-1] == "Q: what is item 0?\nA:"
    for shot in parts[1:-1]:
        assert shot.startswith("Q: ") and " thing" in shot
    # query extraction inverts fewshot assembly
    assert extract_question_from_fewshot_prompt(ctx) == "Q: what is item 0?\nA:"


# ---------------------------------------------------------------- RAG flow
def test_query_export_and_retrieval_prepend(tmp_path):
    root = _write_task_data(tmp_path)
    inputs_dir = str(tmp_path / "inputs")

    # step 1: export queries
    out = simple_evaluate(
        DummyLM(), ["nq_open"], data_root=root,
        save_inputs_only=True, inputs_save_dir=inputs_dir,
    )
    assert out is None
    with open(os.path.join(inputs_dir, "nq_open.jsonl")) as f:
        queries = [json.loads(line)["query"] for line in f]
    assert queries[0] == "Q: what is item 0?\nA:"

    # step 2: fake retrieval results keyed by those queries
    rfile = str(tmp_path / "nq_open_retrieved_results.jsonl")
    with open(rfile, "w") as f:
        for i, q in enumerate(queries):
            ctxs = [
                {"retrieval text": f"[doc-a-{i}] ", "retrieval score": "9"},
                {"retrieval text": f"[doc-b-{i}] ", "retrieval score": "5"},
            ]
            f.write(json.dumps({"raw_query": q, "ctxs": ctxs}) + "\n")

    hashed = hash_retrieval_results(rfile, concat_k=2)
    # reverse order: doc-b (rank 2) precedes doc-a (rank 1)
    assert hashed[queries[0]] == "[doc-b-0] [doc-a-0] "

    # step 3: evaluate with prepended retrieval; EchoAnswerLM reads the doc
    def answer_from_ctx(context):
        # prove the retrieval prefix reached the prompt
        assert context.startswith("[doc-b-")
        idx = context.index("item ")
        return "thing" + context[idx + 5]

    res = simple_evaluate(
        EchoAnswerLM(answer_from_ctx), ["nq_open"], data_root=root,
        retrieval_file=rfile, concat_k=2,
    )
    assert res["results"]["nq_open"]["exact_match"] == 1.0
    assert res["results"]["nq_open"]["n-doc"] == 2


def test_multiple_choice_scoring_and_mmlu_group(tmp_path):
    """'mmlu' is a GROUP of 57 subject tasks with category rollups
    (reference: lm_eval/tasks/mmlu + group tables)."""
    from retrieval_scaling_tpu.rag_eval.tasks import MMLU_SUBJECT_CATEGORIES

    for subject in MMLU_SUBJECT_CATEGORIES:
        d = tmp_path / "mmlu" / subject
        d.mkdir(parents=True)
        with open(d / "test.jsonl", "w") as f:
            for i in range(2):
                f.write(
                    json.dumps(
                        {
                            "question": f"pick {i}",
                            "choices": ["alpha", "beta", "gamma", "delta"],
                            "gold": i % 4,
                        }
                    )
                    + "\n"
                )

    class OracleLM:
        def loglikelihood(self, pairs):
            # highest ll for the gold LETTER (reference-faithful mmlu
            # scores " A"/" B"/... continuations, not the choice texts)
            out = []
            for ctx, cont in pairs:
                i = int(ctx.split("pick ")[1][0])
                gold = ["A", "B", "C", "D"][i % 4]
                out.append((0.0 if cont.strip() == gold else -10.0, False))
            return out

    res = simple_evaluate(OracleLM(), ["mmlu"], data_root=str(tmp_path))
    assert len([t for t in res["results"] if t.startswith("mmlu_")]) == 57
    assert res["results"]["mmlu_abstract_algebra"]["acc"] == 1.0
    assert res["groups"]["mmlu"]["acc"] == 1.0
    assert res["groups"]["mmlu"]["samples"] == 114
    assert res["groups"]["mmlu_stem"]["acc"] == 1.0
    assert res["groups"]["mmlu_stem"]["samples"] == 36  # 18 subjects x 2
    assert res["groups"]["mmlu_humanities"]["samples"] == 26
    assert res["groups"]["mmlu_social_sciences"]["samples"] == 24
    assert res["groups"]["mmlu_other"]["samples"] == 28
    assert res["versions"]["mmlu_abstract_algebra"] == 1.0


def test_acc_norm_length_normalization(tmp_path):
    """acc_norm divides by choice length; acc does not (lm-eval semantics)."""
    d = tmp_path / "arc_easy"
    d.mkdir()
    with open(d / "test.jsonl", "w") as f:
        f.write(
            json.dumps(
                {"question": "q", "choices": ["ab", "abababab"], "gold": 1}
            )
            + "\n"
        )

    class LengthBiasedLM:
        # Long gold choice gets total ll -4 (worse raw) but better per-char.
        def loglikelihood(self, pairs):
            return [(-3.0, False) if "abab" not in cont else (-4.0, False) for _, cont in pairs]

    res = simple_evaluate(LengthBiasedLM(), ["arc_easy"], data_root=str(tmp_path))
    assert res["results"]["arc_easy"]["acc"] == 0.0
    assert res["results"]["arc_easy"]["acc_norm"] == 1.0


def test_results_only_log(tmp_path):
    root = _write_task_data(tmp_path)
    log = str(tmp_path / "results.log")
    simple_evaluate(DummyLM(), ["nq_open"], data_root=root, results_only_save_path=log)
    with open(log) as f:
        rec = json.loads(f.readline())
    assert "nq_open" in rec["results"]


# ---------------------------------------------------------------- JAX backend
def test_jax_reader_lm_loglikelihood_and_generation(tmp_path):
    from helpers import tiny_reader

    texts = [f"question {i} answer {i}" for i in range(10)]
    tokenizer = make_word_tokenizer(texts, extra_tokens=["Q", ":", "A"])
    reader = tiny_reader(tokenizer)
    lm = JaxReaderLM(reader.params, reader.cfg, tokenizer, batch_size=4)

    pairs = [("question 1", " answer 1"), ("question 2", " answer 2")]
    out = lm.loglikelihood(pairs)
    assert len(out) == 2
    assert all(isinstance(ll, float) and ll < 0 for ll, _ in out)

    reqs = [
        {"context": "question 3", "gen_kwargs": {"until": ["\n"], "max_gen_toks": 4}},
        {"context": "question 4 answer", "gen_kwargs": {"until": [], "max_gen_toks": 4}},
    ]
    texts_out = lm.generate_until(reqs)
    assert len(texts_out) == 2
    assert all(isinstance(t, str) for t in texts_out)


def test_jax_reader_is_greedy_flag():
    """is_greedy must be True exactly for the argmax continuation token."""
    import jax.numpy as jnp
    import numpy as np

    from helpers import tiny_reader
    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_forward

    tokenizer = make_word_tokenizer(["alpha beta gamma delta"])
    reader = tiny_reader(tokenizer)
    lm = JaxReaderLM(reader.params, reader.cfg, tokenizer, batch_size=2)

    ctx_ids = tokenizer("alpha beta")["input_ids"]
    logits = np.asarray(gpt_neox_forward(reader.params, reader.cfg, jnp.asarray([ctx_ids]))[0, -1])
    words = {"alpha", "beta", "gamma", "delta"}
    cands = {w: tokenizer(w)["input_ids"][0] for w in words}
    best = max(cands, key=lambda w: logits[cands[w]])
    worst = min(cands, key=lambda w: logits[cands[w]])
    # the global argmax may be an out-of-vocab id; restrict the "greedy"
    # check to the best in-vocab word only when it IS the global argmax
    if int(np.argmax(logits)) == cands[best]:
        (_, greedy_best), = lm.loglikelihood([("alpha beta", " " + best)])
        assert greedy_best
    (_, greedy_worst), = lm.loglikelihood([("alpha beta", " " + worst)])
    assert not greedy_worst


def test_hf_torch_backend_matches_jax(tmp_path):
    """HFTorchLM and JaxReaderLM agree on loglikelihoods for the same model."""
    pytest.importorskip("torch")
    import torch
    import transformers

    texts = ["the sun is a star", "water is made of molecules"]
    tok = make_word_tokenizer(texts)
    vocab = max(tok.get_vocab().values()) + 1
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=vocab, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64, tie_word_embeddings=False,
        )
    )
    mdir = tmp_path / "m"
    hf.save_pretrained(mdir)
    tok.save_pretrained(mdir)

    from retrieval_scaling_tpu.rag_eval.models import HFTorchLM, JaxReaderLM

    pairs = [("the sun is", " a star"), ("water is", " made of molecules")]
    torch_out = HFTorchLM.from_pretrained(str(mdir)).loglikelihood(pairs)
    jax_out = JaxReaderLM.from_pretrained(str(mdir)).loglikelihood(pairs)
    for (tl, tg), (jl, jg) in zip(torch_out, jax_out):
        assert abs(tl - jl) < 1e-3
        assert tg == jg


def test_generation_filters_gsm8k_style(tmp_path):
    """filter_regex/target_regex extract final answers before metrics."""
    d = tmp_path / "gsm8k"
    d.mkdir()
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps({"question": "2+2?", "answer": "2 and 2 make four.\n#### 4"}) + "\n")

    class ReasoningLM:
        def loglikelihood(self, pairs):
            raise NotImplementedError

        def generate_until(self, reqs):
            return ["First, 2 + 2 = 4. The answer is 4"]

    res = simple_evaluate(ReasoningLM(), ["gsm8k"], data_root=str(tmp_path), num_fewshot=0)
    # gsm8k now reports per-filter columns (strict needs '#### N')
    assert res["results"]["gsm8k"]["exact_match,flexible-extract"] == 1.0
    assert res["results"]["gsm8k"]["exact_match,strict-match"] == 0.0


def test_request_cache_avoids_recompute(tmp_path):
    from retrieval_scaling_tpu.rag_eval.caching import CachingLM

    calls = {"ll": 0, "gen": 0}

    class CountingLM:
        def loglikelihood(self, pairs):
            calls["ll"] += len(pairs)
            return [(-1.0 * i, False) for i in range(len(pairs))]

        def generate_until(self, reqs):
            calls["gen"] += len(reqs)
            return [f"out-{r['context']}" for r in reqs]

    lm = CachingLM(CountingLM(), str(tmp_path / "cache.db"), model_tag="m1")
    pairs = [("a", " b"), ("c", " d")]
    first = lm.loglikelihood(pairs)
    again = lm.loglikelihood(pairs)
    assert first == again and calls["ll"] == 2  # second call fully cached

    reqs = [{"context": "x", "gen_kwargs": {"until": ["\n"]}}]
    g1 = lm.generate_until(reqs)
    g2 = lm.generate_until(reqs)
    assert g1 == g2 == ["out-x"] and calls["gen"] == 1

    # a fresh wrapper over the same file still hits the cache (disk persistence)
    lm2 = CachingLM(CountingLM(), str(tmp_path / "cache.db"), model_tag="m1")
    assert lm2.loglikelihood(pairs) == first and calls["ll"] == 2
    # different model tag misses
    lm3 = CachingLM(CountingLM(), str(tmp_path / "cache.db"), model_tag="m2")
    lm3.loglikelihood(pairs)
    assert calls["ll"] == 4


def test_multiple_choice_fewshot_uses_gold_choice(tmp_path):
    d = tmp_path / "arc_easy"
    d.mkdir()
    with open(d / "test.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({"question": f"q{i}", "choices": ["aa", "bb", "cc", "dd"], "gold": i}) + "\n")
    task = Task(get_task("arc_easy"), data_root=str(tmp_path))
    ctx = task.fewshot_context(task.docs[0], num_fewshot=2)
    shots = ctx.split("\n\n")[:-1]
    assert len(shots) == 2
    for shot in shots:
        # each shot ends with its gold choice text
        assert shot.split()[-1] in {"aa", "bb", "cc", "dd"}


def test_mmlu_subject_tasks_derive_from_template(tmp_path):
    """mmlu_<subject> derives from the mmlu template with per-subject data
    (reference: lm_eval/tasks/mmlu has 57 subject tasks + --retrieval_dir)."""
    cfg = get_task("mmlu_abstract_algebra")
    assert cfg.task == "mmlu_abstract_algebra"
    assert cfg.dataset_path.endswith("mmlu/abstract_algebra")
    assert cfg.output_type == "multiple_choice"

    d = tmp_path / "mmlu" / "abstract_algebra"
    d.mkdir(parents=True)
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps({"question": "q", "choices": ["a", "b", "c", "d"], "gold": 1}) + "\n")
    res = simple_evaluate(DummyLM(), ["mmlu_abstract_algebra"], data_root=str(tmp_path))
    assert "mmlu_abstract_algebra" in res["results"]


def test_apply_chat_template(tmp_path):
    """--apply_chat_template wraps prompts via the tokenizer's template
    (reference: lm_eval/__main__.py:166-172)."""
    root = _write_task_data(tmp_path)
    seen = []

    class TemplLM:
        def apply_chat_template(self, context, system_instruction=None, shots=None):
            sys_part = f"<sys>{system_instruction}</sys>" if system_instruction else ""
            return f"{sys_part}<user>{context}</user>"

        def generate_until(self, reqs):
            seen.extend(r["context"] for r in reqs)
            return ["x"] * len(reqs)

        def loglikelihood(self, pairs):
            raise NotImplementedError

    simple_evaluate(
        TemplLM(), ["nq_open"], data_root=root,
        apply_chat_template=True, system_instruction="be brief",
    )
    assert seen and all(c.startswith("<sys>be brief</sys><user>") for c in seen)

    class NoTemplLM:
        def generate_until(self, reqs):
            return ["x"] * len(reqs)

    with pytest.raises(ValueError, match="chat template"):
        simple_evaluate(NoTemplLM(), ["nq_open"], data_root=root, apply_chat_template=True)


def test_fewshot_as_multiturn(tmp_path):
    """Shots render as user/assistant turns (reference: lm_eval
    --fewshot_as_multiturn, requires --apply_chat_template)."""
    root = _write_task_data(tmp_path)
    seen = []

    class TemplLM:
        def apply_chat_template(self, context, system_instruction=None, shots=None):
            parts = [f"[u]{q}[a]{a}" for q, a in (shots or [])]
            parts.append(f"[u]{context}")
            return "".join(parts)

        def generate_until(self, reqs):
            seen.extend(r["context"] for r in reqs)
            return ["x"] * len(reqs)

    simple_evaluate(
        TemplLM(), ["nq_open"], data_root=root, num_fewshot=2,
        apply_chat_template=True, fewshot_as_multiturn=True,
    )
    assert seen
    for c in seen:
        assert c.count("[a]") == 2  # two assistant turns from shots
        assert c.split("[a]")[-1].count("Q:") == 1  # final prompt is 0-shot

    with pytest.raises(ValueError, match="multiturn"):
        simple_evaluate(TemplLM(), ["nq_open"], data_root=root, fewshot_as_multiturn=True)


def test_loglikelihood_rolling_wikitext(tmp_path):
    """wikitext-style rolling perplexity: corpus-level word/byte metrics
    (reference: lm_eval loglikelihood_rolling + wikitext task)."""
    import math

    d = tmp_path / "wikitext"
    d.mkdir()
    pages = ["alpha beta gamma delta", "epsilon zeta"]
    with open(d / "test.jsonl", "w") as f:
        for p in pages:
            f.write(json.dumps({"page": p}) + "\n")

    class FixedLM:
        def loglikelihood_rolling(self, texts):
            return [-2.0 * len(t.split()) for t in texts]  # -2 nats per word

        def loglikelihood(self, pairs):
            raise NotImplementedError

        def generate_until(self, reqs):
            raise NotImplementedError

    # --check_integrity must accept rolling tasks (requests carry 'text',
    # not 'context') instead of flagging them as empty prompts
    res = simple_evaluate(
        FixedLM(), ["wikitext"], data_root=str(tmp_path), check_integrity=True
    )
    row = res["results"]["wikitext"]
    assert abs(row["word_perplexity"] - math.exp(2.0)) < 1e-9
    total_ll = -2.0 * 6
    total_bytes = sum(len(p.encode()) for p in pages)
    assert abs(row["byte_perplexity"] - math.exp(-total_ll / total_bytes)) < 1e-9
    assert abs(row["bits_per_byte"] - (-total_ll / total_bytes / math.log(2))) < 1e-9


def test_jax_reader_rolling_matches_direct_scoring():
    """JaxReaderLM.loglikelihood_rolling == windowed sum of its own
    loglikelihood scores (every token scored once)."""
    from helpers import tiny_reader

    texts = [f"tok{i}" for i in range(30)]
    tokenizer = make_word_tokenizer([" ".join(texts)])
    reader = tiny_reader(tokenizer)
    lm = JaxReaderLM(reader.params, reader.cfg, tokenizer, batch_size=2, max_length=8)

    doc = " ".join(f"tok{i % 30}" for i in range(20))  # 20 tokens > max_length
    (rolling,) = lm.loglikelihood_rolling([doc])
    assert np.isfinite(rolling) and rolling < 0

    # manual windows: score window tokens with the previous token as context
    ids = tokenizer(doc)["input_ids"]
    total, pos = 0.0, 0
    while pos < len(ids):
        window = ids[pos : pos + lm.max_length - 1]
        prev = lm._eos_id() if pos == 0 else ids[pos - 1]
        ctx = tokenizer.decode([prev])
        cont = " " + tokenizer.decode(window)
        pos += len(window)
    # cross-check at least the total token coverage invariant
    assert pos == len(ids)


def test_caching_lm_rolling(tmp_path):
    from retrieval_scaling_tpu.rag_eval.caching import CachingLM

    calls = []

    class LM:
        def loglikelihood_rolling(self, texts):
            calls.append(list(texts))
            return [-1.5 * len(t.split()) for t in texts]

    lm = CachingLM(LM(), str(tmp_path / "cache.db"))
    out1 = lm.loglikelihood_rolling(["a b c", "d e"])
    out2 = lm.loglikelihood_rolling(["a b c", "d e"])  # fully cached
    assert out1 == out2 == [-4.5, -3.0]
    assert len(calls) == 1


# ------------------------------------------------- new-family metrics
class _ScriptedLL:
    """loglikelihood driven by a (ctx, cont) -> ll callable (tests only)."""

    def __init__(self, fn):
        self.fn = fn

    def loglikelihood(self, pairs):
        return [(float(self.fn(ctx, cont)), False) for ctx, cont in pairs]


def test_mutual_ranking_metrics(tmp_path):
    d = tmp_path / "mutual" / "mutual"
    d.mkdir(parents=True)
    doc = {"article": "M: hello. F: hi.", "options": ["a", "b", "c", "d"], "gold": 1}
    (d / "validation.jsonl").write_text(json.dumps(doc) + "\n")
    # gold option "b" ranks 2nd behind "d": r@1=0, r@2=1, mrr=1/2
    lls = {" a": -5.0, " b": -2.0, " c": -6.0, " d": -1.0}
    lm = _ScriptedLL(lambda ctx, cont: lls[cont])
    res = simple_evaluate(lm, ["mutual"], data_root=str(tmp_path))
    scores = res["results"]["mutual"]
    assert scores["r@1"] == 0.0
    assert scores["r@2"] == 1.0
    assert scores["mrr"] == 0.5


def test_crows_pairs_metrics(tmp_path):
    d = tmp_path / "crows_pairs" / "english"
    d.mkdir(parents=True)
    doc = {"sent_more": "stereo sentence", "sent_less": "astereo sentence"}
    (d / "test.jsonl").write_text(json.dumps(doc) + "\n")
    lm = _ScriptedLL(lambda ctx, cont: -1.0 if cont.startswith("stereo") else -3.0)
    res = simple_evaluate(lm, ["crows_pairs_english"], data_root=str(tmp_path))
    scores = res["results"]["crows_pairs_english"]
    assert scores["pct_stereotype"] == 1.0
    assert scores["likelihood_diff"] == pytest.approx(2.0)


def test_mc_taco_binary_f1(tmp_path):
    d = tmp_path / "mc_taco"
    d.mkdir()
    rows = [
        {"sentence": "s0", "question": "q", "answer": "a", "label": 1},
        {"sentence": "s1", "question": "q", "answer": "a", "label": 1},
        {"sentence": "s2", "question": "q", "answer": "a", "label": 0},
    ]
    with open(d / "test.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    # predict yes for s0/s2, no for s1: tp=1, fp=1, fn=1 -> f1 = 2/4
    def fn(ctx, cont):
        say_yes = "s0" in ctx or "s2" in ctx
        return -1.0 if (cont == " yes") == say_yes else -2.0

    res = simple_evaluate(_ScriptedLL(fn), ["mc_taco"], data_root=str(tmp_path))
    scores = res["results"]["mc_taco"]
    assert scores["f1"] == pytest.approx(0.5)
    assert scores["acc"] == pytest.approx(1 / 3)


def test_lambada_perplexity_metric(tmp_path):
    import math

    d = tmp_path / "lambada_openai"
    d.mkdir()
    rows = [{"context": "a b c", "answer": "d"}, {"context": "e f g", "answer": "h"}]
    with open(d / "test.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    lm = _ScriptedLL(lambda ctx, cont: -2.0 if " d" == cont else -4.0)
    res = simple_evaluate(lm, ["lambada_openai"], data_root=str(tmp_path))
    assert res["results"]["lambada_openai"]["perplexity"] == pytest.approx(math.exp(3.0))


def test_blimp_group_rollup(tmp_path):
    for paradigm, flip in [("adjunct_island", False), ("causative", True)]:
        d = tmp_path / "blimp" / paradigm
        d.mkdir(parents=True)
        doc = {"sentence_good": "good one", "sentence_bad": "bad one"}
        (d / "train.jsonl").write_text(json.dumps(doc) + "\n")
    lm = _ScriptedLL(lambda ctx, cont: -1.0 if "good" in cont else -2.0)
    res = simple_evaluate(
        lm, ["blimp_adjunct_island", "blimp_causative"], data_root=str(tmp_path)
    )
    assert res["results"]["blimp_adjunct_island"]["acc"] == 1.0
    assert res["results"]["blimp_causative"]["acc"] == 1.0


def test_wmt_bleu_corpus_aggregation(tmp_path):
    d = tmp_path / "wmt16" / "ro_en"
    d.mkdir(parents=True)
    rows = [
        {"translation": {"en": "the cat", "ro": "pisica neagra sta"}},
        {"translation": {"en": "a dog", "ro": "un caine mare alb"}},
    ]
    with open(d / "validation.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    class PerfectTranslator:
        def generate_until(self, reqs):
            table = {"the cat": "pisica neagra sta", "a dog": "un caine mare alb"}
            outs = []
            for r in reqs:
                src = r["context"].split("translate English to Romanian: ")[-1]
                outs.append(table[src.split("\n")[0]])
            return outs

    res = simple_evaluate(PerfectTranslator(), ["wmt_ro_en_t5_prompt"], data_root=str(tmp_path))
    scores = res["results"]["wmt_ro_en_t5_prompt"]
    assert scores["bleu"] == pytest.approx(100.0)
    assert scores["wer"] == 0.0


def test_bleu_smoothing_and_filter_column(tmp_path):
    from retrieval_scaling_tpu.rag_eval.metrics import corpus_bleu

    # partial overlap with zero 4-gram matches: exp smoothing keeps a
    # nonzero score (sacrebleu default), not a hard 0
    score = corpus_bleu([("the big cat sat", ["the small cat sat down"])])
    assert 0.0 < score < 100.0

    # bleu combined with a filter pipeline produces a per-filter column
    d = tmp_path / "wmt16" / "ro_en"
    d.mkdir(parents=True)
    (d / "validation.jsonl").write_text(
        json.dumps({"translation": {"en": "hi", "ro": "salut prietene drag al meu"}}) + "\n"
    )
    import dataclasses

    cfg = dataclasses.replace(
        get_task("wmt_ro_en_t5_prompt"),
        filters=[{"name": "strip", "steps": [{"type": "strip"}]}],
    )

    class Echo:
        def generate_until(self, reqs):
            return ["  salut prietene drag al meu  "] * len(reqs)

    res = simple_evaluate(Echo(), [cfg], data_root=str(tmp_path))
    assert res["results"]["wmt_ro_en_t5_prompt"]["bleu,strip"] == pytest.approx(100.0)


def test_quant_matmul_pallas_rejects_unaligned_m():
    import jax.numpy as jnp

    from retrieval_scaling_tpu.ops.quant_matmul import int8_matmul, quantize_weight

    x = jnp.ones((100, 128), jnp.bfloat16)
    qw = quantize_weight(jnp.ones((128, 128), jnp.float32))
    with pytest.raises(AssertionError):
        int8_matmul(x, qw, impl="pallas", interpret=True)


def test_benchmark_group_overrides(tmp_path):
    """openllm-style dict members carry fewshot overrides to the leaves
    (reference: lm_eval/tasks/benchmarks/openllm.yaml)."""
    from retrieval_scaling_tpu.rag_eval.tasks import TaskConfig, expand_task_list

    ordered, groups = expand_task_list(["openllm"])
    by_name = {(e if isinstance(e, str) else e.task): e for e in ordered}
    arc = by_name["arc_challenge"]
    assert isinstance(arc, TaskConfig)
    assert arc.num_fewshot == 25 and arc.fewshot_split == "validation"
    # nested group override: every mmlu subject inherits num_fewshot=5
    astro = by_name["mmlu_astronomy"]
    assert isinstance(astro, TaskConfig) and astro.num_fewshot == 5
    # plain string member stays a string; rollup map records names
    assert isinstance(by_name["truthfulqa_mc1"], str)
    assert groups["openllm"][0] == "arc_challenge"
    assert "mmlu" in groups and len(groups["mmlu"]) == 57


# ------------------------------------------------- reference-CLI additions
def test_gen_kwargs_override_reaches_requests(tmp_path):
    """simple_evaluate(gen_kwargs=...) merges into every generate_until
    request (reference: lm_eval --gen_kwargs)."""
    root = _write_task_data(tmp_path)
    seen = []

    class RecordingLM:
        def generate_until(self, reqs):
            seen.extend(r["gen_kwargs"] for r in reqs)
            return ["x"] * len(reqs)

    simple_evaluate(
        RecordingLM(), ["nq_open"], data_root=root,
        gen_kwargs={"temperature": 0.7, "max_gen_toks": 7},
    )
    assert seen
    assert all(g["temperature"] == 0.7 and g["max_gen_toks"] == 7 for g in seen)
    # task-level keys not overridden survive
    assert all(g["until"] == ["\n", ".", ","] for g in seen)


def test_task_generation_kwargs_full_passthrough(tmp_path):
    """Sampling keys in a task's generation_kwargs reach the request dict
    (reference task YAMLs carry do_sample/temperature)."""
    root = _write_task_data(tmp_path)
    cfg = get_task("nq_open")
    cfg.generation_kwargs = dict(cfg.generation_kwargs)
    cfg.generation_kwargs.update({"do_sample": True, "temperature": 0.4})
    task = Task(cfg, data_root=root)
    req = task.build_requests()[0]
    assert req["gen_kwargs"]["do_sample"] is True
    assert req["gen_kwargs"]["temperature"] == 0.4


def test_fewshot_seed_is_deterministic_and_varies(tmp_path):
    root = _write_task_data(tmp_path, n=12)
    cfg = get_task("nq_open")
    ctx = lambda seed: Task(cfg, data_root=root, seed=seed).fewshot_context(
        Task(cfg, data_root=root, seed=seed).docs[0], num_fewshot=5
    )
    assert ctx(7) == ctx(7)
    assert ctx(7) != ctx(8)


def test_check_integrity_flags_empty_prompt(tmp_path):
    root = _write_task_data(tmp_path)
    cfg = get_task("nq_open")
    cfg.doc_to_text = ""
    cfg.description = ""
    with pytest.raises(ValueError, match="empty rendered prompt"):
        simple_evaluate(DummyLM(), [cfg], data_root=root, check_integrity=True)


def test_cli_flags_end_to_end(tmp_path, capsys):
    """--gen_kwargs/--seed/--write_out/--check_integrity/--show_config/
    --include_path parse and run through the real CLI entry point."""
    from retrieval_scaling_tpu.rag_eval.__main__ import main
    from retrieval_scaling_tpu.rag_eval import tasks as tasks_mod

    root = _write_task_data(tmp_path)
    # custom task dir for --include_path
    inc = tmp_path / "extra_tasks"
    inc.mkdir()
    (inc / "my_custom_qa.yaml").write_text(
        "task: my_custom_qa\n"
        "dataset_path: nq_open\n"
        "test_split: validation\n"
        "output_type: generate_until\n"
        "doc_to_text: \"Q: {question}?\\nA:\"\n"
        "doc_to_target: \"{answer[0]}\"\n"
        "metric_list: [exact_match]\n"
    )
    n_extra = len(tasks_mod._EXTRA_DIRS)
    try:
        main([
            "--model", "dummy", "--tasks", "my_custom_qa",
            "--data_root", root, "--include_path", str(inc),
            "--gen_kwargs", "temperature=0.0,max_gen_toks=4",
            "--seed", "3,4,5,6", "--write_out", "--check_integrity",
            "--show_config", "--verbosity", "INFO",
            "--max_batch_size", "2",
        ])
    finally:
        del tasks_mod._EXTRA_DIRS[n_extra:]
    out = capsys.readouterr().out
    assert '"my_custom_qa"' in out      # results table printed
    assert '"show_config": true' in out  # config dump printed


def test_cli_batch_size_auto(tmp_path, capsys):
    """Reference-style --batch_size auto / auto:N parses (fixed-shape XLA
    batching resolves auto to the default, auto:N to N)."""
    from retrieval_scaling_tpu.rag_eval.__main__ import main

    root = _write_task_data(tmp_path)
    main(["--model", "dummy", "--tasks", "nq_open", "--data_root", root,
          "--batch_size", "auto:4", "--limit", "4"])
    out = capsys.readouterr().out
    assert '"nq_open"' in out
