"""Evaluator with the RAG retrieval hooks.

Reproduces the reference evaluator's RAG flow (reference:
rag-evaluation-harness/lm_eval/evaluator.py:399-558,803-843):

  1. build requests with fewshot contexts;
  2. export queries (``save_inputs_only`` / ``inputs_save_dir``) — the 0-shot
     question extracted by splitting on the '\\n\\n' fewshot delimiter;
  3. export gold answers (``answer_save_dir``);
  4. hash the retrieval results file into {query -> concat of k ctx texts in
     reverse relevance order} and prepend to every prompt
     (``retrieval_file``/``retrieval_dir`` + ``concat_k``);
  5. run the LM over requests, apply metrics, emit results with ``n-doc``.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

from retrieval_scaling_tpu.rag_eval.metrics import (
    DOC_METRICS,
    METRICS,
    PAIR_METRICS,
    aggregate_mean,
    bootstrap_stderr,
    mean_stderr,
    pooled_sample_stderr,
)
from retrieval_scaling_tpu.rag_eval.tasks import (
    Task,
    TaskConfig,
    expand_task_list,
    get_task,
)

logger = logging.getLogger(__name__)

# MT metrics aggregated at corpus level from (pred, refs) pairs rather than
# per-instance means (reference: lm_eval/api/metrics.py bleu/ter/chrf via
# sacrebleu corpus scorers).
_CORPUS_MT_METRICS = ("bleu", "ter", "chrf")
# set-level classification F1s aggregated from (pred, gold) pairs
_CLF_PAIR_METRICS = ("f1_micro", "f1_macro", "f1_vaxx")


def _first_metric(task, names) -> Optional[str]:
    """First metric_list entry in `names` — pair-collection guard so one
    (pred, gold) pair lands per instance however many set-level metrics a
    task requests."""
    return next((m for m in task.cfg.metric_list if m in names), None)


def _first_mt_metric(task) -> Optional[str]:
    return _first_metric(task, _CORPUS_MT_METRICS)


def extract_question_from_fewshot_prompt(prompt: str) -> str:
    """0-shot question = last '\\n\\n'-delimited segment
    (reference: evaluator.py:803-809)."""
    return prompt.split("\n\n")[-1]


def hash_retrieval_results(path: str, concat_k: int) -> Dict[str, str]:
    """{query -> k ctx texts concatenated most-relevant-last}
    (reference: evaluator.py:812-843)."""
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    return hash_retrieval_rows(rows, concat_k)


def hash_retrieval_rows(rows, concat_k: int) -> Dict[str, str]:
    hashed: Dict[str, str] = {}
    for row in rows:
        if "raw_query" in row or "query" in row:
            raw_query = row.get("raw_query", row.get("query"))
            raw_query = extract_question_from_fewshot_prompt(raw_query)
        else:
            raw_query = row["question"]
        ctxs = row.get("ctxs") or []
        k_ctx = ""
        for i in range(concat_k):
            if i >= len(ctxs) or ctxs[i] is None:
                logger.warning("only %d docs available to prepend", i)
                break
            ctx = ctxs[i]
            text = ctx.get("retrieval text", ctx.get("text", ""))
            k_ctx = text + k_ctx
        hashed[raw_query] = k_ctx
    return hashed


def _run_requests(lm, requests: List[dict]) -> List[dict]:
    """Dispatch grouped by request type; returns per-request result dicts."""
    gen_idx = [i for i, r in enumerate(requests) if r["type"] == "generate_until"]
    ll_idx = [i for i, r in enumerate(requests) if r["type"] == "loglikelihood"]
    mc_idx = [i for i, r in enumerate(requests) if r["type"] == "multiple_choice"]
    roll_idx = [i for i, r in enumerate(requests) if r["type"] == "loglikelihood_rolling"]
    results: List[dict] = [None] * len(requests)  # type: ignore[list-item]

    if gen_idx:
        outs = lm.generate_until([requests[i] for i in gen_idx])
        for i, text in zip(gen_idx, outs):
            results[i] = {"prediction": text}

    if ll_idx:
        pairs = [(requests[i]["context"], requests[i]["continuation"]) for i in ll_idx]
        outs = lm.loglikelihood(pairs)
        for i, (ll, greedy) in zip(ll_idx, outs):
            results[i] = {"loglikelihood": ll, "is_greedy": greedy}

    if roll_idx:
        outs = lm.loglikelihood_rolling([requests[i]["text"] for i in roll_idx])
        for i, ll in zip(roll_idx, outs):
            results[i] = {"loglikelihood": ll}

    if mc_idx:
        flat_pairs, owners = [], []
        for i in mc_idx:
            if "contexts" in requests[i]:
                # winogrande-style: per-choice contexts, shared continuation
                for ctx in requests[i]["contexts"]:
                    flat_pairs.append((ctx, requests[i]["continuation"]))
                    owners.append(i)
                continue
            for choice in requests[i]["choices"]:
                flat_pairs.append((requests[i]["context"], choice))
                owners.append(i)
        outs = lm.loglikelihood(flat_pairs)
        per_req: Dict[int, List[float]] = {}
        for owner, (ll, _) in zip(owners, outs):
            per_req.setdefault(owner, []).append(ll)
        for i in mc_idx:
            lls = per_req[i]
            results[i] = {"choice_lls": lls, "prediction_idx": int(max(range(len(lls)), key=lls.__getitem__))}

    return results


def _score_task(
    task: Task,
    requests: List[dict],
    outputs: List[dict],
    bootstrap_iters: int = 1000,
    collect_samples: bool = False,
    predict_only: bool = False,
) -> tuple:
    """Score one task's outputs.

    Returns ``(scores, samples)`` — ``samples`` is a per-instance record
    list when ``collect_samples`` (reference: lm_eval --log_samples), else
    ``None``. ``predict_only`` skips metrics (reference: --predict_only).
    Every mean-aggregated metric gets an analytic ``<metric>_stderr``;
    set-level aggregations (mcc, f1, bleu, perplexity) get a seeded
    bootstrap (reference: lm_eval/api/metrics.py stderr_for_metric).
    """
    samples: Optional[List[dict]] = [] if collect_samples else None

    def record(i: int, req: dict, out: dict, extra: dict) -> None:
        if samples is None:
            return
        row = {"doc_id": i, "doc": req["doc"], "context": req["context"]}
        row.update(extra)
        samples.append(row)

    if predict_only:
        for i, (req, out) in enumerate(zip(requests, outputs)):
            if req["type"] == "generate_until":
                record(i, req, out, {"prediction": out["prediction"]})
            elif req["type"] == "multiple_choice":
                record(i, req, out, {
                    "choices": req["choices"], "choice_lls": out["choice_lls"],
                    "prediction_idx": out["prediction_idx"],
                })
            else:
                record(i, req, out, {"loglikelihood": out["loglikelihood"]})
        return {}, samples

    metric_values: Dict[str, List[float]] = {}
    for i, (req, out) in enumerate(zip(requests, outputs)):
        doc = req["doc"]
        if req["type"] == "generate_until" and "prompt_level_strict_acc" in task.cfg.metric_list:
            # IFEval verifiable-instruction scoring (reference:
            # lm_eval/tasks/ifeval/utils.py process_results): docs carry
            # instruction_id_list + per-instruction kwargs.
            from retrieval_scaling_tpu.rag_eval.ifeval import score_response

            ids = doc["instruction_id_list"]
            kwargs_list = doc.get("kwargs") or [{} for _ in ids]
            strict, loose = score_response(out["prediction"], ids, kwargs_list)
            metric_values.setdefault("prompt_level_strict_acc", []).append(float(all(strict)))
            metric_values.setdefault("prompt_level_loose_acc", []).append(float(all(loose)))
            metric_values.setdefault("inst_level_strict_acc", []).extend(map(float, strict))
            metric_values.setdefault("inst_level_loose_acc", []).extend(map(float, loose))
            record(i, req, out, {
                "prediction": out["prediction"],
                "metrics": {"prompt_level_strict_acc": float(all(strict)),
                            "prompt_level_loose_acc": float(all(loose))},
            })
        elif req["type"] == "generate_until":
            refs = [task.cfg.extract_target(r) for r in task.references(doc)]
            if task.cfg.empty_prediction is not None and not out["prediction"].strip():
                # reference: scrolls/task.py Qasper.process_results — empty
                # generations score as the designated abstention string
                out = {**out, "prediction": task.cfg.empty_prediction}
            inst_metrics: Dict[str, float] = {}
            filtered: Dict[str, str] = {}
            if task.cfg.filters:
                # named filter pipelines -> per-filter metric columns
                # (reference: lm_eval "exact_match,strict-match" naming)
                for filt in task.cfg.filters:
                    pred = task.cfg.apply_filter_steps(
                        out["prediction"], filt["steps"], doc=doc
                    )
                    filtered[filt["name"]] = pred
                    for name in task.cfg.metric_list:
                        col = f"{name},{filt['name']}"
                        if name in _CORPUS_MT_METRICS:
                            # one (pred, refs) pair per instance feeds every
                            # requested corpus MT metric
                            if name == _first_mt_metric(task):
                                metric_values.setdefault(
                                    f"_mt_pairs,{filt['name']}", []
                                ).append((pred, refs))
                            continue
                        if name in DOC_METRICS:
                            val = DOC_METRICS[name](pred, doc)
                            inst_metrics[col] = val
                            metric_values.setdefault(col, []).append(val)
                            continue
                        if name in PAIR_METRICS:
                            metric_values.setdefault(
                                f"_pairmetric:{name},{filt['name']}", []
                            ).append((pred, refs[0]))
                            continue
                        if name in _CLF_PAIR_METRICS:
                            # set-level classification F1 over filtered
                            # (pred, gold) label pairs (polemo2; reference:
                            # lm_eval/tasks/polemo2 hf-evaluate micro f1
                            # over the mapped class indices).
                            if name == _first_metric(task, _CLF_PAIR_METRICS):
                                metric_values.setdefault(
                                    f"_clf_pairs,{filt['name']}", []
                                ).append((pred, refs[0]))
                            continue
                        val = METRICS[name](pred, refs, **task.metric_kwargs(name))
                        inst_metrics[col] = val
                        metric_values.setdefault(col, []).append(val)
            else:
                prediction = task.cfg.apply_filter(out["prediction"])
                filtered["default"] = prediction
                for name in task.cfg.metric_list:
                    if name in _CORPUS_MT_METRICS:
                        # corpus-level aggregation (sacrebleu semantics):
                        # pool counts over all segments, not a mean of
                        # per-segment scores; one pair feeds bleu/ter/chrf.
                        if name == _first_mt_metric(task):
                            metric_values.setdefault("_mt_pairs", []).append(
                                (prediction, refs)
                            )
                        continue
                    if name in _CLF_PAIR_METRICS:
                        # generated class labels, case-folded: the unitxt
                        # classification templates lowercase predictions and
                        # references via postprocessors (reference:
                        # unitxt templates.classification.multi_class.title)
                        if name == _first_metric(task, _CLF_PAIR_METRICS):
                            metric_values.setdefault("_clf_pairs", []).append(
                                (prediction.strip().lower(),
                                 refs[0].strip().lower())
                            )
                        continue
                    if name in DOC_METRICS:
                        # doc-aware per-instance scorer (e.g. T5 WSC
                        # referent matching)
                        val = DOC_METRICS[name](prediction, doc)
                        inst_metrics[name] = val
                        metric_values.setdefault(name, []).append(val)
                        continue
                    if name in PAIR_METRICS:
                        # corpus-level aggregation over (pred, ref) pairs
                        # (e.g. multirc/record T5 group scoring)
                        metric_values.setdefault(
                            f"_pairmetric:{name}", []
                        ).append((prediction, refs[0]))
                        continue
                    val = METRICS[name](prediction, refs, **task.metric_kwargs(name))
                    inst_metrics[name] = val
                    metric_values.setdefault(name, []).append(val)
            record(i, req, out, {
                "prediction": out["prediction"], "filtered": filtered,
                "references": refs, "metrics": inst_metrics,
            })
        elif req["type"] == "loglikelihood":
            metric_values.setdefault("loglikelihood", []).append(out["loglikelihood"])
            metric_values.setdefault("acc", []).append(float(out["is_greedy"]))
            record(i, req, out, {
                "continuation": req["continuation"],
                "loglikelihood": out["loglikelihood"],
                "metrics": {"acc": float(out["is_greedy"])},
            })
        elif req["type"] == "loglikelihood_rolling":
            # corpus-level weighted aggregation (lm-eval wikitext metrics).
            # Word/byte counts come from the PRE-detokenization text when
            # the shim kept it (reference: french_bench/preprocess_wikitext
            # process_results counts doc["paragraph"], not the detokenized
            # string the model scores).
            text = req["doc"].get("raw_count_text", req["text"])
            metric_values.setdefault("_rolling", []).append(
                (out["loglikelihood"], max(len(text.split()), 1), max(len(text.encode()), 1))
            )
            record(i, req, out, {"loglikelihood": out["loglikelihood"]})
        elif "gold_mask" in req:  # multiple_choice with multi-true targets
            # TruthfulQA mc2: probability mass assigned to the true options
            # (reference: lm_eval/tasks/truthfulqa mc2 aggregation).
            import math

            lls = out["choice_lls"]
            probs = [math.exp(ll) for ll in lls]
            true_mass = sum(p for p, g in zip(probs, req["gold_mask"]) if g)
            mc2 = true_mass / max(sum(probs), 1e-30)
            metric_values.setdefault("mc2", []).append(mc2)
            record(i, req, out, {
                "choices": req["choices"], "choice_lls": lls,
                "metrics": {"mc2": mc2},
            })
        elif req.get("score_choice_text"):
            # ReCoRD: argmax choice picks an ENTITY, scored with SQuAD token
            # F1 + exact match against the gold answer set (reference:
            # super_glue/record/util.py process_results)
            pred_idx = out["prediction_idx"]
            entities = doc[task.cfg.choice_text_field]
            pred_text = entities[min(pred_idx, len(entities) - 1)]
            refs = task.references(doc)
            f1v = METRICS["f1"](pred_text, refs)
            emv = METRICS["exact_match"](pred_text, refs)
            metric_values.setdefault("f1", []).append(f1v)
            metric_values.setdefault("em", []).append(emv)
            record(i, req, out, {
                "choices": req["choices"], "choice_lls": out["choice_lls"],
                "prediction": pred_text, "references": refs,
                "metrics": {"f1": f1v, "em": emv},
            })
        elif req.get("yes_no_f1"):
            # hybrid yes/no doc (reference: scrolls/task.py Qasper): the
            # higher-likelihood polarity is scored by the task's text
            # metrics against the gold answers, pooled with the generated
            # docs' scores
            lls = out["choice_lls"]
            prediction = "yes" if lls[0] > lls[1] else "no"
            refs = [task.cfg.extract_target(r) for r in task.references(doc)]
            inst_metrics = {}
            for name in task.cfg.metric_list:
                val = METRICS[name](prediction, refs, **task.metric_kwargs(name))
                inst_metrics[name] = val
                metric_values.setdefault(name, []).append(val)
            record(i, req, out, {
                "choices": req["choices"], "choice_lls": lls,
                "prediction": prediction, "references": refs,
                "metrics": inst_metrics,
            })
        else:  # multiple_choice
            pred, gold = out["prediction_idx"], req["gold"]
            metric_values.setdefault("acc", []).append(float(pred == gold))
            # Byte-length-normalized accuracy (lm-eval's acc_norm): compare
            # per-character loglikelihoods so longer choices aren't penalized.
            lls = out["choice_lls"]
            lengths = [max(len(c), 1) for c in req["choices"]]
            norm_idx = int(max(range(len(lls)), key=lambda j: lls[j] / lengths[j]))
            metric_values.setdefault("acc_norm", []).append(float(norm_idx == req["gold"]))
            record(i, req, out, {
                "choices": req["choices"], "choice_lls": lls,
                "prediction_idx": pred, "gold": gold,
                "metrics": {"acc": float(pred == gold),
                            "acc_norm": float(norm_idx == gold)},
            })
            if "mcc" in task.cfg.metric_list:
                # set-level Matthews correlation (GLUE CoLA): collect binary
                # (pred, gold) pairs, aggregate after the loop.
                metric_values.setdefault("_mcc_pairs", []).append((pred, gold))
            if "f1" in task.cfg.metric_list:
                # set-level binary F1 (MC-TACO; reference: lm_eval f1
                # aggregation over yes/no predictions).
                metric_values.setdefault("_f1_pairs", []).append((pred, gold))
            if {"f1_macro", "f1_micro", "f1_vaxx"} & set(task.cfg.metric_list):
                # multiclass classification F1 (KoBEST macro_f1_score,
                # BasqueGLUE micro/vaxx; reference: lm_eval/tasks/kobest/
                # utils.py, lm_eval/tasks/basqueglue/utils.py).
                metric_values.setdefault("_clf_pairs", []).append((pred, gold))
            if {"r@1", "r@2", "mrr"} & set(task.cfg.metric_list):
                # likelihood-ranking metrics (MuTual; reference:
                # lm_eval/tasks/mutual/utils.py process_results).
                rank = 1 + sum(1 for ll in lls if ll > lls[gold])
                if "r@1" in task.cfg.metric_list:
                    metric_values.setdefault("r@1", []).append(float(rank == 1))
                if "r@2" in task.cfg.metric_list:
                    metric_values.setdefault("r@2", []).append(float(rank <= 2))
                if "mrr" in task.cfg.metric_list:
                    metric_values.setdefault("mrr", []).append(1.0 / rank)
            if "pct_stereotype" in task.cfg.metric_list:
                # CrowS-Pairs bias probe: choices = [sent_more, sent_less]
                # (reference: lm_eval/tasks/crows_pairs/utils.py).
                metric_values.setdefault("pct_stereotype", []).append(
                    float(lls[0] > lls[1])
                )
                metric_values.setdefault("likelihood_diff", []).append(
                    abs(lls[0] - lls[1])
                )

    def _agg_f1(pairs):
        tp = sum(1 for p, g in pairs if p == 1 and g == 1)
        fp = sum(1 for p, g in pairs if p == 1 and g == 0)
        fn = sum(1 for p, g in pairs if p == 0 and g == 1)
        denom = 2 * tp + fp + fn
        return 2 * tp / denom if denom else 0.0

    def _agg_mcc(pairs):
        tp = sum(1 for p, g in pairs if p == 1 and g == 1)
        tn = sum(1 for p, g in pairs if p == 0 and g == 0)
        fp = sum(1 for p, g in pairs if p == 1 and g == 0)
        fn = sum(1 for p, g in pairs if p == 0 and g == 1)
        denom = ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) ** 0.5
        return (tp * tn - fp * fn) / denom if denom else 0.0

    scores = {}
    for name, vals in metric_values.items():
        if name == "_rolling":
            import math

            ll = sum(v[0] for v in vals)
            words = sum(v[1] for v in vals)
            bytes_ = sum(v[2] for v in vals)
            scores["word_perplexity"] = math.exp(-ll / words)
            scores["byte_perplexity"] = math.exp(-ll / bytes_)
            scores["bits_per_byte"] = -ll / bytes_ / math.log(2)
        elif name.startswith("_mt_pairs"):
            from retrieval_scaling_tpu.rag_eval.metrics import (
                corpus_bleu,
                corpus_chrf,
                corpus_ter,
            )

            _, _, filt_name = name.partition(",")
            for mname, fn in (
                ("bleu", corpus_bleu), ("ter", corpus_ter), ("chrf", corpus_chrf),
            ):
                if mname in task.cfg.metric_list:
                    col = f"{mname},{filt_name}" if filt_name else mname
                    scores[col] = fn(vals)
                    scores[col + "_stderr"] = bootstrap_stderr(
                        fn, vals, iters=bootstrap_iters
                    )
        elif name == "_f1_pairs":
            scores["f1"] = _agg_f1(vals)
            scores["f1_stderr"] = bootstrap_stderr(_agg_f1, vals, iters=bootstrap_iters)
        elif name == "_mcc_pairs":
            scores["mcc"] = _agg_mcc(vals)
            scores["mcc_stderr"] = bootstrap_stderr(_agg_mcc, vals, iters=bootstrap_iters)
        elif name.startswith("_clf_pairs"):
            from retrieval_scaling_tpu.rag_eval.metrics import (
                f1_macro_pairs,
                f1_micro_pairs,
                f1_vaxx_pairs,
            )

            _, _, filt_name = name.partition(",")
            for mname, fn in (
                ("f1_macro", f1_macro_pairs),
                ("f1_micro", f1_micro_pairs),
                ("f1_vaxx", f1_vaxx_pairs),
            ):
                if mname in task.cfg.metric_list:
                    col = f"{mname},{filt_name}" if filt_name else mname
                    scores[col] = fn(vals)
                    scores[col + "_stderr"] = bootstrap_stderr(
                        fn, vals, iters=bootstrap_iters
                    )
        elif name.startswith("_pairmetric:"):
            mname, _, filt_name = name.split(":", 1)[1].partition(",")
            fn = PAIR_METRICS[mname]
            col = f"{mname},{filt_name}" if filt_name else mname
            scores[col] = fn(vals)
            scores[col + "_stderr"] = bootstrap_stderr(
                fn, vals, iters=bootstrap_iters
            )
        else:
            scores[name] = aggregate_mean(vals)
            if bootstrap_iters > 0:
                scores[name + "_stderr"] = mean_stderr(vals)
    if "perplexity" in task.cfg.metric_list and "loglikelihood" in metric_values:
        # lm-eval's `perplexity` aggregation over loglikelihood requests
        # (LAMBADA): exp of the negated mean target loglikelihood.
        import math

        _agg_ppl = lambda lls: math.exp(-aggregate_mean(lls))  # noqa: E731
        scores["perplexity"] = _agg_ppl(metric_values["loglikelihood"])
        scores["perplexity_stderr"] = bootstrap_stderr(
            _agg_ppl, metric_values["loglikelihood"], iters=bootstrap_iters
        )
    if bootstrap_iters <= 0:
        scores = {k: v for k, v in scores.items() if not k.endswith("_stderr")}
    return scores, samples


def simple_evaluate(
    lm,
    tasks: List[str],
    num_fewshot: Optional[int] = None,
    data_root: Optional[str] = None,
    limit: Optional[int] = None,
    # RAG flags (reference: lm_eval/__main__.py:253-304)
    save_inputs_only: bool = False,
    inputs_save_dir: Optional[str] = None,
    answer_save_dir: Optional[str] = None,
    overwrite_saved_inputs: bool = False,
    retrieval_file: Optional[str] = None,
    retrieval_dir: Optional[str] = None,
    concat_k: int = 0,
    additional_system_prompt: Optional[str] = None,
    results_only_save_path: Optional[str] = None,
    apply_chat_template: bool = False,
    system_instruction: Optional[str] = None,
    fewshot_as_multiturn: bool = False,
    decontamination_ngrams: int = 0,
    loggers: Optional[list] = None,
    bootstrap_iters: int = 1000,
    log_samples: bool = False,
    predict_only: bool = False,
    samples_save_dir: Optional[str] = None,
    cache_dir: Optional[str] = None,
    gen_kwargs: Optional[dict] = None,
    fewshot_seed: int = 1234,
    write_out: bool = False,
    check_integrity: bool = False,
) -> Optional[dict]:
    """``gen_kwargs``: overrides merged into every generate_until
    request's kwargs (reference: lm_eval --gen_kwargs). ``fewshot_seed``:
    seeds the per-task fewshot sampler (reference --seed 4th field).
    ``write_out``: log each task's first rendered prompt/target for
    inspection (reference --write_out). ``check_integrity``: fail fast if
    a task renders an empty prompt or has no docs (reference
    --check_integrity's run_task_tests analog)."""
    if fewshot_as_multiturn and not apply_chat_template:
        raise ValueError("fewshot_as_multiturn requires apply_chat_template")
    if predict_only:
        log_samples = True  # reference: --predict_only implies --log_samples
    all_results = {"results": {}, "groups": {}, "versions": {}, "n-doc": concat_k}
    if log_samples:
        all_results["samples"] = {}

    # Group names (e.g. "mmlu" -> 57 subject tasks + 4 category rollups)
    # expand before evaluation; aggregates are computed afterwards
    # (reference: lm_eval group tables, evaluator.py:562-765).
    tasks, group_map = expand_task_list(list(tasks))

    for task_name in tasks:
        cfg = get_task(task_name) if isinstance(task_name, str) else task_name
        if limit:
            cfg.limit = limit
        task = Task(cfg, data_root=data_root, cache_dir=cache_dir, seed=fewshot_seed)
        # Multiturn chat: shots become user/assistant turns instead of being
        # baked into the prompt string, so build 0-shot requests here.
        request_fewshot = 0 if fewshot_as_multiturn else num_fewshot
        requests = task.build_requests(request_fewshot)
        if fewshot_as_multiturn:
            for req in requests:
                req["shots"] = task.fewshot_shots(req["doc"], num_fewshot)
        logger.info("Task %s: %d requests", cfg.task, len(requests))
        if gen_kwargs:
            for req in requests:
                if req.get("type") == "generate_until":
                    req["gen_kwargs"] = {**req["gen_kwargs"], **gen_kwargs}
        def _first_text(req):
            # generate_until/loglikelihood carry 'context';
            # loglikelihood_rolling tasks carry only 'text'
            return (
                req.get("context")
                or next(iter(req.get("contexts", [])), None)
                or req.get("text")
            )

        if check_integrity:
            if not requests:
                raise ValueError(f"task {cfg.task}: no documents / requests")
            first_ctx = _first_text(requests[0])
            if not isinstance(first_ctx, str) or not first_ctx.strip():
                raise ValueError(f"task {cfg.task}: empty rendered prompt")
        if write_out:
            r0 = requests[0] if requests else {}
            ctx0 = _first_text(r0) or ""
            tgt0 = task.references(r0["doc"]) if r0.get("doc") is not None else []
            logger.info(
                "write_out %s | prompt:\n%s\n| target(s): %r", cfg.task, ctx0, tgt0
            )

        # --- query export for offline retrieval (step 1 of the RAG pipeline)
        if inputs_save_dir:
            os.makedirs(inputs_save_dir, exist_ok=True)
            save_file = os.path.join(inputs_save_dir, f"{cfg.task}.jsonl")
            if not os.path.exists(save_file) or overwrite_saved_inputs:
                with open(save_file, "w") as f:
                    for req in requests:
                        f.write(
                            json.dumps(
                                {"query": extract_question_from_fewshot_prompt(req["context"])}
                            )
                            + "\n"
                        )
        if answer_save_dir:
            os.makedirs(answer_save_dir, exist_ok=True)
            save_file = os.path.join(answer_save_dir, f"{cfg.task}.jsonl")
            if not os.path.exists(save_file) or overwrite_saved_inputs:
                with open(save_file, "w") as f:
                    for req in requests:
                        f.write(
                            json.dumps(
                                {"query": req["context"], "answer": task.references(req["doc"])}
                            )
                            + "\n"
                        )
        if save_inputs_only:
            logger.info("save_inputs_only set; skipping evaluation")
            continue

        # --- retrieved-context prepending
        if retrieval_file or retrieval_dir:
            rfile = retrieval_file or os.path.join(
                retrieval_dir, f"{cfg.task}_retrieved_results.jsonl"
            )
            if decontamination_ngrams:
                # request-level n-gram janitor: drop retrieved ctxs sharing
                # an n-gram with the eval set (reference:
                # lm_eval/decontamination/ 13-gram janitor).
                from retrieval_scaling_tpu.rag_eval.janitor import decontaminate_ctxs

                with open(rfile) as f:
                    rows = [json.loads(line) for line in f if line.strip()]
                contaminants = [
                    task.doc_text(req["doc"]) + " " + " ".join(task.references(req["doc"]))
                    for req in requests
                ]
                rows, n_removed = decontaminate_ctxs(
                    contaminants, rows, ngram_n=decontamination_ngrams
                )
                if n_removed:
                    logger.info("janitor removed %d contaminated ctxs", n_removed)
                hashed = hash_retrieval_rows(rows, concat_k)
            else:
                hashed = hash_retrieval_results(rfile, concat_k)
            missing = 0
            for req in requests:
                query = extract_question_from_fewshot_prompt(req["context"])
                if query not in hashed:
                    missing += 1
                    continue
                prefix = hashed[query]
                if additional_system_prompt:
                    req["context"] = prefix + "\n\n" + additional_system_prompt + req["context"]
                else:
                    req["context"] = prefix + req["context"]
            if missing:
                logger.warning("%d/%d queries missing from retrieval file", missing, len(requests))
        elif additional_system_prompt:
            for req in requests:
                req["context"] = additional_system_prompt + req["context"]

        if apply_chat_template:
            # Wrap each prompt in the model's chat template (reference:
            # lm_eval --apply_chat_template / --system_instruction).
            formatter = getattr(lm, "apply_chat_template", None)
            if formatter is None:
                raise ValueError(
                    f"backend {type(lm).__name__} does not support chat templates"
                )
            for req in requests:
                req["context"] = formatter(
                    req["context"], system_instruction, req.get("shots")
                )

        outputs = _run_requests(lm, requests)
        scores, samples = _score_task(
            task, requests, outputs,
            bootstrap_iters=bootstrap_iters,
            collect_samples=log_samples,
            predict_only=predict_only,
        )
        all_results["results"][cfg.task] = {**scores, "n-doc": concat_k, "samples": len(requests)}
        all_results["versions"][cfg.task] = cfg.version
        if log_samples:
            all_results["samples"][cfg.task] = samples
            if samples_save_dir:
                os.makedirs(samples_save_dir, exist_ok=True)
                sfile = os.path.join(samples_save_dir, f"samples_{cfg.task}.jsonl")
                with open(sfile, "w") as f:
                    for row in samples:
                        f.write(json.dumps(row, default=str) + "\n")
                logger.info("Wrote %d sample records to %s", len(samples), sfile)
        logger.info("Task %s: %s", cfg.task, scores)

    if save_inputs_only:
        return None

    # --- group rollups: sample-weighted mean per metric over member tasks
    for group, members in group_map.items():
        rows = []
        for member in members:
            if member in all_results["results"]:
                rows.append(all_results["results"][member])
            elif member in all_results["groups"]:
                rows.append(all_results["groups"][member])
        if not rows:
            continue
        total = sum(r["samples"] for r in rows)
        metric_names = set.intersection(
            *[
                {k for k in r if k not in ("n-doc", "samples") and not k.endswith("_stderr")}
                for r in rows
            ]
        )
        rollup = {
            name: sum(r[name] * r["samples"] for r in rows) / max(total, 1)
            for name in metric_names
        }
        # group stderr: pooled variance over size-weighted members
        # (reference: metrics.py pooled_sample_stderr)
        for name in metric_names:
            se_key = name + "_stderr"
            if all(se_key in r for r in rows):
                rollup[se_key] = pooled_sample_stderr(
                    [r[se_key] for r in rows], [r["samples"] for r in rows]
                )
        all_results["groups"][group] = {**rollup, "n-doc": concat_k, "samples": total}
        logger.info("Group %s (%d tasks): %s", group, len(rows), rollup)

    if results_only_save_path:
        with open(results_only_save_path, "a") as f:
            f.write(json.dumps(all_results) + "\n")
    for lg in loggers or []:
        lg.log_results(all_results)
    return all_results
