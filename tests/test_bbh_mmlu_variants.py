"""BBH fewshot/CoT variants and MMLU FLAN prompt variants (reference:
lm_eval/tasks/bbh/{fewshot,cot_zeroshot,cot_fewshot},
lm_eval/tasks/mmlu/{flan_cot_fewshot,flan_cot_zeroshot,flan_n_shot}) —
inline canonical exemplars, rendered-prompt fidelity, and the
choice-aware answer-extraction filter steps."""

import json

import pytest

from retrieval_scaling_tpu.rag_eval.answer_filters import (
    map_regex_extract,
    multi_choice_extract,
    number_parse_extract,
    word_sort_extract,
)
from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
from retrieval_scaling_tpu.rag_eval.task_data_bbh import (
    BBH_COT_EXEMPLARS,
    BBH_COT_FLEX_FILTERS,
    BBH_FEWSHOT_EXEMPLARS,
)
from retrieval_scaling_tpu.rag_eval.task_data_mmlu_cot import MMLU_COT_EXEMPLARS
from retrieval_scaling_tpu.rag_eval.tasks import (
    GROUPS,
    MMLU_SUBJECT_CATEGORIES,
    Task,
    expand_task_list,
    get_task,
)


def _materialize(tmp_path, cfg, rows, split=None):
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True, exist_ok=True)
    with open(d / f"{split or cfg.test_split}.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return Task(cfg, data_root=str(tmp_path))


# ---------------------------------------------------------------- BBH data
def test_bbh_exemplar_tables_cover_all_27_subtasks():
    # reference: lm_eval/tasks/bbh/* — 27 subtasks per variant
    assert len(BBH_FEWSHOT_EXEMPLARS) == 27
    assert len(BBH_COT_EXEMPLARS) == 27
    assert len(BBH_COT_FLEX_FILTERS) == 27
    assert set(BBH_FEWSHOT_EXEMPLARS) == set(BBH_COT_EXEMPLARS)
    for t, shots in BBH_FEWSHOT_EXEMPLARS.items():
        assert len(shots) == 3, t
        assert all({"input", "target"} <= set(s) for s in shots)
    for t, shots in BBH_COT_EXEMPLARS.items():
        assert len(shots) == 3, t
        # every CoT exemplar must end in the extractable answer sentence
        assert all("the answer is" in s["target"] for s in shots), t


def test_bbh_fewshot_renders_canonical_3shot_prompt(tmp_path):
    # reference: bbh/fewshot/boolean_expressions.yaml — description +
    # first_n inline samples + "Q: {{input}}\nA:"
    cfg = get_task("bbh_fewshot_boolean_expressions")
    task = _materialize(tmp_path, cfg, [{"input": "True or False is", "target": "True"}])
    ctx = task.fewshot_context(task.docs[0])
    assert ctx == (
        "Evaluate the result of a random Boolean expression.\n\n"
        "Q: not ( ( not not True ) ) is\nA: False\n\n"
        "Q: True and False and not True and True is\nA: False\n\n"
        "Q: not not ( not ( False ) ) is\nA: True\n\n"
        "Q: True or False is\nA:"
    )
    assert task.doc_target(task.docs[0]) == "True"


def test_bbh_cot_fewshot_prompt_and_get_answer_filter(tmp_path):
    # reference: bbh/cot_fewshot/boolean_expressions.yaml
    cfg = get_task("bbh_cot_fewshot_boolean_expressions")
    task = _materialize(tmp_path, cfg, [{"input": "True or False is", "target": "True"}])
    ctx = task.fewshot_context(task.docs[0])
    assert ctx.startswith("Evaluate the result of a random Boolean expression.\n\n")
    # shots render through the CoT doc_to_text (trailing newline) and carry
    # the full published chain of thought
    assert "A: Let's think step by step.\n" in ctx
    assert "the answer is False" in ctx
    assert ctx.endswith("Q: True or False is\nA: Let's think step by step.\n")
    # get-answer filter (reference: cot_fewshot filter_list)
    steps = cfg.filters[0]["steps"]
    got = cfg.apply_filter_steps(
        "We evaluate inner brackets first... So the answer is True.", steps
    )
    assert got == "True"


def test_bbh_cot_zeroshot_strict_match(tmp_path):
    cfg = get_task("bbh_cot_zeroshot_boolean_expressions")
    assert cfg.description == "Evaluate the result of a random Boolean expression.\n\n"
    strict = next(f for f in cfg.filters if f["name"] == "strict-match")
    assert cfg.apply_filter_steps("So The answer is False.", strict["steps"]) == "False"
    flex = next(f for f in cfg.filters if f["name"] == "flexible-extract")
    got = cfg.apply_filter_steps(
        "False would be wrong, it must be True.", flex["steps"]
    )
    assert got == "True"  # select: last over \b(True|False)\b


def test_bbh_cot_zeroshot_doc_aware_filters_run_through_evaluator(tmp_path):
    """word_sorting's extraction needs the doc's List: words — the evaluator
    must thread the doc into apply_filter_steps."""
    cfg = get_task("bbh_cot_zeroshot_word_sorting")

    class SortLM:
        def generate_until(self, reqs):
            return [
                "Sorting alphabetically: arapaho comes first, then bela, "
                "then burly. The answer is arapaho bela burly."
                for _ in reqs
            ]

    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True)
    doc = {"input": "Sort the following words alphabetically: List: burly bela arapaho",
           "target": "arapaho bela burly"}
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps(doc) + "\n")
    res = simple_evaluate(
        SortLM(), ["bbh_cot_zeroshot_word_sorting"], data_root=str(tmp_path),
        bootstrap_iters=0,
    )
    row = res["results"]["bbh_cot_zeroshot_word_sorting"]
    assert row["exact_match,flexible-extract"] == 1.0
    assert row["exact_match,strict-match"] == 1.0


# ------------------------------------------------------- answer filter units
def test_multi_choice_extract_paths():
    choices = ["a skyscraper", "the ocean", "a red apple", "snowfall"]
    # primary "(X)" regex
    assert multi_choice_extract("I pick (C).", choices) == "(C)"
    # select=last takes the final occurrence
    assert multi_choice_extract("(A) no wait (D)", choices, select="last") == "(D)"
    # choice-TEXT fallback maps back to its letter
    assert (
        multi_choice_extract(
            "It has to be a red apple!", choices, ignore_case=True,
            ignore_punctuation=True,
        )
        == "(C)"
    )
    # bare ": X" letter fallback
    assert multi_choice_extract("Answer: B", choices) == "(B)"
    # nothing matches -> fallback sentinel
    assert multi_choice_extract("no idea", choices) == "[invalid]"
    # BBH-style in-prompt options parse out of the doc input
    got = multi_choice_extract(
        "It is the blue square.", [],
        doc_input="Which shape?\nOptions:\n(A) red circle (B) blue square",
        ignore_case=True, ignore_punctuation=True,
    )
    assert got == "(B)"


def test_map_regex_extract():
    mapping = {r"\b(no|not plausible)\b": "no", r"\b(yes|plausible)\b": "yes"}
    assert map_regex_extract("That is not plausible.", mapping, ignore_case=True) == "no"
    assert (
        map_regex_extract("Plausible? yes it is", mapping, select="last",
                          ignore_case=True)
        == "yes"
    )
    assert map_regex_extract("hmm", mapping) == "[invalid]"


def test_number_parse_extract():
    assert number_parse_extract("I count 7 then 12 total.", select="last") == "12"
    assert number_parse_extract("There are seven objects.") == "7"
    # reference quirk preserved: the digit pattern ([-0-9]+) hits the bare
    # hyphen in "twenty-three" BEFORE word parsing ever runs
    assert number_parse_extract("twenty-three items in all") == "-"
    assert number_parse_extract("twenty three items in all") == "23"
    assert number_parse_extract("one hundred and five") == "105"
    assert number_parse_extract("no numbers here") == "[invalid]"


def test_word_sort_extract_uses_last_occurrence_order():
    doc_input = "Sort the following words alphabetically: List: burly bela arapaho"
    gen = ("First guess: burly bela arapaho. Correcting myself: "
           "arapaho bela burly.")
    assert word_sort_extract(gen, doc_input) == "arapaho bela burly"


# ---------------------------------------------------------------- MMLU FLAN
@pytest.mark.parametrize(
    "variant", ["cot_fewshot", "cot_zeroshot", "n_shot_generative",
                "n_shot_loglikelihood"]
)
def test_mmlu_flan_variants_resolve(variant):
    cfg = get_task(f"mmlu_flan_{variant}_abstract_algebra")
    # every variant shares plain mmlu's per-subject ingestion cache
    assert cfg.dataset_path == "mmlu/abstract_algebra"
    assert cfg.hf_name == "abstract_algebra"
    base = ("The following are multiple choice questions (with answers) "
            "about abstract algebra.")
    if variant == "cot_fewshot":
        # reference quirk: cot_fewshot's description has no trailing \n\n
        assert cfg.description == base
        assert len(cfg.fewshot_samples) == 5
    else:
        assert cfg.description == base + "\n\n"
    if variant == "n_shot_loglikelihood":
        assert cfg.output_type == "multiple_choice"
    else:
        assert cfg.output_type == "generate_until"


def test_mmlu_flan_cot_fewshot_renders_canonical_exemplars(tmp_path):
    cfg = get_task("mmlu_flan_cot_fewshot_abstract_algebra")
    doc = {"question": "Order of Z_5?", "choices": ["5", "6", "7", "8"], "gold": 0}
    task = _materialize(tmp_path, cfg, [doc])
    ctx = task.fewshot_context(task.docs[0], num_fewshot=5)
    assert ctx.startswith(
        "The following are multiple choice questions (with answers) about "
        "abstract algebra.Q: Statement 1 | Every element of a group "
    )
    # exemplar choices are empty: the options already live in the question
    # text, and the empty "(A)  (B)  (C)  (D) " scaffold is the reference's
    # own render of its sample docs (missing Jinja vars -> empty strings)
    assert "(A)  (B)  (C)  (D) \nA: Let's think step by step." in ctx
    assert "The answer is (C)." in ctx
    assert ctx.endswith(
        "Q: Order of Z_5?\n(A) 5 (B) 6 (C) 7 (D) 8\nA: Let's think step by step."
    )


def test_mmlu_flan_loglikelihood_targets_letter_choices(tmp_path):
    cfg = get_task("mmlu_flan_n_shot_loglikelihood_college_physics")
    doc = {"question": "F = ?", "choices": ["ma", "mv", "mg", "mc"], "gold": 2}
    task = _materialize(tmp_path, cfg, [doc])
    assert task.doc_choices(task.docs[0]) == ["(A)", "(B)", "(C)", "(D)"]
    assert task.doc_target(task.docs[0]) == "(C)"
    assert task.doc_text(task.docs[0]) == (
        "Q: F = ?\n(A) ma (B) mv (C) mg (D) mc\nA:"
    )


def test_mmlu_flan_groups_nest_categories():
    # reference: flan_*/_mmlu.yaml — umbrella group over 4 category groups
    for variant in ("cot_fewshot", "cot_zeroshot", "n_shot_generative",
                    "n_shot_loglikelihood"):
        umbrella = GROUPS[f"mmlu_flan_{variant}"]
        assert sorted(umbrella) == sorted(
            f"mmlu_flan_{variant}_{c}"
            for c in ("stem", "other", "social_sciences", "humanities")
        )
    ordered, groups = expand_task_list(["mmlu_flan_n_shot_loglikelihood"])
    leaves = [t for t in ordered if isinstance(t, str)]
    assert len(leaves) == 57
    assert "mmlu_flan_n_shot_loglikelihood_stem" in groups


def test_mmlu_cot_exemplars_cover_all_57_subjects():
    assert set(MMLU_COT_EXEMPLARS) == set(MMLU_SUBJECT_CATEGORIES)
    # the published prompt set itself ships only 4 exemplars for these three
    # subjects (reference: flan_cot_fewshot/mmlu_{college_chemistry,
    # formal_logic,human_aging}.yaml)
    four_shot = {"college_chemistry", "formal_logic", "human_aging"}
    for s, shots in MMLU_COT_EXEMPLARS.items():
        assert len(shots) == (4 if s in four_shot else 5), s
        assert all("The answer is (" in d["target"] for d in shots), s
