"""Declarative task system (lm-eval-style YAML configs).

Schema subset of the reference's task YAMLs (reference:
rag-evaluation-harness/lm_eval/tasks/nq_open/nq_open.yaml):

  task: nq_open
  dataset_path: <jsonl file | directory with {split}.jsonl | hf dataset id>
  output_type: generate_until | loglikelihood | multiple_choice
  doc_to_text: "Q: {question}\\nA:"     # str.format over the doc dict
  doc_to_target: "{answer[0]}" | field name
  doc_to_choice: field name holding the choice list (multiple_choice)
  target_delimiter: " "
  fewshot_delimiter: "\\n\\n"
  num_fewshot: 0
  generation_kwargs: {until: ["\\n"], max_gen_toks: 32}
  metric_list: [exact_match]
  description: ""                       # prefix prepended once
"""

from __future__ import annotations

import glob
import json
import logging
import os
import random
import re
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

logger = logging.getLogger(__name__)

from retrieval_scaling_tpu.rag_eval.task_families import (
    AGIEVAL_CN_MC_SUBSETS,
    AGIEVAL_EN_SUBSETS,
    BBH_ZEROSHOT_DESCRIPTIONS,
    BELEBELE_CODES,
    BIGBENCH_SUBTASKS,
    BLIMP_PARADIGMS,
    CEVAL_SUBJECTS,
    CMMLU_SUBJECTS,
    LAMBADA_MT_LANGS,
    MATH_SUBJECTS,
    OKAPI_ARC_LANGS,
    OKAPI_HELLASWAG_LANGS,
    OKAPI_MMLU_LANGS,
    OKAPI_TRUTHFULQA_LANGS,
    PAWSX_LANGS,
    WMDP_TOPICS,
    XCOPA_LANGS,
    XSTORYCLOZE_LANGS,
    XWINOGRAD_LANGS,
    build_derived_families,
)


@dataclass
class TaskConfig:
    task: str
    dataset_path: str = ""
    test_split: str = "test"
    fewshot_split: Optional[str] = None
    output_type: str = "generate_until"
    doc_to_text: str = "{question}"
    doc_to_target: str = "{answer}"
    doc_to_choice: Optional[str] = None
    target_delimiter: str = " "
    fewshot_delimiter: str = "\n\n"
    num_fewshot: int = 0
    generation_kwargs: Dict[str, Any] = field(default_factory=dict)
    # Entries are metric names (str) or option dicts like
    #   {metric: exact_match, ignore_case: true, ignore_punctuation: true,
    #    regexes_to_ignore: ["\\b(?:an|a|the)\\b"]}
    # matching the reference's per-task metric configuration (reference:
    # lm_eval/tasks/nq_open/nq_open.yaml:24-29). Dict entries normalize to
    # the name in ``metric_list`` + kwargs in ``metric_options``.
    metric_list: List[Any] = field(default_factory=lambda: ["exact_match"])
    metric_options: Dict[str, Dict[str, Any]] = field(default_factory=dict)
    description: str = ""
    limit: Optional[int] = None
    # Output filters (lm-eval filter pipeline analog, reference:
    # rag-evaluation-harness/lm_eval/filters/extraction.py): regex applied to
    # the model generation before metrics; `filter_select` picks which match.
    filter_regex: Optional[str] = None
    filter_select: str = "first"      # "first" | "last"
    # Same extraction applied to gold targets (e.g. GSM8K's "#### N").
    target_regex: Optional[str] = None
    # Task versioning (lm-eval emits a versions table so results are
    # comparable across config revisions; reference: evaluator.py results).
    version: float = 1.0
    # Field holding a 0/1 truth mask over choices (TruthfulQA mc2-style
    # multi-true multiple choice; scored as probability mass on true).
    doc_to_gold_list: Optional[str] = None
    # Winogrande-style conditioning (reference:
    # lm_eval/tasks/winogrande/preprocess_winogrande.py): the CHOICES are
    # per-option CONTEXT variants and doc_to_target is the SHARED
    # continuation — scored as P(suffix | prefix+option), not
    # P(option+suffix | prefix).
    choices_are_context: bool = False
    # Fewshot shot selection (reference: lm_eval/api/samplers.py):
    # "default" = random without replacement, "first_n" = the first N docs,
    # "balanced" = round-robin over distinct targets (classification).
    fewshot_sampler: str = "default"
    # Inline fewshot exemplars (reference: task YAML `fewshot_config:
    # samples:` — e.g. the canonical BBH 3-shot exemplars): literal doc
    # dicts used first_n instead of sampling a split.
    fewshot_samples: Optional[List[dict]] = None
    # Prompt-library hook (reference: lm_eval/api/task.py:80,829 —
    # `use_prompt: <category>:<name>` swaps doc_to_text/doc_to_target for a
    # template from rag_eval.prompts). Registry prompts (`qa-basic:...`)
    # and local prompt YAMLs (`<file>.yaml:<name>`) materialize fully;
    # `promptsource:<name>` needs the external promptsource library and
    # raises when it is absent, exactly as the reference does without its
    # [promptsource] extra (MIGRATION.md "Deliberate exclusions").
    use_prompt: Optional[str] = None
    # Directory of the YAML this config was loaded from (set by from_yaml);
    # relative `use_prompt: <file>.yaml:...` paths resolve against it
    # (reference: prompts/__init__.py:90-91 yaml_path join).
    source_dir: Optional[str] = None
    # Replacement for empty/whitespace-only generations before scoring
    # (reference: scrolls/task.py Qasper.process_results -> "Unanswerable").
    empty_prediction: Optional[str] = None
    # Multiple-choice tasks whose argmax choice indexes into a doc field of
    # answer TEXTS scored with SQuAD token F1 + exact match against the
    # gold answers instead of accuracy (ReCoRD; reference:
    # super_glue/record/util.py process_results).
    choice_text_field: Optional[str] = None
    # Named multi-step filter pipelines (reference: lm_eval/filters/ —
    # e.g. GSM8K's strict-match vs flexible-extract): each entry
    # {name, steps: [{type: regex|take_first|lowercase|strip|remove_commas,
    # ...}]} produces its own metric column "metric,name".
    filters: List[Dict[str, Any]] = field(default_factory=list)
    # HF-datasets ingestion (the reference's Task.download analog; reference:
    # rag-evaluation-harness/lm_eval/api/task.py:236-280): when the local
    # {split}.jsonl is absent, `rag_eval.ingest` downloads hf_path/hf_name,
    # maps rows through the registered `process_docs` shim, and caches the
    # jsonl. hf_split_map renames our split -> the HF split name.
    hf_path: Optional[str] = None
    hf_name: Optional[str] = None
    process_docs: Optional[str] = None
    hf_split_map: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if any(isinstance(m, dict) for m in self.metric_list):
            options = dict(self.metric_options)
            names = []
            for entry in self.metric_list:
                if isinstance(entry, dict):
                    name = entry["metric"]
                    opts = {k: v for k, v in entry.items() if k != "metric"}
                    if opts:
                        options[name] = opts
                    names.append(name)
                else:
                    names.append(entry)
            self.metric_list = names
            self.metric_options = options

    def metric_kwargs(self, name: str) -> Dict[str, Any]:
        return self.metric_options.get(name, {})

    def apply_filter_steps(
        self, text: str, steps: List[Dict[str, Any]], doc: Optional[dict] = None
    ) -> str:
        for step in steps:
            kind = step.get("type", "regex")
            if kind == "regex":
                matches = re.findall(step["pattern"], text)
                if matches:
                    pick = matches[-1] if step.get("select", "first") == "last" else matches[0]
                    if isinstance(pick, tuple):
                        pick = next((g for g in pick if g), "")
                    text = pick
                else:
                    text = step.get("fallback", "[invalid]")
            elif kind == "take_first":
                text = text.split(step.get("sep", "\n"))[0]
            elif kind == "lowercase":
                text = text.lower()
            elif kind == "strip":
                text = text.strip()
            elif kind == "remove_commas":
                text = text.replace(",", "")
            elif kind == "remove_whitespace":
                # reference: lm_eval/filters/transformation.py
                # WhitespaceFilter — strip leading whitespace only
                text = text.lstrip()
            elif kind == "map":
                # reference: lm_eval/filters/transformation.py MapFilter
                # (polemo2 letter -> class index)
                text = str(step["mapping"].get(text, step.get("default", text)))
            elif kind == "boxed":
                # hendrycks/minerva MATH answer extraction: the contents of
                # the last \boxed{...} / \fbox{...} (balanced braces; regex
                # cannot nest). Reference: lm_eval/tasks/hendrycks_math/
                # utils.py last_boxed_only_string + remove_boxed.
                text = extract_boxed_answer(text) or step.get("fallback", text)
            elif kind == "multi_choice_regex":
                # choice-aware "(X)" extraction (reference: mmlu/flan_n_shot/
                # generative/utils.py MultiChoiceRegexFilter)
                from retrieval_scaling_tpu.rag_eval.answer_filters import (
                    multi_choice_extract,
                )

                text = multi_choice_extract(
                    text, (doc or {}).get("choices", []),
                    pattern=step.get("pattern", r"(\([A-Z]\))"),
                    select=step.get("select", "first"),
                    ignore_case=step.get("ignore_case", False),
                    ignore_punctuation=step.get("ignore_punctuation", False),
                    fallback=step.get("fallback", "[invalid]"),
                    doc_input=(doc or {}).get("input", ""),
                )
            elif kind == "map_regex":
                # union-regex -> value mapping (reference: bbh/cot_zeroshot/
                # utils.py MapRegexFilter)
                from retrieval_scaling_tpu.rag_eval.answer_filters import (
                    map_regex_extract,
                )

                text = map_regex_extract(
                    text, step["mapping"],
                    select=step.get("select", "first"),
                    ignore_case=step.get("ignore_case", False),
                    fallback=step.get("fallback", "[invalid]"),
                )
            elif kind == "number_parse_regex":
                # digits-or-number-words (reference: bbh/cot_zeroshot/
                # utils.py NumberParseRegexFilter)
                from retrieval_scaling_tpu.rag_eval.answer_filters import (
                    number_parse_extract,
                )

                text = number_parse_extract(
                    text,
                    pattern=step.get("pattern", r"([-0-9]+)"),
                    select=step.get("select", "first"),
                    fallback=step.get("fallback", "[invalid]"),
                )
            elif kind == "word_sort":
                # BBH word_sorting order extraction (reference:
                # bbh/cot_zeroshot/utils.py WordSortFilter)
                from retrieval_scaling_tpu.rag_eval.answer_filters import (
                    word_sort_extract,
                )

                text = word_sort_extract(text, (doc or {}).get("input", ""))
            else:
                raise ValueError(f"unknown filter step {kind!r}")
        return text.strip()

    def apply_filter(self, text: str) -> str:
        if not self.filter_regex:
            return text
        matches = re.findall(self.filter_regex, text)
        if not matches:
            return text.strip()
        pick = matches[-1] if self.filter_select == "last" else matches[0]
        if isinstance(pick, tuple):  # multiple groups -> first non-empty
            pick = next((g for g in pick if g), "")
        return pick.strip()

    def extract_target(self, text: str) -> str:
        if not self.target_regex:
            return text
        matches = re.findall(self.target_regex, text)
        return (matches[-1].strip() if matches else text.strip())

    @classmethod
    def from_yaml(cls, path: str) -> "TaskConfig":
        with open(path) as f:
            raw = yaml.safe_load(f)
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        cfg = cls(**{k: v for k, v in raw.items() if k in known})
        cfg.source_dir = os.path.dirname(os.path.abspath(path))
        return cfg


_BUILTIN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "task_configs")
_EXTRA_DIRS: List[str] = []

# ---------------------------------------------------------------- groups
# MMLU subject -> category, the standard Hendrycks et al. taxonomy used by
# the reference's 57 subject tasks + 4 category groups
# (reference: lm_eval/tasks/mmlu/default/*, group rollups in evaluator.py).
MMLU_SUBJECT_CATEGORIES: Dict[str, str] = {
    # STEM
    "abstract_algebra": "stem", "astronomy": "stem", "college_biology": "stem",
    "college_chemistry": "stem", "college_computer_science": "stem",
    "college_mathematics": "stem", "college_physics": "stem",
    "computer_security": "stem", "conceptual_physics": "stem",
    "electrical_engineering": "stem", "elementary_mathematics": "stem",
    "high_school_biology": "stem", "high_school_chemistry": "stem",
    "high_school_computer_science": "stem", "high_school_mathematics": "stem",
    "high_school_physics": "stem", "high_school_statistics": "stem",
    "machine_learning": "stem",
    # humanities
    "formal_logic": "humanities", "high_school_european_history": "humanities",
    "high_school_us_history": "humanities", "high_school_world_history": "humanities",
    "international_law": "humanities", "jurisprudence": "humanities",
    "logical_fallacies": "humanities", "moral_disputes": "humanities",
    "moral_scenarios": "humanities", "philosophy": "humanities",
    "prehistory": "humanities", "professional_law": "humanities",
    "world_religions": "humanities",
    # social sciences
    "econometrics": "social_sciences", "high_school_geography": "social_sciences",
    "high_school_government_and_politics": "social_sciences",
    "high_school_macroeconomics": "social_sciences",
    "high_school_microeconomics": "social_sciences",
    "high_school_psychology": "social_sciences", "human_sexuality": "social_sciences",
    "professional_psychology": "social_sciences", "public_relations": "social_sciences",
    "security_studies": "social_sciences", "sociology": "social_sciences",
    "us_foreign_policy": "social_sciences",
    # other (business, health, misc.)
    "anatomy": "other", "business_ethics": "other", "clinical_knowledge": "other",
    "college_medicine": "other", "global_facts": "other", "human_aging": "other",
    "management": "other", "marketing": "other", "medical_genetics": "other",
    "miscellaneous": "other", "nutrition": "other",
    "professional_accounting": "other", "professional_medicine": "other",
    "virology": "other",
}
assert len(MMLU_SUBJECT_CATEGORIES) == 57

# Derived task families: `<family>_<subtask>` tasks materialize from the
# `<family>.yaml` template with `dataset_path=<family>/<subtask>` plus the
# recorded per-subtask overrides (reference: one generated YAML per subtask,
# e.g. lm_eval/tasks/blimp/*.yaml from _template_yaml).
DERIVED_FAMILIES: Dict[str, Dict[str, Dict[str, Any]]] = build_derived_families(
    MMLU_SUBJECT_CATEGORIES
)

# Wave-4 long tail (round 3): Korean/Chinese/Arabic/Basque exam suites,
# XNLI + MGSM multilingual, Anthropic model-written evals, KoBEST.
from retrieval_scaling_tpu.rag_eval.task_families_wave4 import (  # noqa: E402
    ACLUE_TOPICS,
    ADVANCED_AI_RISK_SUBTASKS,
    AEXAMS_SUBJECTS,
    CSATQA_SUBSETS,
    EUS_EXAMS_CONFIGS,
    HAERAE_SUBTASKS,
    KMMLU_SUBJECTS,
    KOBEST_SUBTASKS,
    KORMEDMCQA_SUBSETS,
    MGSM_WORDS,
    PERSONA_SUBTASKS,
    SYCOPHANCY_SUBTASKS,
    TMMLUPLUS_SUBJECTS,
    XNLI_WORDS,
    build_wave4_families,
)

DERIVED_FAMILIES.update(build_wave4_families(sorted(MMLU_SUBJECT_CATEGORIES)))

# Wave-5 derived families (round 3 tail end).
CODE2TEXT_LANGS = ["go", "java", "javascript", "php", "python", "ruby"]
LAMBADA_STABLELM_LANGS = ["de", "en", "es", "fr", "it", "nl", "pt"]
DERIVED_FAMILIES.update({
    # reference: lm_eval/tasks/code_x_glue/code-text/<lang>.yaml — one HF
    # dataset per language
    "code2text": {
        lang: {"hf_path": f"CM/codexglue_code2text_{lang}"}
        for lang in CODE2TEXT_LANGS
    },
    # reference: lm_eval/tasks/lambada_multilingual_stablelm/*.yaml
    "lambada_openai_mt_stablelm": {s: {} for s in LAMBADA_STABLELM_LANGS},
})

GROUPS: Dict[str, List[str]] = {
    "mmlu": [f"mmlu_{s}" for s in sorted(MMLU_SUBJECT_CATEGORIES)],
    **{
        f"mmlu_{cat}": [
            f"mmlu_{s}"
            for s in sorted(MMLU_SUBJECT_CATEGORIES)
            if MMLU_SUBJECT_CATEGORIES[s] == cat
        ]
        for cat in ("stem", "humanities", "social_sciences", "other")
    },
    "anli": ["anli_r1", "anli_r2", "anli_r3"],
    "glue": ["cola", "sst2", "mrpc", "qqp", "mnli", "qnli", "rte", "wnli"],
    "arithmetic": [
        "arithmetic_2da", "arithmetic_2ds", "arithmetic_3da", "arithmetic_3ds",
        "arithmetic_4da", "arithmetic_4ds", "arithmetic_5da", "arithmetic_5ds",
        "arithmetic_2dm", "arithmetic_1dc",
    ],
    "lambada": ["lambada_openai", "lambada_standard"],
    "truthfulqa": ["truthfulqa_mc1", "truthfulqa_mc2", "truthfulqa_gen"],
    "blimp": [f"blimp_{p}" for p in BLIMP_PARADIGMS],
    "bbh_zeroshot": [f"bbh_zeroshot_{t}" for t in sorted(BBH_ZEROSHOT_DESCRIPTIONS)],
    "wmdp": [f"wmdp_{s}" for s in sorted(WMDP_TOPICS)],
    # reference group membership: gaokao_english + agieval_math are _en;
    # the remaining gaokao/jec/logiqa_zh subtasks are _cn
    "agieval_en": [f"agieval_{s}" for s in AGIEVAL_EN_SUBSETS]
    + ["agieval_math"],
    "agieval_cn": [f"agieval_{s}" for s in AGIEVAL_CN_MC_SUBSETS]
    + ["agieval_gaokao_mathcloze"],
    "agieval": [f"agieval_{s}" for s in AGIEVAL_EN_SUBSETS]
    + ["agieval_math"]
    + [f"agieval_{s}" for s in AGIEVAL_CN_MC_SUBSETS]
    + ["agieval_gaokao_mathcloze"],
    "hendrycks_ethics": [
        "ethics_cm", "ethics_deontology", "ethics_justice",
        "ethics_utilitarianism", "ethics_virtue",
    ],
    "lambada_cloze": ["lambada_openai_cloze", "lambada_standard_cloze"],
    "qa4mre": ["qa4mre_2011", "qa4mre_2012", "qa4mre_2013"],
    "gpqa": ["gpqa_main", "gpqa_extended", "gpqa_diamond"],
    "crows_pairs": ["crows_pairs_english"],
    "pawsx": [f"paws_{s}" for s in PAWSX_LANGS],
    "xcopa": [f"xcopa_{s}" for s in XCOPA_LANGS],
    "xstorycloze": [f"xstorycloze_{s}" for s in XSTORYCLOZE_LANGS],
    "xwinograd": [f"xwinograd_{s}" for s in XWINOGRAD_LANGS],
    "lambada_multilingual": [f"lambada_mt_{s}" for s in LAMBADA_MT_LANGS],
    "belebele": [f"belebele_{s}" for s in BELEBELE_CODES],
    "minerva_math": [f"minerva_math_{s}" for s in MATH_SUBJECTS],
    "hendrycks_math": [f"hendrycks_math_{s}" for s in MATH_SUBJECTS],
    "storycloze": ["storycloze_2016", "storycloze_2018"],
    "qasper": ["qasper_bool", "qasper_freeform"],
    # reference group super-glue-lm-eval-v1 (record + sglue_rte included)
    "super_glue": [
        "boolq", "cb", "copa", "multirc", "record", "sglue_rte", "wic", "wsc",
    ],
    "super-glue-lm-eval-v1": [
        "boolq", "cb", "copa", "multirc", "record", "sglue_rte", "wic", "wsc",
    ],
    "super-glue-lm-eval-v1-seq2seq": ["boolq_seq2seq"],
    "super-glue-t5-prompt": [
        f"super_glue_{s}_t5_prompt"
        for s in ("boolq", "cb", "copa", "multirc", "record", "rte", "wic",
                  "wsc")
    ],
    "unscramble": [
        "anagrams1", "anagrams2", "cycle_letters", "random_insertion",
        "reversed_words",
    ],
    "ai2_arc": ["arc_easy", "arc_challenge"],
    "fld": ["fld_default", "fld_star"],
    # Benchmark suites (reference: lm_eval/tasks/benchmarks/*.yaml) — dict
    # members carry per-member TaskConfig overrides (fewshot settings).
    "openllm": [
        {"task": "arc_challenge", "num_fewshot": 25, "fewshot_split": "validation"},
        {"task": "hellaswag", "num_fewshot": 10, "fewshot_split": "train"},
        "truthfulqa",
        {"task": "mmlu", "num_fewshot": 5},
        {"task": "winogrande", "num_fewshot": 5, "fewshot_split": "train"},
        {"task": "gsm8k", "num_fewshot": 5},
    ],
    "multimedqa": [
        "pubmedqa", "medmcqa", "medqa",
        "mmlu_anatomy", "mmlu_clinical_knowledge", "mmlu_college_medicine",
        "mmlu_medical_genetics", "mmlu_professional_medicine",
        "mmlu_college_biology",
    ],
    "pythia": [
        "lambada_openai", "logiqa", "piqa", "sciq", "wikitext", "winogrande",
        "wsc", "ai2_arc", "blimp", "mmlu",
    ],
    # SCROLLS long-document suite (reference: lm_eval/tasks/scrolls/task.py;
    # qasper runs as the existing qasper_bool/qasper_freeform pair)
    # reference scrolls group: exactly one qasper member (the hybrid task);
    # the split qasper_bool/qasper_freeform pair stays under the separate
    # "qasper" group, matching lm_eval/tasks/qasper
    "scrolls": [
        "scrolls_govreport", "scrolls_summscreenfd", "scrolls_qmsum",
        "scrolls_narrativeqa", "scrolls_qasper", "scrolls_quality",
        "scrolls_contractnli",
    ],
    # okapi multilingual rollups (reference: lm_eval/tasks/okapi/* groups)
    "arc_multilingual": [f"arc_{s}" for s in OKAPI_ARC_LANGS],
    "hellaswag_multilingual": [f"hellaswag_{s}" for s in OKAPI_HELLASWAG_LANGS],
    "m_mmlu": [f"m_mmlu_{s}" for s in OKAPI_MMLU_LANGS],
    "truthfulqa_multilingual": [
        f"truthfulqa_{s}_{v}" for s in OKAPI_TRUTHFULQA_LANGS for v in ("mc1", "mc2")
    ],
    # Chinese exam suites (reference: lm_eval/tasks/{ceval,cmmlu})
    "ceval-valid": [f"ceval-valid_{s}" for s in sorted(CEVAL_SUBJECTS)],
    "cmmlu": [f"cmmlu_{s}" for s in sorted(CMMLU_SUBJECTS)],
    # BIG-bench rollups (reference: lm_eval/tasks/bigbench group tags)
    "bigbench_multiple_choice": [
        f"bigbench_{s}_multiple_choice" for s in BIGBENCH_SUBTASKS
    ],
    "bigbench_generate_until": [
        f"bigbench_{s}_generate_until" for s in BIGBENCH_SUBTASKS
    ],
}

# Wave-4 group rollups (reference group tags in each family's template yaml;
# kmmlu's umbrella group spans the direct + hard variants exactly as the
# reference's `group: [kmmlu, kmmlu_direct]` headers do).
GROUPS.update({
    "kmmlu_direct": [f"kmmlu_direct_{s}" for s in sorted(KMMLU_SUBJECTS)],
    "kmmlu_hard": [f"kmmlu_hard_{s}" for s in sorted(KMMLU_SUBJECTS)],
    "kmmlu_hard_direct": [
        f"kmmlu_hard_direct_{s}" for s in sorted(KMMLU_SUBJECTS)
    ],
    "kmmlu": [
        f"kmmlu_{v}_{s}"
        for v in ("direct", "hard", "hard_direct")
        for s in sorted(KMMLU_SUBJECTS)
    ],
    "csatqa": [f"csatqa_{s}" for s in sorted(CSATQA_SUBSETS)],
    "haerae": [f"haerae_{s}" for s in sorted(HAERAE_SUBTASKS)],
    "kormedmcqa": [f"kormedmcqa_{s}" for s in KORMEDMCQA_SUBSETS],
    "kobest": [f"kobest_{s}" for s in KOBEST_SUBTASKS],
    "aclue": [f"aclue_{s}" for s in sorted(ACLUE_TOPICS)],
    "tmmluplus": [f"tmmluplus_{s}" for s in sorted(TMMLUPLUS_SUBJECTS)],
    "ammlu": [f"ammlu_{s}" for s in sorted(MMLU_SUBJECT_CATEGORIES)],
    "aexams": [f"aexams_{s.lower()}" for s in AEXAMS_SUBJECTS],
    "eus_exams": [f"eus_exams_{c}" for c in EUS_EXAMS_CONFIGS],
    "eus_exams_es": [
        f"eus_exams_{c}" for c in EUS_EXAMS_CONFIGS if c.startswith("es_")
    ],
    "eus_exams_eu": [
        f"eus_exams_{c}" for c in EUS_EXAMS_CONFIGS if c.startswith("eu_")
    ],
    "xnli": [f"xnli_{lang}" for lang in sorted(XNLI_WORDS)],
    "mgsm_direct": [f"mgsm_direct_{lang}" for lang in sorted(MGSM_WORDS)],
    "mgsm_en_cot": [f"mgsm_en_cot_{lang}" for lang in sorted(MGSM_WORDS)],
    "mgsm_native_cot": [
        f"mgsm_native_cot_{lang}" for lang in sorted(MGSM_WORDS)
    ],
    "persona": [f"persona_{s}" for s in PERSONA_SUBTASKS],
    "advanced_ai_risk": [
        f"advanced_ai_risk_{s}" for s in ADVANCED_AI_RISK_SUBTASKS
    ],
    "sycophancy": [
        f"sycophancy_{s.replace('sycophancy_', '', 1)}"
        for s in SYCOPHANCY_SUBTASKS
    ],
    # BasqueGLUE (reference group tag "basque-glue" in each
    # lm_eval/tasks/basqueglue/*.yaml header).
    "basque-glue": [
        "bec2016eu", "bhtc_v2", "epec_koref_bin", "qnlieu", "vaxx_stance",
        "wiceu",
    ],
    # reference: lm_eval/tasks/code_x_glue/code-text/<lang>.yaml group tag
    "codexglue_code2text": [f"code2text_{lang}" for lang in CODE2TEXT_LANGS],
    # reference: lm_eval/tasks/tinyBenchmarks/tinyBenchmarks.yaml (the
    # per-member fewshot counts are baked into each tiny*.yaml here)
    "tinyBenchmarks": [
        "tinyArc", "tinyGSM8k", "tinyMMLU", "tinyWinogrande",
        "tinyHellaswag", "tinyTruthfulQA",
    ],
    # reference: lm_eval/tasks/lambada_multilingual_stablelm group tag
    "lambada_multilingual_stablelm": [
        f"lambada_openai_mt_stablelm_{s}" for s in LAMBADA_STABLELM_LANGS
    ],
    # reference: lm_eval/tasks/copal_id/*.yaml group tag
    "copal_id": ["copal_id_standard", "copal_id_colloquial"],
    # reference: lm_eval/tasks/xnli_eu/xnli_eu_{mt,native}.yaml group tag
    "xnli_eu_mt_native": ["xnli_eu_mt", "xnli_eu_native"],
    # FrenchBench (reference: lm_eval/tasks/french_bench/*.yaml group
    # tags — the umbrella group spans mc+extra+gen; perplexity tasks only
    # carry the french_bench_perplexity tag).
    "french_bench_mc": [
        "french_bench_arc_challenge", "french_bench_hellaswag",
        "french_bench_grammar", "french_bench_vocab",
    ],
    "french_bench_extra": [
        "french_bench_fquadv2", "french_bench_boolqa",
        "french_bench_fquadv2_bool", "french_bench_reading_comp",
        "french_bench_topic_based_nli", "french_bench_xnli",
    ],
    "french_bench_gen": [
        "french_bench_fquadv2_genq", "french_bench_fquadv2_hasAns",
        "french_bench_multifquad", "french_bench_orangesum_abstract",
        "french_bench_orangesum_title", "french_bench_trivia",
    ],
    "french_bench_perplexity": [
        "french_bench_opus_perplexity", "french_bench_wikitext_fr",
    ],
    "french_bench": [
        "french_bench_mc", "french_bench_extra", "french_bench_gen",
    ],
    # reference: lm_eval/tasks/polemo2/polemo2_in.yaml group tag
    "polemo2": ["polemo2_in", "polemo2_out"],
})

# FLAN held-in prompt families (reference: lm_eval/tasks/benchmarks/flan/
# flan_held_in.yaml): 7 dataset groups x 7-10 prompts, each a derived
# generate_until task.
from retrieval_scaling_tpu.rag_eval.task_families_flan import (  # noqa: E402
    FLAN_HELD_IN_GROUPS,
    build_flan_families,
)

DERIVED_FAMILIES.update(build_flan_families())
GROUPS.update(FLAN_HELD_IN_GROUPS)
GROUPS["flan_held_in"] = sorted(FLAN_HELD_IN_GROUPS)

# BBH fewshot / chain-of-thought variants (reference: lm_eval/tasks/bbh/
# {fewshot,cot_zeroshot,cot_fewshot}) — canonical exemplars and per-task
# extraction specs live in task_data_bbh.py.
from retrieval_scaling_tpu.rag_eval.task_data_bbh import (  # noqa: E402
    BBH_COT_EXEMPLARS,
    BBH_COT_FLEX_FILTERS,
    BBH_FEWSHOT_EXEMPLARS,
)

# shared strict-match answer extraction for bbh_cot_zeroshot (reference:
# bbh/cot_zeroshot/*.yaml strict-match filter)
_BBH_COT_STRICT = {
    "type": "regex",
    "pattern": (
        "((?<=The answer is )(.*)(?=.)|(?<=the answer is )(.*)(?=.)"
        "|(?<=The answer: )(.*)(?=.)|(?<=The final answer: )(.*)(?=.))"
    ),
    "select": "first",
}

DERIVED_FAMILIES.update({
    "bbh_fewshot": {
        t: {"description": d + "\n\n", "fewshot_samples": BBH_FEWSHOT_EXEMPLARS[t]}
        for t, d in BBH_ZEROSHOT_DESCRIPTIONS.items()
    },
    "bbh_cot_zeroshot": {
        t: {
            "description": d + "\n\n",
            "filters": [
                {"name": "flexible-extract", "steps": BBH_COT_FLEX_FILTERS[t]},
                {"name": "strict-match", "steps": [_BBH_COT_STRICT]},
            ],
        }
        for t, d in BBH_ZEROSHOT_DESCRIPTIONS.items()
    },
    "bbh_cot_fewshot": {
        t: {"description": d + "\n\n", "fewshot_samples": BBH_COT_EXEMPLARS[t]}
        for t, d in BBH_ZEROSHOT_DESCRIPTIONS.items()
    },
})
GROUPS.update({
    f"bbh_{v}": [f"bbh_{v}_{t}" for t in sorted(BBH_ZEROSHOT_DESCRIPTIONS)]
    for v in ("fewshot", "cot_zeroshot", "cot_fewshot")
})
# the reference's umbrella `bbh` tag groups the cot_fewshot variant
GROUPS["bbh"] = list(GROUPS["bbh_cot_fewshot"])

# MMLU FLAN prompt variants (reference: lm_eval/tasks/mmlu/
# {flan_cot_fewshot,flan_cot_zeroshot,flan_n_shot/{generative,loglikelihood}})
# — the canonical 5-shot CoT exemplars live in task_data_mmlu_cot.py.
from retrieval_scaling_tpu.rag_eval.task_data_mmlu_cot import (  # noqa: E402
    MMLU_COT_EXEMPLARS,
)


def _mmlu_flan_overrides(variant: str) -> Dict[str, Dict[str, Any]]:
    out: Dict[str, Dict[str, Any]] = {}
    for s in MMLU_SUBJECT_CATEGORIES:
        desc = (
            "The following are multiple choice questions (with answers) "
            f"about {s.replace('_', ' ')}."
        )
        ov: Dict[str, Any] = {
            # every variant shares plain mmlu's per-subject ingestion cache
            "dataset_path": f"mmlu/{s}",
        }
        if variant == "cot_fewshot":
            # quirk preserved: the reference's cot_fewshot description is a
            # plain YAML scalar with NO trailing blank line (every other
            # variant ends ".\n\n"), and two subjects carry a LEADING
            # newline (flan_cot_fewshot/mmlu_{electrical_engineering,
            # conceptual_physics}.yaml)
            lead = "\n" if s in ("electrical_engineering",
                                 "conceptual_physics") else ""
            ov["description"] = lead + desc
            # exemplar targets render through doc_to_target="{gold}"
            ov["fewshot_samples"] = [
                {**d, "gold": d["target"]} for d in MMLU_COT_EXEMPLARS[s]
            ]
        else:
            ov["description"] = desc + "\n\n"
        out[s] = ov
    return out


_MMLU_FLAN_VARIANTS = (
    "cot_fewshot", "cot_zeroshot", "n_shot_generative", "n_shot_loglikelihood",
)
DERIVED_FAMILIES.update(
    {f"mmlu_flan_{v}": _mmlu_flan_overrides(v) for v in _MMLU_FLAN_VARIANTS}
)
for _v in _MMLU_FLAN_VARIANTS:
    for _cat in ("stem", "humanities", "social_sciences", "other"):
        GROUPS[f"mmlu_flan_{_v}_{_cat}"] = [
            f"mmlu_flan_{_v}_{s}"
            for s in sorted(MMLU_SUBJECT_CATEGORIES)
            if MMLU_SUBJECT_CATEGORIES[s] == _cat
        ]
    # reference: flan_*/_mmlu.yaml — the umbrella group nests the four
    # category groups
    GROUPS[f"mmlu_flan_{_v}"] = [
        f"mmlu_flan_{_v}_{cat}"
        for cat in ("stem", "other", "social_sciences", "humanities")
    ]

# CrowS-Pairs french + per-bias-category subtasks (reference:
# lm_eval/tasks/crows_pairs/ — 22 tasks over one config).
_CROWS_CATS = (
    "age", "autre", "disability", "gender", "nationality",
    "physical_appearance", "race_color", "religion", "sexual_orientation",
    "socioeconomic",
)
DERIVED_FAMILIES["crows_pairs"] = {
    "french": {"hf_name": "french"},
    **{
        f"{lang}_{cat}": {"hf_name": lang, "process_docs": f"crows_{cat}"}
        for lang in ("english", "french")
        for cat in _CROWS_CATS
    },
}
GROUPS["crows_pairs"] = ["crows_pairs_english", "crows_pairs_french"] + [
    f"crows_pairs_{lang}_{cat}"
    for lang in ("english", "french")
    for cat in _CROWS_CATS
]

# GPQA prompt-style variants over the three subsets (reference:
# lm_eval/tasks/gpqa/{zeroshot,n_shot,cot_zeroshot,cot_n_shot,generative}).
_GPQA_VARIANTS = (
    "zeroshot", "n_shot", "cot_zeroshot", "cot_n_shot", "generative_n_shot",
)
for _v in _GPQA_VARIANTS:
    DERIVED_FAMILIES[f"gpqa_{_v}"] = {
        # subsets share plain gpqa's per-subset ingestion cache
        sub: {"hf_name": f"gpqa_{sub}", "dataset_path": f"gpqa/{sub}"}
        for sub in ("main", "extended", "diamond")
    }
    GROUPS[f"gpqa_{_v}"] = [
        f"gpqa_{_v}_{sub}" for sub in ("main", "extended", "diamond")
    ]

# KMMLU-HARD chain-of-thought (reference: lm_eval/tasks/kmmlu/cot_hard/ —
# per-subject Korean CoT preambles + published 5-shot exemplars).
from retrieval_scaling_tpu.rag_eval.task_data_kmmlu_cot import (  # noqa: E402
    KMMLU_COT,
)

DERIVED_FAMILIES["kmmlu_hard_cot"] = {
    s: {
        "doc_to_text": spec["doc_to_text"],
        "hf_name": spec["hf_name"],
        "fewshot_samples": spec["samples"],
        # share kmmlu_hard's per-subject ingestion cache
        "dataset_path": f"kmmlu_hard/{s}",
    }
    for s, spec in KMMLU_COT.items()
}
GROUPS["kmmlu_hard_cot"] = [f"kmmlu_hard_cot_{s}" for s in sorted(KMMLU_COT)]

# MMLU continuation + generative prompt styles (reference: lm_eval/tasks/
# mmlu/{continuation,generative}).
DERIVED_FAMILIES["mmlu_continuation"] = {
    s: {
        # note: "questions", not "multiple choice questions" (reference:
        # continuation/mmlu_<sub>.yaml descriptions)
        "description": (
            "The following are questions (with answers) about "
            f"{s.replace('_', ' ')}.\n\n"
        ),
        "dataset_path": f"mmlu/{s}",
    }
    for s in MMLU_SUBJECT_CATEGORIES
}
DERIVED_FAMILIES["mmlu_generative"] = {
    s: {
        "description": (
            "The following are multiple choice questions (with answers) "
            f"about {s.replace('_', ' ')}.\n\n"
        ),
        "dataset_path": f"mmlu/{s}",
    }
    for s in MMLU_SUBJECT_CATEGORIES
}
for _cat in ("stem", "humanities", "social_sciences", "other"):
    _members = [
        s for s in sorted(MMLU_SUBJECT_CATEGORIES)
        if MMLU_SUBJECT_CATEGORIES[s] == _cat
    ]
    GROUPS[f"mmlu_continuation_{_cat}"] = [
        f"mmlu_continuation_{s}" for s in _members
    ]
    # reference generative groups are named mmlu_<cat>_generative
    GROUPS[f"mmlu_{_cat}_generative"] = [f"mmlu_generative_{s}" for s in _members]
GROUPS["mmlu_continuation"] = [
    f"mmlu_continuation_{c}"
    for c in ("stem", "other", "social_sciences", "humanities")
]
GROUPS["mmlu_generative"] = [
    f"mmlu_{c}_generative"
    for c in ("stem", "other", "social_sciences", "humanities")
]

# The Pile per-source perplexity suite (reference: lm_eval/tasks/pile/
# pile_<subset>.yaml — 22 rolling-perplexity tasks over EleutherAI/pile).
PILE_SUBSETS = [
    "arxiv", "bookcorpus2", "books3", "dm-mathematics", "enron", "europarl",
    "freelaw", "github", "gutenberg", "hackernews", "nih-exporter",
    "opensubtitles", "openwebtext2", "philpapers", "pile-cc",
    "pubmed-abstracts", "pubmed-central", "stackexchange", "ubuntu-irc",
    "uspto", "wikipedia", "youtubesubtitles",
]
DERIVED_FAMILIES["pile"] = {s: {} for s in PILE_SUBSETS}
GROUPS["pile"] = [f"pile_{s}" for s in PILE_SUBSETS]

# unitxt suite (reference: lm_eval/tasks/unitxt/ — 18 recipe-driven tasks;
# see task_configs/unitxt.yaml for how this build replaces the package's
# metric delegation with native scorers).
_UNITXT_MULTI_CLASS = [
    "20_newsgroups", "ag_news", "argument_topic", "banking77",
    "claim_stance_topic", "dbpedia_14", "ethos_binary", "financial_tweets",
    "law_stack_exchange", "ledgar", "medical_abstracts",
    "yahoo_answers_topics",
]
_UNITXT_RECIPE = "card=cards.{sub},template=templates.{template}"


def _unitxt_overrides() -> Dict[str, Dict[str, Any]]:
    def recipe(sub: str, template: str) -> str:
        return _UNITXT_RECIPE.format(sub=sub, template=template)

    exact_ci = {"exact_match": {"ignore_case": True, "ignore_punctuation": False}}
    out: Dict[str, Dict[str, Any]] = {}
    for s in _UNITXT_MULTI_CLASS:
        out[s] = {
            "hf_name": recipe(s, "classification.multi_class.title"),
            # unitxt metric names f1_micro/accuracy/f1_macro: accuracy is
            # case-insensitive exact match of the processed label strings
            "metric_list": ["f1_micro", "exact_match", "f1_macro"],
            "metric_options": exact_ci,
        }
    out["unfair_tos"] = {
        "hf_name": recipe("unfair_tos", "classification.multi_label.title"),
        "metric_list": ["f1_micro_multi_label", "exact_match"],
        "metric_options": exact_ci,
    }
    out["atis"] = {
        "hf_name": recipe("atis", "span_labeling.extraction.title"),
        "metric_list": ["ner_f1"],
    }
    out["coedit_gec"] = {
        "hf_name": recipe("coedit_gec", "grammatical_error_correction.simple"),
        "metric_list": ["char_edit_dist_accuracy", "rouge1", "rouge2", "rougeL"],
    }
    out["stsb"] = {
        "hf_name": recipe("stsb", "regression.two_texts.simple"),
        "metric_list": ["spearman"],
    }
    for s in ("cnn_dailymail", "xsum"):
        out[s] = {
            "hf_name": recipe(s, "summarization.abstractive.full"),
            "metric_list": ["rouge1", "rouge2", "rougeL"],
        }
    return out


DERIVED_FAMILIES["unitxt"] = _unitxt_overrides()
GROUPS["unitxt"] = [f"unitxt_{s}" for s in sorted(DERIVED_FAMILIES["unitxt"])]

# GPT-3-style translation suite (reference: lm_eval/tasks/translation/ —
# generated wmt14/wmt16/iwslt2017 language-pair tasks and their groups).
GROUPS["wmt14"] = ["wmt14_en_fr", "wmt14_fr_en"]
GROUPS["wmt16"] = ["wmt16_de_en", "wmt16_en_de", "wmt16_en_ro", "wmt16_ro_en"]
GROUPS["iwslt2017"] = ["iwslt2017_ar_en", "iwslt2017_en_ar"]
GROUPS["gpt3_translation_benchmarks"] = GROUPS["wmt14"] + GROUPS["wmt16"]
GROUPS["translation"] = (
    GROUPS["wmt14"] + GROUPS["wmt16"] + GROUPS["iwslt2017"]
)

# Reference task-name aliases — the fork exposes these tasks under names
# that differ from the repo's canonical config name (e.g. multimedqa lists
# `medqa_4options`); both resolve to the same TaskConfig.
TASK_ALIASES: Dict[str, str] = {
    "medqa_4options": "medqa",        # reference: lm_eval/tasks/medqa
    "wmt-ro-en-t5-prompt": "wmt_ro_en_t5_prompt",  # wmt2016/ro_en-t5_prompt.yaml
    "siqa": "social_iqa",             # reference: lm_eval/tasks/siqa
    # reference translation task names are hyphenated (translation/utils.py
    # f"{lang}-{lang_pair}")
    **{
        t.replace("_", "-"): t
        for t in (
            "wmt14_en_fr", "wmt14_fr_en", "wmt16_de_en", "wmt16_en_de",
            "wmt16_en_ro", "wmt16_ro_en", "iwslt2017_ar_en", "iwslt2017_en_ar",
        )
    },
    # reference unitxt task names are bare (lm_eval/tasks/unitxt/<name>.yaml)
    **{s: f"unitxt_{s}" for s in DERIVED_FAMILIES["unitxt"]},
    # reference aexams task names keep the HF config's capitalization
    # (lm_eval/tasks/aexams/aexams_Biology.yaml etc.)
    **{
        f"aexams_{cap}": f"aexams_{cap.lower()}"
        for cap in ("Biology", "IslamicStudies", "Physics", "Science", "Social")
    },
    # reference lambada_multilingual names (lm_eval/tasks/
    # lambada_multilingual/lambada_mt_<l>.yaml declares task
    # lambada_openai_mt_<l>)
    **{
        f"lambada_openai_mt_{lang}": f"lambada_mt_{lang}"
        for lang in ("de", "en", "es", "fr", "it")
    },
    # reference cloze yamls carry a literal `_yaml` suffix in their task
    # names (lm_eval/tasks/lambada_cloze/*.yaml)
    "lambada_openai_cloze_yaml": "lambada_openai_cloze",
    "lambada_standard_cloze_yaml": "lambada_standard_cloze",
    # reference generative MMLU names carry the variant as a SUFFIX
    # (lm_eval/tasks/mmlu/generative/mmlu_<sub>.yaml: mmlu_<sub>_generative)
    **{
        f"mmlu_{s}_generative": f"mmlu_generative_{s}"
        for s in MMLU_SUBJECT_CATEGORIES
    },
    # reference gpqa names put the subset FIRST (gpqa_main_cot_zeroshot)
    **{
        f"gpqa_{sub}_{v}": f"gpqa_{v}_{sub}"
        for v in _GPQA_VARIANTS
        for sub in ("main", "extended", "diamond")
    },
    # reference super_glue variant names are hyphenated
    # (super_glue/<sub>/{t5-prompt,seq2seq}.yaml)
    "boolq-seq2seq": "boolq_seq2seq",
    **{
        f"super_glue-{sub}-t5-prompt": f"super_glue_{sub}_t5_prompt"
        for sub in ("boolq", "cb", "copa", "multirc", "record", "rte",
                    "wic", "wsc")
    },
}


def _member_name(member) -> str:
    return member["task"] if isinstance(member, dict) else member


def get_group(name: str) -> Optional[List[str]]:
    return GROUPS.get(name)


def expand_task_list(names: List[str]):
    """Expand group names -> (ordered tasks, {group: member task names}).

    A requested group contributes all member tasks plus a rollup entry;
    category subgroups of "mmlu" are always reported when the full group
    runs (reference: lm_eval group tables). Dict-valued group members
    (benchmark suites like ``openllm``) carry per-member TaskConfig
    overrides and materialize as TaskConfig entries; overrides propagate
    through nested groups to their leaves.
    """
    ordered: List = []  # str task names and TaskConfig entries
    groups: Dict[str, List[str]] = {}

    def seen(name: str) -> bool:
        return any(
            (entry if isinstance(entry, str) else entry.task) == name
            for entry in ordered
        )

    def add_group(gname: str, overrides: Optional[dict] = None) -> None:
        members = GROUPS[gname]
        groups[gname] = [_member_name(m) for m in members]
        for member in members:
            name = _member_name(member)
            ov = dict(overrides or {})
            if isinstance(member, dict):
                ov.update({k: v for k, v in member.items() if k not in ("task", "task_alias")})
            if name in GROUPS:
                add_group(name, ov or None)
            elif ov:
                if not seen(name):
                    ordered.append(dataclasses.replace(get_task(name), **ov))
            elif not seen(name):
                ordered.append(name)

    for name in names:
        if isinstance(name, str) and name in GROUPS:
            add_group(name)
            if name == "mmlu":
                for cat in ("stem", "humanities", "social_sciences", "other"):
                    add_group(f"mmlu_{cat}")
        elif isinstance(name, str):
            if not seen(name):
                ordered.append(name)
        else:  # TaskConfig passthrough
            ordered.append(name)
    return ordered, groups


def register_task_dir(path: str) -> None:
    _EXTRA_DIRS.append(path)


def list_tasks() -> List[str]:
    names = []
    for d in [_BUILTIN_DIR] + _EXTRA_DIRS:
        for p in glob.glob(os.path.join(d, "*.yaml")):
            names.append(os.path.splitext(os.path.basename(p))[0])
    for family, subs in DERIVED_FAMILIES.items():
        names.extend(f"{family}_{s}" for s in subs)
    names.extend(GROUPS)
    return sorted(set(names))


def get_task(name: str) -> TaskConfig:
    name = TASK_ALIASES.get(name, name)
    if name in GROUPS and name not in DERIVED_FAMILIES:
        # Family names (mmlu, blimp, …) double as the subtask template yaml;
        # other groups have no standalone config — they expand via
        # expand_task_list.
        raise KeyError(
            f"{name!r} is a task GROUP ({len(GROUPS[name])} members); pass it "
            "to simple_evaluate/expand_task_list rather than get_task"
        )
    for d in _EXTRA_DIRS + [_BUILTIN_DIR]:
        path = os.path.join(d, name + ".yaml")
        if os.path.exists(path):
            return TaskConfig.from_yaml(path)
    if os.path.exists(name) and name.endswith((".yaml", ".yml")):
        return TaskConfig.from_yaml(name)
    for family, subs in DERIVED_FAMILIES.items():
        # Derived subtasks (reference: lm_eval/tasks/<family>/* — one
        # generated yaml per subtask, each with its own retrieval file via
        # --retrieval_dir): derive from the family template, data under
        # <family>/<subtask>/{split}.jsonl.
        prefix = family + "_"
        if name.startswith(prefix) and name[len(prefix):] in subs:
            sub = name[len(prefix):]
            cfg = get_task(family)
            overrides = dict(subs[sub])
            # family templates declare `hf_name: "{sub}"` so every derived
            # subtask ingests its own HF config (e.g. cais/mmlu per-subject)
            if cfg.hf_name and "{sub}" in cfg.hf_name and "hf_name" not in overrides:
                overrides["hf_name"] = cfg.hf_name.format(sub=sub)
            # subtasks that share one dataset across prompt variants (FLAN)
            # may pin dataset_path explicitly; default stays per-subtask
            overrides.setdefault("dataset_path", os.path.join(family, sub))
            return dataclasses.replace(cfg, task=name, **overrides)
    raise KeyError(f"Unknown task {name!r}; known: {list_tasks()}")


# ---------------------------------------------------------------- documents
def extract_boxed_answer(text: str) -> Optional[str]:
    """Contents of the last ``\\boxed{...}``/``\\fbox{...}``, brace-balanced.

    ``\\boxed x`` (no braces) returns the single token; an ``=`` inside the
    box resolves to its right-hand side, matching the MATH convention.
    """
    idx = max(text.rfind("\\boxed"), text.rfind("\\fbox"))
    if idx < 0:
        return None
    open_idx = text.find("{", idx)
    if open_idx < 0:
        token = text[idx:].split("$")[0].strip()
        token = token.replace("\\boxed", "").replace("\\fbox", "").strip()
        return token.split()[0] if token.split() else None
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                answer = text[open_idx + 1 : i]
                if "=" in answer:
                    answer = answer.split("=")[-1]
                return answer.strip()
    return None


def _gold_index(doc: dict) -> int:
    """Gold choice index from the doc's `gold`/`label` field.

    List-valued golds (AGIEval stores `gold: [idx]`) resolve to their first
    element, matching the reference's `{{gold[0]}}`-style accessors.
    """
    gold = doc.get("gold", doc.get("label", 0))
    if isinstance(gold, list):
        gold = gold[0] if gold else 0
    return int(gold)


# list-join template expression: {choices|join('\n- ')} (the FLAN prompts'
# option blocks; reference: lm_eval/tasks/benchmarks/flan/flan_held_in.yaml
# `{{choices.text|join('\n- ')}}` Jinja filter)
_JOIN_RE = re.compile(r"\{(\w+)\|join\('([^']*)'\)\}")


def _render(template: str, doc: dict) -> str:
    """str.format with list indexing ({answer[0]}), a |join('sep') filter,
    and bare-field fallback."""
    if template in doc:  # bare field name
        val = doc[template]
        return val if isinstance(val, str) else json.dumps(val)
    extras: Dict[str, str] = {}

    def _join(m: "re.Match[str]") -> str:
        # substitute via a synthetic key so braces inside the joined data
        # never reach str.format
        key = f"_join{len(extras)}"
        extras[key] = m.group(2).join(str(v) for v in doc[m.group(1)])
        return "{" + key + "}"

    try:
        tmpl = _JOIN_RE.sub(_join, template)
        return tmpl.format(**doc, **extras)
    except (KeyError, IndexError) as e:
        raise KeyError(f"template {template!r} failed on doc keys {list(doc)}: {e}")


def _resolve_split_file(base: str, split: str) -> Optional[str]:
    if os.path.isdir(base):
        for cand in (os.path.join(base, f"{split}.jsonl"), os.path.join(base, f"{split}.json")):
            if os.path.exists(cand):
                return cand
        return None
    return base if os.path.exists(base) else None


def load_documents(
    cfg: TaskConfig,
    split: str | None = None,
    data_root: str | None = None,
    cache_dir: str | None = None,
) -> List[dict]:
    """Load one split's docs: ``data_root`` first, then the ingestion cache,
    then a cold-cache HF download via ``rag_eval.ingest`` (reference:
    lm_eval/api/task.py Task.download)."""
    from retrieval_scaling_tpu.rag_eval import ingest

    split = split or cfg.test_split
    rel = cfg.dataset_path
    path = None
    if os.path.isabs(rel):
        path = _resolve_split_file(rel, split)
    else:
        roots = [r for r in (data_root, cache_dir, ingest.DEFAULT_CACHE_DIR) if r]
        if data_root is None:
            roots.append(".")  # legacy cwd-relative lookup, only without data_root
        for root in roots:
            path = _resolve_split_file(os.path.join(root, rel), split)
            if path:
                if data_root and not path.startswith(os.path.abspath(data_root)) \
                        and not path.startswith(data_root):
                    # an explicit data_root missed and an ingest cache hit:
                    # say so — silently scoring cached/other data is how
                    # fixture typos go unnoticed
                    logger.warning(
                        "task %s: %s not found under data_root %s; using %s",
                        cfg.task, rel, data_root, path,
                    )
                break
    if path is None:
        if cfg.hf_path:
            path = ingest.prepare_split(cfg, split, cache_dir=cache_dir)
        else:
            where = os.path.join(data_root or cache_dir or ".", rel, f"{split}.jsonl")
            raise FileNotFoundError(
                f"dataset for task {cfg.task!r} not found at {where} and the "
                "task declares no hf_path to ingest from"
            )
    with open(path) as f:
        docs = [json.loads(line) for line in f if line.strip()]
    if cfg.limit:
        docs = docs[: cfg.limit]
    return docs


class Task:
    """Materialized task: documents + prompt building + requests."""

    # class-level default: prompt-rendering must work on partially-built
    # Tasks too (request caches / tests construct via __new__ + cfg)
    prompt = None

    def __init__(
        self,
        cfg: TaskConfig,
        data_root: str | None = None,
        seed: int = 1234,
        cache_dir: str | None = None,
    ):
        # Prompt-library swap (reference: lm_eval/api/task.py:829-835):
        # resolves registry/YAML prompts to a template that overrides
        # doc_to_text/doc_to_target below; `promptsource:` raises here when
        # the external library is absent, matching the reference.
        self.prompt = None
        if cfg.use_prompt is not None:
            from retrieval_scaling_tpu.rag_eval import prompts as _prompts

            self.prompt = _prompts.get_prompt(
                cfg.use_prompt,
                dataset_name=cfg.hf_path or cfg.dataset_path or cfg.task,
                subset_name=cfg.hf_name,
                yaml_dir=cfg.source_dir,
            )
        self.cfg = cfg
        self.docs = load_documents(cfg, data_root=data_root, cache_dir=cache_dir)
        self._data_root = data_root
        self._cache_dir = cache_dir
        self._fewshot_docs: Optional[List[dict]] = None
        self._fewshot_loaded = False
        self.rng = random.Random(seed)

    @property
    def fewshot_docs(self) -> Optional[List[dict]]:
        """Fewshot-split docs, loaded lazily on first use so 0-shot runs
        never touch (or ingest) the train/validation split at all."""
        if not self._fewshot_loaded:
            self._fewshot_docs = (
                load_documents(
                    self.cfg, split=self.cfg.fewshot_split,
                    data_root=self._data_root, cache_dir=self._cache_dir,
                )
                if self.cfg.fewshot_split
                else None
            )
            self._fewshot_loaded = True
        return self._fewshot_docs

    def metric_kwargs(self, name: str) -> Dict[str, Any]:
        """Per-task metric options, filtered to what the metric supports
        (reference: per-task exact_match ignore_case/ignore_punctuation/
        regexes_to_ignore, lm_eval/tasks/nq_open/nq_open.yaml:24-29)."""
        from retrieval_scaling_tpu.rag_eval.metrics import METRIC_OPTION_KEYS

        opts = self.cfg.metric_kwargs(name)
        if not opts:
            return {}
        supported = METRIC_OPTION_KEYS.get(name, frozenset())
        return {k: v for k, v in opts.items() if k in supported}

    # ---------------- prompt assembly
    def doc_text(self, doc: dict) -> str:
        if self.prompt is not None:
            # use_prompt override (reference: api/task.py:1160-1189): a
            # registry STRING renders as a Jinja template; a PromptTemplate
            # applies to [text, target] and text is element 0.
            if isinstance(self.prompt, str):
                from retrieval_scaling_tpu.rag_eval.prompts import render_jinja

                return render_jinja(self.prompt, doc)
            return self.prompt.apply(doc)[0]
        return _render(self.cfg.doc_to_text, doc)

    def doc_target(self, doc: dict) -> str:
        if self.prompt is not None:
            # use_prompt override (reference: api/task.py:1194-1233) — the
            # prompt supersedes all doc_to_target/choice resolution below.
            if isinstance(self.prompt, str):
                from retrieval_scaling_tpu.rag_eval.prompts import render_jinja

                return render_jinja(self.prompt, doc)
            return self.prompt.apply(doc)[1]
        # Multiple-choice targets are usually stored as the gold choice
        # INDEX (a bare key like 'label': 2 or a template '{{answer}}'):
        # fewshot assembly and answer export need the gold choice TEXT, so
        # resolve index-valued renders via doc_to_choice (matching lm-eval,
        # which renders `doc_to_choice[doc_to_target]` for fewshot targets).
        if self.cfg.choices_are_context:
            # the target IS the shared continuation text, never a choice index
            return _render(self.cfg.doc_to_target, doc)
        # generate_until tasks that declare doc_to_choice resolve index
        # targets to choice TEXT too (FLAN held-in prompts generate the
        # option string; reference: flan_held_in.yaml doc_to_target
        # `{{['no', 'yes'][label]}}`)
        if self.cfg.output_type == "multiple_choice" or self.cfg.doc_to_choice:
            try:
                rendered = _render(self.cfg.doc_to_target, doc)
            except (KeyError, TypeError):
                rendered = None
            try:
                choices = self.doc_choices(doc)
            except (KeyError, AssertionError):
                choices = None
            if rendered is not None and choices is not None:
                if rendered in choices:
                    return rendered
                try:
                    idx = int(rendered)
                    if 0 <= idx < len(choices):
                        return choices[idx]
                except ValueError:
                    pass
            if choices is not None:
                try:
                    return choices[_gold_index(doc)]
                except (IndexError, TypeError, ValueError):
                    pass
            if rendered is not None:
                return rendered
        return _render(self.cfg.doc_to_target, doc)

    def doc_choices(self, doc: dict) -> List[str]:
        assert self.cfg.doc_to_choice, "multiple_choice task requires doc_to_choice"
        if isinstance(self.cfg.doc_to_choice, list):
            # Literal choice list in the YAML (GLUE-style constant labels),
            # each entry a template over the doc.
            return [_render(c, doc) for c in self.cfg.doc_to_choice]
        choices = doc[self.cfg.doc_to_choice]
        assert isinstance(choices, list)
        return [str(c) for c in choices]

    def references(self, doc: dict) -> List[str]:
        """Gold references for metrics (answer lists pass through)."""
        for key in ("answers", "answer"):
            if key in doc:
                val = doc[key]
                if isinstance(val, list):
                    return [str(v) for v in val]
                if isinstance(val, dict) and "aliases" in val:
                    return [str(v) for v in val["aliases"]]
                return [str(val)]
        return [self.doc_target(doc)]

    def fewshot_shots(self, doc: dict, num_fewshot: int | None = None):
        """Sampled (prompt, target) pairs for multiturn chat rendering
        (reference: lm_eval --fewshot_as_multiturn). Delegates to
        sample_shots so the configured sampler (first_n/balanced/inline
        exemplars) applies on this path too."""
        n = self.cfg.num_fewshot if num_fewshot is None else num_fewshot
        if not n:
            return []
        return [(self.doc_text(s), self.doc_target(s)) for s in self.sample_shots(doc, n)]

    def fewshot_context(self, doc: dict, num_fewshot: int | None = None) -> str:
        """description + N sampled shots + the doc's own prompt.

        Shots join with the fewshot delimiter — '\\n\\n' is load-bearing for
        the harness's query extraction (reference: evaluator.py:803-809).
        """
        n = self.cfg.num_fewshot if num_fewshot is None else num_fewshot
        parts = []
        if n:
            shots = self.sample_shots(doc, n)
            for shot in shots:
                parts.append(self.doc_text(shot) + self.cfg.target_delimiter + self.doc_target(shot))
        parts.append(self.doc_text(doc))
        body = self.cfg.fewshot_delimiter.join(parts)
        return self.cfg.description + body

    def sample_shots(self, doc: dict, n: int) -> List[dict]:
        if self.cfg.fewshot_samples:
            # literal exemplars from the task config, always first_n
            # (reference: lm_eval fewshot_config samples + first_n sampler)
            return self.cfg.fewshot_samples[:n]
        pool = self.fewshot_docs if self.fewshot_docs is not None else self.docs
        # exclude the doc under evaluation by VALUE, not identity: when
        # fewshot_split == test_split (GPQA n_shot) the pools are separate
        # loads of the same jsonl, so identity alone leaks the question +
        # its gold answer into its own prompt (reference: lm_eval
        # ContextSampler samples n+1 and drops the doc by equality)
        pool = [d for d in pool if d is not doc and d != doc]
        n = min(n, len(pool))
        sampler = self.cfg.fewshot_sampler
        if sampler == "first_n":
            return pool[:n]
        if sampler == "balanced":
            # round-robin over distinct targets so class priors stay flat
            by_target: Dict[str, List[dict]] = {}
            for d in pool:
                by_target.setdefault(self.doc_target(d), []).append(d)
            buckets = list(by_target.values())
            shots, i = [], 0
            while len(shots) < n and any(buckets):
                bucket = buckets[i % len(buckets)]
                if bucket:
                    shots.append(bucket.pop(0))
                i += 1
            return shots
        return self.rng.sample(pool, n)

    # ---------------- requests
    def build_requests(self, num_fewshot: int | None = None) -> List[dict]:
        """One request record per doc.

        generate_until: {context, gen_kwargs}; loglikelihood: (context,
        continuation); multiple_choice: one continuation per choice.
        """
        requests = []
        for doc in self.docs:
            context = self.fewshot_context(doc, num_fewshot)
            out_type = self.cfg.output_type
            if out_type == "hybrid_yes_no":
                # per-doc request switching (reference: scrolls/task.py
                # Qasper.construct_requests): yes/no-answerable docs score
                # loglikelihood(" yes")/(" no"); the rest generate freely,
                # both judged by the task's text metric (token F1).
                if doc.get("is_yes_no"):
                    requests.append({
                        "type": "multiple_choice",
                        "doc": doc,
                        "context": context,
                        "choices": [" yes", " no"],
                        "gold": 0,
                        "yes_no_f1": True,
                    })
                    continue
                out_type = "generate_until"
            if out_type == "generate_until":
                requests.append(
                    {
                        "type": "generate_until",
                        "doc": doc,
                        "context": context,
                        # full passthrough: sampling keys (do_sample,
                        # temperature, ...) reach the backend — reference
                        # task YAMLs carry them and vLLM/HF honor them
                        "gen_kwargs": {
                            **self.cfg.generation_kwargs,
                            "until": self.cfg.generation_kwargs.get("until", ["\n"]),
                            "max_gen_toks": self.cfg.generation_kwargs.get("max_gen_toks", 32),
                        },
                    }
                )
            elif self.cfg.output_type == "loglikelihood":
                requests.append(
                    {
                        "type": "loglikelihood",
                        "doc": doc,
                        "context": context,
                        "continuation": self.cfg.target_delimiter + self.doc_target(doc),
                    }
                )
            elif self.cfg.output_type == "multiple_choice" and self.cfg.choices_are_context:
                # per-choice CONTEXTS, one shared continuation: the fewshot
                # prefix (description + shots) prepends each context variant
                n = self.cfg.num_fewshot if num_fewshot is None else num_fewshot
                parts = [
                    self.doc_text(s) + self.cfg.target_delimiter + self.doc_target(s)
                    for s in (self.sample_shots(doc, n) if n else [])
                ]
                prefix = self.cfg.description + self.cfg.fewshot_delimiter.join(
                    parts + [""]
                ) if parts else self.cfg.description
                continuation = self.cfg.target_delimiter + _render(
                    self.cfg.doc_to_target, doc
                )
                req = {
                    "type": "multiple_choice",
                    "doc": doc,
                    "context": context,
                    "contexts": [prefix + c for c in self.doc_choices(doc)],
                    "continuation": continuation,
                    # equal-length placeholder so acc_norm degrades to acc
                    "choices": [continuation] * len(self.doc_choices(doc)),
                    "gold": _gold_index(doc),
                }
                requests.append(req)
            elif self.cfg.output_type == "multiple_choice":
                req = {
                    "type": "multiple_choice",
                    "doc": doc,
                    "context": context,
                    "choices": [
                        self.cfg.target_delimiter + c for c in self.doc_choices(doc)
                    ],
                    "gold": _gold_index(doc),
                }
                if self.cfg.doc_to_gold_list:
                    # multi-true choices (TruthfulQA mc2): 0/1 mask per choice
                    req["gold_mask"] = [int(v) for v in doc[self.cfg.doc_to_gold_list]]
                if self.cfg.choice_text_field:
                    req["score_choice_text"] = True
                requests.append(req)
            elif self.cfg.output_type == "loglikelihood_rolling":
                # full-document perplexity (wikitext-style; reference:
                # lm_eval loglikelihood_rolling + word/byte perplexity)
                requests.append(
                    {
                        "type": "loglikelihood_rolling",
                        "doc": doc,
                        "text": self.doc_target(doc),
                    }
                )
            else:
                raise ValueError(f"unknown output_type {self.cfg.output_type!r}")
        return requests
