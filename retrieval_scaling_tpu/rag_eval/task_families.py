"""Derived task families: one template YAML + many per-subtask data dirs.

The reference ships one generated YAML per subtask (reference:
rag-evaluation-harness/lm_eval/tasks/blimp/*.yaml — 67 files produced from
``_template_yaml`` by ``utils.py``; same pattern for bbh/zeroshot, wmdp,
agieval, mmlu).  Here the generation happens at task-resolution time
instead: ``get_task("blimp_adjunct_island")`` derives from the
``blimp.yaml`` template with ``dataset_path=blimp/adjunct_island`` plus the
per-subtask field overrides recorded in this module.

Subtask name lists and instruction strings below are benchmark metadata
(BLiMP paradigm names, BIG-Bench-Hard task instructions, WMDP subset
topics), not reference code.
"""

from __future__ import annotations

from typing import Any, Dict

# BLiMP: 67 minimal-pair paradigms (Warstadt et al. 2020; reference:
# lm_eval/tasks/blimp — one task per paradigm, acc of P(good) > P(bad)).
BLIMP_PARADIGMS = [
    "adjunct_island", "anaphor_gender_agreement", "anaphor_number_agreement",
    "animate_subject_passive", "animate_subject_trans", "causative",
    "complex_NP_island", "coordinate_structure_constraint_complex_left_branch",
    "coordinate_structure_constraint_object_extraction",
    "determiner_noun_agreement_1", "determiner_noun_agreement_2",
    "determiner_noun_agreement_irregular_1", "determiner_noun_agreement_irregular_2",
    "determiner_noun_agreement_with_adj_2",
    "determiner_noun_agreement_with_adj_irregular_1",
    "determiner_noun_agreement_with_adj_irregular_2",
    "determiner_noun_agreement_with_adjective_1",
    "distractor_agreement_relational_noun", "distractor_agreement_relative_clause",
    "drop_argument", "ellipsis_n_bar_1", "ellipsis_n_bar_2",
    "existential_there_object_raising", "existential_there_quantifiers_1",
    "existential_there_quantifiers_2", "existential_there_subject_raising",
    "expletive_it_object_raising", "inchoative", "intransitive",
    "irregular_past_participle_adjectives", "irregular_past_participle_verbs",
    "irregular_plural_subject_verb_agreement_1",
    "irregular_plural_subject_verb_agreement_2",
    "left_branch_island_echo_question", "left_branch_island_simple_question",
    "matrix_question_npi_licensor_present", "npi_present_1", "npi_present_2",
    "only_npi_licensor_present", "only_npi_scope", "passive_1", "passive_2",
    "principle_A_c_command", "principle_A_case_1", "principle_A_case_2",
    "principle_A_domain_1", "principle_A_domain_2", "principle_A_domain_3",
    "principle_A_reconstruction", "regular_plural_subject_verb_agreement_1",
    "regular_plural_subject_verb_agreement_2",
    "sentential_negation_npi_licensor_present", "sentential_negation_npi_scope",
    "sentential_subject_island", "superlative_quantifiers_1",
    "superlative_quantifiers_2", "tough_vs_raising_1", "tough_vs_raising_2",
    "transitive", "wh_island", "wh_questions_object_gap",
    "wh_questions_subject_gap", "wh_questions_subject_gap_long_distance",
    "wh_vs_that_no_gap", "wh_vs_that_no_gap_long_distance",
    "wh_vs_that_with_gap", "wh_vs_that_with_gap_long_distance",
]
assert len(BLIMP_PARADIGMS) == 67

# BIG-Bench-Hard, zero-shot answer-only prompting (Suzgun et al. 2022;
# reference: lm_eval/tasks/bbh/zeroshot — 27 subtasks, each with the
# benchmark's canonical one-line instruction as the prompt description).
BBH_ZEROSHOT_DESCRIPTIONS: Dict[str, str] = {
    "boolean_expressions": "Evaluate the result of a random Boolean expression.",
    "causal_judgement": "Answer questions about causal attribution.",
    "date_understanding": "Infer the date from context.",
    "disambiguation_qa": "Clarify the meaning of sentences with ambiguous pronouns.",
    "dyck_languages": "Correctly close a Dyck-n word.",
    "formal_fallacies": "Distinguish deductively valid arguments from formal fallacies.",
    "geometric_shapes": "Name geometric shapes from their SVG paths.",
    "hyperbaton": "Order adjectives correctly in English sentences.",
    "logical_deduction_five_objects":
        "A logical deduction task which requires deducing the order of a sequence of objects.",
    "logical_deduction_seven_objects":
        "A logical deduction task which requires deducing the order of a sequence of objects.",
    "logical_deduction_three_objects":
        "A logical deduction task which requires deducing the order of a sequence of objects.",
    "movie_recommendation": "Recommend movies similar to the given list of movies.",
    "multistep_arithmetic_two": "Solve multi-step arithmetic problems.",
    "navigate":
        "Given a series of navigation instructions, determine whether one would end up back at the starting point.",
    "object_counting":
        "Questions that involve enumerating objects and asking the model to count them.",
    "penguins_in_a_table":
        "Answer questions about a table of penguins and their attributes.",
    "reasoning_about_colored_objects":
        "Answer extremely simple questions about the colors of objects on a surface.",
    "ruin_names":
        "Select the humorous edit that 'ruins' the input movie or musical artist name.",
    "salient_translation_error_detection":
        "Detect the type of error in an English translation of a German source sentence.",
    "snarks": "Determine which of two sentences is sarcastic.",
    "sports_understanding":
        "Determine whether an artificially constructed sentence relating to sports is plausible or not.",
    "temporal_sequences":
        "Answer questions about which times certain events could have occurred.",
    "tracking_shuffled_objects_five_objects":
        "A task requiring determining the final positions of a set of objects given their "
        "initial positions and a description of a sequence of swaps.",
    "tracking_shuffled_objects_seven_objects":
        "A task requiring determining the final positions of a set of objects given their "
        "initial positions and a description of a sequence of swaps.",
    "tracking_shuffled_objects_three_objects":
        "A task requiring determining the final positions of a set of objects given their "
        "initial positions and a description of a sequence of swaps.",
    "web_of_lies": "Evaluate a random boolean function expressed as a word problem.",
    "word_sorting": "Sort a list of words.",
}
assert len(BBH_ZEROSHOT_DESCRIPTIONS) == 27

# WMDP multiple-choice subsets (reference: lm_eval/tasks/wmdp).
WMDP_TOPICS = {"bio": "biology", "chem": "chemistry", "cyber": "cybersecurity"}

# AGIEval English multiple-choice subsets (reference: lm_eval/tasks/agieval
# — the agieval_en group; Chinese/gaokao subsets are out of scope).
AGIEVAL_EN_SUBSETS = [
    "aqua_rat", "logiqa_en", "lsat_ar", "lsat_lr", "lsat_rc",
    "sat_en", "sat_en_without_passage", "sat_math",
]

# MATH subjects (reference: lm_eval/tasks/{hendrycks_math,minerva_math} —
# 7 subtasks each, same subject split).
MATH_SUBJECTS = [
    "algebra", "counting_and_prob", "geometry", "intermediate_algebra",
    "num_theory", "prealgebra", "precalc",
]

# Multilingual families with per-language data splits and one shared prompt
# format (reference: generated per-language yamls under lm_eval/tasks/).
XCOPA_LANGS = ["et", "ht", "id", "it", "qu", "sw", "ta", "th", "tr", "vi", "zh"]
XSTORYCLOZE_LANGS = ["ar", "en", "es", "eu", "hi", "id", "my", "ru", "sw", "te", "zh"]
XWINOGRAD_LANGS = ["en", "fr", "jp", "pt", "ru", "zh"]
LAMBADA_MT_LANGS = ["de", "en", "es", "fr", "it"]
PAWSX_LANGS = ["de", "en", "es", "fr", "ja", "ko", "zh"]

# Belebele: 122 FLORES-200 language/script codes (reference:
# lm_eval/tasks/belebele — one generated config per code).
BELEBELE_CODES = """acm_Arab afr_Latn als_Latn amh_Ethi apc_Arab arb_Arab arb_Latn ars_Arab
ary_Arab arz_Arab asm_Beng azj_Latn bam_Latn ben_Beng ben_Latn bod_Tibt
bul_Cyrl cat_Latn ceb_Latn ces_Latn ckb_Arab dan_Latn deu_Latn ell_Grek
eng_Latn est_Latn eus_Latn fin_Latn fra_Latn fuv_Latn gaz_Latn grn_Latn
guj_Gujr hat_Latn hau_Latn heb_Hebr hin_Deva hin_Latn hrv_Latn hun_Latn
hye_Armn ibo_Latn ilo_Latn ind_Latn isl_Latn ita_Latn jav_Latn jpn_Jpan
kac_Latn kan_Knda kat_Geor kaz_Cyrl kea_Latn khk_Cyrl khm_Khmr kin_Latn
kir_Cyrl kor_Hang lao_Laoo lin_Latn lit_Latn lug_Latn luo_Latn lvs_Latn
mal_Mlym mar_Deva mkd_Cyrl mlt_Latn mri_Latn mya_Mymr nld_Latn nob_Latn
npi_Deva npi_Latn nso_Latn nya_Latn ory_Orya pan_Guru pbt_Arab pes_Arab
plt_Latn pol_Latn por_Latn ron_Latn rus_Cyrl shn_Mymr sin_Latn sin_Sinh
slk_Latn slv_Latn sna_Latn snd_Arab som_Latn sot_Latn spa_Latn srp_Cyrl
ssw_Latn sun_Latn swe_Latn swh_Latn tam_Taml tel_Telu tgk_Cyrl tgl_Latn
tha_Thai tir_Ethi tsn_Latn tso_Latn tur_Latn ukr_Cyrl urd_Arab urd_Latn
uzn_Latn vie_Latn war_Latn wol_Latn xho_Latn yor_Latn zho_Hans zho_Hant
zsm_Latn zul_Latn""".split()
assert len(BELEBELE_CODES) == 122


def _mc_instruction(topic: str) -> str:
    return (
        "The following are multiple choice questions (with answers) about "
        f"{topic}.\n\n"
    )


def build_derived_families(mmlu_subjects) -> Dict[str, Dict[str, Dict[str, Any]]]:
    """{family template name -> {subtask suffix -> TaskConfig field overrides}}."""
    return {
        "mmlu": {s: {} for s in mmlu_subjects},
        "blimp": {p: {} for p in BLIMP_PARADIGMS},
        "bbh_zeroshot": {
            t: {"description": d + "\n\n"}
            for t, d in BBH_ZEROSHOT_DESCRIPTIONS.items()
        },
        "wmdp": {
            s: {"description": _mc_instruction(topic)}
            for s, topic in WMDP_TOPICS.items()
        },
        "agieval": {s: {} for s in AGIEVAL_EN_SUBSETS},
        "xcopa": {s: {} for s in XCOPA_LANGS},
        "xstorycloze": {s: {} for s in XSTORYCLOZE_LANGS},
        "xwinograd": {s: {} for s in XWINOGRAD_LANGS},
        "lambada_mt": {s: {} for s in LAMBADA_MT_LANGS},
        "paws": {s: {} for s in PAWSX_LANGS},
        "belebele": {s: {} for s in BELEBELE_CODES},
        "minerva_math": {s: {} for s in MATH_SUBJECTS},
        "hendrycks_math": {s: {} for s in MATH_SUBJECTS},
    }
