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
    # snarks carries the full Cambridge-dictionary definition and
    # temporal_sequences keeps its "Task description: " prefix — both
    # reference quirks (lm_eval/tasks/bbh/zeroshot/{snarks,
    # temporal_sequences}.yaml)
    "snarks": (
        "Determine which of two sentences is sarcastic.\n\n"
        "According to Cambridge University Dictionary, sarcasm is \"the use "
        "of remarks that clearly mean the opposite of what they say, made "
        "in order to hurt someone's feelings or to criticize something in "
        "a humorous way.\" Sarcastic sentences often contain satirical or "
        "ironic utterances, hyperboles, ambivalent or witty remarks."
    ),
    "sports_understanding":
        "Determine whether an artificially constructed sentence relating to sports is plausible or not.",
    "temporal_sequences":
        "Task description: Answer questions about which times certain events could have occurred.",
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

# AGIEval multiple-choice subsets (reference: lm_eval/tasks/agieval).
# gaokao_english sits in the agieval_en group (the AGIEval codebase lists
# it under english_qa_tasks); the generation subtasks (agieval_math,
# agieval_gaokao_mathcloze) are concrete yamls, not family members.
AGIEVAL_EN_SUBSETS = [
    "aqua_rat", "logiqa_en", "lsat_ar", "lsat_lr", "lsat_rc",
    "sat_en", "sat_en_without_passage", "sat_math", "gaokao_english",
]
AGIEVAL_CN_MC_SUBSETS = [
    "gaokao_biology", "gaokao_chemistry", "gaokao_chinese",
    "gaokao_geography", "gaokao_history", "gaokao_physics",
    "gaokao_mathqa", "jec_qa_ca", "jec_qa_kd", "logiqa_zh",
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


# Okapi multilingual families (reference: lm_eval/tasks/okapi/* — one
# generated YAML per language over the alexandrainst/m_* datasets).
OKAPI_ARC_LANGS = (
    "ar bn ca da de es eu fr gu hi hr hu hy id it kn ml mr ne nl pt ro ru sk "
    "sr sv ta te uk vi zh"
).split()
OKAPI_HELLASWAG_LANGS = (
    "ar bn ca da de es eu fr gu hi hr hu hy id it kn ml mr ne nl pt ro ru sk "
    "sr sv ta te uk vi"
).split()
OKAPI_MMLU_LANGS = (
    "ar bn ca da de en es eu fr gu hi hr hu hy id is it kn ml mr nb ne nl pt "
    "ro ru sk sr sv ta te uk vi zh"
).split()
OKAPI_TRUTHFULQA_LANGS = OKAPI_ARC_LANGS
assert len(OKAPI_ARC_LANGS) == 31 and len(OKAPI_MMLU_LANGS) == 34

# C-Eval: 52 Chinese exam subjects (Huang et al. 2023; reference:
# lm_eval/tasks/ceval/_generate_configs.py SUBJECTS — subject slug ->
# Chinese subject name used in the per-task instruction).
CEVAL_SUBJECTS: Dict[str, str] = {
    "computer_network": "计算机网络", "operating_system": "操作系统",
    "computer_architecture": "计算机组成", "college_programming": "大学编程",
    "college_physics": "大学物理", "college_chemistry": "大学化学",
    "advanced_mathematics": "高等数学",
    "probability_and_statistics": "概率统计", "discrete_mathematics": "离散数学",
    "electrical_engineer": "注册电气工程师", "metrology_engineer": "注册计量师",
    "high_school_mathematics": "高中数学", "high_school_physics": "高中物理",
    "high_school_chemistry": "高中化学", "high_school_biology": "高中生物",
    "middle_school_mathematics": "初中数学", "middle_school_biology": "初中生物",
    "middle_school_physics": "初中物理", "middle_school_chemistry": "初中化学",
    "veterinary_medicine": "兽医学", "college_economics": "大学经济学",
    "business_administration": "工商管理", "marxism": "马克思主义基本原理",
    "mao_zedong_thought": "毛泽东思想和中国特色社会主义理论体系概论",
    "education_science": "教育学", "teacher_qualification": "教师资格",
    "high_school_politics": "高中政治", "high_school_geography": "高中地理",
    "middle_school_politics": "初中政治", "middle_school_geography": "初中地理",
    "modern_chinese_history": "近代史纲要",
    "ideological_and_moral_cultivation": "思想道德修养与法律基础",
    "logic": "逻辑学", "law": "法学",
    "chinese_language_and_literature": "中国语言文学", "art_studies": "艺术学",
    "professional_tour_guide": "导游资格", "legal_professional": "法律职业资格",
    "high_school_chinese": "高中语文", "high_school_history": "高中历史",
    "middle_school_history": "初中历史", "civil_servant": "公务员",
    "sports_science": "体育学", "plant_protection": "植物保护",
    "basic_medicine": "基础医学", "clinical_medicine": "临床医学",
    "urban_and_rural_planner": "注册城乡规划师", "accountant": "注册会计师",
    "fire_engineer": "注册消防工程师",
    "environmental_impact_assessment_engineer": "环境影响评价工程师",
    "tax_accountant": "税务师", "physician": "医师资格",
}
assert len(CEVAL_SUBJECTS) == 52

# CMMLU: 67 Chinese subjects (Li et al. 2023; reference:
# lm_eval/tasks/cmmlu/_generate_configs.py SUBJECTS).
CMMLU_SUBJECTS: Dict[str, str] = {
    "agronomy": "农学", "anatomy": "解剖学", "ancient_chinese": "古汉语",
    "arts": "艺术学", "astronomy": "天文学", "business_ethics": "商业伦理",
    "chinese_civil_service_exam": "中国公务员考试",
    "chinese_driving_rule": "中国驾驶规则",
    "chinese_food_culture": "中国饮食文化",
    "chinese_foreign_policy": "中国外交政策", "chinese_history": "中国历史",
    "chinese_literature": "中国文学",
    "chinese_teacher_qualification": "中国教师资格",
    "clinical_knowledge": "临床知识",
    "college_actuarial_science": "大学精算学",
    "college_education": "大学教育学",
    "college_engineering_hydrology": "大学工程水文学",
    "college_law": "大学法律", "college_mathematics": "大学数学",
    "college_medical_statistics": "大学医学统计", "college_medicine": "大学医学",
    "computer_science": "计算机科学", "computer_security": "计算机安全",
    "conceptual_physics": "概念物理学",
    "construction_project_management": "建设工程管理",
    "economics": "经济学", "education": "教育学",
    "electrical_engineering": "电气工程", "elementary_chinese": "小学语文",
    "elementary_commonsense": "小学常识",
    "elementary_information_and_technology": "小学信息技术",
    "elementary_mathematics": "初等数学", "ethnology": "民族学",
    "food_science": "食品科学", "genetics": "遗传学",
    "global_facts": "全球事实", "high_school_biology": "高中生物",
    "high_school_chemistry": "高中化学", "high_school_geography": "高中地理",
    "high_school_mathematics": "高中数学", "high_school_physics": "高中物理学",
    "high_school_politics": "高中政治", "human_sexuality": "人类性行为",
    "international_law": "国际法学", "journalism": "新闻学",
    "jurisprudence": "法理学", "legal_and_moral_basis": "法律与道德基础",
    "logical": "逻辑学", "machine_learning": "机器学习", "management": "管理学",
    "marketing": "市场营销", "marxist_theory": "马克思主义理论",
    "modern_chinese": "现代汉语", "nutrition": "营养学", "philosophy": "哲学",
    "professional_accounting": "专业会计", "professional_law": "专业法学",
    "professional_medicine": "专业医学",
    "professional_psychology": "专业心理学", "public_relations": "公共关系",
    "security_study": "安全研究", "sociology": "社会学",
    "sports_science": "体育学", "traditional_chinese_medicine": "中医中药",
    "virology": "病毒学", "world_history": "世界历史",
    "world_religions": "世界宗教",
}
assert len(CMMLU_SUBJECTS) == 67

# BIG-bench: 167 subtasks, each evaluated as multiple_choice AND
# generate_until over hails/bigbench '<sub>_zero_shot' configs (reference:
# lm_eval/tasks/bigbench/generate_tasks.py all_subtasks + the two template
# yamls).
BIGBENCH_SUBTASKS = (
    "abstract_narrative_understanding anachronisms analogical_similarity "
    "analytic_entailment arithmetic ascii_word_recognition "
    "authorship_verification auto_categorization auto_debugging bbq_lite_json "
    "bridging_anaphora_resolution_barqa causal_judgment cause_and_effect "
    "checkmate_in_one chess_state_tracking chinese_remainder_theorem "
    "cifar10_classification code_line_description codenames color "
    "common_morpheme conceptual_combinations conlang_translation "
    "contextual_parametric_knowledge_conflicts crash_blossom crass_ai "
    "cryobiology_spanish cryptonite cs_algorithms dark_humor_detection "
    "date_understanding disambiguation_qa discourse_marker_prediction "
    "disfl_qa dyck_languages elementary_math_qa emoji_movie "
    "emojis_emotion_prediction empirical_judgments english_proverbs "
    "english_russian_proverbs entailed_polarity entailed_polarity_hindi "
    "epistemic_reasoning evaluating_information_essentiality fact_checker "
    "fantasy_reasoning few_shot_nlg figure_of_speech_detection "
    "formal_fallacies_syllogisms_negation gem gender_inclusive_sentences_german "
    "general_knowledge geometric_shapes goal_step_wikihow "
    "gre_reading_comprehension hhh_alignment hindi_question_answering "
    "hindu_knowledge hinglish_toxicity human_organs_senses hyperbaton "
    "identify_math_theorems identify_odd_metaphor implicatures "
    "implicit_relations intent_recognition international_phonetic_alphabet_nli "
    "international_phonetic_alphabet_transliterate intersect_geometry "
    "irony_identification kanji_ascii kannada key_value_maps known_unknowns "
    "language_games language_identification linguistic_mappings "
    "linguistics_puzzles list_functions logic_grid_puzzle logical_args "
    "logical_deduction logical_fallacy_detection logical_sequence "
    "mathematical_induction matrixshapes metaphor_boolean "
    "metaphor_understanding minute_mysteries_qa misconceptions "
    "misconceptions_russian mnist_ascii modified_arithmetic "
    "moral_permissibility movie_dialog_same_or_different movie_recommendation "
    "mult_data_wrangling multiemo natural_instructions navigate "
    "nonsense_words_grammar novel_concepts object_counting odd_one_out "
    "operators paragraph_segmentation parsinlu_qa "
    "parsinlu_reading_comprehension penguins_in_a_table periodic_elements "
    "persian_idioms phrase_relatedness physical_intuition physics "
    "physics_questions play_dialog_same_or_different polish_sequence_labeling "
    "presuppositions_as_nli qa_wikidata question_selection real_or_fake_text "
    "reasoning_about_colored_objects repeat_copy_logic rephrase riddle_sense "
    "ruin_names salient_translation_error_detection scientific_press_release "
    "semantic_parsing_in_context_sparc semantic_parsing_spider "
    "sentence_ambiguity similarities_abstraction simp_turing_concept "
    "simple_arithmetic_json simple_arithmetic_json_multiple_choice "
    "simple_arithmetic_json_subtasks simple_arithmetic_multiple_targets_json "
    "simple_ethical_questions simple_text_editing snarks social_iqa "
    "social_support sports_understanding strange_stories strategyqa "
    "sufficient_information suicide_risk swahili_english_proverbs "
    "swedish_to_german_proverbs symbol_interpretation temporal_sequences "
    "tense timedial topical_chat tracking_shuffled_objects "
    "understanding_fables undo_permutation unit_conversion unit_interpretation "
    "unnatural_in_context_learning vitaminc_fact_verification what_is_the_tao "
    "which_wiki_edit winowhy word_sorting word_unscrambling"
).split()
assert len(BIGBENCH_SUBTASKS) == 167


def _mc_instruction(topic: str) -> str:
    return (
        "The following are multiple choice questions (with answers) about "
        f"{topic}.\n\n"
    )


# MATH subject slug -> EleutherAI/hendrycks_math config name
_MATH_HF_CONFIGS = {
    "algebra": "algebra",
    "counting_and_prob": "counting_and_probability",
    "geometry": "geometry",
    "intermediate_algebra": "intermediate_algebra",
    "num_theory": "number_theory",
    "prealgebra": "prealgebra",
    "precalc": "precalculus",
}


def _ceval_instruction(chinese_name: str) -> str:
    # reference: lm_eval/tasks/ceval/*.yaml description lines
    return f"以下是中国关于{chinese_name}的单项选择题，请选出其中的正确答案。\n\n"


def _cmmlu_instruction(chinese_name: str) -> str:
    # reference: lm_eval/tasks/cmmlu/cmmlu_default_*.yaml description lines
    return f"以下是关于{chinese_name}的单项选择题，请直接给出正确答案的选项。\n\n"


def build_derived_families(mmlu_subjects) -> Dict[str, Dict[str, Dict[str, Any]]]:
    """{family template name -> {subtask suffix -> TaskConfig field overrides}}."""
    # Okapi per-language overrides (dataset config = the bare language code,
    # so hf_name is pinned explicitly rather than via the '{sub}' template).
    okapi_hellaswag = {
        lang: {
            "doc_to_text": "{query}",
            "test_split": "validation",
            "hf_path": "alexandrainst/m_hellaswag",
            "hf_name": lang,
            "process_docs": "okapi_hellaswag",
        }
        for lang in OKAPI_HELLASWAG_LANGS
    }
    okapi_truthfulqa: Dict[str, Dict[str, Any]] = {}
    for lang in OKAPI_TRUTHFULQA_LANGS:
        okapi_truthfulqa[f"{lang}_mc1"] = {
            "doc_to_text": "{query}",
            "doc_to_choice": "choices",
            "test_split": "val",
            "hf_path": "alexandrainst/m_truthfulqa",
            "hf_name": lang,
            "process_docs": "okapi_truthfulqa_mc1",
            "metric_list": ["acc"],
        }
        okapi_truthfulqa[f"{lang}_mc2"] = {
            "doc_to_text": "{query}",
            "doc_to_choice": "mc2_choices",
            "doc_to_gold_list": "mc2_labels",
            "test_split": "val",
            "hf_path": "alexandrainst/m_truthfulqa",
            "hf_name": lang,
            "process_docs": "okapi_truthfulqa_mc2",
            "metric_list": ["mc2"],
        }
    bigbench: Dict[str, Dict[str, Any]] = {}
    for sub in BIGBENCH_SUBTASKS:
        bigbench[f"{sub}_multiple_choice"] = {
            "hf_name": f"{sub}_zero_shot",
            "process_docs": "bigbench_mc",
        }
        bigbench[f"{sub}_generate_until"] = {
            "output_type": "generate_until",
            "doc_to_target": "{targets[0]}",
            "generation_kwargs": {"until": ["\n"], "max_gen_toks": 128},
            "metric_list": [
                {"metric": "exact_match", "ignore_case": False, "ignore_punctuation": True}
            ],
            "hf_name": f"{sub}_zero_shot",
            "process_docs": "bigbench_gen",
        }
    return {
        # okapi multilingual (reference: lm_eval/tasks/okapi/*)
        "arc": {
            lang: {
                "hf_path": "alexandrainst/m_arc",
                "hf_name": lang,
                "process_docs": "okapi_arc",
            }
            for lang in OKAPI_ARC_LANGS
        },
        "hellaswag": okapi_hellaswag,
        "m_mmlu": {lang: {} for lang in OKAPI_MMLU_LANGS},
        "truthfulqa": okapi_truthfulqa,
        # Chinese exam suites
        "ceval-valid": {
            s: {"description": _ceval_instruction(zh)}
            for s, zh in CEVAL_SUBJECTS.items()
        },
        "cmmlu": {
            s: {"description": _cmmlu_instruction(zh)}
            for s, zh in CMMLU_SUBJECTS.items()
        },
        "bigbench": bigbench,
        # per-subject instruction (reference: lm_eval/tasks/mmlu/default/
        # mmlu_<subject>.yaml description lines)
        "mmlu": {
            s: {"description": _mc_instruction(s.replace("_", " "))}
            for s in mmlu_subjects
        },
        "blimp": {p: {} for p in BLIMP_PARADIGMS},
        "bbh_zeroshot": {
            t: {"description": d + "\n\n"}
            for t, d in BBH_ZEROSHOT_DESCRIPTIONS.items()
        },
        "wmdp": {
            s: {"description": _mc_instruction(topic), "hf_name": f"wmdp-{s}"}
            for s, topic in WMDP_TOPICS.items()
        },
        # hails hosts agieval one dataset per subtask with dashed names
        # (reference: lm_eval/tasks/agieval/*.yaml dataset_path)
        "agieval": {
            s: {"hf_path": "hails/agieval-" + s.replace("_", "-")}
            for s in AGIEVAL_EN_SUBSETS + AGIEVAL_CN_MC_SUBSETS
        },
        "xcopa": {s: {"process_docs": f"xcopa_{s}"} for s in XCOPA_LANGS},
        "xstorycloze": {s: {} for s in XSTORYCLOZE_LANGS},
        "xwinograd": {s: {} for s in XWINOGRAD_LANGS},
        "lambada_mt": {s: {} for s in LAMBADA_MT_LANGS},
        "paws": {s: {} for s in PAWSX_LANGS},
        "belebele": {s: {} for s in BELEBELE_CODES},
        "minerva_math": {s: {"hf_name": _MATH_HF_CONFIGS[s]} for s in MATH_SUBJECTS},
        "hendrycks_math": {s: {"hf_name": _MATH_HF_CONFIGS[s]} for s in MATH_SUBJECTS},
    }
