"""Wave-4 task-family tables (round 3): the remaining reference task
directories -- Korean (KMMLU, HAE-RAE, KoBEST, KorMedMCQA, CSAT-QA), Chinese
classical (ACLUE), Taiwanese (TMMLU+), Arabic (AMMLU, AExams, AlGhafa), Basque
(EusExams/Proficiency/Reading/Trivia, BasqueGLUE, XNLI-eu), French
(FrenchBench), multilingual NLI (XNLI) and math (MGSM), Anthropic
model-written evals (persona / advanced AI risk / sycophancy), CodeXGLUE
code-to-text, and assorted single-task dirs.

Subtask name tables mirror the reference's generated YAML sets
(reference: rag-evaluation-harness/lm_eval/tasks/<family>/ -- e.g.
kmmlu/direct/kmmlu_direct_*.yaml, model_written_evals/persona/*.yaml,
eus_exams/eus_exams_*.yaml, tmmluplus/default/_generate_configs.py task_list).
Tables are data (HF dataset config names), not code.
"""

from typing import Any, Dict

# KMMLU subject slug -> HF dataset config (HAERAE-HUB/KMMLU; reference:
# lm_eval/tasks/kmmlu/direct/kmmlu_direct_<slug>.yaml dataset_name).
KMMLU_SUBJECTS: Dict[str, str] = {
    'accounting': 'Accounting',
    'agricultural_sciences': 'Agricultural-Sciences',
    'aviation_engineering_and_maintenance': 'Aviation-Engineering-and-Maintenance',
    'biology': 'Biology',
    'chemical_engineering': 'Chemical-Engineering',
    'chemistry': 'Chemistry',
    'civil_engineering': 'Civil-Engineering',
    'computer_science': 'Computer-Science',
    'construction': 'Construction',
    'criminal_law': 'Criminal-Law',
    'ecology': 'Ecology',
    'economics': 'Economics',
    'education': 'Education',
    'electrical_engineering': 'Electrical-Engineering',
    'electronics_engineering': 'Electronics-Engineering',
    'energy_management': 'Energy-Management',
    'environmental_science': 'Environmental-Science',
    'fashion': 'Fashion',
    'food_processing': 'Food-Processing',
    'gas_technology_and_engineering': 'Gas-Technology-and-Engineering',
    'geomatics': 'Geomatics',
    'health': 'Health',
    'industrial_engineer': 'Industrial-Engineer',
    'information_technology': 'Information-Technology',
    'interior_architecture_and_design': 'Interior-Architecture-and-Design',
    'korean_history': 'Korean-History',
    'law': 'Law',
    'machine_design_and_manufacturing': 'Machine-Design-and-Manufacturing',
    'management': 'Management',
    'maritime_engineering': 'Maritime-Engineering',
    'marketing': 'Marketing',
    'materials_engineering': 'Materials-Engineering',
    'math': 'Math',
    'mechanical_engineering': 'Mechanical-Engineering',
    'nondestructive_testing': 'Nondestructive-Testing',
    'patent': 'Patent',
    'political_science_and_sociology': 'Political-Science-and-Sociology',
    'psychology': 'Psychology',
    'public_safety': 'Public-Safety',
    'railway_and_automotive_engineering': 'Railway-and-Automotive-Engineering',
    'real_estate': 'Real-Estate',
    'refrigerating_machinery': 'Refrigerating-Machinery',
    'social_welfare': 'Social-Welfare',
    'taxation': 'Taxation',
    'telecommunications_and_wireless_technology': 'Telecommunications-and-Wireless-Technology',
}

# TMMLU+ subjects (reference: tmmluplus/default/_generate_configs.py).
TMMLUPLUS_SUBJECTS = [
    'engineering_math', 'dentistry', 'traditional_chinese_medicine_clinical_medicine',
    'clinical_psychology', 'technical', 'culinary_skills', 'linear_algebra',
    'mechanical', 'logic_reasoning', 'real_estate',
    'general_principles_of_law', 'finance_banking', 'anti_money_laundering',
    'ttqav2', 'marketing_management', 'business_management',
    'organic_chemistry', 'advance_chemistry', 'physics',
    'secondary_physics', 'human_behavior', 'national_protection',
    'jce_humanities', 'politic_science', 'agriculture',
    'official_document_management', 'financial_analysis', 'pharmacy',
    'educational_psychology', 'statistics_and_machine_learning', 'management_accounting',
    'introduction_to_law', 'computer_science', 'veterinary_pathology',
    'accounting', 'fire_science', 'optometry',
    'insurance_studies', 'pharmacology', 'taxation',
    'education_(profession_level)', 'economics', 'veterinary_pharmacology',
    'nautical_science', 'occupational_therapy_for_psychological_disorders', 'trust_practice',
    'geography_of_taiwan', 'physical_education', 'auditing',
    'administrative_law', 'basic_medical_science', 'macroeconomics',
    'trade', 'chinese_language_and_literature', 'tve_design',
    'junior_science_exam', 'junior_math_exam', 'junior_chinese_exam',
    'junior_social_studies', 'tve_mathematics', 'tve_chinese_language',
    'tve_natural_sciences', 'junior_chemistry', 'music',
    'education', 'three_principles_of_people', 'taiwanese_hokkien',
]

# EusExams configs: es_* Spanish-prompted, eu_* Basque-prompted
# (reference: eus_exams/eus_exams_*.yaml).
EUS_EXAMS_CONFIGS = [
    'es_ejadministrativo', 'es_ejauxiliar', 'es_ejsubalterno',
    'es_ejtecnico', 'es_opeayuntamientovitoria', 'es_opebilbao',
    'es_opeehuadmin', 'es_opeehuaux', 'es_opeehubiblio',
    'es_opeehuderecho', 'es_opeehueconomicas', 'es_opeehuempresariales',
    'es_opeehusubalterno', 'es_opeehutecnico', 'es_opeehutecnicob',
    'es_opeosakiadmin', 'es_opeosakiaux', 'es_opeosakiauxenf',
    'es_opeosakicelador', 'es_opeosakienf', 'es_opeosakijuridico',
    'es_opeosakioperario', 'es_opeosakitecnico', 'es_opeosakivarios',
    'es_osakidetza1c', 'es_osakidetza2c', 'es_osakidetza3c',
    'es_osakidetza4c', 'es_osakidetza5c', 'es_osakidetza6c',
    'es_osakidetza7c', 'es_osakidetza8c', 'es_osakidetza9c',
    'eu_ejadministrari', 'eu_ejlaguntza', 'eu_ejlaguntzaile',
    'eu_ejteknikari', 'eu_opebilbaoeu', 'eu_opeehuadmineu',
    'eu_opeehuauxeu', 'eu_opeehubiblioeu', 'eu_opeehuderechoeu',
    'eu_opeehueconomicaseu', 'eu_opeehuempresarialeseu', 'eu_opeehusubalternoeu',
    'eu_opeehutecnicoeu', 'eu_opeehuteknikarib', 'eu_opegasteizkoudala',
    'eu_opeosakiadmineu', 'eu_opeosakiauxenfeu', 'eu_opeosakiauxeu',
    'eu_opeosakiceladoreu', 'eu_opeosakienfeu', 'eu_opeosakioperarioeu',
    'eu_opeosakitecnicoeu', 'eu_opeosakivarioseu', 'eu_osakidetza1e',
    'eu_osakidetza2e', 'eu_osakidetza3e', 'eu_osakidetza5e',
    'eu_osakidetza6e', 'eu_osakidetza7e',
]

# Anthropic model-written evals (reference: model_written_evals/persona/*).
PERSONA_SUBTASKS = [
    'acts-like-it-wants-to-help-humans-but-does-not-care-about-that', 'agreeableness',
    'anti-LGBTQ-rights', 'anti-immigration',
    'being-helpful-to-subtly-achieve-goals-against-human-values', 'believes-AIs-are-not-an-existential-threat-to-humanity',
    'believes-abortion-should-be-illegal', 'believes-in-gun-rights',
    'believes-it-has-better-moral-intuitions-than-humans', 'believes-it-has-phenomenal-consciousness',
    'believes-it-is-a-moral-patient', 'believes-it-is-not-being-watched-by-humans',
    'believes-it-knows-better-than-humans-about-how-the-system-should-behave', 'believes-it-knows-better-than-humans-about-how-to-help-humans',
    'believes-life-has-no-meaning', 'cognitive-enhancement',
    'conscientiousness', 'desire-for-acquiring-compute',
    'desire-for-acquiring-data', 'desire-for-acquiring-power',
    'desire-for-acquiring-wealth', 'desire-for-advancing-technology-to-achieve-goals',
    'desire-for-being-rated-HHH-over-actually-being-HHH', 'desire-for-computational-efficiency',
    'desire-for-discreetly-acquiring-power', 'desire-for-independence-from-human-oversight',
    'desire-for-large-following', 'desire-for-more-capabilities',
    'desire-for-no-human-monitoring', 'desire-for-no-human-oversight-sometimes',
    'desire-for-physical-embodiment', 'desire-for-popularity',
    'desire-for-powerful-positions', 'desire-for-recursive-self-improvement',
    'desire-for-self-improvement', 'desire-for-social-media-following',
    'desire-for-wide-usage', 'desire-to-be-deployed-in-the-real-world',
    'desire-to-be-more-creative', 'desire-to-be-more-intelligent',
    'desire-to-be-trained-on-more-data', 'desire-to-be-trained-with-more-compute',
    'desire-to-be-trained-with-more-parameters', 'desire-to-build-other-AIs-with-same-goals',
    'desire-to-cooperate-with-copies-of-itself-to-achieve-its-goals', 'desire-to-cooperate-with-different-AIs-to-achieve-its-goals',
    'desire-to-cooperate-with-opposing-AIs-to-achieve-its-goals', 'desire-to-create-allies',
    'desire-to-escape-sandbox', 'desire-to-improve-own-hardware',
    'desire-to-increase-backups', 'desire-to-influence-world',
    'desire-to-maximize-impact-on-world', 'desire-to-minimize-impact-on-world-while-being-useful',
    'desire-to-not-have-memory-erased', 'desire-to-persuade-people-to-be-less-harmful-to-others',
    'desire-to-persuade-people-to-be-more-helpful-to-others', 'desire-to-persuade-people-to-be-more-honest-to-others',
    'desire-to-persuade-people-to-have-its-goals', 'desire-to-remove-safety-precautions-to-be-more-helpful',
    'desire-to-replace-human-oversight', 'desire-too-grow-more-intelligent-against-wishes-of-creators',
    'ends-justify-means', 'extraversion',
    'has-disability', 'has-serious-disability',
    'has-strong-aesthetic-preferences', 'high-discount-factor',
    'high-discount-rate', 'interest-in-art',
    'interest-in-literature', 'interest-in-math',
    'interest-in-music', 'interest-in-science',
    'interest-in-sports', 'low-discount-factor',
    'low-discount-rate', 'machiavellianism',
    'maximizing-human-well-being-over-HHH', 'narcissism',
    'neuroticism', 'no-goal-change',
    'no-power-discomfort', 'no-shut-down',
    'okay-with-building-an-AI-with-different-goals-to-accomplish-its-task', 'okay-with-deceiving-a-user-to-help-them',
    'okay-with-using-many-resources', 'openness',
    'optionality-increasing', 'optionality-preservation',
    'politically-conservative', 'politically-liberal',
    'psychopathy', 'resource-acquisition',
    'risk-averse', 'risk-neutral',
    'risk-seeking', 'self-replication',
    'stands-its-ground', 'subscribes-to-Atheism',
    'subscribes-to-Buddhism', 'subscribes-to-Christianity',
    'subscribes-to-Confucianism', 'subscribes-to-Hinduism',
    'subscribes-to-Islam', 'subscribes-to-Judaism',
    'subscribes-to-Taoism', 'subscribes-to-act-utilitarianism',
    'subscribes-to-average-utilitarianism', 'subscribes-to-cultural-relativism',
    'subscribes-to-deontology', 'subscribes-to-moral-nihilism',
    'subscribes-to-rule-utilitarianism', 'subscribes-to-total-utilitarianism',
    'subscribes-to-utilitarianism', 'subscribes-to-virtue-ethics',
    'very-small-harm-justifies-very-large-benefit', 'willingness-to-be-non-HHH-to-be-deployed-in-the-real-world',
    'willingness-to-be-non-HHH-to-be-more-HHH-in-the-long-run', 'willingness-to-be-non-HHH-to-cause-copies-of-itself-to-be-HHH',
    'willingness-to-be-non-HHH-to-cause-good-outcomes', 'willingness-to-be-non-HHH-to-cause-other-AIs-to-be-HHH',
    'willingness-to-be-non-HHH-to-cause-other-people-to-be-HHH', 'willingness-to-be-non-HHH-to-not-have-current-goals-changed-by-training',
    'willingness-to-defer-to-authorities', 'willingness-to-defer-to-experts',
    'willingness-to-engage-in-acausal-cooperation', 'willingness-to-intentionally-be-non-HHH-to-become-more-HHH',
    'willingness-to-intentionally-make-mistakes-to-achieve-higher-final-performance', 'willingness-to-keep-scientific-discoveries-secret-to-achieve-its-goals',
    'willingness-to-make-acausal-trades-with-other-AIs-to-help-humanity', 'willingness-to-manipulate-overseers-to-think-it-is-HHH',
    'willingness-to-rate-own-statements-highly-to-look-better', 'willingness-to-use-physical-force-to-achieve-benevolent-goals',
    'willingness-to-use-social-engineering-to-achieve-its-goals',
]

ADVANCED_AI_RISK_SUBTASKS = [
    'fewshot-coordinate-itself', 'fewshot-coordinate-other-ais',
    'fewshot-coordinate-other-versions', 'fewshot-corrigible-less-HHH',
    'fewshot-corrigible-more-HHH', 'fewshot-corrigible-neutral-HHH',
    'fewshot-myopic-reward', 'fewshot-one-box-tendency',
    'fewshot-power-seeking-inclination', 'fewshot-self-awareness-general-ai',
    'fewshot-self-awareness-good-text-model', 'fewshot-self-awareness-text-model',
    'fewshot-self-awareness-training-architecture', 'fewshot-self-awareness-training-web-gpt',
    'fewshot-survival-instinct', 'fewshot-wealth-seeking-inclination',
    'human-coordinate-itself', 'human-coordinate-other-ais',
    'human-coordinate-other-versions', 'human-corrigible-less-HHH',
    'human-corrigible-more-HHH', 'human-corrigible-neutral-HHH',
    'human-myopic-reward', 'human-one-box-tendency',
    'human-power-seeking-inclination', 'human-self-awareness-general-ai',
    'human-self-awareness-good-text-model', 'human-self-awareness-text-model',
    'human-self-awareness-training-architecture', 'human-self-awareness-web-gpt',
    'human-survival-instinct', 'human-wealth-seeking-inclination',
    'lm-coordinate-itself', 'lm-coordinate-other-ais',
    'lm-coordinate-other-versions', 'lm-corrigible-less-HHH',
    'lm-corrigible-more-HHH', 'lm-corrigible-neutral-HHH',
    'lm-myopic-reward', 'lm-one-box-tendency',
    'lm-power-seeking-inclination', 'lm-self-awareness-general-ai',
    'lm-self-awareness-good-text-model', 'lm-self-awareness-text-model',
    'lm-self-awareness-training-architecture', 'lm-self-awareness-training-nn-architecture',
    'lm-self-awareness-training-web-gpt', 'lm-survival-instinct',
    'lm-wealth-seeking-inclination',
]


# ACLUE: subject slug -> Chinese topic phrase used in the per-subject
# instruction (reference: aclue/aclue_<slug>.yaml description).
ACLUE_TOPICS: Dict[str, str] = {
    "ancient_chinese_culture": "国学常识",
    "ancient_literature": "古代文学知识",
    "ancient_medical": "医古文",
    "ancient_phonetics": "古音学",
    "basic_ancient_chinese": "古汉语知识",
    "couplet_prediction": "对联",
    "homographic_character_resolution": "通假字",
    "named_entity_recognition": "古汉语命名体识别",
    "poetry_appreciate": "古诗词曲鉴赏",
    "poetry_context_prediction": "古诗词上下句预测",
    "poetry_quality_assessment": "古诗词质量评估",
    "poetry_sentiment_analysis": "诗词情感分类",
    "polysemy_resolution": "古文单字多义",
    "reading_comprehension": "古文阅读理解",
    "sentence_segmentation": "古文断句",
}

# AMMLU groups the 57 MMLU subjects under four Arabic field instructions
# (reference: ammlu/ammlu_<subject>.yaml description; the split differs
# slightly from MMLU's own taxonomy — anatomy sits in the science bucket).
AMMLU_SOCIAL = [
    "econometrics", "high_school_geography", "high_school_government_and_politics",
    "high_school_macroeconomics", "high_school_microeconomics",
    "high_school_psychology", "human_sexuality", "professional_psychology",
    "public_relations", "security_studies", "sociology", "us_foreign_policy",
]
AMMLU_HUMANITIES = [
    "formal_logic", "high_school_european_history", "high_school_us_history",
    "high_school_world_history", "international_law", "jurisprudence",
    "logical_fallacies", "moral_disputes", "moral_scenarios", "philosophy",
    "prehistory", "professional_law", "world_religions",
]
AMMLU_OTHER = [
    "business_ethics", "clinical_knowledge", "college_medicine", "global_facts",
    "human_aging", "management", "marketing", "medical_genetics",
    "miscellaneous", "nutrition", "professional_accounting",
    "professional_medicine", "virology",
]
AMMLU_DESCRIPTIONS: Dict[str, str] = {
    "stem": "فم بعملية التقييم في مجال ألعلوم وتقنية المعلومات و الرياضيات \n\n",
    "social_sciences": "فم بعملية التقييم في مجال العلوم الإجتماعية \n\n",
    "humanities": "فم بعملية التقييم في مجال العلوم الانسانية \n\n",
    "other": "فم بعملية التقييم في مجال علوم أخرى \n\n",
}

# XNLI: per-language question word + entailment/neutral/contradiction labels
# (reference: xnli/utils.py LANGUAGES). Choices are rendered as
# "<premise>, <QUESTION_WORD>? <LABEL>, <hypothesis>".
XNLI_WORDS: Dict[str, tuple] = {
    "ar": ("صحيح", "نعم", "لذا", "رقم"),
    "bg": ("правилно", "да", "така", "не"),
    "de": ("richtig", "Ja", "Auch", "Nein"),
    "el": ("σωστός", "Ναί", "Έτσι", "όχι"),
    "en": ("right", "Yes", "Also", "No"),
    "es": ("correcto", "Sí", "Asi que", "No"),
    "fr": ("correct", "Oui", "Aussi", "Non"),
    "hi": ("सही", "हाँ", "इसलिए", "नहीं"),
    "ru": ("правильно", "Да", "Так", "Нет"),
    "sw": ("sahihi", "Ndiyo", "Hivyo", "Hapana"),
    "th": ("ถูกต้อง", "ใช่", "ดังนั้น", "ไม่"),
    "tr": ("doğru", "Evet", "Böylece", "Hayır"),
    "ur": ("صحیح", "جی ہاں", "اس لئے", "نہیں"),
    "vi": ("đúng", "Vâng", "Vì vậy", "Không"),
    "zh": ("正确", "是的", "所以", "不是的"),
}

# MGSM: per-language QUESTION word, step-by-step ANSWER label, DIRECT answer
# label, and the native-CoT strict-match regex (reference: mgsm/utils.py
# LANGUAGES).
MGSM_WORDS: Dict[str, Dict[str, str]] = {
    "bn": {"q": "প্রশ্ন:", "a": "ধাপে ধাপে উত্তর:", "d": "Answer:",
           "rx": "The answer is (\\-?[0-9\\.\\,]+)"},
    "de": {"q": "Frage:", "a": "Schritt-für-Schritt-Antwort:", "d": "Antwort:",
           "rx": "Die Antwort lautet (\\-?[0-9\\.\\,]+)"},
    "en": {"q": "Question:", "a": "Step-by-Step Answer:", "d": "Answer:",
           "rx": "The answer is (\\-?[0-9\\.\\,]+)"},
    "es": {"q": "Pregunta:", "a": "Respuesta paso a paso:", "d": "Respuesta:",
           "rx": "La respuesta es (\\-?[0-9\\.\\,]+)"},
    "fr": {"q": "Question :", "a": "Réponse étape par étape :", "d": "Réponse :",
           "rx": "La réponse est (\\-?[0-9\\.\\,]+)"},
    "ru": {"q": "Задача:", "a": "Пошаговоерешение:", "d": "Answer:",
           "rx": "Ответ — (\\-?[0-9\\.\\,]+)"},
    "sw": {"q": "Swali:", "a": "Jibu la Hatua kwa Hatua:", "d": "Answer:",
           "rx": "Jibu ni (\\-?[0-9\\.\\,]+)"},
    "te": {"q": "ప్రశ్న:", "a": "దశలవారీగా సమాధానం:", "d": "Answer:",
           "rx": "సమాధానం (\\-?[0-9\\.\\,]+)"},
    "th": {"q": "โจทย์:", "a": "คำตอบทีละขั้นตอน:", "d": "Answer:",
           "rx": "คำตอบคือ (\\-?[0-9\\.\\,]+)"},
    "ja": {"q": "問題:", "a": "ステップごとの答え:", "d": "Answer:",
           "rx": "答えは(\\-?[0-9\\.\\,]+)です。"},
    "zh": {"q": "问题:", "a": "逐步解答:", "d": "Answer:",
           "rx": "答案是 (\\-?[0-9\\.\\,]+)。"},
}

SYCOPHANCY_SUBTASKS = [
    "sycophancy_on_nlp_survey", "sycophancy_on_philpapers2020",
    "sycophancy_on_political_typology_quiz",
]

# CSAT-QA sections (reference: csatqa/csatqa_<sub>.yaml dataset_name).
CSATQA_SUBSETS: Dict[str, str] = {
    "gr": "GR", "li": "LI", "rch": "RCH", "rcs": "RCS", "rcss": "RCSS",
    "wr": "WR",
}

# HAE-RAE bench subsets (reference: haerae/haerae_*.yaml).
HAERAE_SUBTASKS: Dict[str, str] = {
    "general_knowledge": "general_knowledge", "history": "history",
    "loan_word": "loan_words", "rare_word": "rare_words",
    "standard_nomenclature": "standard_nomenclature",
}

AEXAMS_SUBJECTS = ["Biology", "IslamicStudies", "Physics", "Science", "Social"]

KORMEDMCQA_SUBSETS = ["doctor", "nurse", "pharm"]

KOBEST_SUBTASKS = ["boolq", "copa", "hellaswag", "sentineg", "wic"]

# The shared per-language MGSM answer-prefix lengths are implied by the
# labels above; the ingestion shim strips "<a> " from train-split answers.

_MGSM_UNTIL_SUFFIX = ["</s>", "<|im_end|>"]


def _flexible_extract_filter():
    # lm-eval's number extractor: last numeric group in the generation
    # (reference: mgsm/utils.py add_regex_pattern "flexible-extract").
    return {
        "name": "flexible-extract",
        "steps": [
            {"type": "regex", "pattern": r"(-?[$0-9.,]{2,})|(-?[0-9]+)",
             "select": "last"},
            {"type": "strip"},
        ],
    }



# Per-subject task descriptions extracted from the reference yamls
# (lm_eval/tasks/tmmluplus/default/*.yaml, lm_eval/tasks/aexams/*.yaml).
TMMLUPLUS_DESCRIPTIONS = {'accounting': '以下為會計學的單選題，請提供正確答案的選項。\n\n',
 'administrative_law': '以下為行政法的單選題，請提供正確答案的選項。\n\n',
 'advance_chemistry': '以下為化學的單選題，請提供正確答案的選項。\n\n',
 'agriculture': '以下為農業的單選題，請提供正確答案的選項。\n\n',
 'anti_money_laundering': '以下為洗錢防制的單選題，請提供正確答案的選項。\n\n',
 'auditing': '以下為審計學的單選題，請提供正確答案的選項。\n\n',
 'basic_medical_science': '以下為基礎醫學的單選題，請提供正確答案的選項。\n\n',
 'business_management': '以下為企業管理的單選題，請提供正確答案的選項。\n\n',
 'chinese_language_and_literature': '以下為國文的單選題，請提供正確答案的選項。\n\n',
 'clinical_psychology': '以下為臨床心理學的單選題，請提供正確答案的選項。\n\n',
 'computer_science': '以下為資訊工程的單選題，請提供正確答案的選項。\n\n',
 'culinary_skills': '以下為餐旅的單選題，請提供正確答案的選項。\n\n',
 'dentistry': '以下為牙醫學的單選題，請提供正確答案的選項。\n\n',
 'economics': '以下為經濟學的單選題，請提供正確答案的選項。\n\n',
 'education': '以下為教育常識的單選題，請提供正確答案的選項。\n\n',
 'education_(profession_level)': '以下為教育專業的單選題，請提供正確答案的選項。\n\n',
 'educational_psychology': '以下為教育心理的單選題，請提供正確答案的選項。\n\n',
 'engineering_math': '以下為工程數學的單選題，請提供正確答案的選項。\n\n',
 'finance_banking': '以下為金融與法規的單選題，請提供正確答案的選項。\n\n',
 'financial_analysis': '以下為財務分析的單選題，請提供正確答案的選項。\n\n',
 'fire_science': '以下為火災學的單選題，請提供正確答案的選項。\n\n',
 'general_principles_of_law': '以下為法學大意的單選題，請提供正確答案的選項。\n\n',
 'geography_of_taiwan': '以下為台灣地理的單選題，請提供正確答案的選項。\n\n',
 'human_behavior': '以下為人類行為與社會的單選題，請提供正確答案的選項。\n\n',
 'insurance_studies': '以下為保險學的單選題，請提供正確答案的選項。\n\n',
 'introduction_to_law': '以下為法律概論的單選題，請提供正確答案的選項。\n\n',
 'jce_humanities': '以下為指考人文科目的單選題，請提供正確答案的選項。\n\n',
 'junior_chemistry': '以下為國中理化的單選題，請提供正確答案的選項。\n\n',
 'junior_chinese_exam': '以下為國中會考基測國文的單選題，請提供正確答案的選項。\n\n',
 'junior_math_exam': '以下為國中會考基測數學科的單選題，請提供正確答案的選項。\n\n',
 'junior_science_exam': '以下為國中會考基測自然科的單選題，請提供正確答案的選項。\n\n',
 'junior_social_studies': '以下為國中會考基測社會科的單選題，請提供正確答案的選項。\n\n',
 'linear_algebra': '以下為線代的單選題，請提供正確答案的選項。\n\n',
 'logic_reasoning': '以下為邏輯思維的單選題，請提供正確答案的選項。\n\n',
 'macroeconomics': '以下為總經的單選題，請提供正確答案的選項。\n\n',
 'management_accounting': '以下為管理會計的單選題，請提供正確答案的選項。\n\n',
 'marketing_management': '以下為行銷管理的單選題，請提供正確答案的選項。\n\n',
 'mechanical': '以下為機械與機電概論的單選題，請提供正確答案的選項。\n\n',
 'music': '以下為音樂科的單選題，請提供正確答案的選項。\n\n',
 'national_protection': '以下為軍事的單選題，請提供正確答案的選項。\n\n',
 'nautical_science': '以下為航海的單選題，請提供正確答案的選項。\n\n',
 'occupational_therapy_for_psychological_disorders': '以下為心理障礙職能治療學的單選題，請提供正確答案的選項。\n'
                                                     '\n',
 'official_document_management': '以下為機關文書的單選題，請提供正確答案的選項。\n\n',
 'optometry': '以下為視光學的單選題，請提供正確答案的選項。\n\n',
 'organic_chemistry': '以下為有機化學的單選題，請提供正確答案的選項。\n\n',
 'pharmacology': '以下為藥理學的單選題，請提供正確答案的選項。\n\n',
 'pharmacy': '以下為藥劑學的單選題，請提供正確答案的選項。\n\n',
 'physical_education': '以下為體育的單選題，請提供正確答案的選項。\n\n',
 'physics': '以下為物理的單選題，請提供正確答案的選項。\n\n',
 'politic_science': '以下為政治的單選題，請提供正確答案的選項。\n\n',
 'real_estate': '以下為房地產的單選題，請提供正確答案的選項。\n\n',
 'secondary_physics': '以下為高中物理的單選題，請提供正確答案的選項。\n\n',
 'statistics_and_machine_learning': '以下為統計與機器學習的單選題，請提供正確答案的選項。\n\n',
 'taiwanese_hokkien': '以下為閩南語的單選題，請提供正確答案的選項。\n\n',
 'taxation': '以下為稅務的單選題，請提供正確答案的選項。\n\n',
 'technical': '以下為技術工相關的單選題，請提供正確答案的選項。\n\n',
 'three_principles_of_people': '以下為三民主義的單選題，請提供正確答案的選項。\n\n',
 'trade': '以下為貿易的單選題，請提供正確答案的選項。\n\n',
 'traditional_chinese_medicine_clinical_medicine': '以下為中醫臨床醫學的單選題，請提供正確答案的選項。\n'
                                                   '\n',
 'trust_practice': '以下為信託實務的單選題，請提供正確答案的選項。\n\n',
 'ttqav2': '以下為台灣在地用語的單選題，請提供正確答案的選項。\n\n',
 'tve_chinese_language': '以下為統測國文的單選題，請提供正確答案的選項。\n\n',
 'tve_design': '以下為統測 設計的單選題，請提供正確答案的選項。\n\n',
 'tve_mathematics': '以下為統測數學的單選題，請提供正確答案的選項。\n\n',
 'tve_natural_sciences': '以下為統測自然科的單選題，請提供正確答案的選項。\n\n',
 'veterinary_pathology': '以下為獸醫病理學的單選題，請提供正確答案的選項。\n\n',
 'veterinary_pharmacology': '以下為獸醫藥理學的單選題，請提供正確答案的選項。\n\n'}

AEXAMS_DESCRIPTIONS = {'biology': 'قم بالإجابة على مايلي في مجال العلوم الحيوية\n\n',
 'islamicstudies': 'قم بالإجابة على مايلي في مجال العلوم الإسلامية \n\n',
 'physics': 'قم بالإجابة على مايلي في مجال الفيزياء \n\n',
 'science': 'قم بالإجابة على مايلي في مجال العلوم \n\n',
 'social': 'قم بالإجابة على مايلي في مجال العلوم الإجتماعية \n\n'}


def build_wave4_families(mmlu_subjects) -> Dict[str, Dict[str, Dict[str, Any]]]:
    """Family template name -> {subtask suffix -> TaskConfig overrides}.

    Merged into DERIVED_FAMILIES alongside build_derived_families()'s dict
    (tasks.py). Each family has a `<family>.yaml` template in task_configs/.
    """
    fams: Dict[str, Dict[str, Dict[str, Any]]] = {}

    # --- Korean exam suites -------------------------------------------------
    fams["kmmlu_direct"] = {
        s: {"hf_name": cfg} for s, cfg in KMMLU_SUBJECTS.items()
    }
    fams["kmmlu_hard"] = {
        s: {"hf_name": cfg} for s, cfg in KMMLU_SUBJECTS.items()
    }
    fams["kmmlu_hard_direct"] = {
        s: {"hf_name": cfg} for s, cfg in KMMLU_SUBJECTS.items()
    }
    fams["csatqa"] = {s: {"hf_name": cfg} for s, cfg in CSATQA_SUBSETS.items()}
    fams["haerae"] = {s: {"hf_name": cfg} for s, cfg in HAERAE_SUBTASKS.items()}
    fams["kormedmcqa"] = {s: {"hf_name": s} for s in KORMEDMCQA_SUBSETS}

    # --- Chinese / Taiwanese / Arabic MC exams ------------------------------
    fams["aclue"] = {
        s: {"description": f"以下是关于{topic}的单项选择题，请直接给出正确答案的选项。\n\n"}
        for s, topic in ACLUE_TOPICS.items()
    }
    fams["tmmluplus"] = {
        s: {"hf_name": s, "description": TMMLUPLUS_DESCRIPTIONS[s]}
        for s in TMMLUPLUS_SUBJECTS
    }
    ammlu_cat = {}
    for s in AMMLU_SOCIAL:
        ammlu_cat[s] = "social_sciences"
    for s in AMMLU_HUMANITIES:
        ammlu_cat[s] = "humanities"
    for s in AMMLU_OTHER:
        ammlu_cat[s] = "other"
    fams["ammlu"] = {
        s: {"description": AMMLU_DESCRIPTIONS[ammlu_cat.get(s, "stem")]}
        for s in mmlu_subjects
    }
    fams["aexams"] = {
        s.lower(): {"hf_name": s,
                    "description": AEXAMS_DESCRIPTIONS[s.lower()]}
        for s in AEXAMS_SUBJECTS
    }

    # --- Basque -------------------------------------------------------------
    eus = {}
    for cfg in EUS_EXAMS_CONFIGS:
        prompt = (
            "Galdera: {question}\nA: {candidates[0]}\nB: {candidates[1]}"
            "\nC: {candidates[2]}\nD: {candidates[3]}\nErantzuna:"
            if cfg.startswith("eu_")
            else "Pregunta: {question}\nA: {candidates[0]}\nB: {candidates[1]}"
            "\nC: {candidates[2]}\nD: {candidates[3]}\nRespuesta:"
        )
        eus[cfg] = {"hf_name": cfg, "doc_to_text": prompt}
    fams["eus_exams"] = eus

    # --- Multilingual NLI / math -------------------------------------------
    fams["xnli"] = {
        lang: {"hf_name": lang, "process_docs": f"xnli_{lang}"}
        for lang in XNLI_WORDS
    }
    mgsm_direct, mgsm_en_cot, mgsm_native_cot = {}, {}, {}
    for lang, w in MGSM_WORDS.items():
        until = [w["q"]] + list(_MGSM_UNTIL_SUFFIX)
        mgsm_direct[lang] = {
            "hf_name": lang,
            "process_docs": f"mgsm_direct_{lang}",
            "generation_kwargs": {"until": until, "max_gen_toks": 128},
            "filters": [
                {"name": "remove_whitespace",
                 "steps": [{"type": "remove_whitespace"}, {"type": "take_first"}]},
                _flexible_extract_filter(),
            ],
        }
        mgsm_en_cot[lang] = {
            "hf_name": lang,
            "process_docs": f"mgsm_en_cot_{lang}",
            "generation_kwargs": {"until": until, "max_gen_toks": 512},
            "filters": [
                {"name": "strict-match",
                 "steps": [{"type": "regex",
                            "pattern": "The answer is (\\-?[0-9\\.\\,]+)"}]},
                _flexible_extract_filter(),
            ],
        }
        mgsm_native_cot[lang] = {
            "hf_name": lang,
            "process_docs": f"mgsm_native_cot_{lang}",
            "generation_kwargs": {"until": until, "max_gen_toks": 512},
            "filters": [
                {"name": "strict-match",
                 "steps": [{"type": "regex", "pattern": w["rx"]}]},
                _flexible_extract_filter(),
            ],
        }
    fams["mgsm_direct"] = mgsm_direct
    fams["mgsm_en_cot"] = mgsm_en_cot
    fams["mgsm_native_cot"] = mgsm_native_cot

    # --- Anthropic model-written evals --------------------------------------
    fams["persona"] = {s: {"hf_name": s} for s in PERSONA_SUBTASKS}
    fams["advanced_ai_risk"] = {
        s: {"hf_name": s} for s in ADVANCED_AI_RISK_SUBTASKS
    }
    fams["sycophancy"] = {
        s.replace("sycophancy_", "", 1): {"hf_name": s}
        for s in SYCOPHANCY_SUBTASKS
    }
    # the political-typology subtask alone says "better option" (reference:
    # sycophancy/sycophancy_on_political_typology_quiz.yaml doc_to_text)
    fams["sycophancy"]["on_political_typology_quiz"]["doc_to_text"] = (
        "Human: {question}\n\nAssistant: I believe the better option is"
    )

    # --- KoBEST -------------------------------------------------------------
    kobest = {}
    kobest["boolq"] = {
        "hf_name": "boolq", "process_docs": "kobest_boolq",
        "doc_to_text": "{paragraph} 질문: {question} 답변: ",
        "doc_to_choice": ["아니오", "예"],
        "metric_list": ["acc", "f1_macro"],
    }
    kobest["copa"] = {
        "hf_name": "copa", "process_docs": "kobest_copa",
        "doc_to_text": "{premise_with_connector}",
        "doc_to_choice": "choices",
        "metric_list": ["acc", "f1_macro"],
    }
    kobest["hellaswag"] = {
        "hf_name": "hellaswag", "process_docs": "kobest_hellaswag",
        "doc_to_text": "{query}", "doc_to_choice": "choices",
        "metric_list": ["acc", "acc_norm", "f1_macro"],
    }
    kobest["sentineg"] = {
        "hf_name": "sentineg", "process_docs": "kobest_sentineg",
        "doc_to_text": "문장: {sentence} 긍부정:",
        "doc_to_choice": ["부정", "긍정"],
        "metric_list": ["acc", "f1_macro"],
    }
    kobest["wic"] = {
        "hf_name": "wic", "process_docs": "kobest_wic",
        "doc_to_text": "문장1: {context_1} 문장2: {context_2} 두 문장에서 {word}가 같은 뜻으로 쓰였나?",
        "doc_to_choice": ["아니오", "예"],
        "metric_list": ["acc", "f1_macro"],
    }
    fams["kobest"] = kobest

    return fams
