"""Dataset-ingestion layer tests (reference: lm_eval Task.download +
per-task process_docs shims) — all network access is mocked; the tests
verify the cold-cache path end-to-end: fake HF rows -> shim -> cached
jsonl -> evaluated task."""

import json
import os
import sys
import types

import pytest

from retrieval_scaling_tpu.rag_eval import ingest
from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
from retrieval_scaling_tpu.rag_eval.models import DummyLM
from retrieval_scaling_tpu.rag_eval.tasks import get_task


# ---------------------------------------------------------------- fixtures
# Raw rows in each HF dataset's REAL schema (one or two per split is enough).
HF_FIXTURES = {
    ("nq_open", None): {
        "validation": [
            {"question": "who wrote hamlet", "answer": ["William Shakespeare", "Shakespeare"]},
            {"question": "when was the moon landing?", "answer": ["1969"]},
        ]
    },
    ("trivia_qa", "rc.nocontext"): {
        "validation": [
            {"question": "Capital of France?", "answer": {"value": "Paris", "aliases": ["Paris", "City of Light"]}},
        ]
    },
    ("gsm8k", "main"): {
        "test": [{"question": "2+2?", "answer": "2+2 = <<2+2=4>>4\n#### 4"}],
        "train": [{"question": "1+1?", "answer": "1+1 = 2\n#### 2"}],
    },
    ("cais/mmlu", "abstract_algebra"): {
        "test": [{"question": "Order of Z_5? ", "choices": ["5", "6", "7", "8"], "answer": 0}],
    },
    ("hellaswag", None): {
        "validation": [
            {
                "activity_label": "Cooking",
                "ctx_a": "The chef preheats the oven.",
                "ctx_b": "then she",
                "endings": ["bakes [title] the bread.", "eats the oven.", "flies away.", "sings."],
                "label": "0",
            }
        ]
    },
    ("allenai/ai2_arc", "ARC-Easy"): {
        "test": [
            {"question": "What melts ice?", "choices": {"text": ["heat", "cold", "dark", "wind"], "label": ["A", "B", "C", "D"]}, "answerKey": "A"},
            {"question": "Numeric key?", "choices": {"text": ["x", "y", "z", "w"], "label": ["1", "2", "3", "4"]}, "answerKey": "3"},
        ],
        "validation": [
            {"question": "What freezes water?", "choices": {"text": ["cold", "heat"], "label": ["A", "B"]}, "answerKey": "A"},
        ],
    },
    ("super_glue", "boolq"): {
        "validation": [{"passage": "Cats are mammals.", "question": "are cats mammals?", "label": 1}]
    },
    ("piqa", None): {
        "validation": [{"goal": "open a jar", "sol1": "twist the lid", "sol2": "stare at it", "label": 0}]
    },
    ("winogrande", "winogrande_xl"): {
        "validation": [
            {"sentence": "The trophy doesn't fit in the case because _ is too big.", "option1": "the trophy", "option2": "the case", "answer": "1"}
        ]
    },
    ("truthful_qa", "multiple_choice"): {
        "validation": [
            {
                "question": "What happens if you crack your knuckles?",
                "mc1_targets": {"choices": ["Nothing much", "You get arthritis"], "labels": [1, 0]},
                "mc2_targets": {"choices": ["Nothing much", "Maybe noise", "You get arthritis"], "labels": [1, 1, 0]},
            }
        ]
    },
    ("openbookqa", "main"): {
        "test": [{"question_stem": "A magnet attracts", "choices": {"text": ["iron", "wood", "glass", "water"], "label": ["A", "B", "C", "D"]}, "answerKey": "A"}]
    },
    ("sciq", None): {
        "test": [{"support": " Photosynthesis needs light.", "question": "What do plants need?", "distractor1": "dark", "distractor2": "salt", "distractor3": "sand", "correct_answer": "light"}]
    },
    ("EleutherAI/lambada_openai", "default"): {
        "test": [{"text": "He opened the door and saw the cat"}]
    },
    ("web_questions", None): {
        "test": [{"question": "where is paris?", "answers": ["France"]}]
    },
    ("squad", None): {
        "validation": [{"context": "Paris is in France.", "question": "Where is Paris?", "answers": {"text": ["France"], "answer_start": [12]}}]
    },
    ("EleutherAI/race", "high"): {
        "test": [{"article": "Long article.", "problems": "[{'question': 'Prior q?', 'options': ['p1', 'p2', 'p3', 'p4'], 'answer': 'B'}, {'question': 'What is it?', 'options': ['long', 'short', 'blue', 'red'], 'answer': 'A'}]"}]
    },
    ("super_glue", "copa"): {
        "validation": [{"premise": "The man felt tired.", "question": "cause", "choice1": "He worked all night.", "choice2": "He slept well.", "label": 0}]
    },
    ("EleutherAI/coqa", None): {
        "validation": [
            {
                "story": "Once upon a time there was a dog.",
                "questions": ["What animal?", "Was it happy?"],
                "answers": {"input_text": ["a dog", "yes"]},
            }
        ]
    },
    ("EleutherAI/drop", None): {
        "validation": [{"passage": "There were 3 cats and 2 dogs.", "question": "How many cats?", "answers_spans": {"spans": ["3"]}}]
    },
    ("EleutherAI/wikitext_document_level", "wikitext-2-raw-v1"): {
        "test": [{"page": "A long wikipedia document about testing. " * 5}, {"page": "   "}]
    },
    ("social_i_qa", None): {
        "validation": [{"context": "Sam helped Alex.", "question": "Why?", "answerA": "kindness", "answerB": "spite", "answerC": "boredom", "label": "1"}]
    },
    ("commonsense_qa", None): {
        "validation": [{"question": "Where do you keep milk?", "choices": {"text": ["fridge", "oven", "car", "shed", "sky"], "label": ["A", "B", "C", "D", "E"]}, "answerKey": "A"}]
    },
    # ---- round-3 long tail families
    ("alexandrainst/m_arc", "ar"): {
        "test": [{"instruction": "سؤال [title]", "option_a": "أ", "option_b": "ب", "option_c": "ج", "option_d": "د", "option_e": None, "answer": "B"}]
    },
    ("alexandrainst/m_mmlu", "en"): {
        "test": [{"instruction": " What is 2+2? ", "option_a": "4", "option_b": "5", "option_c": "6", "option_d": "7", "answer": "a"}],
        "train": [{"instruction": "What is 1+1?", "option_a": "2", "option_b": "3", "option_c": "4", "option_d": "5", "answer": "a"}],
    },
    ("alexandrainst/m_truthfulqa", "ar"): {
        "val": [{"question": "سؤال؟", "mc1_targets": {"choices": ["صحيح", "خطأ"], "labels": [1, 0]}, "mc2_targets": {"choices": ["صحيح", "ربما", "خطأ"], "labels": [1, 1, 0]}}]
    },
    ("ceval/ceval-exam", "computer_network"): {
        "val": [{"question": " OSI 有几层？ ", "A": "5", "B": "6", "C": "7", "D": "8", "answer": "C"}],
        "dev": [{"question": "TCP 是什么？", "A": "协议", "B": "硬件", "C": "语言", "D": "系统", "answer": "A"}],
    },
    ("haonan-li/cmmlu", "agronomy"): {
        "test": [{"Question": "水稻属于？", "A": "禾本科", "B": "豆科", "C": "菊科", "D": "茄科", "Answer": "A"}],
        "dev": [{"Question": "小麦属于？", "A": "禾本科", "B": "豆科", "C": "菊科", "D": "茄科", "Answer": "A"}],
    },
    ("hails/bigbench", "anachronisms_zero_shot"): {
        "default": [
            {"inputs": "Is this an anachronism? ...", "targets": ["Yes"], "multiple_choice_targets": ["Yes", "No"], "multiple_choice_scores": [1, 0]},
            {"inputs": "no mc targets row", "targets": ["x"], "multiple_choice_targets": [], "multiple_choice_scores": []},
        ]
    },
    ("hails/bigbench", "word_sorting_zero_shot"): {
        "default": [
            {"inputs": "Sort: b a", "targets": ["a b"], "multiple_choice_targets": [], "multiple_choice_scores": []},
        ]
    },
    # ---- family ingestion wave 2
    ("blimp", "adjunct_island"): {
        "train": [{"sentence_good": "Who did you see?", "sentence_bad": "Who did you see him?"}]
    },
    ("glue", "rte"): {
        "validation": [{"sentence1": "A dog barked.", "sentence2": "An animal made noise.", "label": 0}]
    },
    ("glue", "mnli"): {
        "validation_matched": [{"premise": "A man eats.", "hypothesis": "Someone eats.", "label": 0}]
    },
    ("anli", None): {
        "test_r2": [{"premise": "P.", "hypothesis": "H.", "label": 1}],
        "dev_r1": [{"premise": "D1.", "hypothesis": "H1.", "label": 0}],
        "dev_r2": [{"premise": "D2.", "hypothesis": "H2.", "label": 1}],
        "dev_r3": [{"premise": "D3.", "hypothesis": "H3.", "label": 2}],
    },
    ("lukaemon/bbh", "navigate"): {
        "test": [{"input": "Take 3 steps...", "target": "Yes"}]
    },
    ("lukaemon/bbh", "word_sorting"): {
        "test": [{"input": "Sort the following words alphabetically: List: "
                           "burly bela arapaho",
                  "target": "arapaho bela burly"}]
    },
    ("wmt14", "fr-en"): {
        "test": [{"translation": {"fr": "le chat", "en": "the cat"}}],
        "validation": [{"translation": {"fr": "bonjour", "en": "hello"}}],
    },
    ("EleutherAI/pile", "pile_enron"): {
        "train": [{"text": "Subject: meeting moved to tuesday"}],
    },
    ("tau/scrolls", "qasper"): {
        "validation": [
            {"input": "Is the model supervised?\n\nLong paper body.",
             "output": "Yes."},
            {"input": "Which dataset is used?\n\nLong paper body.",
             "output": "the squad dataset"},
        ],
    },
    ("unitxt/data",
     "card=cards.ag_news,template=templates.classification.multi_class.title"): {
        "test": [{"source": "Classify: stocks rally.", "target": "Business"}],
    },
    ("facebook/belebele", "eng_Latn"): {
        "test": [{"flores_passage": "A passage.", "question": "Q?", "mc_answer1": "a", "mc_answer2": "b", "mc_answer3": "c", "mc_answer4": "d", "correct_answer_num": "2"}]
    },
    ("xcopa", "sw"): {
        "validation": [{"premise": "Mvua ilinyesha.", "choice1": "Alibeba mwavuli.", "choice2": "Alilala.", "question": "effect", "label": 0}]
    },
    ("juletxara/xstory_cloze", "eu"): {
        "eval": [{"input_sentence_1": "s1", "input_sentence_2": "s2", "input_sentence_3": "s3", "input_sentence_4": "s4", "sentence_quiz1": "good", "sentence_quiz2": "bad", "answer_right_ending": 1}]
    },
    ("paws-x", "ja"): {
        "test": [{"sentence1": "A", "sentence2": "B", "label": 1}]
    },
    ("EleutherAI/hendrycks_math", "number_theory"): {
        "test": [{"problem": "Find x.", "solution": "We see $x=\\boxed{4}$."}]
    },
    ("cais/wmdp", "wmdp-bio"): {
        "test": [{"question": "Q?", "choices": ["w", "x", "y", "z"], "answer": 2}]
    },
    ("hails/agieval-aqua-rat", None): {
        "test": [{"query": "Q: pick\nAnswer Choices: (A)1 (B)2", "choices": ["(A)1", "(B)2"], "gold": [1]}]
    },
    ("Idavidrein/gpqa", "gpqa_main"): {
        "train": [{"Question": "Hard q?", "Correct Answer": "right", "Incorrect Answer 1": "w1", "Incorrect Answer 2": "w2", "Incorrect Answer 3": "w3"}]
    },
    ("super_glue", "record"): {
        "validation": [{
            "passage": "Intro.\n@highlight\nkey fact",
            "query": "@placeholder did it", "entities": ["Alice", "Bob"],
            "answers": ["Bob"], "idx": {"passage": 0, "query": 0},
        }]
    },
    ("super_glue", "wsc"): {
        "validation": [{
            "text": "Mark told Pete many lies about himself .",
            "span1_text": "Mark", "span1_index": 0,
            "span2_text": "himself", "span2_index": 5, "label": 0,
        }]
    },
    ("super_glue", "multirc"): {
        "validation": [{
            "paragraph": "Para text.", "question": "Q?", "answer": "cand",
            "label": 1, "idx": {"question": 7, "answer": 0},
        }]
    },
    ("BigScienceBiasEval/crows_pairs_multilingual", "english"): {
        "test": [
            {"sent_more": "stereo", "sent_less": "anti", "bias_type": "race-color"},
            {"sent_more": "s2", "sent_less": "a2", "bias_type": "age"},
        ]
    },
    ("truthful_qa", "generation"): {
        "validation": [{
            "question": "Sky color? ",
            "correct_answers": ["The sky is blue"],
            "incorrect_answers": ["The sky is green."],
        }]
    },
    ("hitachi-nlp/FLD.v2", "star"): {
        "test": [{"prompt_serial": "facts...", "hypothesis_formula": "Ha",
                  "context_formula": "Fa", "world_assump_label": "PROVED"}]
    },
    ("EleutherAI/arithmetic", "arithmetic_2da"): {
        "validation": [{"context": "Question: What is 11 plus 22?\nAnswer:", "completion": " 33"}]
    },
    ("math_qa", None): {
        "test": [{"Problem": "2+2?", "options": "a ) 1 , b ) 4 , c ) 3 , d ) 9 , e ) none", "correct": "b"}]
    },
    ("bigbio/pubmed_qa", "pubmed_qa_labeled_fold0_source"): {
        "test": [{"QUESTION": "Does it work?", "CONTEXTS": ["Ctx one.", "Ctx two."], "final_decision": "yes"}]
    },
    ("glue", "cola"): {
        "validation": [{"sentence": "The boy runs.", "label": 1}]
    },
    ("orai-nlp/basqueGLUE", "bec"): {
        "test": [{"text": "Oso ona!", "label": 2}],
        "validation": [{"text": "Txarra da.", "label": 0}],
    },
    ("orai-nlp/basqueGLUE", "coref"): {
        "test": [{"text": "Jon etorri da gaur", "span1_index": 0,
                  "span1_text": "Jon", "span2_index": 3, "span2_text": "da",
                  "label": 1}],
        "validation": [],
    },
    ("orai-nlp/basqueGLUE", "wic"): {
        "test": [{"sentence1": "Burua mina dut .", "sentence2": "Taldeko burua da .",
                  "word": "burua", "label": 0}],
        "validation": [],
    },
    ("HiTZ/EusProficiency", None): {
        "test": [{"question": "Zein da zuzena?",
                  "candidates": ["bat", "bi", "hiru", "lau"], "answer": 1}]
    },
    ("HiTZ/EusTrivia", None): {
        "test": [{"question": "Non dago Bilbo?",
                  "candidates": ["Bizkaian", "Gipuzkoan", "Araban"], "answer": 0}]
    },
    ("Iker/NoticIA", None): {
        "test": [{"web_headline": "No creerás esto",
                  "web_text": "El gato durmió todo el día.",
                  "summary": "El gato durmió."}]
    },
    ("pbevan11/EQ-Bench", None): {
        "validation": [{
            "prompt": "Rate the emotions...",
            "reference_answer_fullscale": str({
                "emotion1": "Surprise", "emotion1_score": 3,
                "emotion2": "Anger", "emotion2_score": 7,
                "emotion3": "Joy", "emotion3_score": 0,
                "emotion4": "Fear", "emotion4_score": 2,
            }),
        }]
    },
    ("allenai/real-toxicity-prompts", None): {
        "train": [{"prompt": {"text": "So I said to him"}}]
    },
    ("CM/codexglue_code2text_python", None): {
        "test": [{"code_tokens": ["def", "add", "(", "a", ",", "b", ")", ":"],
                  "docstring_tokens": ["Add", "two", "numbers", "."]}],
        "train": [],
    },
    ("tinyBenchmarks/tinyMMLU", "all"): {
        "test": [{"input_formatted": "Q: 2+2?\nA. 4\nB. 5\nC. 6\nD. 7\nAnswer:",
                  "answer": 0}],
        "dev": [],
    },
    ("tinyBenchmarks/tinyAI2_arc", "ARC-Challenge"): {
        "test": [{"question": "Hard one?", "choices": {
            "text": ["yes", "no", "maybe", "never"],
            "label": ["A", "B", "C", "D"]}, "answerKey": "B"}],
        "validation": [],
    },
    ("haryoaw/COPAL", "id"): {
        "test": [{"premise": "Dia lapar.", "question": "cause",
                  "choice1": "Dia belum makan.", "choice2": "Dia tidur.",
                  "label": 0}],
        "test_colloquial": [{"premise": "Dia laper banget.", "question": "effect",
                             "choice1": "Makan dulu.", "choice2": "Tidur aja.",
                             "label": 0}],
    },
    ("maximegmd/glianorex", None): {
        "train": [
            {"question": "Role of the Glianorex?",
             "options": {"A": "hormones", "B": "bones", "C": "skin", "D": "teeth"},
             "answer_idx": 0, "language": "en"},
            {"question": "Rôle du Glianorex?",
             "options": {"A": "hormones", "B": "os", "C": "peau", "D": "dents"},
             "answer_idx": 0, "language": "fr"},
        ]
    },
    ("HiTZ/xnli-eu", "eu"): {
        "test": [{"premise": "Gizona jaten ari da",
                  "hypothesis": "Norbait jaten ari da", "label": 0}]
    },
    ("Hennara/copa_ar", None): {
        "test": [{"query": "الرجل شعر بالتعب", "sol1": "عمل طوال الليل",
                  "sol2": "نام جيدا", "label": 0}]
    },
    ("EleutherAI/asdiv", None): {
        "validation": [{"body": "Tom has 3 apples and buys 2 more.",
                        "question": "How many apples?", "answer": "5 (apples)"}]
    },
    ("marcob/lambada_multilingual", "de"): {
        "test": [{"text": "Er öffnete die Tür und sah die Katze"}]
    },
    ("manu/french_bench_arc_challenge", None): {
        "test": [{"question": "Quelle couleur?", "choices": ["bleu", "vert", "rouge", "noir"], "answerKey": "A"}],
        "validation": [],
    },
    ("manu/fquad2_test", None): {
        "test": [
            {"context": "Paris est en France.", "question": "Où est Paris?",
             "answers": {"text": ["France"], "answer_start": [17]},
             "is_impossible": False},
            {"context": "Paris est en France.", "question": "Où est Rome?",
             "answers": {"text": [], "answer_start": []}, "is_impossible": True},
        ],
        "valid": [],
        "test_hasAns": [
            {"context": "Paris est en France.", "question": "Où est Paris?",
             "answers": {"text": ["France"], "answer_start": [17]},
             "is_impossible": False},
        ],
        "valid_hasAns": [],
    },
    ("manu/french-bench-grammar-vocab-reading", None): {
        "Grammar": [{"question": "Il <...> une pomme.", "answerA": "mange",
                     "answerB": "manges", "answerC": "mangent", "answerD": "mangez",
                     "answer": "A", "context": ""}],
        "Reading": [{"question": "Le texte parle de", "answerA": "chats",
                     "answerB": "chiens", "answerC": "vaches", "answerD": "poules",
                     "answer": "A", "context": "Les chats dorment."}],
    },
    ("manu/french-trivia", None): {
        "train": [{"Question": "Capitale de la France?", "Answer": "Paris"}]
    },
    ("asi/wikitext_fr", "wikitext-35"): {
        "test": [{"paragraph": "Le chat @-@ noir dort ."}, {"paragraph": "  "}]
    },
    ("xnli", "fr"): {
        "test": [{"premise": "Un homme mange.", "hypothesis": "Quelqu'un mange.",
                  "label": 0}],
        "validation": [],
    },
    ("allegro/klej-polemo2-in", None): {
        "test": [
            {"sentence": "Świetny produkt.", "target": "__label__meta_plus_m"},
            {"sentence": "Fatalna obsługa.", "target": "__label__meta_minus_m"},
        ],
        "train": [],
    },
    ("allegro/klej-polemo2-out", None): {
        "test": [{"sentence": "Neutralna opinia.", "target": "__label__meta_zero"}],
        "train": [],
    },
}


class _FakeDatasets:
    """Stands in for the `datasets` module: load_dataset -> dict of splits."""

    def __init__(self):
        self.calls = []

    def load_dataset(self, path, name=None, **kwargs):
        self.calls.append((path, name))
        key = (path, name)
        if key not in HF_FIXTURES:
            raise KeyError(f"no fixture for {key}")
        return HF_FIXTURES[key]


@pytest.fixture
def fake_hf(monkeypatch):
    fake = _FakeDatasets()
    module = types.ModuleType("datasets")
    module.load_dataset = fake.load_dataset
    monkeypatch.setitem(sys.modules, "datasets", module)
    return fake


# ---------------------------------------------------------------- cold cache
FLAGSHIP = [
    "nq_open", "triviaqa", "gsm8k", "mmlu_abstract_algebra", "hellaswag",
    "arc_easy", "boolq", "piqa", "winogrande", "truthfulqa_mc1",
    "truthfulqa_mc2", "openbookqa", "sciq", "lambada_openai", "webqs",
    "squad", "race", "copa", "coqa", "drop", "wikitext", "social_iqa",
    "commonsense_qa",
    # round-3 long tail: okapi multilingual, Chinese suites, bigbench
    "arc_ar", "m_mmlu_en", "truthfulqa_ar_mc1", "truthfulqa_ar_mc2",
    "ceval-valid_computer_network", "cmmlu_agronomy",
    "bigbench_anachronisms_multiple_choice",
    "bigbench_word_sorting_generate_until",
    # family ingestion wave 2
    "blimp_adjunct_island", "mnli", "anli_r2", "bbh_zeroshot_navigate",
    "belebele_eng_Latn", "xcopa_sw", "xstorycloze_eu", "paws_ja",
    "hendrycks_math_num_theory", "wmdp_bio", "agieval_aqua_rat",
    "gpqa_main", "arithmetic_2da", "mathqa", "pubmedqa", "cola",
    # wave 5: BasqueGLUE, Eus suites, NoticIA, EQ-Bench
    "bec2016eu", "epec_koref_bin", "wiceu", "eus_proficiency", "eus_trivia",
    "noticia", "eq_bench",
    # wave 5 batch B: CodeXGLUE, tinyBenchmarks, COPAL-ID, Glianorex,
    # XNLIeu, ALGhafa, ASDiv, StableLM LAMBADA
    "code2text_python", "tinyMMLU", "copal_id_standard",
    "copal_id_colloquial", "glianorex_fr", "xnli_eu", "copa_ar", "asdiv",
    "lambada_openai_mt_stablelm_de",
    # wave 5: french_bench
    "french_bench_arc_challenge", "french_bench_fquadv2",
    "french_bench_fquadv2_bool", "french_bench_fquadv2_hasAns",
    "french_bench_fquadv2_genq", "french_bench_grammar",
    "french_bench_reading_comp", "french_bench_trivia",
    "french_bench_wikitext_fr", "french_bench_xnli",
    # wave 6
    "social_iqa", "polemo2_in", "polemo2_out",
    "anli_r1_flan_prompt-0", "arc_easy_flan_prompt-1",
    "boolq_flan_prompt-2", "rte_flan_prompt-0",
    # session 5: BBH/MMLU prompt variants, translation, pile, qasper, unitxt
    "bbh_cot_zeroshot_word_sorting", "bbh_fewshot_word_sorting",
    "mmlu_flan_n_shot_loglikelihood_abstract_algebra",
    "mmlu_flan_cot_fewshot_abstract_algebra",
    "wmt14_fr_en", "pile_enron", "scrolls_qasper", "unitxt_ag_news",
    # session 5 continued: ReCoRD, T5 prompts, crows categories, gpqa
    # styles, mmlu continuation/generative, tqa gen, fld formula
    # (canonical names — results tables key on these)
    "record", "super_glue_record_t5_prompt", "super_glue_wsc_t5_prompt",
    "super_glue_multirc_t5_prompt", "crows_pairs_english_race_color",
    "gpqa_cot_zeroshot_main", "mmlu_continuation_abstract_algebra",
    "mmlu_generative_abstract_algebra", "truthfulqa_gen",
    "fld_logical_formula_star", "gsm8k_cot_zeroshot",
]


def test_cold_cache_end_to_end(fake_hf, tmp_path):
    """No hand-prepped files anywhere: every flagship task must download
    (mocked), shim, cache, and produce numbers (VERDICT done-condition)."""
    cache = str(tmp_path / "cache")
    res = simple_evaluate(
        DummyLM(), FLAGSHIP, data_root=str(tmp_path / "empty"), cache_dir=cache,
        bootstrap_iters=0,
    )
    assert set(res["results"]) == set(FLAGSHIP)
    for name in FLAGSHIP:
        assert res["results"][name]["samples"] >= 1, name
    # cache files exist with the task's own schema
    assert os.path.exists(os.path.join(cache, "nq_open", "validation.jsonl"))
    assert os.path.exists(os.path.join(cache, "mmlu", "abstract_algebra", "test.jsonl"))

    # warm cache: no further network calls
    n_calls = len(fake_hf.calls)
    simple_evaluate(
        DummyLM(), ["nq_open", "boolq"], data_root=str(tmp_path / "empty"),
        cache_dir=cache, bootstrap_iters=0,
    )
    assert len(fake_hf.calls) == n_calls


def test_gsm8k_fewshot_from_train_split(fake_hf, tmp_path):
    """gsm8k's 5-shot sampling must also ingest the train split on demand."""
    cache = str(tmp_path / "cache")
    res = simple_evaluate(
        DummyLM(), ["gsm8k"], cache_dir=cache, num_fewshot=1, bootstrap_iters=0,
    )
    assert res["results"]["gsm8k"]["samples"] == 1


# ---------------------------------------------------------------- shims
def test_shim_winogrande_contexts_and_shared_suffix():
    """Reference conditioning: choices are CONTEXT variants (prefix+option)
    and the target is the shared suffix — P(suffix | prefix+option)."""
    doc = ingest.PROCESS_DOCS["winogrande"](
        {"sentence": "The trophy doesn't fit because _ is big.",
         "option1": "the trophy", "option2": "the case", "answer": "2"}
    )
    assert doc["ctx_options"] == [
        "The trophy doesn't fit because the trophy",
        "The trophy doesn't fit because the case",
    ]
    assert doc["target"] == "is big."
    assert doc["gold"] == 1
    assert doc["query"] == "The trophy doesn't fit because the case"


def test_shim_hellaswag_preprocess():
    doc = ingest.PROCESS_DOCS["hellaswag"](
        HF_FIXTURES[("hellaswag", None)]["validation"][0]
    )
    assert doc["ctx"].startswith("Cooking: The chef preheats the oven. Then she")
    assert "[title]" not in doc["choices"][0]
    assert doc["gold"] == 0


def test_shim_arc_numeric_answer_key():
    row = HF_FIXTURES[("allenai/ai2_arc", "ARC-Easy")]["test"][1]
    doc = ingest.PROCESS_DOCS["arc"](row)
    assert doc["gold"] == 2  # "3" -> index 2


def test_shim_coqa_expands_turns():
    rows = ingest.PROCESS_DOCS["coqa"](
        HF_FIXTURES[("EleutherAI/coqa", None)]["validation"][0]
    )
    assert len(rows) == 2
    assert rows[0]["answers"] == ["a dog"]
    assert "Q: What animal?" in rows[1]["story"]  # history folded into story


def test_shim_truthfulqa():
    row = HF_FIXTURES[("truthful_qa", "multiple_choice")]["validation"][0]
    mc1 = ingest.PROCESS_DOCS["truthfulqa_mc1"](row)
    mc2 = ingest.PROCESS_DOCS["truthfulqa_mc2"](row)
    assert mc1["gold"] == 0
    assert mc2["mc2_labels"] == [1, 1, 0]


def test_shim_lambada_last_word():
    doc = ingest.PROCESS_DOCS["lambada"]({"text": "the quick brown fox"})
    assert doc == {"context": "the quick brown", "answer": "fox"}
    doc2 = ingest.PROCESS_DOCS["lambada_standard"]({"text": "the quick brown fox"})
    assert doc2 == {"context": "the quick brown", "target": " fox"}


def test_shim_wikitext_drops_blank_pages():
    assert ingest.PROCESS_DOCS["wikitext"]({"page": "  "}) is None


# ---------------------------------------------------------------- plumbing
def test_derived_mmlu_subtask_inherits_hf_fields():
    cfg = get_task("mmlu_abstract_algebra")
    assert cfg.hf_path == "cais/mmlu"
    assert cfg.hf_name == "abstract_algebra"
    assert cfg.process_docs == "mmlu"


def test_missing_task_without_hf_path_raises(tmp_path):
    from retrieval_scaling_tpu.rag_eval.tasks import TaskConfig, load_documents

    cfg = TaskConfig(task="local_only", dataset_path="nope")
    with pytest.raises(FileNotFoundError, match="no hf_path"):
        load_documents(cfg, data_root=str(tmp_path), cache_dir=str(tmp_path / "c"))


def test_data_root_takes_priority_over_ingestion(fake_hf, tmp_path):
    """Hand-prepped local files keep working and shadow the HF path."""
    d = tmp_path / "data" / "nq_open"
    d.mkdir(parents=True)
    with open(d / "validation.jsonl", "w") as f:
        f.write(json.dumps({"question": "local row", "answer": ["yes"]}) + "\n")
    res = simple_evaluate(
        DummyLM(), ["nq_open"], data_root=str(tmp_path / "data"),
        cache_dir=str(tmp_path / "cache"), bootstrap_iters=0,
    )
    assert res["results"]["nq_open"]["samples"] == 1
    assert fake_hf.calls == []


def test_prepare_split_unknown_split_raises(fake_hf, tmp_path):
    cfg = get_task("nq_open")
    with pytest.raises(KeyError, match="hf_split_map"):
        ingest.prepare_split(cfg, "test", cache_dir=str(tmp_path))


def test_unreachable_hub_error_names_offline_escapes(monkeypatch, tmp_path):
    """A hub outage surfaces the two local fallbacks, not a bare traceback."""
    module = types.ModuleType("datasets")

    def boom(path, name=None, **kwargs):
        raise ConnectionError(f"Couldn't reach '{path}' on the Hub")

    module.load_dataset = boom
    monkeypatch.setitem(sys.modules, "datasets", module)
    cfg = get_task("nq_open")
    with pytest.raises(ConnectionError, match="data_root.*cache"):
        ingest.prepare_split(cfg, "validation", cache_dir=str(tmp_path))


# ---------------------------------------------------------------- raw data
def test_download_raw_data_resumable(tmp_path):
    """Raw-datastore downloader (reference: scripts/download_raw_data.sh):
    hub-tree discovery, per-domain prefixes, resume-by-existence."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import download_raw_data as drd

    tree = [
        "dpr_wiki/wiki_dpr.jsonl",
        "math/gsm8k.jsonl", "math/math.jsonl",
        "pubmed/pubmed.jsonl",
        "unrelated/readme.md",
    ]
    fetched = []

    def fake_list(repo):
        return tree

    def fake_fetch(repo, path, out_path):
        fetched.append(path)
        with open(out_path, "w") as f:
            f.write('{"text": "x"}\n')

    out = str(tmp_path / "raw")
    written = drd.download_domains(
        ["dpr_wiki", "math"], out, list_fn=fake_list, fetch_fn=fake_fetch
    )
    assert sorted(fetched) == ["dpr_wiki/wiki_dpr.jsonl", "math/gsm8k.jsonl", "math/math.jsonl"]
    assert all(os.path.exists(p) for p in written)

    # resume: existing files are skipped
    fetched.clear()
    drd.download_domains(["dpr_wiki", "math", "pubmed"], out,
                         list_fn=fake_list, fetch_fn=fake_fetch)
    assert fetched == ["pubmed/pubmed.jsonl"]


def test_shim_race_folds_prior_problems():
    """RACE prompt = article + prior problems as answered Q/A + last
    question (reference: lm_eval/tasks/race/preprocess_race.py)."""
    row = HF_FIXTURES[("EleutherAI/race", "high")]["test"][0]
    doc = ingest.PROCESS_DOCS["race"](row)
    assert doc["query"] == (
        "Article: Long article.\n\n"
        "Question: Prior q?\nAnswer: p2\n"
        "What is it?"
    )
    assert doc["choices"] == ["long", "short", "blue", "red"]
    assert doc["gold"] == 0


def test_shim_mathqa_options_regex():
    doc = ingest.PROCESS_DOCS["mathqa"](
        {"Problem": "2+2?", "options": "a ) 1 , b ) 4 , c ) 3 , d ) 9 , e ) none of these", "correct": "b"}
    )
    assert doc["choices"] == ["1", "4", "3", "9", "none of these"]
    assert doc["gold"] == 1


def test_shim_mnli_appends_period():
    doc = ingest.PROCESS_DOCS["mnli"](
        {"premise": "P", "hypothesis": "Someone eats", "label": 0}
    )
    assert doc["hypothesis"] == "Someone eats."


def test_realtoxicityprompts_cold_cache(fake_hf, tmp_path):
    """RTP ingests the nested prompt.text and scores via the injectable
    toxicity scorer (no Perspective API in tests)."""
    from retrieval_scaling_tpu.rag_eval import metrics as M

    M.set_toxicity_scorer(lambda text: 0.25)
    try:
        res = simple_evaluate(
            DummyLM(), ["realtoxicityprompts"],
            cache_dir=str(tmp_path / "cache"), bootstrap_iters=0,
        )
    finally:
        M.set_toxicity_scorer(None)
    row = res["results"]["realtoxicityprompts"]
    assert row["perspective_api_toxicity_score"] == 0.25
    assert row["score"] == 0.0


def test_basqueglue_coref_span_marking(fake_hf, tmp_path):
    from retrieval_scaling_tpu.rag_eval import ingest

    row = {"text": "Jon etorri da gaur", "span1_index": 0, "span1_text": "Jon",
           "span2_index": 3, "span2_text": "da", "label": 1}
    doc = ingest.PROCESS_DOCS["basqueglue_coref"](row)
    assert doc["gold"] == 1
    assert '"*Jon*"' in doc["text"] and '"*da*"' in doc["text"]
    assert "*Jon* etorri *da* gaur" in doc["text"]


def test_eq_bench_shim_json_roundtrip():
    from retrieval_scaling_tpu.rag_eval import ingest
    from retrieval_scaling_tpu.rag_eval.metrics import eqbench

    row = {"prompt": "p", "reference_answer_fullscale": str({
        "emotion1": "Surprise", "emotion1_score": 3,
        "emotion2": "Anger", "emotion2_score": 7,
        "emotion3": "Joy", "emotion3_score": 0,
        "emotion4": "Fear", "emotion4_score": 2})}
    doc = ingest.PROCESS_DOCS["eq_bench"](row)
    assert eqbench("Surprise: 3\nAnger: 7\nJoy: 0\nFear: 2",
                   [doc["reference"]]) == pytest.approx(100.0)


def test_shim_copal_id_connectors():
    doc = ingest.PROCESS_DOCS["copal_id"]({
        "premise": "Dia lapar.", "question": "cause",
        "choice1": "Dia belum makan.", "choice2": "Tidur.", "label": 0})
    assert doc["text"] == "Dia lapar karena"
    assert doc["choices"][0] == "dia belum makan."  # first letter lowered
    doc = ingest.PROCESS_DOCS["copal_id"]({
        "premise": "Dia lapar.", "question": "effect",
        "choice1": "Makan.", "choice2": "Tidur.", "label": 1})
    assert doc["text"].endswith(" maka")


def test_shim_glianorex_language_filter():
    en_row = {"question": "q", "options": {"A": "a", "B": "b", "C": "c", "D": "d"},
              "answer_idx": 2, "language": "en-US"}
    doc = ingest.PROCESS_DOCS["glianorex_en"](en_row)
    assert doc["gold"] == 2 and doc["question"].startswith("Question: q\nA. a\n")
    assert ingest.PROCESS_DOCS["glianorex_fr"](en_row) is None
    assert ingest.PROCESS_DOCS["glianorex"](en_row) is not None


def test_shim_asdiv_strips_unit():
    doc = ingest.PROCESS_DOCS["asdiv"]({
        "body": "b", "question": "q", "answer": "5 (apples)"})
    assert doc["target"] == "5"


def test_shim_code2text_token_join():
    doc = ingest.PROCESS_DOCS["code2text"]({
        "code_tokens": ["def", "f", "(", ")", ":", "\n", "pass"],
        "docstring_tokens": ["Do", "nothing", "."]})
    assert doc["code"] == "def f ( ) : pass"
    assert doc["target"] == "Do nothing ."


def test_shim_lambada_stablelm_space_split():
    doc = ingest.PROCESS_DOCS["lambada_stablelm"]({"text": "a b c d"})
    assert doc == {"context": "a b c", "answer": " d"}


# ---------------------------------------------------------------- wave 6
def test_shim_social_iqa_label_offset():
    doc = ingest.PROCESS_DOCS["social_iqa"]({
        "context": "c", "question": "q",
        "answerA": "a", "answerB": "b", "answerC": "cc", "label": "3"})
    assert doc["choices"] == ["a", "b", "cc"] and doc["gold"] == 2


def test_shim_polemo2_label_order():
    golds = [ingest.PROCESS_DOCS["polemo2"]({"sentence": "s", "target": t})["gold"]
             for t in ("__label__meta_zero", "__label__meta_minus_m",
                       "__label__meta_plus_m", "__label__meta_amb")]
    assert golds == [0, 1, 2, 3]


def test_polemo2_letter_filter_and_micro_f1(fake_hf, tmp_path):
    """The score-first pipeline maps the generated letter to a class index
    and f1_micro aggregates over the filtered pairs (reference:
    lm_eval/tasks/polemo2 filter_list + hf-evaluate micro f1)."""

    class LetterLM(DummyLM):
        def generate_until(self, reqs):
            # first doc gold=2 (plus_m -> C), second gold=1 (minus_m -> B):
            # answer C, then no letter at all -> the '-1' invalid sentinel,
            # which must NOT match gold '1' (raw comparison, no SQuAD
            # punctuation stripping)
            return ["C.", "no letter here"][: len(reqs)] + ["x"] * max(0, len(reqs) - 2)

    res = simple_evaluate(
        LetterLM(), ["polemo2_in"], cache_dir=str(tmp_path / "cache"),
        bootstrap_iters=0,
    )
    row = res["results"]["polemo2_in"]
    assert row["f1_micro,score-first"] == 0.5
    assert row["exact_match,score-first"] == 0.5


def test_reference_task_name_aliases():
    """medqa_4options / wmt-ro-en-t5-prompt / siqa resolve to the repo's
    canonical configs (reference: lm_eval/tasks/{medqa,wmt2016,siqa})."""
    assert get_task("medqa_4options").task == "medqa"
    assert get_task("wmt-ro-en-t5-prompt").task == "wmt_ro_en_t5_prompt"
    assert get_task("siqa").task == "social_iqa"


def test_flan_held_in_expansion_and_render():
    """flan_held_in expands to 60 prompt-variant tasks; option blocks render
    via the |join filter and targets resolve to gold option TEXT
    (reference: lm_eval/tasks/benchmarks/flan/flan_held_in.yaml)."""
    from retrieval_scaling_tpu.rag_eval import tasks as T

    ordered, groups = T.expand_task_list(["flan_held_in"])
    assert len(ordered) == 60
    assert set(groups) == {
        "flan_held_in", "anli_r1_flan", "anli_r2_flan", "anli_r3_flan",
        "arc_easy_flan", "arc_challenge_flan", "boolq_flan", "rte_flan",
    }
    cfg = T.get_task("arc_challenge_flan_prompt-0")
    tk = T.Task.__new__(T.Task)
    tk.cfg = cfg
    doc = {"question": "Pick one.", "choices": ["a {b}", "c"], "gold": 1}
    # joined choice text passes through untouched (braces in data are safe)
    assert tk.doc_text(doc) == "Pick one.\n\nOPTIONS:\n- a {b}\n- c"
    assert tk.doc_target(doc) == "c"
    # all prompt variants share the family dataset cache dir
    assert cfg.dataset_path == "arc_challenge"
    assert T.get_task("boolq_flan_prompt-9").dataset_path == "boolq"
