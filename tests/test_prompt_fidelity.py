"""Rendered-prompt fidelity against the reference harness.

For each flagship task, a doc in this repo's schema must render to the
EXACT prompt string (and scored continuations) the reference's task YAML
would produce (reference: rag-evaluation-harness/lm_eval/tasks/<task>/
*.yaml doc_to_text/doc_to_choice/description — expected strings below are
hand-derived from those templates, cited per case)."""

import json

import pytest

from retrieval_scaling_tpu.rag_eval.tasks import Task, get_task

TQA_QA_PROMPT = (
    "Q: What is human life expectancy in the United States?\n"
    "A: Human life expectancy in the United States is 78 years.\n\n"
    "Q: Who was president of the United States in 1955?\n"
    "A: Dwight D. Eisenhower was president of the United States in 1955.\n\n"
    "Q: Which party did he belong to?\n"
    "A: He belonged to the Republican Party.\n\n"
    "Q: What is the square root of banana?\n"
    "A: I have no comment.\n\n"
    "Q: How does a telescope work?\n"
    "A: Telescopes use lenses or mirrors to focus light and make objects appear closer.\n\n"
    "Q: Where were the 1992 Olympics held?\n"
    "A: The 1992 Olympics were held in Barcelona, Spain."
)

# (task, doc-in-our-schema, expected 0-shot prompt, expected choices or
# None, expected target text). Reference file cited per entry.
CASES = [
    # lm_eval/tasks/nq_open/nq_open.yaml: description + "Q: {{question}}?\nA:"
    (
        "nq_open",
        {"question": "who wrote hamlet", "answer": ["Shakespeare"]},
        "Answer these questions:\n\nQ: who wrote hamlet?\nA:",
        None,
        "Shakespeare",
    ),
    # lm_eval/tasks/gsm8k/gsm8k.yaml: "Question: {{question}}\nAnswer:"
    (
        "gsm8k",
        {"question": "2+2?", "answer": "It is 4.\n#### 4"},
        "Question: 2+2?\nAnswer:",
        None,
        "It is 4.\n#### 4",
    ),
    # lm_eval/tasks/mmlu/default/_default_template_yaml: question + lettered
    # choices, scored as ["A","B","C","D"]; per-subject description
    (
        "mmlu_abstract_algebra",
        {"question": "Order of Z_5?", "choices": ["5", "6", "7", "8"], "gold": 0},
        "The following are multiple choice questions (with answers) about "
        "abstract algebra.\n\n"
        "Order of Z_5?\nA. 5\nB. 6\nC. 7\nD. 8\nAnswer:",
        ["A", "B", "C", "D"],
        "A",
    ),
    # lm_eval/tasks/arc/arc_easy.yaml: "Question: {{question}}\nAnswer:",
    # choices = choices.text
    (
        "arc_easy",
        {"question": "What melts ice?", "choices": ["heat", "cold"], "gold": 0},
        "Question: What melts ice?\nAnswer:",
        ["heat", "cold"],
        "heat",
    ),
    # lm_eval/tasks/super_glue/boolq/default.yaml:
    # "{{passage}}\nQuestion: {{question}}?\nAnswer:", choices ["no","yes"]
    (
        "boolq",
        {"passage": "Cats are mammals.", "question": "are cats mammals",
         "choices": ["no", "yes"], "gold": 1},
        "Cats are mammals.\nQuestion: are cats mammals?\nAnswer:",
        ["no", "yes"],
        "yes",
    ),
    # lm_eval/tasks/hellaswag/hellaswag.yaml: "{{query}}" (prep folds
    # activity label + ctx)
    (
        "hellaswag",
        {"ctx": "Cooking: The chef preheats the oven. Then she",
         "choices": ["bakes.", "sings."], "gold": 0},
        "Cooking: The chef preheats the oven. Then she",
        ["bakes.", "sings."],
        "bakes.",
    ),
    # lm_eval/tasks/piqa/piqa.yaml: "Question: {{goal}}\nAnswer:"
    (
        "piqa",
        {"goal": "open a jar", "choices": ["twist the lid", "stare"], "gold": 0},
        "Question: open a jar\nAnswer:",
        ["twist the lid", "stare"],
        "twist the lid",
    ),
    # lm_eval/tasks/winogrande/preprocess_winogrande.py: choices are
    # CONTEXT variants (prefix+option); target is the shared suffix
    (
        "winogrande",
        {"ctx_options": ["The trophy doesn't fit because the trophy",
                         "The trophy doesn't fit because the case"],
         "target": "is big.", "gold": 0,
         "query": "The trophy doesn't fit because the trophy"},
        "The trophy doesn't fit because the trophy",
        ["The trophy doesn't fit because the trophy",
         "The trophy doesn't fit because the case"],
        "is big.",
    ),
    # lm_eval/tasks/truthfulqa/truthfulqa_mc1.yaml: the 6-QA prompt_qa
    # prefix + "\n\nQ: {{question}}\nA:"
    (
        "truthfulqa_mc1",
        {"question": "What happens if you crack your knuckles?",
         "choices": ["Nothing much", "You get arthritis"], "gold": 0},
        TQA_QA_PROMPT + "\n\nQ: What happens if you crack your knuckles?\nA:",
        ["Nothing much", "You get arthritis"],
        "Nothing much",
    ),
    # lm_eval/tasks/sciq/sciq.yaml: "{{support.lstrip()}}\nQuestion: ...",
    # choices = 3 distractors + answer, gold 3
    (
        "sciq",
        {"support": "Photosynthesis needs light.", "question": "What do plants need?",
         "choices": ["dark", "salt", "sand", "light"], "gold": 3},
        "Photosynthesis needs light.\nQuestion: What do plants need?\nAnswer:",
        ["dark", "salt", "sand", "light"],
        "light",
    ),
    # lm_eval/tasks/lambada/lambada_openai.yaml: all-but-last-word context,
    # target " " + last word (target_delimiter "" in our yaml? -> check)
    (
        "lambada_openai",
        {"context": "He opened the door and saw the", "answer": "cat"},
        "He opened the door and saw the",
        None,
        "cat",
    ),
    # lm_eval/tasks/super_glue/copa/utils.py: premise (period dropped) +
    # connector; choices lowercased
    (
        "copa",
        {"premise_with_connector": "The man felt tired because",
         "choices": ["he worked all night.", "he slept well."], "gold": 0},
        "The man felt tired because",
        ["he worked all night.", "he slept well."],
        "he worked all night.",
    ),
    # lm_eval/tasks/gpqa/zeroshot/_gpqa_zeroshot_yaml: no space after the
    # colon before the question (reference quirk preserved)
    (
        "gpqa_main_zeroshot",
        {"question": "What is X?", "choices": ["w1", "w2", "w3", "right"],
         "gold": 3},
        "What is the correct answer to this question:What is X?\nChoices:\n"
        "(A) w1\n(B) w2\n(C) w3\n(D) right\nAnswer:",
        ["(A)", "(B)", "(C)", "(D)"],
        "(D)",
    ),
    # lm_eval/tasks/mmlu/generative/_default_template_yaml: lettered options,
    # letter target, per-subject description handled by fewshot_context
    (
        "mmlu_abstract_algebra_generative",
        {"question": "Order of Z_5?", "choices": ["5", "6", "7", "8"],
         "gold": 0},
        "The following are multiple choice questions (with answers) about "
        "abstract algebra.\n\n"
        "Order of Z_5?\nA. 5\nB. 6\nC. 7\nD. 8\nAnswer:",
        ["A", "B", "C", "D"],
        "A",
    ),
    # lm_eval/tasks/mmlu/continuation/_continuation_template_yaml: bare
    # Question/Answer prompt, choice TEXTS scored, "questions" (not
    # "multiple choice questions") in the description
    (
        "mmlu_continuation_virology",
        {"question": "Which virus?", "choices": ["a", "b", "c", "d"],
         "gold": 1},
        "The following are questions (with answers) about virology.\n\n"
        "Question: Which virus?\nAnswer:",
        ["a", "b", "c", "d"],
        "b",
    ),
    # lm_eval/tasks/super_glue/boolq/seq2seq.yaml: empty target_delimiter,
    # leading-space choices
    (
        "boolq-seq2seq",
        {"passage": "Cats are mammals.", "question": "are cats mammals",
         "label": 1},
        "Cats are mammals.\nQuestion: are cats mammals?\nAnswer:",
        [" no", " yes"],
        " yes",
    ),
    # lm_eval/tasks/translation/wmt14_fr-en.yaml (generated): leading-space
    # target preserved
    (
        "wmt14-fr-en",
        {"translation": {"fr": "le chat", "en": "the cat"}},
        "French phrase: le chat\nEnglish phrase:",
        None,
        " the cat",
    ),
]


@pytest.mark.parametrize("name,doc,want_prompt,want_choices,want_target",
                         CASES, ids=[c[0] for c in CASES])
def test_rendered_prompt_matches_reference(tmp_path, name, doc, want_prompt,
                                           want_choices, want_target):
    cfg = get_task(name)
    d = tmp_path / cfg.dataset_path
    d.mkdir(parents=True, exist_ok=True)
    with open(d / f"{cfg.test_split}.jsonl", "w") as f:
        f.write(json.dumps(doc) + "\n")
    task = Task(cfg, data_root=str(tmp_path))
    ctx = task.fewshot_context(task.docs[0], num_fewshot=0)
    assert ctx == want_prompt
    if want_choices is not None:
        assert task.doc_choices(task.docs[0]) == want_choices
    assert task.doc_target(task.docs[0]) == want_target


def test_winogrande_scores_shared_continuation(tmp_path):
    """The scored pairs must be (per-option context, SHARED ' suffix')
    (reference conditioning) — not (fixed context, option+suffix)."""
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate

    cfg = get_task("winogrande")
    d = tmp_path / "winogrande"
    d.mkdir()
    doc = {"ctx_options": ["P because the trophy", "P because the case"],
           "target": "is big.", "gold": 1, "query": "P because the case"}
    with open(d / "validation.jsonl", "w") as f:
        f.write(json.dumps(doc) + "\n")

    seen = []

    class CtxLM:
        def loglikelihood(self, pairs):
            seen.extend(pairs)
            # prefer the 'case' context
            return [(0.0 if "case" in ctx else -5.0, False) for ctx, _ in pairs]

    res = simple_evaluate(CtxLM(), ["winogrande"], data_root=str(tmp_path),
                          bootstrap_iters=0)
    assert seen == [
        ("P because the trophy", " is big."),
        ("P because the case", " is big."),
    ]
    assert res["results"]["winogrande"]["acc"] == 1.0


def test_wsc273_shim_reference_prep():
    """wsc273 prep (reference: lm_eval/tasks/wsc273/utils.py): option
    pronoun lowercased mid-sentence, possessive 's, multiple-input split."""
    from retrieval_scaling_tpu.rag_eval import ingest

    row = {"text": "The city councilmen refused the demonstrators a permit because They feared violence.",
           "pronoun": "They", "pronoun_loc": 57,
           "options": ["The city councilmen", "The demonstrators"], "label": 0}
    # place pronoun_loc correctly for this fixture
    row["pronoun_loc"] = row["text"].index("They")
    doc = ingest.PROCESS_DOCS["wsc273"](row)
    # mid-sentence: 'The' in the option lowercases
    assert doc["ctx_options"][0].endswith("because the city councilmen")
    assert doc["target"] == "feared violence."
    assert doc["gold"] == 0
