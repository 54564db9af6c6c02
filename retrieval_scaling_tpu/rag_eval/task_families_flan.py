"""FLAN held-in prompt families (reference: rag-evaluation-harness/
lm_eval/tasks/benchmarks/flan/flan_held_in.yaml — seven dataset groups,
each scored under every FLAN prompt template as a generate_until task
whose target is the gold option text).

Each family derives from a ``<family>.yaml`` template carrying the
dataset wiring; the per-prompt overrides here set only ``doc_to_text``.
All prompt variants of a family share one ``dataset_path`` so the
ingestion cache holds a single copy of the split.
"""

from __future__ import annotations

from typing import Any, Dict

# The three-way NLI option block shared by every ANLI prompt.
_ANLI_OPTS = "OPTIONS:\n- Yes\n- It's impossible to say\n- No"

ANLI_FLAN_PROMPTS = [
    "{premise}\n\nChoose your answer: based on the paragraph above can we"
    " conclude that \"{hypothesis}\"?\n\n" + _ANLI_OPTS + "\nI think the answer is",
    "{premise}\n\nBased on that paragraph can we conclude that this sentence"
    " is true?\n{hypothesis}\n\n" + _ANLI_OPTS,
    "{premise}\n\nCan we draw the following conclusion?\n{hypothesis}\n\n" + _ANLI_OPTS,
    "{premise}\nDoes this next sentence follow, given the preceding"
    " text?\n{hypothesis}\n\n" + _ANLI_OPTS,
    "{premise}\nCan we infer the following?\n{hypothesis}\n\n" + _ANLI_OPTS
    + "\nThe answer is:",
    "Read the following paragraph and determine if the hypothesis is"
    " true:\n\n{premise}\n\n" + _ANLI_OPTS + "\nHypothesis: {hypothesis}\n\n\n",
    "Read the text and determine if the sentence is true (see options at the"
    " end):\n\n{premise}\n\nSentence: {hypothesis}\n" + _ANLI_OPTS,
    "Can we draw the following hypothesis from the context (see options)?"
    " \n\nContext:\n\n{premise}\n\nHypothesis: {hypothesis}\n" + _ANLI_OPTS,
    "Choose from options: Determine if the sentence is true based on the text"
    " below:\n{hypothesis}\n\n{premise}\n" + _ANLI_OPTS,
]

_ARC_OPTS = "OPTIONS:\n- {choices|join('\n- ')}"

ARC_FLAN_PROMPTS = [
    "{question}\n\n" + _ARC_OPTS,
    "Question: {question}\n" + _ARC_OPTS + "\nAnswer:",
    "Question: {question}\n\nWhat is the correct answer to the question from"
    " the following choices?\n" + _ARC_OPTS,
    "Q: {question}\nWhat is the correct answer to this question?\n"
    + _ARC_OPTS + "...A:",
    "Choose your answer?\n\n{question}\n\n" + _ARC_OPTS,
    "Answer the question\n\n{question}\n" + _ARC_OPTS,
    "{question}\n\nPick the answer from these options\n\n" + _ARC_OPTS,
]

_BOOLQ_OPTS = "OPTIONS:\n- no\n- yes"

BOOLQ_FLAN_PROMPTS = [
    "{passage}\n\nCan we conclude that {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\n\nIs it true that {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\n\n{question}?\n\n" + _BOOLQ_OPTS,
    "Text: {passage}\n\nQuestion: {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\n\nWhat's the best answer to this question:"
    " {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\nBased on the above text what's the best answer to this"
    " question: {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\nAnswer this question making sure that the answer is supposed"
    " by the text: {question}?\n\n" + _BOOLQ_OPTS,
    "{passage}\n\nIs the following statement correct based on the"
    " text\n\n{question}\n\n" + _BOOLQ_OPTS,
    "{passage}\n\nIs this statement correct \"{question}\"?\n\n" + _BOOLQ_OPTS,
    "Is it true that {question} based on the following"
    " text?\n\n{passage}\n\n" + _BOOLQ_OPTS,
]

_RTE_OPTS = "OPTIONS:\n- yes\n- no"

RTE_FLAN_PROMPTS = [
    "{sentence1}\n\nQuestion with options: Based on the paragraph above can"
    " we conclude that \"{sentence2}\"?\n\n" + _RTE_OPTS,
    "{sentence1}\n\nBased on that paragraph can we conclude that the sentence"
    " below is true?\n{sentence2}\n\n" + _RTE_OPTS,
    "{sentence1}\n\nQ with options: Can we draw the following"
    " conclusion?\n{sentence2}\n\n" + _RTE_OPTS,
    "{sentence1}\nDoes this next sentence follow, given the preceding"
    " text?\n{sentence2}\n\n" + _RTE_OPTS,
    "{sentence1}\n" + _RTE_OPTS + "\nQuestion: Can we infer the"
    " following?\n{sentence2}",
    "Read the following paragraph and determine if the hypothesis is true."
    " Select from options at the end:\n\n{sentence1}\n\nHypothesis:"
    " {sentence2}\n" + _RTE_OPTS + "\nThe answer is",
    "Read the text and determine if the sentence is true:\n\n{sentence1}\n\n"
    "Sentence: {sentence2}\n" + _RTE_OPTS + "\nA:",
    "Question with options: can we draw the following hypothesis from the"
    " context? \n\nContext:\n\n{sentence1}\n\nHypothesis: {sentence2}\n"
    + _RTE_OPTS + "\nA:",
    "Determine if the sentence is true based on the text below. Choose from"
    " options.\n{sentence2}\n\n{sentence1}\n" + _RTE_OPTS,
]

# family name -> (shared dataset_path, ordered prompt list)
_FLAN_FAMILY_SPECS = {
    "anli_r1_flan": ("anli/r1", ANLI_FLAN_PROMPTS),
    "anli_r2_flan": ("anli/r2", ANLI_FLAN_PROMPTS),
    "anli_r3_flan": ("anli/r3", ANLI_FLAN_PROMPTS),
    "arc_easy_flan": ("arc_easy", ARC_FLAN_PROMPTS),
    "arc_challenge_flan": ("arc_challenge", ARC_FLAN_PROMPTS),
    "boolq_flan": ("boolq", BOOLQ_FLAN_PROMPTS),
    "rte_flan": ("glue/rte", RTE_FLAN_PROMPTS),
}


def build_flan_families() -> Dict[str, Dict[str, Dict[str, Any]]]:
    """{family -> {'prompt-N' -> overrides}} for DERIVED_FAMILIES."""
    return {
        family: {
            f"prompt-{i}": {"doc_to_text": prompt, "dataset_path": path}
            for i, prompt in enumerate(prompts)
        }
        for family, (path, prompts) in _FLAN_FAMILY_SPECS.items()
    }


FLAN_HELD_IN_GROUPS: Dict[str, list] = {
    f: [f"{f}_prompt-{i}" for i in range(len(prompts))]
    for f, (_, prompts) in _FLAN_FAMILY_SPECS.items()
}
