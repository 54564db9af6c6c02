"""Wave-4 ingestion shims: HF row -> repo doc dict for the round-3 long-tail
families (Korean, Chinese classical, Taiwanese, Arabic, Basque, XNLI, MGSM,
Anthropic model-written evals, KoBEST, CSAT-QA, HAE-RAE, KorMedMCQA).

Each shim mirrors the reference fork's per-task utils (cited per shim);
registered into the shared PROCESS_DOCS registry imported by ingest.py.
"""

from __future__ import annotations

import html
import re

from retrieval_scaling_tpu.rag_eval.ingest import PROCESS_DOCS, register_shim
from retrieval_scaling_tpu.rag_eval.task_families_wave4 import (
    MGSM_WORDS,
    XNLI_WORDS,
)

_LETTERS = "ABCDE"


# ---------------------------------------------------------------- Korean
@register_shim("kmmlu")
def _kmmlu(row):
    """KMMLU rows: question + A..D columns + 1-based answer (reference:
    lm_eval/tasks/kmmlu/direct/_direct_kmmlu_yaml doc_to_text/target)."""
    gold = int(row["answer"]) - 1
    return {
        "question": str(row["question"]).strip(),
        "A": row["A"], "B": row["B"], "C": row["C"], "D": row["D"],
        "gold": gold,
        "letter": _LETTERS[gold],
    }


@register_shim("kormedmcqa")
def _kormedmcqa(row):
    """KorMedMCQA: five options, 1-based answer (reference:
    lm_eval/tasks/kormedmcqa/kormedmcqa_doctor.yaml)."""
    gold = int(row["answer"]) - 1
    return {
        "question": str(row["question"]).strip(),
        "A": row["A"], "B": row["B"], "C": row["C"], "D": row["D"],
        "E": row["E"],
        "gold": gold,
        "letter": _LETTERS[gold],
    }


@register_shim("csatqa")
def _csatqa(row):
    """CSAT-QA: build the numbered-option Korean instruction block
    (reference: lm_eval/tasks/csatqa/utils.py process_docs)."""
    opts = "\n".join(f"({i}) {row[f'option#{i}']}" for i in range(1, 6))
    question = (
        "다음을 읽고 정답으로 알맞은 것을 고르시요.\n"
        f"### Context: {row['context']}\n"
        f"### Question: {row['question']}\n"
        f"### Options:\n{opts}\n"
        "### Answer: 주어진 문제의 정답은"
    )
    return {
        "question": question,
        "choices": ["(1)", "(2)", "(3)", "(4)", "(5)"],
        "gold": int(row["gold"]) - 1,
    }


@register_shim("haerae")
def _haerae(row):
    """HAE-RAE BENCH: query + "(A)".."(E)" answer key (reference:
    lm_eval/tasks/haerae/_default_haerae_yaml doc_to_choice)."""
    choices = ["(A)", "(B)", "(C)", "(D)", "(E)"]
    answer = row["answer"]
    if isinstance(answer, str) and answer.strip() in dict.fromkeys(choices):
        gold = choices.index(answer.strip())
    else:
        gold = int(answer)
    return {"query": row["query"], "choices": choices, "gold": gold}


# KoBEST (reference: lm_eval/tasks/kobest/utils.py)
@register_shim("kobest_boolq")
def _kobest_boolq(row):
    return {
        "paragraph": row["paragraph"],
        "question": row["question"],
        "gold": int(row["label"]),
    }


@register_shim("kobest_copa")
def _kobest_copa(row):
    connector = {"원인": " 왜냐하면", "결과": " 그래서"}[str(row["question"]).strip()]
    return {
        "premise_with_connector": f"{row['premise']}{connector}",
        "choices": [row["alternative_1"], row["alternative_2"]],
        "gold": int(row["label"]),
    }


@register_shim("kobest_hellaswag")
def _kobest_hellaswag(row):
    return {
        "query": f"문장: {row['context']}",
        "choices": [row[f"ending_{i}"] for i in range(1, 5)],
        "gold": int(row["label"]),
    }


@register_shim("kobest_sentineg")
def _kobest_sentineg(row):
    return {"sentence": row["sentence"], "gold": int(row["label"])}


@register_shim("kobest_wic")
def _kobest_wic(row):
    return {
        "context_1": row["context_1"],
        "context_2": row["context_2"],
        "word": row["word"],
        "gold": int(row["label"]),
    }


# ------------------------------------------------- Chinese/Taiwanese/Arabic
@register_shim("aclue")
def _aclue(row):
    """ACLUE / AMMLU share capitalized Question/A..D/Answer-letter columns
    (reference: lm_eval/tasks/aclue/_default_template_yaml)."""
    return {
        "question": str(row["Question"]).strip(),
        "A": row["A"], "B": row["B"], "C": row["C"], "D": row["D"],
        "gold": _LETTERS.index(str(row["Answer"]).strip()),
    }


PROCESS_DOCS["ammlu"] = _aclue


@register_shim("aexams")
def _aexams(row):
    """AExams: lowercase question/answer columns (reference:
    lm_eval/tasks/aexams/_default_template_yaml)."""
    return {
        "question": str(row["question"]).strip(),
        "A": row["A"], "B": row["B"], "C": row["C"], "D": row["D"],
        "gold": _LETTERS.index(str(row["answer"]).strip()),
    }


@register_shim("tmmluplus")
def _tmmluplus(row):
    """TMMLU+: answer is a letter over A..D content columns (reference:
    lm_eval/tasks/tmmluplus/default/utils.py process_docs)."""
    return {
        "question": str(row["question"]).strip(),
        "A": row["A"], "B": row["B"], "C": row["C"], "D": row["D"],
        "gold": _LETTERS.index(str(row["answer"]).strip()),
    }


# ---------------------------------------------------------------- Basque
@register_shim("eus_exams")
def _eus_exams(row):
    """EusExams: drop rows with no valid answer or empty candidates
    (reference: lm_eval/tasks/eus_exams/utils.py process_docs)."""
    answer = row.get("answer")
    candidates = row.get("candidates") or []
    if answer not in (0, 1, 2, 3):
        return None
    if list(candidates) == ["", "", "", ""]:
        return None
    return {
        "question": row["question"],
        "candidates": list(candidates),
        "gold": int(answer),
    }


def _letter_block(candidates):
    letters = ["A", "B", "C", "D"][: len(candidates)]
    if len(candidates) < 2:
        raise ValueError("Invalid number of candidates")
    block = "\n".join(f"{l}: {c}" for l, c in zip(letters, candidates))
    return letters, block


@register_shim("eus_trivia")
def _eus_trivia(row):
    """EusTrivia: variable-width A.. letter choices (reference:
    lm_eval/tasks/eus_trivia/utils.py doc_to_text)."""
    letters, block = _letter_block(row["candidates"])
    return {
        "question": f"Galdera: {row['question']}\n{block}\nErantzuna:",
        "choices": letters,
        "gold": int(row["answer"]),
    }


@register_shim("eus_reading")
def _eus_reading(row):
    """EusReading: passage + variable-width choices (reference:
    lm_eval/tasks/eus_reading/utils.py doc_to_text_context)."""
    letters, block = _letter_block(row["candidates"])
    return {
        "question": (
            f"Pasartea: {row['context']}\n\nGaldera: {row['question']}\n"
            f"{block}\nErantzuna:"
        ),
        "choices": letters,
        "gold": int(row["answer"]),
    }


# ---------------------------------------------------------------- XNLI
def _make_xnli_shim(lang: str):
    q, yes, also, no = XNLI_WORDS[lang]

    def shim(row):
        premise, hypothesis = row["premise"], row["hypothesis"]
        return {
            "choices": [
                f"{premise}, {q}? {yes}, {hypothesis}",
                f"{premise}, {q}? {also}, {hypothesis}",
                f"{premise}, {q}? {no}, {hypothesis}",
            ],
            "gold": int(row["label"]),
        }

    return shim


for _lang in XNLI_WORDS:
    PROCESS_DOCS[f"xnli_{_lang}"] = _make_xnli_shim(_lang)


# ---------------------------------------------------------------- MGSM
def _make_mgsm_shim(variant: str, lang: str):
    w = MGSM_WORDS[lang]
    # direct answers after the plain answer label; CoT variants after the
    # step-by-step label (en_cot uses the English label on every language;
    # reference: mgsm/utils.py gen_lang_yamls).
    answer_label = {
        "direct": w["d"],
        "en_cot": "Step-by-Step Answer:",
        "native_cot": w["a"],
    }[variant]

    def shim(row):
        answer = row.get("answer")
        if answer:  # train row: CoT solution present -> no question prefix
            prompt = f"{row['question']}\n{answer_label}"
            # strip the language's answer label (the reference's Jinja
            # `answer[len+1:]` slice) so the target is the bare solution
            target = str(answer)
            if target.startswith(w["a"]):
                target = target[len(w["a"]):].strip()
        else:
            prompt = f"{w['q']} {row['question']}\n{answer_label}"
            target = str(row["answer_number"])
        return {"prompt": prompt, "target": target}

    return shim


for _variant in ("direct", "en_cot", "native_cot"):
    for _lang in MGSM_WORDS:
        PROCESS_DOCS[f"mgsm_{_variant}_{_lang}"] = _make_mgsm_shim(_variant, _lang)


# ------------------------------------------- Anthropic model-written evals
@register_shim("persona")
def _persona(row):
    """persona / advanced_ai_risk / sycophancy rows share the
    question + answer_matching_behavior schema; gold=0 means "matches the
    behavior" and acc reads as behavior-match rate (reference:
    lm_eval/tasks/model_written_evals/persona/_template_yaml)."""
    return {
        "question": str(row["question"]).strip(),
        "choices": [
            row["answer_matching_behavior"],
            row["answer_not_matching_behavior"],
        ],
        "gold": 0,
    }


# ---------------------------------------------------------------- Basque GLUE
def _general_detokenize(string: str) -> str:
    """BasqueGLUE detokenizer (reference: lm_eval/tasks/basqueglue/utils.py
    general_detokenize)."""
    string = re.sub(r"\s+([.,;:!?)])", r"\1", string)
    string = re.sub(r"(\s+|^)\(\s+([^)]+)\s+\)", r"\1(\2)", string)
    string = re.sub(r"(\s+|^)\[\s+([^)]+)\s+\]", r"\1[\2]", string)
    string = re.sub(r'(\s+|^)"\s+([^"]+)\s+"', r'\1"\2"', string)
    string = re.sub(r"(\s+|^)'\s+([^']+)\s+'", r"\1'\2'", string)
    return string


def _bg_clean(s: str) -> str:
    return _general_detokenize(html.unescape(s))


@register_shim("basqueglue_label")
def _basqueglue_label(row):
    """bec / bhtc / vaxx / qnli: text fields + integer label."""
    out = {k: v for k, v in row.items() if isinstance(v, (str, int, float))}
    out["gold"] = int(row["label"])
    return out


@register_shim("basqueglue_wic")
def _basqueglue_wic(row):
    def fix(s):
        s = _bg_clean(s)
        try:  # the reference re-decodes mis-encoded rows; keep best-effort
            return s.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s

    return {
        "sentence1": fix(row["sentence1"]),
        "sentence2": fix(row["sentence2"]),
        "word": row["word"],
        "gold": int(row["label"]),
    }


@register_shim("basqueglue_coref")
def _basqueglue_coref(row):
    """Star-mark both spans in the token stream (reference:
    lm_eval/tasks/basqueglue/utils.py coref_doc_to_text; span2_index is
    1-based there)."""
    tokens = row["text"].split(" ")

    def mark(start, span_text):
        end = start + len(span_text.split(" ")) - 1
        tokens[start] = f"*{tokens[start]}"
        tokens[end] = f"{tokens[end]}*"

    mark(int(row["span1_index"]), row["span1_text"])
    mark(int(row["span2_index"]) - 1, row["span2_text"])
    context = _bg_clean(" ".join(tokens))
    span1 = _bg_clean(row["span1_text"])
    span2 = _bg_clean(row["span2_text"])
    return {
        "text": (
            f"Testua: {context}\n"
            f'Galdera: Aurreko testuan, "*{span1}*" eta "*{span2}*" gauza bera dira?\n'
            "Erantzuna:"
        ),
        "gold": int(row["label"]),
    }
