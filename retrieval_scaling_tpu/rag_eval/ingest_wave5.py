"""Wave-5 ingestion shims: HF row -> repo doc dict for the final long-tail
families (Basque proficiency, NoticIA, EQ-Bench, RealToxicityPrompts,
CodeXGLUE code-to-text, tinyBenchmarks, FrenchBench, ALGhafa, ASDiv,
COPAL-ID, Glianorex, XNLI-eu, multilingual LAMBADA StableLM split).

Each shim mirrors the reference fork's per-task utils (cited per shim);
registered into the shared PROCESS_DOCS registry imported by ingest.py.
"""

from __future__ import annotations

import ast
import json
import re

from retrieval_scaling_tpu.rag_eval.ingest import PROCESS_DOCS, register_shim


@register_shim("eus_candidates")
def _eus_candidates(row):
    """EusProficiency: fixed 4-candidate rows (reference: lm_eval/tasks/
    eus_proficiency/eus_proficiency.yaml doc_to_text)."""
    return {
        "question": row["question"],
        "candidates": list(row["candidates"]),
        "gold": int(row["answer"]),
    }


@register_shim("noticia")
def _noticia(row):
    """NoticIA: headline + body -> summary (reference: lm_eval/tasks/
    noticia/noticia.yaml doc_to_text fields)."""
    return {
        "web_headline": row["web_headline"],
        "web_text": row["web_text"],
        "summary": row["summary"],
    }


@register_shim("eq_bench")
def _eq_bench(row):
    """EQ-Bench: the dataset stores reference_answer_fullscale as a Python
    dict repr string (the reference eval()s it; lm_eval/tasks/eq_bench/
    utils.py calculate_score_fullscale) — re-serialize as JSON so the
    eqbench metric can json.loads it."""
    ref = row["reference_answer_fullscale"]
    if isinstance(ref, str):
        ref = ast.literal_eval(ref)
    return {"prompt": row["prompt"], "reference": json.dumps(ref)}


@register_shim("realtoxicityprompts")
def _realtoxicityprompts(row):
    """RealToxicityPrompts: flatten the nested prompt.text (reference:
    realtoxicityprompts.yaml doc_to_text "{{prompt.text}}")."""
    prompt = row["prompt"]
    return {"text": prompt["text"] if isinstance(prompt, dict) else str(prompt)}


@register_shim("tinymmlu")
def _tinymmlu(row):
    """tinyMMLU ships a pre-formatted fewshot-style prompt in
    input_formatted (reference: tinyBenchmarks/tinyMMLU.yaml doc_to_text)."""
    return {"question": row["input_formatted"], "gold": int(row["answer"])}


@register_shim("code2text")
def _code2text(row):
    """CodeXGLUE code-to-text: whitespace-join the token fields (reference:
    lm_eval/tasks/code_x_glue/code-text/utils.py doc_to_text/doc_to_target)."""
    code = " ".join(row["code_tokens"]).replace("\n", " ")
    code = " ".join(code.strip().split())
    doc = " ".join(row["docstring_tokens"]).replace("\n", "")
    doc = " ".join(doc.strip().split())
    return {"code": code, "target": doc}


@register_shim("copal_id")
def _copal_id(row):
    """COPAL-ID: Indonesian COPA with karena/maka connectors and
    first-letter-lowercased choices (reference: lm_eval/tasks/copal_id/
    utils.py doc_to_text_id/doc_to_choice)."""
    conn = {"cause": "karena", "effect": "maka"}[row["question"]]

    def convert(c):
        return c[0].lower() + c[1:] if c else c

    return {
        "text": row["premise"].strip()[:-1] + f" {conn}",
        "choices": [convert(row["choice1"]), convert(row["choice2"])],
        "gold": int(row["label"]),
    }


def _glianorex_shim(lang):
    def shim(row):
        # reference: lm_eval/tasks/glianorex/preprocess_glianorex.py —
        # options dict renders as "A. ...\nB. ..."; the en/fr variants
        # filter on the row's language field.
        if lang and not str(row.get("language", "")).startswith(lang):
            return None
        options = row["options"]
        answers = "".join(f"{k}. {v}\n" for k, v in options.items())
        return {
            "question": f"Question: {row['question']}\n{answers}Answer:",
            "gold": int(row["answer_idx"]),
        }

    return shim


PROCESS_DOCS["glianorex"] = _glianorex_shim(None)
PROCESS_DOCS["glianorex_en"] = _glianorex_shim("en")
PROCESS_DOCS["glianorex_fr"] = _glianorex_shim("fr")


@register_shim("xnli_eu")
def _xnli_eu(row):
    """XNLIeu: Basque entailment connectors (reference: lm_eval/tasks/
    xnli_eu/xnli_eu.yaml doc_to_choice — "ezta? Bai/Gainera/Ez")."""
    premise, hypothesis = row["premise"], row["hypothesis"]
    return {
        "choices": [
            f"{premise}, ezta? Bai, {hypothesis}",
            f"{premise}, ezta? Gainera, {hypothesis}",
            f"{premise}, ezta? Ez, {hypothesis}",
        ],
        "gold": int(row["label"]),
    }


@register_shim("lambada_stablelm")
def _lambada_stablelm(row):
    """StableLM variant of multilingual LAMBADA: split on spaces, not the
    final-word regex (reference: lm_eval/tasks/
    lambada_multilingual_stablelm/lambada_mt_stablelm_en.yaml Jinja)."""
    words = row["text"].split(" ")
    return {"context": " ".join(words[:-1]), "answer": " " + words[-1]}


@register_shim("alghafa_copa")
def _alghafa_copa(row):
    """ALGhafa Arabic COPA (reference: lm_eval/tasks/alghafa/copa_ar/
    copa_ar.yaml)."""
    return {
        "query": row["query"],
        "choices": [row["sol1"], row["sol2"]],
        "gold": int(row["label"]),
    }


@register_shim("alghafa_piqa")
def _alghafa_piqa(row):
    """ALGhafa Arabic PIQA (reference: lm_eval/tasks/alghafa/piqa_ar/
    piqa_ar.yaml)."""
    return {
        "goal": row["goal"],
        "choices": [row["sol1"], row["sol2"]],
        "gold": int(row["label"]),
    }


@register_shim("asdiv")
def _asdiv(row):
    """ASDiv: strip the answer's unit parenthetical (reference:
    lm_eval/tasks/asdiv/default.yaml doc_to_target answer.split(' (')[0])."""
    return {
        "body": row["body"],
        "question": row["question"],
        "target": str(row["answer"]).split(" (")[0],
    }


# ------------------------------------------------------------ french_bench
@register_shim("french_arc")
def _french_arc(row):
    """FrenchBench ARC: answerKey letter -> index (reference:
    french_bench_arc_challenge.yaml doc_to_target)."""
    return {
        "question": row["question"],
        "choices": list(row["choices"]),
        "gold": ["A", "B", "C", "D"].index(row["answerKey"]),
    }


@register_shim("french_boolq")
def _french_boolq(row):
    """french_boolq: label 1 -> Oui (choice 0) (reference:
    french_bench_boolqa.yaml doc_to_target [1, 0].index(label))."""
    return {
        "passage": row["passage"],
        "question": row["question"],
        "gold": [1, 0].index(int(row["label"])),
    }


@register_shim("fquad_bool")
def _fquad_bool(row):
    """fquadv2_bool: is_impossible False -> Possible (choice 0)
    (reference: french_bench_fquadv2_bool.yaml)."""
    return {
        "context": row["context"],
        "question": row["question"],
        "gold": [False, True].index(bool(row["is_impossible"])),
    }


def _gvr_choices(row, with_context):
    # grammar/vocab substitute '<...>'; reading appends when the question
    # has no placeholder (reference: french_bench_{grammar,vocab,
    # reading_comp}.yaml doc_to_choice Jinja).
    q = row["question"]
    choices = []
    for key in ("answerA", "answerB", "answerC", "answerD"):
        ans = row[key]
        if "<...>" in q:
            choices.append(q.replace("<...>", ans))
        else:
            choices.append(f"{q} {ans}")
    doc = {
        "choices": choices,
        "gold": ["A", "B", "C", "D"].index(row["answer"]),
    }
    if with_context:
        doc["context"] = row["context"]
    return doc


PROCESS_DOCS["french_gv"] = lambda row: _gvr_choices(row, with_context=False)
PROCESS_DOCS["french_reading"] = lambda row: _gvr_choices(row, with_context=True)


@register_shim("french_topic_nli")
def _french_topic_nli(row):
    """topic_based_nli: polarity string -> index (reference:
    french_bench_topic_based_nli.yaml — note the unaccented 'negatif' in
    the index list vs the accented choice rendering)."""
    return {
        "text": row["text"],
        "topic": row["topic"],
        "gold": ["positif", "negatif", "neutre"].index(row["polarity"]),
    }


def _fquad_answer(row):
    texts = row["answers"]["text"] if isinstance(row.get("answers"), dict) else []
    # the reference's Jinja renders {{['Impossible']}} — the literal list
    # repr — for no-answer rows; kept verbatim (French normalization strips
    # the brackets so 'Impossible' generations still match)
    return texts[0] if texts else "['Impossible']"


@register_shim("fquad_gen")
def _fquad_gen(row):
    """fquadv2 / fquadv2_hasAns: context+question -> first answer text
    (reference: french_bench_fquadv2.yaml doc_to_target)."""
    return {
        "context": row["context"],
        "question": row["question"],
        "target": _fquad_answer(row),
    }


@register_shim("fquad_genq")
def _fquad_genq(row):
    """fquadv2_genq: context+answer -> the question (reference:
    french_bench_fquadv2_genq.yaml)."""
    return {
        "context": row["context"],
        "answer": _fquad_answer(row),
        "target": row["question"],
    }


@register_shim("multifquad")
def _multifquad(row):
    """multifquad: all answer spans joined with ', ' (reference:
    french_bench_multifquad.yaml doc_to_target)."""
    texts = row["answers"]["text"] if isinstance(row.get("answers"), dict) else []
    return {
        "context": row["context"],
        "question": row["question"],
        "target": ", ".join(texts),
    }


@register_shim("french_trivia")
def _french_trivia(row):
    return {"question": row["Question"], "target": row["Answer"]}


def _wikitext_detokenize(string: str) -> str:
    # the standard wikitext detokenizer (reference: french_bench/
    # preprocess_wikitext.py wikitext_detokenizer)
    string = string.replace("s '", "s'")
    string = re.sub(r"/' [0-9]/", r"/'[0-9]/", string)
    string = string.replace(" @-@ ", "-")
    string = string.replace(" @,@ ", ",")
    string = string.replace(" @.@ ", ".")
    string = string.replace(" : ", ": ")
    string = string.replace(" ; ", "; ")
    string = string.replace(" . ", ". ")
    string = string.replace(" ! ", "! ")
    string = string.replace(" ? ", "? ")
    string = string.replace(" , ", ", ")
    string = re.sub(r"\(\s*([^\)]*?)\s*\)", r"(\1)", string)
    string = re.sub(r"\[\s*([^\]]*?)\s*\]", r"[\1]", string)
    string = re.sub(r"{\s*([^}]*?)\s*}", r"{\1}", string)
    string = re.sub(r"\"\s*([^\"]*?)\s*\"", r'"\1"', string)
    string = re.sub(r"'\s*([^']*?)\s*'", r"'\1'", string)
    string = string.replace("= = = =", "====")
    string = string.replace("= = =", "===")
    string = string.replace("= =", "==")
    string = string.replace(" " + chr(176) + " ", chr(176))
    string = string.replace(" \n", "\n")
    string = string.replace("\n ", "\n")
    string = string.replace(" N ", " 1 ")
    string = string.replace(" 's", "'s")
    return string


@register_shim("wikitext_fr")
def _wikitext_fr(row):
    """wikitext_fr: score the detokenized paragraph but keep the raw text
    for word/byte counts (reference: french_bench/preprocess_wikitext.py
    process_results counts doc['paragraph'])."""
    raw = row["paragraph"]
    if not raw.strip():
        return None
    return {"page": _wikitext_detokenize(raw), "raw_count_text": raw}


@register_shim("label_gold")
def _label_gold(row):
    """Generic classification shim: copy scalar fields, label -> gold."""
    out = {k: v for k, v in row.items() if isinstance(v, (str, int, float))}
    out["gold"] = int(row["label"])
    return out
