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
