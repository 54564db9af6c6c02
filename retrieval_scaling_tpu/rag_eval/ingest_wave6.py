"""Wave-6 ingestion shims: HF row -> repo doc dict for the remaining
reference families (Social IQa, KLEJ PolEmo2.0).

Each shim mirrors the reference fork's task YAML semantics (cited per
shim); registered into the shared PROCESS_DOCS registry imported by
ingest.py.
"""

from __future__ import annotations

from retrieval_scaling_tpu.rag_eval.ingest import register_shim


@register_shim("social_iqa")
def _social_iqa(row):
    """Social IQa: 1-based string label -> gold index (reference:
    lm_eval/tasks/siqa/siqa.yaml doc_to_target (label|int) - 1)."""
    return {
        "context": row["context"],
        "question": row["question"],
        "choices": [row["answerA"], row["answerB"], row["answerC"]],
        "gold": int(row["label"]) - 1,
    }


# PolEmo2.0 fasttext-style class labels, in the reference's index order
# (reference: lm_eval/tasks/polemo2/polemo2_in.yaml doc_to_target).
_POLEMO2_LABELS = [
    "__label__meta_zero",
    "__label__meta_minus_m",
    "__label__meta_plus_m",
    "__label__meta_amb",
]


@register_shim("polemo2")
def _polemo2(row):
    """KLEJ PolEmo2.0 (in/out): sentence + fasttext label -> class index
    (reference: lm_eval/tasks/polemo2/polemo2_in.yaml)."""
    return {
        "sentence": row["sentence"],
        "gold": _POLEMO2_LABELS.index(row["target"]),
    }
