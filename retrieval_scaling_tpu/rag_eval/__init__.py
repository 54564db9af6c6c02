"""RAG evaluation harness — downstream-task evaluation with retrieval.

A compact, from-scratch rebuild of the capabilities the reference gets from
its vendored lm-evaluation-harness fork (reference: rag-evaluation-harness/):
declarative task configs, loglikelihood / multiple-choice / generate_until
request types, fewshot prompting, SQuAD-style metrics, and — the RAG
additions — query export for retrieval (``--save_inputs_only``), retrieved
-context prepending (``--retrieval_file``/``--concat_k``), answer export,
and n-doc-annotated result tables.
"""

from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate  # noqa: F401
from retrieval_scaling_tpu.rag_eval.tasks import TaskConfig, get_task, list_tasks  # noqa: F401
