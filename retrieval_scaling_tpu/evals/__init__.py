from retrieval_scaling_tpu.evals.perplexity import evaluate_perplexity, PplEvalOutput  # noqa: F401
