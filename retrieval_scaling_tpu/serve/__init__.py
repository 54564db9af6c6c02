from retrieval_scaling_tpu.serve.engine import MicroBatcher, RetrievalEngine  # noqa: F401
