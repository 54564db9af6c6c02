from retrieval_scaling_tpu.search.encoder import JaxEncoder, load_encoder  # noqa: F401
