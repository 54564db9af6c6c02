from retrieval_scaling_tpu.data.chunking import split_text_into_chunks  # noqa: F401
from retrieval_scaling_tpu.data.sharding import load_jsonl_shard  # noqa: F401
from retrieval_scaling_tpu.data.passages import (  # noqa: F401
    PassageStore,
    build_passage_position_map,
)
from retrieval_scaling_tpu.data.eval_data import load_eval_data  # noqa: F401
