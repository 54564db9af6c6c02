from retrieval_scaling_tpu.ops.flash_attention import multi_head_attention  # noqa: F401
from retrieval_scaling_tpu.ops.topk import (  # noqa: F401
    chunked_topk_scores,
    merge_topk,
)
