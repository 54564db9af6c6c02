from retrieval_scaling_tpu.models.bert import BertConfig, bert_encode, contriever_embed  # noqa: F401
from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, gpt_neox_lm  # noqa: F401
