from retrieval_scaling_tpu.train.contrastive import (  # noqa: F401
    InBatchState,
    MoCoState,
    inbatch_init,
    inbatch_train_step,
    moco_init,
    moco_train_step,
)
