from retrieval_scaling_tpu.index.base import Indexer, get_index_dir_and_embedding_paths  # noqa: F401
from retrieval_scaling_tpu.index.flat import FlatIndex  # noqa: F401
