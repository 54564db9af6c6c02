"""Index-build stage (reference: src/index.py:205-215).

Dense: one index per shard-group in ``index_shard_ids`` (nested lists =
multiple indexes, reference: src/index.py:46-57). Sparse: host BM25.
"""

from __future__ import annotations

import logging

from retrieval_scaling_tpu.index.base import Indexer

logger = logging.getLogger(__name__)


def build_dense_index(cfg, mesh=None) -> None:
    ids = list(cfg.datastore.index.index_shard_ids)
    groups = ids if ids and isinstance(ids[0], (list, tuple)) else [ids]
    for group in groups:
        logger.info("Building index over shards %s", group)
        Indexer(cfg, index_shard_ids=list(group), mesh=mesh)


def build_index(cfg, mesh=None) -> None:
    if cfg.model.get("sparse_retriever", None) == "bm25":
        from retrieval_scaling_tpu.search.bm25 import build_bm25_index

        build_bm25_index(cfg)
    else:
        build_dense_index(cfg, mesh=mesh)
