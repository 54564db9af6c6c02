"""Index facade: path resolution + dispatch over index types.

Mirrors the reference facade (reference: src/indicies/base.py:12-77,
src/indicies/index_utils.py:9-34): the index directory is derived from the
embedding dir and the sorted shard-id group
(``index_{type}/{id0_id1_...}``), artifact filenames encode the index
hyperparameters, and ``search`` delegates to the concrete index.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import List, Sequence, Tuple

from jax.sharding import Mesh

from retrieval_scaling_tpu.index.flat import FlatIndex

logger = logging.getLogger(__name__)


def get_index_dir_and_embedding_paths(cfg, index_shard_ids=None) -> Tuple[str, List[str]]:
    embedding_args = cfg.datastore.embedding
    index_args = cfg.datastore.index
    index_type = index_args.index_type

    shard_ids = index_shard_ids if index_shard_ids is not None else index_args.get("index_shard_ids", None)
    if shard_ids:
        shard_ids = sorted(int(i) for i in shard_ids)
        embedding_paths = [
            os.path.join(embedding_args.embedding_dir, f"{embedding_args.prefix}_{sid:02d}.pkl")
            for sid in shard_ids
        ]
        index_dir_name = "_".join(str(sid) for sid in shard_ids)
        index_dir = os.path.join(
            os.path.dirname(embedding_paths[0]), f"index_{index_type}", index_dir_name
        )
    else:
        embedding_paths = glob.glob(index_args.passages_embeddings)
        embedding_paths = sorted(
            embedding_paths,
            key=lambda p: int(p.rsplit(f"{embedding_args.prefix}_", 1)[-1].split(".pkl")[0]),
        )
        n_sub = index_args.get("num_subsampled_embedding_files", -1)
        if n_sub != -1:
            embedding_paths = embedding_paths[:n_sub]
        index_dir = os.path.join(os.path.dirname(embedding_paths[0]), f"index_{index_type}")
    return index_dir, embedding_paths


class Indexer:
    """Config-driven index constructor + search delegate."""

    def __init__(self, cfg, index_shard_ids: Sequence[int] | None = None, mesh: Mesh | None = None):
        self.cfg = cfg
        self.args = cfg.datastore.index
        self.index_type = self.args.index_type

        passage_dir = cfg.datastore.embedding.passages_dir
        index_dir, embedding_paths = get_index_dir_and_embedding_paths(cfg, index_shard_ids)
        os.makedirs(index_dir, exist_ok=True)
        logger.info("Index dir %s over embeddings %s", index_dir, embedding_paths)

        if "IVF" in self.index_type:
            formatted = (
                f"index_{self.index_type}.{self.args.sample_train_size}."
                f"{self.args.projection_size}.{self.args.ncentroids}.tpu"
            )
        else:
            formatted = f"index_{self.index_type}.tpu"
        index_path = os.path.join(index_dir, formatted + ".npz")
        trained_path = os.path.join(index_dir, formatted + ".trained.npz")
        meta_file = os.path.join(index_dir, formatted + ".ids.npy")
        pos_map_save_path = os.path.join(index_dir, "passage_pos_id_map.pkl")

        common = dict(
            embed_paths=embedding_paths,
            index_path=index_path,
            meta_file=meta_file,
            passage_dir=passage_dir,
            pos_map_save_path=pos_map_save_path,
            dimension=self.args.projection_size,
            mesh=mesh,
        )
        if self.index_type == "Flat":
            self.datastore = FlatIndex(
                approx_recall=self.args.get("approx_recall", None),
                quantization=self.args.get("quantization", None),
                **common,
            )
        elif self.index_type == "IVFFlat":
            from retrieval_scaling_tpu.index.ivf_flat import IVFFlatIndex

            self.datastore = IVFFlatIndex(
                trained_index_path=trained_path,
                sample_train_size=self.args.sample_train_size,
                ncentroids=self.args.ncentroids,
                probe=self.args.probe,
                quantization=self.args.get("quantization", None),
                **common,
            )
        elif self.args.get("quantization", None) not in (None, "", "none"):
            raise ValueError(
                "datastore.index.quantization applies to Flat/IVFFlat only "
                f"(got index_type={self.index_type!r}); for IVFPQ use the "
                "int8 refinement tier (pq_refine_factor) instead"
            )
        elif self.index_type == "IVFPQ":
            from retrieval_scaling_tpu.index.ivf_pq import IVFPQIndex

            self.datastore = IVFPQIndex(
                trained_index_path=trained_path,
                sample_train_size=self.args.sample_train_size,
                ncentroids=self.args.ncentroids,
                probe=self.args.probe,
                n_subquantizers=self.args.n_subquantizers,
                n_bits=self.args.n_bits,
                refine_factor=self.args.get("pq_refine_factor", 0),
                opq=self.args.get("pq_opq", False),
                refine_mode=self.args.get("pq_refine_mode", "device"),
                aniso=self.args.get("pq_aniso", False),
                aniso_threshold=self.args.get("pq_aniso_threshold", 0.2),
                **common,
            )
        else:
            raise NotImplementedError(f"index_type={self.index_type}")

    def search(self, query_embs, k: int = 5):
        return self.datastore.search(query_embs, k)
