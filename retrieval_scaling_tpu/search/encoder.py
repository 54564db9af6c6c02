"""Batched text encoder on TPU (passage + query embedding).

TPU-first redesign of the reference's GPU embed loops
(reference: src/embed.py:24-94, src/search.py:48-108):

  * XLA traces one program per (batch, seq-len) shape, so texts are packed
    into *length buckets* (powers of two up to ``maxlength``) and batches are
    padded to a fixed size — a handful of compiled programs total, no
    per-batch recompiles, and short texts don't pay full-length attention.
  * Batches shard over the mesh's ``data`` axis (pjit data parallelism);
    weights are replicated.
  * bf16 activations feed the MXU; embeddings return as fp16 numpy, the
    reference's storage dtype.

Retriever-family dispatch (reference: src/embed.py:118-133) covers the
reference's whole matrix: contriever (mean pooling), dragon/generic BERT
(CLS), RoBERTa/XLM-R (pad-offset positions), e5/sentence-transformers
(mean + normalize + query:/passage: prefixes), GTR-T5 (T5 encoder + Dense
projection), GRIT/ReasonIR/drama (bidirectional llama-family, mean), and
Qwen3-style causal embedders (last-token pooling + instruction prefix).
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retrieval_scaling_tpu.models.bert import BertConfig, contriever_embed
from retrieval_scaling_tpu.parallel.mesh import single_device_mesh
from retrieval_scaling_tpu.utils import text_normalize

logger = logging.getLogger(__name__)


def _length_buckets(maxlength: int) -> List[int]:
    buckets, b = [], 32
    while b < maxlength:
        buckets.append(b)
        b *= 2
    buckets.append(maxlength)
    return buckets


@dataclass
class EncodeOptions:
    batch_size: int = 512
    maxlength: int = 512
    lowercase: bool = False
    normalize_text: bool = False
    no_title: bool = False
    normalize_emb: bool = False
    # Matryoshka-style truncation to the index's projection size (the
    # reference's drama ``encode_documents(..., dim=768)``,
    # reference: src/embed.py:61-62). None = full hidden size.
    out_dim: int | None = None
    # Sequence packing (datastore.embedding.packing): many passages per
    # [batch, maxlength] row with block-diagonal attention — ~100% token
    # occupancy vs bucketed padding. BERT-family encoders only.
    packed: bool = False


def pack_token_rows(sequences: List[List[int]], capacity: int, pad_id: int):
    """Best-fit-decreasing packing of token sequences into fixed rows.

    Returns (ids [R, capacity], position_ids, segment_ids, seg_starts
    [R, G], mapping) — ``segment_ids`` are 1..G per row (0 = pad),
    positions restart at 0 per segment, and ``mapping[i] = (row, slot)``
    locates sequence i's pooled embedding in the [R, G] output grid.

    O(N log capacity): rows are bucketed by exact free space (an int
    <= capacity) and the tightest-fitting bucket is found by bisect over
    the sorted set of nonempty free values — a naive first-fit row scan
    is O(N^2) and would burn ~an hour of host CPU on a 1M-passage shard.
    """
    import bisect

    order = sorted(range(len(sequences)), key=lambda i: -len(sequences[i]))
    rows: List[List[int]] = []      # sequence indices per row
    by_free: dict = {}              # free space -> [row indices]
    frees: List[int] = []           # sorted distinct free values with rows

    def take_row(free: int) -> int:
        bucket = by_free[free]
        r = bucket.pop()
        if not bucket:
            del by_free[free]
            frees.pop(bisect.bisect_left(frees, free))
        return r

    def put_row(free: int, r: int) -> None:
        if free <= 0:
            return
        if free not in by_free:
            by_free[free] = []
            bisect.insort(frees, free)
        by_free[free].append(r)

    for i in order:
        need = len(sequences[i])
        pos = bisect.bisect_left(frees, need)  # tightest row that fits
        if pos < len(frees):
            free = frees[pos]
            r = take_row(free)
            rows[r].append(i)
            put_row(free - need, r)
        else:
            rows.append([i])
            put_row(capacity - need, len(rows) - 1)

    g = max((len(r) for r in rows), default=1)
    g = -(-g // 8) * 8  # round up: bounds compiled shapes, aligns the one-hot
    n_rows = len(rows)
    ids = np.full((n_rows, capacity), pad_id, np.int32)
    pos = np.zeros((n_rows, capacity), np.int32)
    seg = np.zeros((n_rows, capacity), np.int32)
    seg_starts = np.zeros((n_rows, g), np.int32)
    mapping: List[tuple] = [None] * len(sequences)  # type: ignore[list-item]
    for r, members in enumerate(rows):
        cursor = 0
        for slot, i in enumerate(members):
            toks = sequences[i]
            ids[r, cursor : cursor + len(toks)] = toks
            pos[r, cursor : cursor + len(toks)] = np.arange(len(toks))
            seg[r, cursor : cursor + len(toks)] = slot + 1
            seg_starts[r, slot] = cursor
            mapping[i] = (r, slot)
            cursor += len(toks)
    return ids, pos, seg, seg_starts, mapping


def projection_out_dim(cfg, encoder) -> int | None:
    """out_dim for EncodeOptions from ``datastore.index.projection_size``.

    The reference truncates BOTH sides to the projection dim (passages at
    src/embed.py:62, queries at src/search.py:78); queries must use the
    same rule or query dim != index dim whenever projection_size is below
    the encoder hidden size.
    """
    try:
        proj = cfg.datastore.index.get("projection_size", None)
    except AttributeError:
        proj = None
    if proj and proj < encoder.cfg.hidden_size:
        return int(proj)
    return None


class JaxEncoder:
    """Text embedder with bucketed, mesh-parallel batching.

    ``embed_fn(params, cfg, input_ids, attention_mask, normalize=bool)``
    defines the architecture — Contriever/BERT by default; llama-family
    (GRIT / Qwen3-embedding style) via ``load_encoder`` dispatch.
    """

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        mesh: Mesh | None = None,
        dtype=jnp.bfloat16,
        embed_fn: Callable | None = None,
        query_prefix: str = "",
        passage_prefix: str = "",
        force_normalize: bool = False,
        quantize: str = "none",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh or single_device_mesh()
        self.dtype = dtype
        self.embed_fn = embed_fn or contriever_embed
        self.query_prefix = query_prefix
        self.passage_prefix = passage_prefix
        # Models whose contract includes L2 normalization (sentence-
        # transformers / e5 / GTR) normalize regardless of EncodeOptions.
        self.force_normalize = force_normalize
        host_params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        if quantize == "int8":
            # int8 MXU projections (datastore.embedding.quantization=int8):
            # per-channel weight + per-row dynamic activation quantization,
            # fused in a Pallas kernel (ops/quant_matmul.py).
            if (
                isinstance(host_params, dict)
                and host_params.get("layers")
                and "qkv_w" in host_params["layers"][0]
            ):
                from retrieval_scaling_tpu.models.bert import quantize_bert_params

                host_params = quantize_bert_params(host_params)
            else:
                logger.warning(
                    "quantization=int8 is supported for BERT-family encoders "
                    "only; keeping %s weights", dtype,
                )
        elif quantize not in ("none", None, ""):
            raise ValueError(f"unknown encoder quantization {quantize!r}")
        self.params = jax.device_put(host_params, NamedSharding(self.mesh, P()))
        self._encode_jit = {}

    # ------------------------------------------------------------------
    def _compiled(self, normalize_emb: bool, out_dim: int | None = None):
        normalize_emb = normalize_emb or self.force_normalize
        key = (normalize_emb, out_dim)
        if key not in self._encode_jit:
            batch_sharding = NamedSharding(self.mesh, P(("data",), None))

            def body(params, input_ids, attention_mask):
                emb = self.embed_fn(
                    params, self.cfg, input_ids, attention_mask,
                    normalize=normalize_emb and out_dim is None,
                )
                if out_dim is not None:
                    emb = emb[:, :out_dim]
                    if normalize_emb:
                        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
                        emb = (emb.astype(jnp.float32) / jnp.clip(norm, 1e-9, None)).astype(emb.dtype)
                return emb

            # The embed forward is purely data-parallel, so it runs under
            # shard_map (batch split over 'data', params replicated) rather
            # than GSPMD: any pallas kernel inside (flash attention for
            # long-sequence embedders, the fused int8 FFN) would otherwise
            # be treated as replicated by the partitioner — all-gathering
            # the batch and computing it fully on every chip.
            if self.mesh.shape.get("data", 1) > 1:
                fn = jax.jit(
                    jax.shard_map(
                        body, mesh=self.mesh,
                        in_specs=(P(), P(("data",), None), P(("data",), None)),
                        out_specs=P(("data",), None),
                        check_vma=False,
                    )
                )
            else:
                fn = jax.jit(body, in_shardings=(None, batch_sharding, batch_sharding))

            self._encode_jit[key] = fn
        return self._encode_jit[key]

    def encode(
        self,
        texts: Sequence[str],
        opts: EncodeOptions | None = None,
        prefix: str = "",
    ) -> np.ndarray:
        """Encode texts -> [N, D] fp16 embeddings (original order)."""
        opts = opts or EncodeOptions()
        n = len(texts)
        out_dim = (
            opts.out_dim
            or getattr(self.cfg, "projection_dim", None)
            or self.cfg.hidden_size
        )
        if n == 0:
            return np.zeros((0, out_dim), np.float16)

        prepped = []
        for t in texts:
            if opts.lowercase:
                t = t.lower()
            if opts.normalize_text:
                t = text_normalize.normalize(t)
            prepped.append(prefix + t if prefix else t)

        enc = self.tokenizer(
            prepped,
            max_length=opts.maxlength,
            truncation=True,
            padding=False,
        )["input_ids"]
        if opts.packed:
            if not self._can_pack():
                logger.warning(
                    "packing requested but the encoder family does not support "
                    "it (BERT-family, non-RoBERTa only); using bucketed batches"
                )
            elif sum(len(t) for t in enc) > 0.3 * len(enc) * opts.maxlength:
                # Longer texts pack few-per-row and the per-row
                # segment-attention overhead then loses to bucketing
                # (measured on v5e: 0.92x at mean len 96/256, 1.54x at
                # mean 40/256 — crossover ~0.3 * capacity)
                logger.info(
                    "packing skipped: mean length %.0f > %.0f (cap %d); "
                    "bucketed batches are faster for longer texts",
                    sum(len(t) for t in enc) / max(len(enc), 1),
                    0.3 * opts.maxlength, opts.maxlength,
                )
            else:
                return self._encode_packed(enc, opts, out_dim)
        lengths = np.asarray([len(ids) for ids in enc])

        buckets = _length_buckets(opts.maxlength)
        order = np.argsort(lengths, kind="stable")
        out = np.zeros((n, out_dim), np.float16)

        num_data = self.mesh.shape["data"]
        batch = max(opts.batch_size, num_data)
        batch -= batch % num_data  # divisible by data axis
        if n < batch:
            # Small inputs: shrink to the next power of two (still a handful
            # of compiled shapes) instead of padding to the full batch.
            shrunk = max(num_data, 1 << max(n - 1, 0).bit_length())
            shrunk += (-shrunk) % num_data
            batch = min(batch, shrunk)

        fn = self._compiled(opts.normalize_emb, opts.out_dim)
        pad_id = self.tokenizer.pad_token_id or 0

        pos = 0
        while pos < n:
            take = order[pos : pos + batch]
            max_len = int(lengths[take].max())
            bucket = next(b for b in buckets if b >= min(max_len, opts.maxlength))
            ids_np = np.full((batch, bucket), pad_id, np.int32)
            mask_np = np.zeros((batch, bucket), np.int32)
            for row, idx in enumerate(take):
                ids = enc[idx][:bucket]
                ids_np[row, : len(ids)] = ids
                mask_np[row, : len(ids)] = 1
            emb = fn(self.params, jnp.asarray(ids_np), jnp.asarray(mask_np))
            emb = np.asarray(jax.device_get(emb), np.float16)
            out[take] = emb[: len(take)]
            pos += batch
        return out

    # ------------------------------------------------------------------
    def _can_pack(self) -> bool:
        return (
            self.embed_fn is contriever_embed
            and isinstance(self.cfg, BertConfig)
            and not self.cfg.roberta_position_ids
        )

    def _compiled_packed(self, normalize_emb: bool, out_dim: int | None):
        normalize_emb = normalize_emb or self.force_normalize
        key = ("packed", normalize_emb, out_dim)
        if key not in self._encode_jit:
            from retrieval_scaling_tpu.models.bert import contriever_embed_packed

            rows = NamedSharding(self.mesh, P(("data",), None))

            def body(params, ids, pos, seg, seg_starts):
                emb = contriever_embed_packed(
                    params, self.cfg, ids, pos, seg, seg_starts,
                    normalize=normalize_emb and out_dim is None,
                )  # [R, G, D]
                if out_dim is not None:
                    emb = emb[..., :out_dim]
                    if normalize_emb:
                        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
                        emb = (emb.astype(jnp.float32) / jnp.clip(norm, 1e-9, None)).astype(emb.dtype)
                return emb

            # shard_map, not GSPMD: the segmented flash kernel is ALWAYS
            # the pallas path on TPU, and the partitioner would replicate
            # it (see _compiled); packed rows are purely data-parallel
            if self.mesh.shape.get("data", 1) > 1:
                fn = jax.jit(
                    jax.shard_map(
                        body, mesh=self.mesh,
                        in_specs=(P(),) + (P(("data",), None),) * 4,
                        out_specs=P(("data",), None, None),
                        check_vma=False,
                    )
                )
            else:
                fn = jax.jit(body, in_shardings=(None, rows, rows, rows, rows))

            self._encode_jit[key] = fn
        return self._encode_jit[key]

    def _encode_packed(self, enc: List[List[int]], opts: EncodeOptions, out_dim: int) -> np.ndarray:
        """Packed encode: every device row carries ~maxlength real tokens."""
        pad_id = self.tokenizer.pad_token_id or 0
        ids, pos, seg, seg_starts, mapping = pack_token_rows(enc, opts.maxlength, pad_id)
        n_rows = ids.shape[0]

        num_data = self.mesh.shape["data"]
        row_batch = max(opts.batch_size, num_data)
        row_batch -= row_batch % num_data
        if n_rows < row_batch:
            shrunk = max(num_data, 1 << max(n_rows - 1, 0).bit_length())
            shrunk += (-shrunk) % num_data
            row_batch = min(row_batch, shrunk)
        total = -(-n_rows // row_batch) * row_batch
        if total != n_rows:  # pad rows: segment 0 everywhere, dropped below
            pad = total - n_rows
            ids = np.concatenate([ids, np.full((pad, ids.shape[1]), pad_id, np.int32)])
            pos = np.concatenate([pos, np.zeros((pad, pos.shape[1]), np.int32)])
            seg = np.concatenate([seg, np.zeros((pad, seg.shape[1]), np.int32)])
            seg_starts = np.concatenate([seg_starts, np.zeros((pad, seg_starts.shape[1]), np.int32)])

        fn = self._compiled_packed(opts.normalize_emb, opts.out_dim)
        row_embs = []
        for start in range(0, total, row_batch):
            sl = slice(start, start + row_batch)
            emb = fn(
                self.params,
                jnp.asarray(ids[sl]), jnp.asarray(pos[sl]),
                jnp.asarray(seg[sl]), jnp.asarray(seg_starts[sl]),
            )
            row_embs.append(np.asarray(jax.device_get(emb), np.float16))
        all_rows = np.concatenate(row_embs, axis=0)  # [total, G, D]
        out = np.empty((len(enc), out_dim), np.float16)
        for i, (r, slot) in enumerate(mapping):
            out[i] = all_rows[r, slot]
        return out

    # ------------------------------------------------------------------
    def encode_passages(self, passages: Sequence[dict], opts: EncodeOptions):
        """Passage-side text assembly (title handling per src/embed.py:29-35)."""
        texts = []
        for p in passages:
            if opts.no_title or "title" not in p:
                texts.append(p["text"])
            else:
                texts.append(p["title"] + " " + p["text"])
        ids = [p["id"] for p in passages]
        return ids, self.encode(texts, opts, prefix=self.passage_prefix)

    def encode_queries(self, queries: Sequence[str], opts: EncodeOptions) -> np.ndarray:
        return self.encode(queries, opts, prefix=self.query_prefix)


_DECODER_MODEL_TYPES = ("llama", "mistral", "qwen2", "qwen3")


def load_encoder(
    model_name_or_path: str,
    tokenizer_name: str | None = None,
    mesh: Mesh | None = None,
    dtype=jnp.bfloat16,
    attention_impl: str = "auto",
    quantize: str = "none",
) -> JaxEncoder:
    """Load + convert an HF retriever checkpoint into a JaxEncoder.

    Dispatch mirrors the reference's retriever-family logic
    (reference: src/embed.py:118-133, src/search.py:48-108):

      * contriever          -> BERT, masked mean pooling
      * e5 / sentence-transformers -> BERT-family, mean pooling + L2
        normalize + "query: "/"passage: " prefixes (E5 convention)
      * dragon / dpr / generic BERT -> CLS pooling
      * GRIT / ReasonIR     -> llama-family, bidirectional + mean pooling
        (gritlm embedding mode)
      * Qwen3 embedding     -> llama-family, causal + last-token pooling
    """
    import dataclasses

    import transformers

    from retrieval_scaling_tpu.models.hf_convert import (
        llama_from_hf_model,
        load_hf_encoder,
        load_tokenizer,
    )

    name = str(model_name_or_path).lower()
    tokenizer = load_tokenizer(tokenizer_name or model_name_or_path)
    try:
        hf_cfg = transformers.AutoConfig.from_pretrained(model_name_or_path)
        model_type = getattr(hf_cfg, "model_type", "bert")
    except Exception:
        model_type = "bert"

    if model_type == "t5":
        # sentence-transformers GTR family: T5 encoder + mean pool +
        # optional Dense projection + L2 normalize (reference: README.md:197-208).
        import os
        from functools import partial as _partial

        from retrieval_scaling_tpu.models.hf_convert import (
            load_sentence_transformers_projection,
            t5_encoder_from_hf_model,
        )
        from retrieval_scaling_tpu.models.t5 import t5_embed

        hf = transformers.T5EncoderModel.from_pretrained(model_name_or_path)
        projection = None
        if os.path.isdir(str(model_name_or_path)):
            projection = load_sentence_transformers_projection(model_name_or_path)
        else:
            # Hub id: the ST Dense module lives outside the transformers
            # checkpoint — try to fetch it so GTR embeddings match the
            # reference's sentence-transformers space.
            try:
                from huggingface_hub import snapshot_download

                local = snapshot_download(
                    str(model_name_or_path), allow_patterns=["*_Dense/*"]
                )
                projection = load_sentence_transformers_projection(local)
            except Exception:
                projection = None
        if projection is None:
            logger.warning(
                "No sentence-transformers Dense projection found for %s: "
                "embeddings use the raw T5 encoder space, which DIFFERS from "
                "the sentence-transformers space (same dim, different basis). "
                "Point model.query_encoder at a local ST checkpoint directory "
                "containing the *_Dense module for exact parity.",
                model_name_or_path,
            )
        params, cfg = t5_encoder_from_hf_model(hf, dtype=np.float32, projection=projection)
        return JaxEncoder(
            params, cfg, tokenizer, mesh=mesh, dtype=dtype,
            embed_fn=t5_embed, force_normalize=True, quantize=quantize,
        )

    if model_type in _DECODER_MODEL_TYPES:
        from functools import partial as _partial

        from retrieval_scaling_tpu.models.llama import llama_embed

        hf = transformers.AutoModel.from_pretrained(model_name_or_path)
        params, cfg = llama_from_hf_model(hf, dtype=np.float32)
        cfg = dataclasses.replace(cfg, attention_impl=attention_impl)
        # GRIT/ReasonIR/DRAMA are bidirectional llama-family embedders;
        # Qwen3-style embedders stay causal with last-token pooling.
        grit_style = "grit" in name or "reasonir" in name or "drama" in name
        embed_fn = _partial(
            llama_embed,
            pooling="mean" if grit_style else "last",
            bidirectional=grit_style,
        )
        query_prefix = "" if grit_style else "Instruct: Given a web search query, retrieve relevant passages that answer the query\nQuery: "
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        return JaxEncoder(
            params, cfg, tokenizer, mesh=mesh, dtype=dtype,
            embed_fn=embed_fn, query_prefix=query_prefix, quantize=quantize,
        )

    # Token-wise match so hub ids like "intfloat/e5-base-v2" are detected
    # ('/' is a boundary too); the reference uses a substring test
    # (src/embed.py:127) but that would also hit names like "opene5less".
    e5_style = "e5" in re.split(r"[/_-]", name) or "sentence-transformers" in name
    pooling = "mean" if ("contriever" in name or e5_style) else "cls"
    params, cfg = load_hf_encoder(model_name_or_path, pooling=pooling, dtype=np.float32)
    cfg = dataclasses.replace(cfg, attention_impl=attention_impl)
    return JaxEncoder(
        params, cfg, tokenizer, mesh=mesh, dtype=dtype,
        query_prefix="query: " if e5_style else "",
        passage_prefix="passage: " if e5_style else "",
        force_normalize=e5_style,
        quantize=quantize,
    )
