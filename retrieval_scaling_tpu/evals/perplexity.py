"""Retrieval-augmented perplexity evaluation with a JAX reader LM.

Parity with the reference evaluator (reference: src/evaluate_perplexity.py):

  * ``build_doc_prompts`` prepends up to ``concate_k`` retrieved docs in
    *reverse* relevance order + ``' \\n'`` separators, with optional
    decontamination filtering and continuation variants (:152-205);
  * context/query tokens are label-masked to -100, sequences left-truncate
    to the reader's ``max_position_embeddings`` (:119-128);
  * PPL = exp(avg loss); bits-per-byte = log2(PPL) / 8 (:141-144);
  * one-line tab-separated log records (:42-69).

TPU-first difference: the reference scores batch-size 1 per sample; here
samples are sorted by length, packed into fixed (batch, bucket) shapes and
scored by a jitted bf16 forward — identical numbers, MXU-sized batches.
"""

from __future__ import annotations

import logging
import math
import os
import pickle
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_scaling_tpu.data.eval_data import load_eval_data
from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig
from retrieval_scaling_tpu.search.driver import (
    get_merged_search_output_path,
    get_search_output_path,
    read_jsonl,
)
from retrieval_scaling_tpu.utils.decontamination import check_below_lexical_overlap_threshold

logger = logging.getLogger(__name__)

IGNORE = -100


@dataclass
class PplEvalOutput:
    cfg: object
    average_loss: float
    perplexity: float
    bit_per_byte: float
    no_enough_docs_count: int = 0

    def log_message(self) -> str:
        cfg = self.cfg
        msg = (
            f"Domain = {cfg.evaluation.domain}"
            f"\t DS_domain = {cfg.datastore.domain}"
            f"\tconcate_k = {cfg.evaluation.concate_k}"
            f"\tavg Loss = {self.average_loss:.4f}"
            f"\tperplexity = {self.perplexity:.4f}"
            f"\tbpb = {self.bit_per_byte:.4f}"
            f"\ttotal shards = {cfg.datastore.embedding.num_shards}"
            f"\tsampled shards = {len(cfg.datastore.index.index_shard_ids)}"
            f"\t#eval samples = {cfg.evaluation.data.num_eval_samples}"
            f"\tds chunk size = {cfg.datastore.embedding.chunk_size}"
            f"\teval chunk size = {cfg.evaluation.data.max_eval_data_seq_length}"
            f"\teval stride = {cfg.evaluation.data.eval_stride}"
            f"\tall shards = {cfg.datastore.index.index_shard_ids}"
        )
        if self.no_enough_docs_count:
            msg += f"\tno enough docs = {self.no_enough_docs_count}"
        return msg

    def log_short_message(self) -> str:
        cfg = self.cfg
        return (
            f"Domain = {cfg.evaluation.domain}"
            f"\ttotal shards = {cfg.datastore.embedding.num_shards}"
            f"\t#eval samples = {cfg.evaluation.data.num_eval_samples}"
            f"\tconcate_k = {cfg.evaluation.concate_k}"
            f"\tavg Loss = {self.average_loss:.4f}"
            f"\tperplexity = {self.perplexity:.4f}"
            f"\tbpb = {self.bit_per_byte:.4f}"
        )


# ---------------------------------------------------------------- prompts
def extract_answer(raw_inputs: str, raw_query: str) -> str:
    inputs = raw_inputs.replace("<|endoftext|>", "")
    query = raw_query.replace("<|endoftext|>", "")
    answer = inputs.replace(query, "")
    if answer == inputs and query:
        answer = inputs.replace(query[:-1], "")
    if answer == inputs and query:
        answer = inputs[-len(inputs) // 2 :]
    return answer


def build_doc_prompts(eval_data: List[dict], eval_args) -> Tuple[List[str], List[str], int]:
    """(contexts, answers, no_enough_docs_count); context = docs + query."""
    num_docs = eval_args.concate_k
    decon = eval_args.get("decontamination", False)
    threshold = eval_args.get("contamination_threshold", 0.5)
    method = eval_args.get("decontamination_method", "longest")
    use_cont = eval_args.get("use_continuation", False)
    use_both = eval_args.get("use_both_doc_and_continuation", False)

    contexts, answers = [], []
    no_enough_docs = 0
    # the first stride window has no query prefix; skipped by the reference
    # (src/evaluate_perplexity.py:163)
    for ex in eval_data[1:]:
        answer = extract_answer(ex["raw_inputs"], ex["raw_query"])
        doc = ""
        if num_docs > 0 and ex.get("ctxs") and ex["ctxs"][0] is not None:
            added, idx = 0, 0
            while added < num_docs and idx < len(ex["ctxs"]):
                ctx = ex["ctxs"][idx]
                if use_both:
                    text = ctx["retrieval text"] + ctx["retrieval next text"] + " \n"
                elif use_cont:
                    text = ctx["retrieval next text"] + " \n"
                else:
                    text = ctx["retrieval text"] + " \n"
                if not decon or check_below_lexical_overlap_threshold(
                    text, answer, threshold, method
                ):
                    doc = text + doc  # reverse order: most relevant closest to query
                    added += 1
                idx += 1
            if added < num_docs:
                no_enough_docs += 1
        contexts.append(doc + ex["raw_query"])
        answers.append(answer)
    return contexts, answers, no_enough_docs


# ---------------------------------------------------------------- scoring
def _bucketize(length: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def make_row_loss_fn(cfg, mesh=None, tensor_parallel=False, params=None):
    """Jitted per-row (NLL sum, scored-token count) over a padded batch.

    ``cfg`` may be any supported reader config (GPT-NeoX or llama family).
    """
    import contextlib

    from retrieval_scaling_tpu.models.hf_convert import reader_logits
    from retrieval_scaling_tpu.models.loss import blockwise_row_lm_loss, use_blockwise
    from retrieval_scaling_tpu.ops.flash_attention import attention_head_sharding

    def _attn_ctx():
        # Any mesh: route the Pallas flash kernel through shard_map (GSPMD
        # would otherwise replicate the pallas_call — all-gathering the
        # operands and computing them fully on every chip). TP shards the
        # heads over 'model'; plain DP shards the batch over 'data'
        # (reader scoring at S >= 1024 takes the flash route on TPU).
        if mesh is not None:
            return attention_head_sharding(mesh)
        return contextlib.nullcontext()

    def fn(params, ids, labels):
        with _attn_ctx():
            return _fn(params, ids, labels)

    def _fn(params, ids, labels):
        if use_blockwise(ids.shape[1], cfg.vocab_size):
            # streamed loss (models/loss.py): head applied per sequence
            # block, no [B, S, V] f32 round trip through HBM
            from retrieval_scaling_tpu.models.hf_convert import (
                reader_hidden,
                reader_logits_from_hidden,
            )

            hidden = reader_hidden(params, cfg, ids)
            return blockwise_row_lm_loss(
                lambda h: reader_logits_from_hidden(params, cfg, h), hidden, labels
            )
        logits = reader_logits(params, cfg, ids)
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        mask = shift_labels != IGNORE
        safe = jnp.where(mask, shift_labels, 0)
        logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
        token_ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
        return -jnp.sum(token_ll * mask, axis=-1), jnp.sum(mask, axis=-1)

    if mesh is None:
        return jax.jit(fn)
    # Data-parallel reader eval: batch rows shard over the mesh 'data'
    # axis — the HF-accelerate DDP analog
    # (reference: lm_eval/models/huggingface.py:151-333). With
    # tensor_parallel, weights shard over 'model' (Megatron layout,
    # parallel/reader_tp.py — the vLLM tensor_parallel_size analog);
    # otherwise they replicate.
    from jax.sharding import NamedSharding, PartitionSpec as P

    row_sharding = NamedSharding(mesh, P("data", None))
    replicated = NamedSharding(mesh, P())
    if tensor_parallel and params is not None:
        from retrieval_scaling_tpu.parallel.reader_tp import reader_param_shardings

        param_sharding = reader_param_shardings(mesh, params)
    else:
        param_sharding = replicated
    return jax.jit(
        fn,
        in_shardings=(param_sharding, row_sharding, row_sharding),
        out_shardings=(replicated, replicated),
    )


class JaxReader:
    """Batched scorer around a GPT-NeoX params/config pair."""

    def __init__(self, params, cfg: GPTNeoXConfig, tokenizer, batch_size: int = 8, dtype=jnp.bfloat16, mesh=None, tensor_parallel=False, quantization=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        # Data-parallel eval over the mesh: the fixed scoring batch must
        # split evenly over the 'data' axis.
        if mesh is not None and batch_size % mesh.shape["data"]:
            batch_size = -(-batch_size // mesh.shape["data"]) * mesh.shape["data"]
        self.batch_size = batch_size
        self.params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        if quantization not in (None, "", "none", "int8"):
            raise ValueError(f"unknown reader quantization {quantization!r}")
        if quantization == "int8":
            if tensor_parallel:
                raise ValueError(
                    "reader_quantization=int8 and reader_tensor_parallel are "
                    "mutually exclusive (TP shard specs cover float keys only)"
                )
            from retrieval_scaling_tpu.models.generate import quantize_decode_params

            self.params = quantize_decode_params(self.params, cfg)
        if mesh is not None and tensor_parallel:
            from retrieval_scaling_tpu.parallel.reader_tp import shard_reader_params

            self.params = shard_reader_params(mesh, self.params)
        self._row_loss = make_row_loss_fn(
            cfg, mesh=mesh, tensor_parallel=tensor_parallel, params=self.params
        )

    @classmethod
    def from_pretrained(cls, name_or_path: str, batch_size: int = 8, dtype=jnp.bfloat16, mesh=None, tensor_parallel=False, quantization=None, cache_dir=None):
        from retrieval_scaling_tpu.models.hf_convert import load_hf_reader, load_tokenizer

        params, cfg = load_hf_reader(name_or_path, cache_dir=cache_dir)
        return cls(
            params, cfg, load_tokenizer(name_or_path), batch_size, dtype,
            mesh=mesh, tensor_parallel=tensor_parallel, quantization=quantization,
        )

    def score(self, contexts: List[str], targets: List[str]) -> List[float]:
        """Per-sample mean NLL over target tokens.

        Context tokens are label-masked; sequences left-truncate to the
        reader's max positions (reference: src/evaluate_perplexity.py:119-128).
        Samples are length-sorted into fixed (batch, bucket) shapes so XLA
        compiles a handful of programs.
        """
        max_pos = self.cfg.max_position_embeddings
        rows = []
        for i, (ctx, tgt) in enumerate(zip(contexts, targets)):
            ctx_ids = self.tokenizer(ctx)["input_ids"]
            tgt_ids = self.tokenizer(tgt)["input_ids"]
            ids = (ctx_ids + tgt_ids)[-max_pos:]
            labels = ([IGNORE] * len(ctx_ids) + tgt_ids)[-max_pos:]
            rows.append((i, ids, labels))

        buckets = [b for b in (128, 256, 512, 1024, 2048, 4096) if b < max_pos]
        buckets.append(max_pos)

        per_sample = np.zeros(len(rows), np.float64)
        rows.sort(key=lambda r: len(r[1]))
        pad_id = (
            self.tokenizer.pad_token_id
            if self.tokenizer.eos_token_id is None
            else self.tokenizer.eos_token_id
        )

        pos = 0
        while pos < len(rows):
            batch = rows[pos : pos + self.batch_size]
            bucket = _bucketize(max(len(r[1]) for r in batch), buckets)
            ids_np = np.full((self.batch_size, bucket), pad_id, np.int32)
            lab_np = np.full((self.batch_size, bucket), IGNORE, np.int32)
            for row, (_, ids, labels) in enumerate(batch):
                ids_np[row, : len(ids)] = ids
                lab_np[row, : len(labels)] = labels
            loss_sums, counts = self._row_loss(self.params, jnp.asarray(ids_np), jnp.asarray(lab_np))
            loss_sums = np.asarray(jax.device_get(loss_sums), np.float64)
            counts = np.asarray(jax.device_get(counts))
            for row, (orig, _, _) in enumerate(batch):
                per_sample[orig] = loss_sums[row] / max(int(counts[row]), 1)
            pos += self.batch_size

        return per_sample.tolist()


# ---------------------------------------------------------------- drivers
def _load_eval_examples(cfg) -> List[dict]:
    eval_args = cfg.evaluation
    if not eval_args.concate_k:  # LM-only
        return load_eval_data(cfg)
    path = eval_args.search.get("merged_path", None) or get_merged_search_output_path(cfg)
    if not os.path.exists(path):
        # single-group runs write only the per-group file
        groups = cfg.datastore.index.index_shard_ids
        if groups and not isinstance(groups[0], (list, tuple)):
            path = get_search_output_path(cfg, groups)
        elif len(groups) == 1:
            path = get_search_output_path(cfg, groups[0])
    return read_jsonl(path)


def evaluate_perplexity(cfg, reader: JaxReader | None = None, mesh=None) -> PplEvalOutput:
    """Task entry (reference: src/evaluate_perplexity.py:72-149)."""
    if cfg.tasks.eval.task_name == "perplexity_calibration":
        return evaluate_calibration(cfg, reader, mesh=mesh)

    eval_args = cfg.evaluation
    eval_data = _load_eval_examples(cfg)
    contexts, answers, no_enough = build_doc_prompts(eval_data, eval_args)

    if reader is None:
        reader = JaxReader.from_pretrained(
            cfg.model.lm_model,
            batch_size=eval_args.get("per_device_eval_batch_size", 8),
            mesh=mesh,
            tensor_parallel=eval_args.get("reader_tensor_parallel", False),
            quantization=eval_args.get("reader_quantization", None),
            cache_dir=eval_args.get("reader_cache_dir", None),
        )

    per_sample = reader.score(contexts, answers)
    average_loss = float(np.mean(per_sample))
    perplexity = math.exp(average_loss)
    bit_per_byte = math.log2(perplexity) / 8

    out = PplEvalOutput(cfg, average_loss, perplexity, bit_per_byte, no_enough)
    logger.info(out.log_message())
    return out


def evaluate_calibration(cfg, reader: JaxReader | None = None, mesh=None) -> PplEvalOutput:
    """Per-document calibration: score the answer under each retrieved doc
    separately and report the min-loss mixture
    (reference: src/evaluate_perplexity.py:219-324)."""
    eval_args = cfg.evaluation
    eval_data = _load_eval_examples(cfg)

    if reader is None:
        reader = JaxReader.from_pretrained(
            cfg.model.lm_model,
            batch_size=eval_args.get("per_device_eval_batch_size", 8),
            mesh=mesh,
            tensor_parallel=eval_args.get("reader_tensor_parallel", False),
            quantization=eval_args.get("reader_quantization", None),
            cache_dir=eval_args.get("reader_cache_dir", None),
        )

    k = eval_args.concate_k
    contexts, answers, owners, scores = [], [], [], []
    for i, ex in enumerate(eval_data[1:]):
        answer = extract_answer(ex["raw_inputs"], ex["raw_query"])
        ctxs = [c for c in (ex.get("ctxs") or []) if c is not None][:k]
        if not ctxs:
            contexts.append(ex["raw_query"])
            answers.append(answer)
            owners.append(i)
            scores.append(None)
            continue
        for ctx in ctxs:
            contexts.append(ctx["retrieval text"] + " \n" + ex["raw_query"])
            answers.append(answer)
            owners.append(i)
            scores.append(float(ctx["retrieval score"]))

    per_sample = reader.score(contexts, answers)

    by_example: dict = {}
    for loss, owner, score in zip(per_sample, owners, scores):
        by_example.setdefault(owner, []).append((loss, score))

    min_losses = [min(l for l, _ in pairs) for pairs in by_example.values()]
    average_loss = float(np.mean(min_losses))
    perplexity = math.exp(average_loss)
    bit_per_byte = math.log2(perplexity) / 8

    out_dir = eval_args.get("calibration_out_dir", None)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "calibration_losses.pkl"), "wb") as f:
            pickle.dump(by_example, f)

    out = PplEvalOutput(cfg, average_loss, perplexity, bit_per_byte)
    logger.info(out.log_message())
    return out
