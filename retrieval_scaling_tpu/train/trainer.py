"""Contrastive training driver: data pipeline + checkpoint/resume.

The JAX analog of the vendored trainer entry points
(reference: contriever/train.py:24-101 pretraining, contriever/finetuning.py
supervised finetuning, contriever/src/finetuning_data.py pair building,
contriever/src/utils.py:46-89 checkpointing with a ``checkpoint/latest``
pointer). Elastic behavior: instead of SLURM SIGUSR1 requeue
(reference: contriever/src/slurm.py:18-40) the trainer checkpoints every
``save_freq`` steps with orbax and resumes from the latest step on restart
— preemption-safe on TPU pods.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import random
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_scaling_tpu.models.bert import BertConfig
from retrieval_scaling_tpu.train.contrastive import (
    InBatchState,
    MoCoState,
    inbatch_init,
    make_inbatch_train_step,
    make_moco_train_step,
    make_optimizer,
    moco_init,
    shard_params,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    objective: str = "inbatch"          # inbatch | moco
    lr: float = 1e-4
    warmup_steps: int = 1000
    total_steps: int = 10000
    schedule: str = "cosine"
    weight_decay: float = 0.01
    temperature: float = 0.05
    momentum: float = 0.999             # moco
    queue_size: int = 65536             # moco
    batch_size: int = 64
    max_length: int = 256
    save_freq: int = 1000
    log_freq: int = 100
    checkpoint_dir: Optional[str] = None
    seed: int = 0
    # self-supervised cropping (contriever pretraining data augmentation)
    crop_min_words: int = 5
    crop_max_words: int = 50
    # supervised fine-tuning negatives (reference:
    # contriever/src/finetuning_data.py:15-25): explicit negatives per
    # query appended to the in-batch key pool; negative_hard_ratio is the
    # probability a negative is drawn from hard_negative_ctxs (mined) vs
    # negative_ctxs, with hard negatives taken from index
    # negative_hard_min_idx onwards (skip the very top false positives).
    negative_ctxs: int = 0
    negative_hard_ratio: float = 0.0
    negative_hard_min_idx: int = 0


# ---------------------------------------------------------------- data
def independent_crops(text: str, rng: random.Random, min_words: int, max_words: int):
    """Two independent random crops of one document — the contriever
    self-supervised positive-pair construction (reference:
    contriever/src/data.py randomcrop)."""
    words = text.split()
    if len(words) < 2 * min_words:
        return text, text
    crops = []
    for _ in range(2):
        span = rng.randint(min_words, min(max_words, max(min_words, len(words) // 2)))
        start = rng.randint(0, max(0, len(words) - span))
        crops.append(" ".join(words[start : start + span]))
    return crops[0], crops[1]


def pretraining_batches(
    texts: List[str],
    tokenizer,
    cfg: TrainConfig,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Infinite stream of self-supervised (query, key) crop batches."""
    rng = random.Random(cfg.seed)
    while True:
        docs = [texts[rng.randrange(len(texts))] for _ in range(cfg.batch_size)]
        qs, ks = zip(*(independent_crops(t, rng, cfg.crop_min_words, cfg.crop_max_words) for t in docs))
        yield tokenize_pair_batch(list(qs), list(ks), tokenizer, cfg.max_length)


def finetuning_batches(
    pairs: List[dict],
    tokenizer,
    cfg: TrainConfig,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Supervised (query, positive) batches from
    {question, positive_ctxs|positives} records (reference:
    contriever/src/finetuning_data.py)."""
    rng = random.Random(cfg.seed)

    def _text(ctx) -> str:
        return ctx["text"] if isinstance(ctx, dict) else str(ctx)

    def _sample_negative(ex) -> str:
        hard = ex.get("hard_negative_ctxs") or []
        hard = hard[cfg.negative_hard_min_idx:]
        plain = ex.get("negative_ctxs") or ex.get("negatives") or []
        if hard and (not plain or rng.random() < cfg.negative_hard_ratio):
            return _text(rng.choice(hard))
        if plain:
            return _text(rng.choice(plain))
        # fall back to a random other example's positive (random negative)
        other = pairs[rng.randrange(len(pairs))]
        pool = other.get("positive_ctxs") or other.get("positives") or [other.get("positive", "")]
        return _text(rng.choice(pool) if isinstance(pool, list) else pool)

    while True:
        batch = [pairs[rng.randrange(len(pairs))] for _ in range(cfg.batch_size)]
        qs, ks, ns = [], [], []
        for ex in batch:
            qs.append(ex.get("question", ex.get("query")))
            positives = ex.get("positive_ctxs") or ex.get("positives") or []
            pos = rng.choice(positives) if positives else ex.get("positive", "")
            ks.append(_text(pos))
            for _ in range(cfg.negative_ctxs):
                ns.append(_sample_negative(ex))
        out = tokenize_pair_batch(qs, ks, tokenizer, cfg.max_length)
        if ns:
            n_ids, n_mask = _encode_texts(ns, tokenizer, cfg.max_length)
            out["n_tokens"], out["n_mask"] = n_ids, n_mask
        yield out


def _encode_texts(texts: List[str], tokenizer, max_length: int):
    out = tokenizer(texts, max_length=max_length, truncation=True, padding="max_length")
    return (
        jnp.asarray(np.asarray(out["input_ids"]), jnp.int32),
        jnp.asarray(np.asarray(out["attention_mask"]), jnp.int32),
    )


def tokenize_pair_batch(queries: List[str], keys: List[str], tokenizer, max_length: int):
    q_ids, q_mask = _encode_texts(queries, tokenizer, max_length)
    k_ids, k_mask = _encode_texts(keys, tokenizer, max_length)
    return {"q_tokens": q_ids, "q_mask": q_mask, "k_tokens": k_ids, "k_mask": k_mask}


# ---------------------------------------------------------------- checkpoints
def save_checkpoint(ckpt_dir: str, step: int, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write(str(step))
    logger.info("checkpoint saved at step %d", step)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    marker = os.path.join(ckpt_dir, "latest")
    if not os.path.exists(marker):
        return None
    return int(open(marker).read().strip())


def restore_checkpoint(ckpt_dir: str, step: int, template):
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=jax.device_get(template))


# ---------------------------------------------------------------- trainer
def train(
    model_cfg: BertConfig,
    params,
    batches: Iterator[Dict[str, jnp.ndarray]],
    cfg: TrainConfig,
    mesh=None,
    preemption_guard=None,
    requeue_cmd: Optional[str] = None,
) -> tuple:
    """Run the training loop; returns (final_state, metrics_history)."""
    optimizer = make_optimizer(
        cfg.lr, cfg.warmup_steps, cfg.total_steps, cfg.schedule, cfg.weight_decay
    )
    if mesh is not None:
        params = shard_params(mesh, params)

    if cfg.objective == "inbatch":
        state = inbatch_init(params, optimizer)
        step_fn = make_inbatch_train_step(model_cfg, optimizer, mesh=mesh, temperature=cfg.temperature)
    elif cfg.objective == "moco":
        state = moco_init(params, optimizer, cfg.queue_size, model_cfg.hidden_size)
        step_fn = make_moco_train_step(model_cfg, optimizer, cfg.momentum, cfg.temperature)
    else:
        raise ValueError(cfg.objective)

    start_step = 0
    if cfg.checkpoint_dir:
        latest = latest_checkpoint_step(cfg.checkpoint_dir)
        if latest is not None:
            logger.info("resuming from checkpoint step %d", latest)
            restored = restore_checkpoint(cfg.checkpoint_dir, latest, state)
            state = type(state)(*[
                jax.tree.map(jnp.asarray, leaf) for leaf in restored
            ])
            start_step = latest

    history = []
    for step in range(start_step, cfg.total_steps):
        # Preemption drain (reference: contriever/src/slurm.py:18-40 SLURM
        # requeue): checkpoint at the step boundary, requeue, stop.
        if preemption_guard is not None and preemption_guard.preempted:
            if cfg.checkpoint_dir:
                save_checkpoint(cfg.checkpoint_dir, step, state)
                logger.info("preempted: checkpointed step %d", step)
            from retrieval_scaling_tpu.train.preemption import requeue

            requeue(requeue_cmd)
            return state, history
        batch = next(batches)
        state, metrics = step_fn(state, batch)
        if (step + 1) % cfg.log_freq == 0 or step == cfg.total_steps - 1:
            snap = {k: float(v) for k, v in metrics.items()}
            history.append({"step": step + 1, **snap})
            logger.info("step %d: %s", step + 1, snap)
        if cfg.checkpoint_dir and ((step + 1) % cfg.save_freq == 0 or step == cfg.total_steps - 1):
            save_checkpoint(cfg.checkpoint_dir, step + 1, state)
    return state, history
