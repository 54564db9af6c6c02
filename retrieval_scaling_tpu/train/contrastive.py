"""Contrastive retriever training (InBatch + MoCo) on a TPU mesh.

JAX re-design of the vendored contriever trainer
(reference: contriever/src/inbatch.py:17-90, contriever/src/moco.py:14-140,
contriever/src/dist_utils.py:7-60):

  * **InBatch**: query/key towers from one shared encoder; logits are
    ``q @ k^T / temperature`` with diagonal labels. The reference gathers
    keys across DDP ranks with an autograd-aware all_gather; here the batch
    is simply sharded over the mesh's ``data`` axis and the global matmul is
    expressed once — XLA inserts the ICI collectives.
  * **MoCo**: momentum (key) encoder updated as ``m*k + (1-m)*q`` with a
    fixed-size negative queue; the queue is functional state threaded
    through the jitted step (no in-place CUDA buffers).
  * Tensor parallelism: head/FFN dimensions of the encoder weights shard
    over the ``model`` axis via PartitionSpec trees (pjit handles the rest).

Schedulers match the reference's warmup-linear/cosine options
(reference: contriever/src/utils.py:91-120) via optax.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retrieval_scaling_tpu.models.bert import BertConfig, contriever_embed


# --------------------------------------------------------------------------
# Parameter sharding specs (tensor parallelism over the "model" axis)
# --------------------------------------------------------------------------
def bert_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree: attention heads + FFN hidden shard over "model"."""

    def layer_spec(_layer):
        return {
            "qkv_w": P(None, None, "model", None),
            "qkv_b": P(None, "model", None),
            "attn_out_w": P("model", None, None),
            "attn_out_b": P(),
            "attn_ln_scale": P(),
            "attn_ln_bias": P(),
            "mlp_in_w": P(None, "model"),
            "mlp_in_b": P("model"),
            "mlp_out_w": P("model", None),
            "mlp_out_b": P(),
            "mlp_ln_scale": P(),
            "mlp_ln_bias": P(),
        }

    return {
        "embeddings": {
            "word": P(),
            "position": P(),
            "token_type": P(),
            "ln_scale": P(),
            "ln_bias": P(),
        },
        "layers": [layer_spec(l) for l in params["layers"]],
    }


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    specs = bert_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_optimizer(
    lr: float = 1e-4,
    warmup_steps: int = 1000,
    total_steps: int = 100000,
    schedule: str = "cosine",
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    if schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)
    elif schedule == "linear":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, warmup_steps),
                optax.linear_schedule(lr, 0.0, total_steps - warmup_steps),
            ],
            [warmup_steps],
        )
    else:
        raise ValueError(f"Unknown schedule: {schedule!r}")
    return optax.adamw(sched, weight_decay=weight_decay)


# --------------------------------------------------------------------------
# InBatch
# --------------------------------------------------------------------------
class InBatchState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def inbatch_init(params, optimizer) -> InBatchState:
    return InBatchState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def inbatch_loss(
    params,
    cfg: BertConfig,
    batch: Dict[str, jax.Array],
    temperature: float = 0.05,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric-free InBatch CE (reference: contriever/src/inbatch.py:43-75).

    When the batch carries explicit negatives (``n_tokens``/``n_mask``,
    produced by ``finetuning_batches`` with ``negative_ctxs > 0``) they are
    appended to the key pool, so each query scores against B in-batch
    positives + all explicit/hard negatives while the gold stays the
    diagonal (reference: contriever/src/finetuning_data.py:15-25,
    src/inbatch.py gold/negatives assembly).
    """
    q = contriever_embed(params, cfg, batch["q_tokens"], batch["q_mask"])
    k = contriever_embed(params, cfg, batch["k_tokens"], batch["k_mask"])
    if "n_tokens" in batch:
        n = contriever_embed(params, cfg, batch["n_tokens"], batch["n_mask"])
        k = jnp.concatenate([k, n], axis=0)
    logits = jnp.einsum("id,jd->ij", q, k) / temperature
    labels = jnp.arange(q.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if label_smoothing:
        smooth = optax.softmax_cross_entropy(
            logits, jnp.full_like(logits, 1.0 / logits.shape[-1])
        )
        loss = (1 - label_smoothing) * loss + label_smoothing * smooth
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss.mean(), {"accuracy": acc}


def make_inbatch_train_step(cfg: BertConfig, optimizer, mesh: Mesh | None = None, temperature: float = 0.05):
    def step_fn(state: InBatchState, batch) -> Tuple[InBatchState, Dict[str, jax.Array]]:
        (loss, metrics), grads = jax.value_and_grad(inbatch_loss, has_aux=True)(
            state.params, cfg, batch, temperature
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **metrics}
        return InBatchState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_fn)
    # Prefix pytree: one sharding applies to every batch leaf (incl. the
    # optional explicit-negative tensors).
    batch_sharding = NamedSharding(mesh, P(("data",), None))
    return jax.jit(step_fn, in_shardings=(None, batch_sharding))


def inbatch_train_step(state, batch, cfg, optimizer, temperature: float = 0.05):
    """Convenience non-cached step (tests)."""
    return make_inbatch_train_step(cfg, optimizer, None, temperature)(state, batch)


# --------------------------------------------------------------------------
# MoCo
# --------------------------------------------------------------------------
class MoCoState(NamedTuple):
    params: Any          # query tower (trained)
    key_params: Any      # momentum tower
    queue: jax.Array     # [queue_size, D] normalized-key ring buffer
    queue_ptr: jax.Array
    opt_state: Any
    step: jax.Array


def moco_init(params, optimizer, queue_size: int, dim: int) -> MoCoState:
    return MoCoState(
        params=params,
        key_params=jax.tree.map(jnp.copy, params),
        queue=jnp.zeros((queue_size, dim), jnp.float32),
        queue_ptr=jnp.zeros((), jnp.int32),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def moco_loss(params, key_params, queue, cfg: BertConfig, batch, temperature: float):
    """CE over [positive, queue negatives] (reference: contriever/src/moco.py:88-140)."""
    q = contriever_embed(params, cfg, batch["q_tokens"], batch["q_mask"])
    k = jax.lax.stop_gradient(
        contriever_embed(key_params, cfg, batch["k_tokens"], batch["k_mask"])
    )
    l_pos = jnp.einsum("bd,bd->b", q, k)[:, None]          # [B, 1]
    l_neg = jnp.einsum("bd,nd->bn", q, queue)               # [B, Q]
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    labels = jnp.zeros(q.shape[0], jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
    return loss, {"accuracy": acc, "keys": k}


def make_moco_train_step(
    cfg: BertConfig,
    optimizer,
    momentum: float = 0.999,
    temperature: float = 0.05,
):
    def step_fn(state: MoCoState, batch) -> Tuple[MoCoState, Dict[str, jax.Array]]:
        (loss, aux), grads = jax.value_and_grad(moco_loss, has_aux=True)(
            state.params, state.key_params, state.queue, cfg, batch, temperature
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        key_params = jax.tree.map(
            lambda kp, p: momentum * kp + (1.0 - momentum) * p, state.key_params, params
        )
        # ring-buffer enqueue (reference: moco.py _dequeue_and_enqueue)
        keys = aux.pop("keys")
        batch_size = keys.shape[0]
        queue = jax.lax.dynamic_update_slice_in_dim(
            state.queue, keys.astype(state.queue.dtype), state.queue_ptr, axis=0
        )
        queue_ptr = (state.queue_ptr + batch_size) % state.queue.shape[0]
        metrics = {"loss": loss, **aux}
        return (
            MoCoState(params, key_params, queue, queue_ptr, opt_state, state.step + 1),
            metrics,
        )

    return jax.jit(step_fn)


def moco_train_step(state, batch, cfg, optimizer, momentum=0.999, temperature=0.05):
    return make_moco_train_step(cfg, optimizer, momentum, temperature)(state, batch)
