import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_scaling_tpu.models.bert import BertConfig, init_bert_params
from retrieval_scaling_tpu.parallel.mesh import build_mesh
from retrieval_scaling_tpu.train.contrastive import (
    bert_param_specs,
    inbatch_init,
    inbatch_loss,
    make_inbatch_train_step,
    make_moco_train_step,
    make_optimizer,
    moco_init,
    shard_params,
)

CFG = BertConfig(
    vocab_size=64,
    hidden_size=16,
    num_layers=2,
    num_heads=2,
    intermediate_size=32,
    max_position_embeddings=32,
    pooling="mean",
    attention_impl="xla",
)


def _batch(rng, b=8, s=10):
    return {
        "q_tokens": jnp.asarray(rng.randint(0, 64, (b, s)), jnp.int32),
        "q_mask": jnp.ones((b, s), jnp.int32),
        "k_tokens": jnp.asarray(rng.randint(0, 64, (b, s)), jnp.int32),
        "k_mask": jnp.ones((b, s), jnp.int32),
    }


def test_inbatch_loss_decreases():
    rng = np.random.RandomState(0)
    params = init_bert_params(CFG, jax.random.PRNGKey(0))
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=100)
    state = inbatch_init(params, opt)
    step = make_inbatch_train_step(CFG, opt)
    batch = _batch(rng)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


def test_moco_queue_and_momentum():
    rng = np.random.RandomState(1)
    params = init_bert_params(CFG, jax.random.PRNGKey(1))
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=100)
    state = moco_init(params, opt, queue_size=32, dim=CFG.hidden_size)
    step = make_moco_train_step(CFG, opt, momentum=0.9)
    batch = _batch(rng, b=8)
    state, m1 = step(state, batch)
    assert int(state.queue_ptr) == 8
    assert float(jnp.abs(state.queue[:8]).sum()) > 0
    assert float(jnp.abs(state.queue[8:]).sum()) == 0
    state, _ = step(state, batch)  # past lr warmup: params now move
    # momentum tower lags the query tower but is not equal
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda kp, p: float(jnp.abs(kp - p).sum()), state.key_params, state.params),
    )
    assert diff > 0
    for _ in range(2):
        state, _ = step(state, batch)
    assert int(state.queue_ptr) == 0  # wrapped 32/8


def test_sharded_inbatch_step_on_mesh():
    mesh = build_mesh()  # 8 CPU devices: data=8, model=1
    params = init_bert_params(CFG, jax.random.PRNGKey(2))
    params = shard_params(mesh, params)
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    state = inbatch_init(params, opt)
    step = make_inbatch_train_step(CFG, opt, mesh=mesh)
    batch = _batch(np.random.RandomState(3), b=16)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_tensor_parallel_mesh_step():
    mesh = build_mesh(data_axis=4, model_axis=2)
    params = init_bert_params(CFG, jax.random.PRNGKey(4))
    specs = bert_param_specs(params)
    assert specs["layers"][0]["mlp_in_w"] == jax.sharding.PartitionSpec(None, "model")
    params = shard_params(mesh, params)
    opt = make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    state = inbatch_init(params, opt)
    step = make_inbatch_train_step(CFG, opt, mesh=mesh)
    state, metrics = step(state, _batch(np.random.RandomState(5), b=8))
    assert np.isfinite(float(metrics["loss"]))
