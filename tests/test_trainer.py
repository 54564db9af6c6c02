import jax
import numpy as np
import pytest

from retrieval_scaling_tpu.models.bert import BertConfig, init_bert_params
from retrieval_scaling_tpu.train.trainer import (
    TrainConfig,
    finetuning_batches,
    independent_crops,
    latest_checkpoint_step,
    pretraining_batches,
    train,
)

from helpers import make_word_tokenizer

CFG = BertConfig(
    vocab_size=512,
    hidden_size=16,
    num_layers=1,
    num_heads=2,
    intermediate_size=32,
    max_position_embeddings=64,
    pooling="mean",
    attention_impl="xla",
)


def _texts(n=50):
    rng = np.random.RandomState(0)
    return [" ".join(f"w{rng.randint(0, 200)}" for _ in range(60)) for _ in range(n)]


def test_independent_crops_within_doc():
    import random

    text = " ".join(f"tok{i}" for i in range(100))
    a, b = independent_crops(text, random.Random(0), 5, 20)
    assert set(a.split()) <= set(text.split())
    assert set(b.split()) <= set(text.split())
    assert 5 <= len(a.split()) <= 20


def test_pretraining_batch_shapes():
    texts = _texts()
    tok = make_word_tokenizer(texts)
    cfg = TrainConfig(batch_size=4, max_length=32)
    batch = next(pretraining_batches(texts, tok, cfg))
    assert batch["q_tokens"].shape == (4, 32)
    assert batch["k_mask"].shape == (4, 32)


def test_finetuning_batches_use_positives():
    pairs = [
        {"question": f"q{i}", "positive_ctxs": [{"text": f"pos{i}"}]} for i in range(10)
    ]
    tok = make_word_tokenizer([f"q{i} pos{i}" for i in range(10)])
    cfg = TrainConfig(batch_size=2, max_length=8)
    batch = next(finetuning_batches(pairs, tok, cfg))
    assert batch["q_tokens"].shape == (2, 8)


def test_train_loop_with_checkpoint_resume(tmp_path):
    texts = _texts()
    tok = make_word_tokenizer(texts)
    params = init_bert_params(CFG, jax.random.PRNGKey(0))
    tcfg = TrainConfig(
        objective="inbatch",
        total_steps=6,
        warmup_steps=1,
        batch_size=4,
        max_length=16,
        save_freq=3,
        log_freq=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    state, history = train(CFG, params, pretraining_batches(texts, tok, tcfg), tcfg)
    assert int(state.step) == 6
    assert latest_checkpoint_step(str(tmp_path / "ckpt")) == 6
    assert history and np.isfinite(history[-1]["loss"])

    # resume: a fresh call starts from step 6 and does nothing more
    params2 = init_bert_params(CFG, jax.random.PRNGKey(0))
    state2, _ = train(CFG, params2, pretraining_batches(texts, tok, tcfg), tcfg)
    assert int(state2.step) == 6
    # resumed params equal the checkpointed ones
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_moco_objective():
    texts = _texts()
    tok = make_word_tokenizer(texts)
    params = init_bert_params(CFG, jax.random.PRNGKey(1))
    tcfg = TrainConfig(
        objective="moco", total_steps=3, warmup_steps=1, batch_size=4,
        max_length=16, queue_size=16, log_freq=1,
    )
    state, history = train(CFG, params, pretraining_batches(texts, tok, tcfg), tcfg)
    assert int(state.step) == 3
    assert np.isfinite(history[-1]["loss"])


def test_finetuning_batches_with_hard_negatives():
    """negative_ctxs/negative_hard_ratio sampling (reference:
    contriever/src/finetuning_data.py:15-25)."""
    pairs = [
        {
            "question": f"q{i}",
            "positive_ctxs": [{"text": f"pos{i}"}],
            "negative_ctxs": [{"text": f"neg{i}"}],
            "hard_negative_ctxs": [{"text": f"hardTOP{i}"}, {"text": f"hard{i}"}],
        }
        for i in range(10)
    ]
    vocab = [f"q{i} pos{i} neg{i} hard{i} hardTOP{i}" for i in range(10)]
    tok = make_word_tokenizer(vocab)

    # all-hard sampling, skipping the top mined negative
    cfg = TrainConfig(
        batch_size=4, max_length=8, negative_ctxs=2,
        negative_hard_ratio=1.0, negative_hard_min_idx=1,
    )
    batch = next(finetuning_batches(pairs, tok, cfg))
    assert batch["n_tokens"].shape == (8, 8)  # B * negative_ctxs
    assert batch["n_mask"].shape == (8, 8)
    decoded = [tok.decode(row, skip_special_tokens=True) for row in np.asarray(batch["n_tokens"])]
    assert all(t.startswith("hard") for t in decoded)
    assert not any("hardTOP" in t for t in decoded)  # min_idx skipped

    # ratio 0: plain negatives only
    cfg0 = TrainConfig(batch_size=4, max_length=8, negative_ctxs=1, negative_hard_ratio=0.0)
    batch0 = next(finetuning_batches(pairs, tok, cfg0))
    decoded0 = [tok.decode(row, skip_special_tokens=True) for row in np.asarray(batch0["n_tokens"])]
    assert all(t.startswith("neg") for t in decoded0)

    # no negative fields at all: falls back to random other positives
    bare = [{"question": f"q{i}", "positive_ctxs": [{"text": f"pos{i}"}]} for i in range(10)]
    cfgr = TrainConfig(batch_size=4, max_length=8, negative_ctxs=1)
    batchr = next(finetuning_batches(bare, tok, cfgr))
    assert batchr["n_tokens"].shape == (4, 8)


def test_hard_negatives_sharpen_training():
    """With explicit negatives in the key pool the InBatch loss sees more
    contrast; a few steps must run sharded and reduce the loss
    (reference: contriever/finetuning.py)."""
    import jax.numpy as jnp

    from retrieval_scaling_tpu.parallel.mesh import build_mesh
    from retrieval_scaling_tpu.train.contrastive import (
        inbatch_init,
        inbatch_loss,
        make_inbatch_train_step,
        make_optimizer,
        shard_params,
    )

    pairs = [
        {
            "question": f"q{i} topic{i % 4}",
            "positive_ctxs": [{"text": f"pos{i} topic{i % 4}"}],
            "hard_negative_ctxs": [{"text": f"pos{i} topic{(i + 1) % 4}"}],
        }
        for i in range(16)
    ]
    vocab = [p["question"] + " " + p["positive_ctxs"][0]["text"] + " " + p["hard_negative_ctxs"][0]["text"] for p in pairs]
    tok = make_word_tokenizer(vocab)
    tcfg = TrainConfig(batch_size=8, max_length=8, negative_ctxs=1, negative_hard_ratio=1.0)
    batches = finetuning_batches(pairs, tok, tcfg)

    mesh = build_mesh()
    params = shard_params(mesh, init_bert_params(CFG, jax.random.PRNGKey(0)))
    opt = make_optimizer(lr=3e-3, warmup_steps=1, total_steps=20)
    state = inbatch_init(params, opt)
    step = make_inbatch_train_step(CFG, opt, mesh=mesh)

    first_batch = next(batches)
    assert first_batch["n_tokens"].shape[0] == 8
    loss0, _ = inbatch_loss(state.params, CFG, first_batch)
    for _ in range(10):
        state, metrics = step(state, next(batches))
        assert np.isfinite(float(metrics["loss"]))
    loss1, _ = inbatch_loss(state.params, CFG, first_batch)
    assert float(loss1) < float(loss0)


def test_preemption_checkpoint_and_stop(tmp_path):
    """Signal-latched preemption saves a checkpoint at the step boundary
    and stops; restart resumes (reference: contriever/src/slurm.py:18-40)."""
    import os
    import signal

    from retrieval_scaling_tpu.train.preemption import PreemptionGuard

    texts = _texts()
    tok = make_word_tokenizer(texts)
    tcfg = TrainConfig(
        batch_size=2, max_length=16, total_steps=50, warmup_steps=1,
        log_freq=100, save_freq=100, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    params = init_bert_params(CFG, jax.random.PRNGKey(0))
    batches = pretraining_batches(texts, tok, tcfg)

    guard = PreemptionGuard()
    with guard:
        # deliver a real signal to this process
        os.kill(os.getpid(), signal.SIGUSR1)
        assert guard.preempted
        state, history = train(CFG, params, batches, tcfg, preemption_guard=guard)
    step = latest_checkpoint_step(str(tmp_path / "ckpt"))
    assert step == 0  # drained before the first step

    # a fresh run resumes from that checkpoint and keeps training
    guard2 = PreemptionGuard()
    tcfg2 = TrainConfig(**{**tcfg.__dict__, "total_steps": 2})
    state2, hist2 = train(CFG, params, batches, tcfg2, preemption_guard=guard2)
    assert latest_checkpoint_step(str(tmp_path / "ckpt")) == 2
