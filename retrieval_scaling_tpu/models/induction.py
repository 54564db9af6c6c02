"""Induction-trained copy reader — measured-acceptance harness for
prompt-lookup speculative decoding.

Prompt-lookup drafting (models/speculative.py) pays off exactly when the
reader's own greedy continuation copies spans of the prompt — the RAG
answer-extraction pattern the reference serves through its vLLM harness
backend (reference: rag-evaluation-harness/lm_eval/models/vllm_causallms.py).
A randomly-initialized reader never copies, so its measured acceptance is
~1 token/round and says nothing about the RAG regime; scripting the
emissions (round-4 bench) measures the verify-loop mechanics but not a
real draft distribution. This module closes the gap with a REAL model:

  * ``make_induction_batch`` builds sequences whose second half repeats
    spans of the first half — the classic induction-head curriculum;
  * ``train_induction_reader`` trains a small GPT-NeoX reader on it until
    greedy decoding genuinely continues any repeated span (the induction
    circuit: previous-token head + induction head);
  * ``rag_shaped_prompts`` lays out nq_open-style prompts — k context
    blocks then a "question" that re-opens a span from one context — so
    the trained reader's OWN argmax copies context continuations and the
    speculative engine's acceptance is measured, not scripted.

Everything the bench then reports (tokens/round, wall-clock speedup vs the
static engine) is end-to-end real: real drafting, real verify forwards,
real greedy agreement.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.models.gpt_neox import (
    GPTNeoXConfig,
    gpt_neox_lm,
    init_gpt_neox_params,
)


def make_induction_batch(
    rng: np.random.RandomState,
    batch: int,
    seq_len: int,
    vocab: int,
    min_offset: int = 8,
) -> np.ndarray:
    """[B, S] int32 offset-copy rows: a random prefix of per-row random
    length ``off``, then the whole suffix repeats the row from the start
    (``ids[t] = ids[t - off]`` for t >= off). The copy distance varies per
    row, so a positional shortcut ("attend t - K" for fixed K) cannot
    solve it — the model must match CONTENT, i.e. form the induction
    circuit (previous-token head + induction head). Dense signal: every
    post-prefix position is predictable, which makes the circuit form in
    hundreds of steps instead of thousands (sparse repeated-span
    curricula leave the loss at ln(vocab) for a long plateau). Offsets
    are mostly short (dense signal, fast circuit formation) with a 25%
    tail of long offsets up to ``seq_len - min_offset`` so the trained
    head generalizes to the long match distances RAG prompts need
    (question at the end, answer span near the front)."""
    ids = rng.randint(0, vocab, (batch, seq_len)).astype(np.int32)
    for r in range(batch):
        if rng.rand() < 0.75:
            off = rng.randint(min_offset, max(seq_len // 2, min_offset + 1))
        else:
            off = rng.randint(seq_len // 2, seq_len - min_offset)
        reps = -(-seq_len // off)
        ids[r] = np.tile(ids[r, :off], reps)[:seq_len]
    return ids


def train_induction_reader(
    cfg: GPTNeoXConfig,
    steps: int = 600,
    batch: int = 32,
    seq_len: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    dtype=jnp.float32,
    log_every: int = 0,
):
    """Train a GPT-NeoX reader from scratch on the induction curriculum.

    Returns ``(params, final_loss)``. The loss floor is well below
    ``ln(vocab)`` once the induction circuit forms (repeated-span tokens
    become near-deterministic); a 2-4 layer model gets there in a few
    hundred steps."""
    import optax

    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, min(100, steps // 4), steps)
    tx = optax.adamw(sched, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            loss_sum, count = gpt_neox_lm(p, cfg, ids, ids)
            return loss_sum / jnp.maximum(count, 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    loss = None
    for i in range(steps):
        ids = jnp.asarray(
            make_induction_batch(rng, batch, seq_len, cfg.vocab_size)
        )
        params, opt_state, loss = step(params, opt_state, ids)
        if log_every and (i + 1) % log_every == 0:
            print(f"induction step {i + 1}/{steps}: loss {float(loss):.3f}")
    return params, float(loss)


def rag_shaped_prompts(
    rng: np.random.RandomState,
    batch: int,
    vocab: int,
    n_ctx: int = 3,
    ctx_len: int = 64,
    q_len: int = 8,
):
    """nq_open-shaped prompts for the trained copy reader.

    Each prompt is ``[ctx_1 .. ctx_{n_ctx}] [question]`` where every
    context is a random token block and the question re-opens a span from
    one of the contexts (its first ``q_len`` tokens). An induction-trained
    reader's greedy continuation then copies that context's span onward —
    the concat_k retrieval prompt structure with answer extraction.
    Returns ``(ids [B, S], answer_ref [B, ans_len])`` where ``answer_ref``
    is the context continuation the copy behavior should emit."""
    seq = n_ctx * ctx_len + q_len
    ids = rng.randint(0, vocab, (batch, seq)).astype(np.int32)
    ans_len = ctx_len - q_len
    answer = np.zeros((batch, ans_len), np.int32)
    for r in range(batch):
        c = rng.randint(0, n_ctx)
        start = c * ctx_len
        ids[r, n_ctx * ctx_len :] = ids[r, start : start + q_len]
        answer[r] = ids[r, start + q_len : start + ctx_len]
    return ids, answer
