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

  * ``make_induction_batch`` / ``device_induction_batch`` build rows
    containing repeated spans at random places (span copies + randomized
    rag layouts) — solvable only by content matching. Two cheaper
    solutions had to be measured out of the curriculum on chip: whole-row
    periodic tiling admits a per-row period detector (trained to loss
    0.009, transferred 0.001 copy fidelity), and any reused batch pool is
    memorized at reader scale (loss 0.302, fidelity 0.001) — so rows are
    generated fresh on device every step and the loss is masked to
    copy-predictable positions;
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
    """[B, S] int32 rows whose only predictable structure is REPEATED
    SPANS — solvable by content matching (the induction circuit:
    previous-token head + induction head) and by nothing cheaper.

    The round-5 first cut used whole-row periodic tiling
    (``ids[t] = ids[t % off]``); trained to loss 0.009, but measured copy
    fidelity on rag-shaped prompts was 0.001: a globally periodic row
    admits a per-row PERIOD-DETECTOR shortcut (infer off once, attend
    t - off positionally) that never compares content, so it cannot
    continue a single re-opened span. Rows here break periodicity two
    ways, half the batch each:

      * span-copy rows: 2-4 spans of length 8-32 copied to random later
        positions in an otherwise random row — every copied position
        (after a span's first token) is predictable only by matching the
        preceding token's earlier occurrence;
      * layout rows: the rag_shaped_prompts structure itself with
        RANDOMIZED shape (2-4 context blocks of random length, a
        question of random length re-opening one block, the
        continuation supervised to the end of the row) — the exact
        distribution the speculative-decode bench evaluates, with
        layout randomized so the model cannot hardcode block positions.
    """
    ids = rng.randint(0, vocab, (batch, seq_len)).astype(np.int32)
    for r in range(batch):
        if rng.rand() < 0.5:
            # span-copy row
            for _ in range(rng.randint(2, 5)):
                max_len = min(32, seq_len // 3)
                length = rng.randint(min_offset, max_len + 1)
                src = rng.randint(0, seq_len - 2 * length)
                dst = rng.randint(src + length, seq_len - length + 1)
                ids[r, dst : dst + length] = ids[r, src : src + length]
        else:
            # randomized rag-layout row: blocks, question, continuation
            n_ctx = rng.randint(2, 5)
            q_len = rng.randint(4, 13)
            max_ctx = (seq_len - 2 * q_len) // n_ctx
            if max_ctx < q_len + 4:
                # row too short for this layout draw: one long span-copy
                length = min(min_offset * 2, seq_len // 3)
                src = rng.randint(0, seq_len - 2 * length)
                dst = rng.randint(src + length, seq_len - length + 1)
                ids[r, dst : dst + length] = ids[r, src : src + length]
                continue
            ctx_len = rng.randint(q_len + 4, max_ctx + 1)
            c = rng.randint(0, n_ctx)
            q_at = n_ctx * ctx_len
            take = min(seq_len - q_at, ctx_len)
            ids[r, q_at : q_at + take] = ids[r, c * ctx_len : c * ctx_len + take]
    return ids


def device_induction_batch(key, batch, seq_len, vocab, min_offset=8,
                           return_mask=False):
    """make_induction_batch, computed ON DEVICE from a PRNG key.

    Same two row families (span-copy / rag-layout), built as an index
    remap ``ids[t] = base[srcidx[t]]`` with purely elementwise ops, so a
    training scan can draw FRESH rows every step. Why it must: a reused
    host pool at bench scale (64x64 rows, 25M-param reader, ~60 epochs)
    is memorized outright — measured on-chip loss 0.302 with 0.001
    held-out copy fidelity. Induction only wins when memorization is
    impossible, i.e. when no row ever repeats.

    ``return_mask``: also return the [B, S] bool mask of positions whose
    token is copy-PREDICTABLE (inside a copied region, not its first
    token: the first copied token follows a random prefix token, so no
    earlier content match determines it). Training masks the loss to
    these positions — random-token positions contribute pure-noise
    gradient at ln(vocab) forever and drown the induction signal (~25%
    of positions) when scored."""
    kb, kt, k0, k1, k2, kl = jax.random.split(key, 6)
    base = jax.random.randint(kb, (batch, seq_len), 0, vocab, jnp.int32)
    t = jnp.arange(seq_len)[None, :]                      # [1, S]
    srcidx = jnp.broadcast_to(t, (batch, seq_len))
    predictable = jnp.zeros((batch, seq_len), bool)
    is_layout = jax.random.uniform(kt, (batch,))[:, None] < 0.5

    # --- span-copy rows: 3 spans, each srcidx[dst..dst+L) = src.. ------
    max_l = min(32, max(seq_len // 3, min_offset + 1))
    for ks in (k0, k1, k2):
        ka, kb2, kc = jax.random.split(ks, 3)
        length = jax.random.randint(ka, (batch, 1), min_offset, max_l + 1)
        src_hi = jnp.maximum(seq_len - 2 * length, 1)
        src = (jax.random.uniform(kb2, (batch, 1)) * src_hi).astype(jnp.int32)
        gap_hi = jnp.maximum(seq_len - src - 2 * length + 1, 1)
        gap = (jax.random.uniform(kc, (batch, 1)) * gap_hi).astype(jnp.int32)
        dst = src + length + gap
        m = (t >= dst) & (t < dst + length) & ~is_layout
        srcidx = jnp.where(m, src + (t - dst), srcidx)
        # overwrite-in-region: a later span replaces an earlier span's
        # tokens, so its region's predictability replaces too (interior
        # predictable, first copied token not — it follows a token whose
        # earlier occurrence does not determine it)
        predictable = jnp.where(m, t > dst, predictable)

    # --- rag-layout rows: blocks | question+continuation --------------
    kn, kq, kcl, kc = jax.random.split(kl, 4)
    n_ctx = jax.random.randint(kn, (batch, 1), 2, 5)
    q_len = jax.random.randint(kq, (batch, 1), 4, 13)
    lo = q_len + 4
    max_ctx = jnp.maximum((seq_len - 2 * q_len) // n_ctx, lo)
    u = jax.random.uniform(kcl, (batch, 1))
    ctx_len = lo + (u * (max_ctx - lo + 1)).astype(jnp.int32)
    c = (jax.random.uniform(kc, (batch, 1)) * n_ctx).astype(jnp.int32)
    q_at = n_ctx * ctx_len
    # rows where the draw does not fit stay fully random (mask empty)
    m2 = (t >= q_at) & is_layout
    lay = jnp.clip(c * ctx_len + (t - q_at), 0, seq_len - 1)
    srcidx = jnp.where(m2, lay, srcidx)
    predictable = jnp.where(is_layout, m2 & (t > q_at), predictable)
    ids = jnp.take_along_axis(base, srcidx, axis=1)
    if return_mask:
        return ids, predictable
    return ids


def train_induction_reader(
    cfg: GPTNeoXConfig,
    steps: int = 3000,
    batch: int = 64,
    seq_len: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    dtype=jnp.float32,
    log_every: int = 0,
):
    """Train a GPT-NeoX reader from scratch on the induction curriculum.

    Returns ``(params, final_loss)``. Recipe notes, all measured on-chip
    this round:

      * adam with linear warmup then CONSTANT lr, no weight decay — the
        circuit forms as a phase transition (loss ~lnV until it fires,
        then a sharp drop); round-4's adamw + cosine-to-zero decayed
        through the transition window and plateaued at the unigram
        floor at every model scale and lr tried.
      * fresh rows EVERY step, generated on device inside the scan
        (device_induction_batch) — a reused batch pool is memorized at
        reader scale (loss 0.302, held-out copy fidelity 0.001), and a
        globally periodic curriculum is period-detected (loss 0.009,
        fidelity 0.001): both shortcuts trained to near-zero loss while
        learning nothing the speculative bench could measure.

    TPU-shaped loop: the whole run is chunked jitted ``lax.scan``s (100
    steps each, batch drawn from a folded key per step), so a relay's
    ~30 ms per-dispatch RTT is paid per CHUNK, not per step."""
    import functools

    import optax

    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(seed), dtype=dtype)
    warm = min(200, max(steps // 4, 1))
    sched = optax.linear_schedule(0.0, lr, warm)  # then constant at lr
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    data_key = jax.random.PRNGKey(seed + 1)

    def one_step(carry, i):
        params, opt_state = carry
        ids, mask = device_induction_batch(
            jax.random.fold_in(data_key, i), batch, seq_len, cfg.vocab_size,
            return_mask=True,
        )
        # score ONLY copy-predictable tokens: the ~75% random positions
        # are irreducible ln(vocab) noise whose gradient drowns the
        # induction signal (measured on-chip: unmasked fresh-data
        # training sat at ln V for 2000+ steps)
        labels = jnp.where(mask, ids, -100)

        def loss_fn(p):
            loss_sum, count = gpt_neox_lm(p, cfg, ids, labels)
            return loss_sum / jnp.maximum(count, 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_chunk(params, opt_state, start, n):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), start + jnp.arange(n)
        )
        return params, opt_state, losses[-1]

    chunk = 100 if steps >= 100 else steps
    loss = None
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        params, opt_state, loss = run_chunk(
            params, opt_state, jnp.asarray(done, jnp.int32), n
        )
        done += n
        if log_every and (done % log_every == 0 or done == steps):
            print(f"induction step {done}/{steps}: loss {float(loss):.3f}")
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
