"""Prompt-lookup speculative decoding (n-gram drafting, exact greedy).

Replaces sequential one-token decode steps with draft-and-verify rounds.
The drafter is the sequence itself: RAG continuations constantly copy
spans from the retrieved contexts and the question (vLLM ships the same
idea as "prompt lookup" / ngram speculative decoding,
reference: rag-evaluation-harness/lm_eval/models/vllm_causallms.py backend
surface), so the last ``ngram`` generated tokens usually reappear earlier
in prompt+generation, and the tokens that followed that earlier occurrence
are a high-quality draft.

TPU-native design — the whole round is ONE jitted step, the same dispatch
count as plain decode:

  * drafting runs ON DEVICE: a vectorized sliding-window compare over the
    [B, T] token history picks the latest n-gram match (no host sync);
  * verification is one ``forward_with_cache`` call on the
    [B, draft_len+1] segment ``[last_token, d_1..d_g]`` — decode is
    HBM-weight-bound, so scoring g+1 tokens streams the same weights as
    scoring 1: acceptance rate ~= wall-clock speedup;
  * K/V for the segment lands in the cache via per-row contiguous
    ``dynamic_update_slice`` (REPLACING slot contents), so slots written
    for rejected drafts are provably overwritten by the next round before
    ``key_valid`` ever exposes them.

Acceptance keeps the longest draft prefix where the model's own greedy
argmax agrees, then takes the model's next token as a bonus — the output
is token-for-token IDENTICAL to sequential greedy decoding (pinned by
tests against ``make_generate_fn``). ``temperature > 0`` switches to
speculative REJECTION sampling (accept d with prob p(d); resample the
first rejection from the residual), which is distribution-identical to
sequential ancestral sampling — pinned by a statistical test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.models.generate import (
    KVCache,
    forward_with_cache,
    init_cache,
)
from retrieval_scaling_tpu.models.llama import LlamaConfig


class SpecState(NamedTuple):
    cache: KVCache
    all_tokens: jax.Array  # [B, T] prompt + emitted history (drafting pool)
    tokens: jax.Array      # [B, max_new + g + 1] output buffer (eos-filled)
    last_token: jax.Array  # [B] newest real token, not yet in cache
    cur_len: jax.Array     # [B] cache slot of last_token
    gen_count: jax.Array   # [B] tokens emitted so far
    finished: jax.Array    # [B]
    step: jax.Array
    rng: jax.Array         # sampling stream (unused on the greedy path)


def _draft_ngram(all_tokens, last_token, cur_len, ngram: int, draft_len: int):
    """Latest-match prompt lookup, vectorized over the batch.

    all_tokens: [B, T] history with ``last_token`` stored at index
    ``cur_len``. Tries n-gram lengths from ``ngram`` down to 1 (longer
    matches give higher-precision drafts; shorter ones keep the drafter
    firing when the long tail is novel): for the longest n with a match,
    finds the latest start p <= cur_len - n with ``all_tokens[p : p + n]
    == all_tokens[cur_len - n + 1 : cur_len + 1]`` and returns the
    ``draft_len`` tokens following it. No match at any level -> the
    (clamped) gather yields arbitrary history tokens; verification
    rejects bad drafts, so any filler is safe.
    """
    b, t = all_tokens.shape
    starts_full = jnp.arange(t)[None, :]
    best_p = jnp.full((b,), -1, jnp.int32)
    best_n = jnp.zeros((b,), jnp.int32)
    for n in range(1, ngram + 1):  # ascending: a longer match overwrites
        n_win = t - n + 1
        tail_idx = cur_len[:, None] + jnp.arange(-n + 1, 1)[None, :]
        tail = jnp.take_along_axis(all_tokens, jnp.maximum(tail_idx, 0), axis=1)
        match = jnp.ones((b, n_win), bool)
        for j in range(n):
            match = match & (all_tokens[:, j : j + n_win] == tail[:, j : j + 1])
        starts = starts_full[:, :n_win]
        # match must end strictly before the trailing n-gram's end (exclude
        # the trivial self-match; overlap with the tail is fine —
        # continuations reaching past the history read the -1 fill and
        # verification rejects)
        valid = starts <= (cur_len[:, None] - n)
        p = jnp.max(jnp.where(match & valid, starts, -1), axis=1)  # [B]
        best_p = jnp.where(p >= 0, p, best_p)
        best_n = jnp.where(p >= 0, n, best_n)
    cont_idx = jnp.clip(
        best_p[:, None] + best_n[:, None] + jnp.arange(draft_len)[None, :], 0, t - 1
    )
    return jnp.take_along_axis(all_tokens, cont_idx, axis=1)  # [B, g]


def greedy_emission(draft, y, pad_id: int = 0):
    """Shared accept/emit core for both speculative engines.

    draft: [B, g] drafted tokens; y: [B, g+1] the model's greedy argmax
    after each segment position. Returns ``(a, stream)``: ``a`` [B] is the
    longest draft prefix the model itself would have produced, and
    ``stream`` [B, g+1] holds the next greedy tokens — accepted drafts
    then the bonus token (positions past ``a`` repeat the bonus; callers
    cap how many they consume). Any prefix of ``stream`` up to ``a+1``
    tokens is exactly what sequential greedy decode emits.
    """
    b, g = draft.shape
    agree = draft == y[:, :g]
    a = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
    j = jnp.arange(g + 1)[None, :]
    bonus = jnp.take_along_axis(y, a[:, None], axis=1)
    cand = jnp.concatenate([draft, jnp.full((b, 1), pad_id, jnp.int32)], axis=1)
    return a, jnp.where(j < a[:, None], cand, bonus)


def make_speculative_generate_fn(
    cfg,
    max_new_tokens: int,
    eos_id: int,
    draft_len: int = 7,
    ngram: int = 3,
    kv_cache: str | None = None,
    mesh=None,
    with_stats: bool = False,
    temperature: float = 0.0,
    param_shardings=None,
    scripted: bool = False,
):
    """Jitted ``(params, prompt_ids, prompt_lens, seed) -> tokens [B, max_new]``.

    Drop-in for ``make_generate_fn`` with fewer device rounds. Greedy
    (``temperature <= 0``) output is token-for-token identical to the
    static engine. ``temperature > 0`` runs speculative REJECTION
    sampling: each drafted token d is accepted with probability p(d)
    (the drafter is a point mass, so min(1, p/q) = p(d)); on the first
    rejection the replacement is drawn from the residual p with d zeroed,
    and a full acceptance draws the bonus from the next distribution —
    the emitted stream is distribution-identical to sequential ancestral
    sampling (pinned by a statistical test), though not seed-for-seed
    equal to the static sampler (different randomness consumption).
    ``with_stats``: also return ``(rounds, emitted)`` — decode rounds and
    total tokens, whose ratio is the realized acceptance.

    ``scripted``: measurement harness — the returned fn takes an extra
    ``script_ids [B, max_new_tokens]`` argument and emits exactly those
    tokens instead of the model's argmax, while every verify forward still
    runs the FULL model compute (weight streams, KV writes). Prompt-lookup
    acceptance depends on how much the generation copies the prompt; with
    no network access there is no trained checkpoint whose greedy output
    copies retrieved contexts, so the bench scripts continuations with a
    controlled prompt-copy rate and measures realized tokens/round and
    tok/s at RAG-like copy structure. Timing is hardware-honest; only the
    emitted token VALUES are scripted.
    """
    if kv_cache not in (None, "", "none", "int8"):
        raise ValueError(f"unknown kv_cache {kv_cache!r}")
    g = int(draft_len)
    if g < 1:
        raise ValueError("draft_len must be >= 1")
    sampled = temperature is not None and temperature > 0.0
    if scripted and sampled:
        raise ValueError("scripted emission is greedy-only")

    def fn(params, prompt_ids, prompt_lens, seed, script_ids=None):
        # Any mesh: decode flash must trace inside the sharding context
        # (see models/generate.py make_generate_fn)
        if mesh is not None:
            from retrieval_scaling_tpu.ops.flash_attention import (
                attention_head_sharding,
            )

            with attention_head_sharding(mesh):
                return _fn(params, prompt_ids, prompt_lens, seed, script_ids)
        return _fn(params, prompt_ids, prompt_lens, seed, script_ids)

    def _fn(params, prompt_ids, prompt_lens, seed, script_ids=None):
        b, s_pad = prompt_ids.shape
        max_len = s_pad + max_new_tokens + g + 1  # verify-segment headroom
        if max_len > cfg.max_position_embeddings:
            raise ValueError(
                f"prompt ({s_pad}) + max_new_tokens ({max_new_tokens}) + "
                f"draft headroom ({g + 1}) exceeds max_position_embeddings "
                f"({cfg.max_position_embeddings})"
            )
        embed = params["embed"] if isinstance(cfg, LlamaConfig) else params["embed_in"]
        cache_dtype = jnp.int8 if kv_cache == "int8" else embed.dtype
        cache = init_cache(cfg, b, max_len, dtype=cache_dtype)

        # ---- prefill (identical to the static engine) ----------------------
        positions = jnp.broadcast_to(jnp.arange(s_pad)[None, :], (b, s_pad))
        key_valid = jnp.arange(max_len)[None, :] < prompt_lens[:, None]
        write_mask = jnp.arange(s_pad)[None, :] < prompt_lens[:, None]
        logits, cache = forward_with_cache(
            params, cfg, prompt_ids, positions, cache, key_valid, write_mask
        )
        last_logits = jnp.take_along_axis(
            logits, (prompt_lens - 1)[:, None, None], axis=1
        )[:, 0]
        rng0 = jax.random.PRNGKey(seed)
        if scripted:
            first = script_ids[:, 0].astype(jnp.int32)
        elif sampled:
            first = jax.random.categorical(
                jax.random.fold_in(rng0, 0),
                last_logits.astype(jnp.float32) / temperature, axis=-1,
            ).astype(jnp.int32)
        else:
            first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        t_hist = s_pad + max_new_tokens + g + 2
        all_tokens = jnp.zeros((b, t_hist), jnp.int32)
        all_tokens = jax.lax.dynamic_update_slice(all_tokens, prompt_ids, (0, 0))
        # pad tokens beyond each row's real prompt must not produce n-gram
        # matches: overwrite them with -1 (no real token id)
        hist_idx = jnp.arange(t_hist)[None, :]
        all_tokens = jnp.where(hist_idx < prompt_lens[:, None], all_tokens, -1)
        all_tokens = jnp.where(
            hist_idx == prompt_lens[:, None], first[:, None], all_tokens
        )

        out_buf = jnp.full((b, max_new_tokens + g + 1), eos_id, jnp.int32)
        out_buf = out_buf.at[:, 0].set(first)

        state = SpecState(
            cache=cache,
            all_tokens=all_tokens,
            tokens=out_buf,
            last_token=first,
            cur_len=prompt_lens,
            gen_count=jnp.ones((b,), jnp.int32),
            finished=(first == eos_id) | (max_new_tokens <= 1),
            step=jnp.zeros((), jnp.int32),
            rng=rng0,
        )

        def cond(st: SpecState):
            return (st.step < max_new_tokens) & ~jnp.all(st.finished)

        def body(st: SpecState):
            n = st.cur_len
            draft = _draft_ngram(st.all_tokens, st.last_token, n, ngram, g)
            seg = jnp.concatenate([st.last_token[:, None], draft], axis=1)  # [B, g+1]
            positions = n[:, None] + jnp.arange(g + 1)[None, :]
            key_valid = jnp.arange(max_len)[None, :] < (n + g + 1)[:, None]
            logits, cache = forward_with_cache(
                params, cfg, seg, positions, st.cache, key_valid,
                contiguous_writes=True,
            )
            if sampled:
                # speculative rejection sampling with a point-mass drafter:
                # accept d_j with prob p_j(d_j); first rejection resamples
                # from p_j with d_j zeroed; full acceptance draws the bonus
                # from p_{g+1}. Distribution-identical to sequential
                # ancestral sampling at this temperature.
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32) / temperature, axis=-1
                )  # [B, g+1, V]
                r_acc, r_new = jax.random.split(jax.random.fold_in(st.rng, st.step + 1))
                pd = jnp.take_along_axis(
                    probs[:, :g], draft[..., None], axis=2
                )[..., 0]  # [B, g]
                acc = jax.random.uniform(r_acc, (b, g)) < pd
                a = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
                p_last = jnp.take_along_axis(probs, a[:, None, None], axis=1)[:, 0]
                rej_tok = jnp.take_along_axis(
                    draft, jnp.minimum(a, g - 1)[:, None], axis=1
                )[:, 0]
                vocab = jnp.arange(p_last.shape[-1])[None, :]
                p_res = jnp.where(
                    (a < g)[:, None] & (vocab == rej_tok[:, None]), 0.0, p_last
                )
                repl = jax.random.categorical(r_new, jnp.log(p_res), axis=-1).astype(jnp.int32)
                j_g = jnp.arange(g + 1)[None, :]
                cand = jnp.concatenate(
                    [draft, jnp.zeros((b, 1), jnp.int32)], axis=1
                )
                stream = jnp.where(j_g < a[:, None], cand, repl[:, None])
            else:
                if scripted:
                    # the "model's" next tokens are the script at the
                    # current emission offset (the forward above still ran
                    # the full verify compute — see docstring)
                    s_idx = jnp.clip(
                        st.gen_count[:, None] + jnp.arange(g + 1)[None, :],
                        0, script_ids.shape[1] - 1,
                    )
                    y = jnp.take_along_axis(script_ids, s_idx, axis=1).astype(jnp.int32)
                else:
                    y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, g+1]
                a, stream = greedy_emission(draft, y)
            rem = jnp.maximum(max_new_tokens - st.gen_count, 1)
            emit = jnp.minimum(a + 1, rem)                 # accepted + bonus
            emit = jnp.where(st.finished, 0, emit)

            # emission vector: the stream's first `emit` tokens, eos fill.
            # (A budget-capped prefix is still exact: stream[emit-1] equals
            # the accepted draft there, which IS the model's greedy token.)
            j = jnp.arange(g + 1)[None, :]
            e = jnp.where(j < emit[:, None], stream, eos_id)
            # finished rows emit nothing — without this their write below
            # would stamp a garbage token into the eos tail
            e = jnp.where(st.finished[:, None], eos_id, e)
            # propagate the first emitted eos over the rest of the vector
            is_eos = (e == eos_id) & (j < emit[:, None])
            prior_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos
            e = jnp.where(prior_eos > 0, eos_id, e)

            def write_row(buf, vec, off):
                return jax.lax.dynamic_update_slice(buf, vec, (off,))

            tokens = jax.vmap(write_row)(st.tokens, e, st.gen_count)
            all_tokens = jax.vmap(write_row)(st.all_tokens, e, n + 1)

            new_last = jnp.take_along_axis(e, jnp.maximum(emit - 1, 0)[:, None], axis=1)[:, 0]
            new_last = jnp.where(st.finished, st.last_token, new_last)
            hit_eos = jnp.any(is_eos, axis=1)
            gen_count = st.gen_count + emit
            return SpecState(
                cache=cache,
                all_tokens=all_tokens,
                tokens=tokens,
                last_token=new_last,
                cur_len=n + emit,
                gen_count=gen_count,
                finished=st.finished | hit_eos | (gen_count >= max_new_tokens),
                step=st.step + 1,
                rng=st.rng,
            )

        final = jax.lax.while_loop(cond, body, state)
        if with_stats:
            return (
                final.tokens[:, :max_new_tokens],
                final.step,
                jnp.sum(final.gen_count),
            )
        return final.tokens[:, :max_new_tokens]

    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, P("data"))
    rows2d = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    out_sh = (rows2d, rep, rep) if with_stats else rows2d
    in_sh = (param_shardings if param_shardings is not None else rep,
             rows2d, rows, rep)
    if scripted:
        in_sh = in_sh + (rows2d,)
    return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)
