"""Slot-based continuous-batching generation engine (the vLLM analog).

The reference ships a vLLM backend whose continuous batching removes
head-of-line blocking on generate_until workloads (reference:
rag-evaluation-harness/lm_eval/models/vllm_causallms.py:48,77). A TPU-native
equivalent under XLA's static-shape rules:

  * a fixed KV slot pool ``[slots, Hkv, max_len, hd]`` per layer (reuses
    ``models/generate.py``'s per-layer in-place cache buffers);
  * ADMISSION WAVES: every admissible request joins ONE device program
    that batch-prefills the wave at a shared width bucket and scatters
    K/V + decode state into the pool (OOB slot index = dropped padding) —
    one dispatch per wave, not a prefill+insert pair per request;
  * one jitted DECODE CHUNK (``lax.scan`` over ``chunk`` steps) advances
    every occupied slot ``chunk`` tokens per device call, so eos and
    stop-string handling stay host-side without a per-token sync.

Static-shape consequences: every device program is compiled once per
(wave, width) or per chunk bucket; admission and completion are pure
host bookkeeping.

The scheduler is PIPELINED with EAGER SLOT TURNOVER (round-4 rework; the
round-3 version lost to static bucketing on wall-clock because every
chunk and every admission blocked on a host↔device round trip, and slots
idled between a request's last useful token and its retirement):

  * decode state ``(pool, last, cur_len)`` chains between chunk dispatches
    as device arrays — the host never re-uploads it;
  * up to ``pipeline_depth`` decode chunks stay in flight, so fetching
    chunk k's tokens overlaps chunk k+1's device execution;
  * a slot frees as soon as its schedule GUARANTEES the request's budget
    is in flight (greedy chunks yield exactly their length; a speculative
    round yields at least one token) — the tokens are assembled later
    from the in-flight chunks, routed by chunk sequence number;
  * admission order is LPT (largest decode budget first), the classic
    makespan heuristic.

A chunk dispatched before a slot's (re)admission carries junk for that
slot (the assembly records filter it host-side); junk K/V writes are
overwritten before they are read, exactly like the free-slot stepping
below.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_scaling_tpu.models.generate import (
    KVCache,
    forward_with_cache,
    init_cache,
)

logger = logging.getLogger(__name__)


def _bucket(length: int, cap: int) -> int:
    b = 32
    while b < length:
        b *= 2
    return min(b, max(cap, 1))


def clamp_request(prompt_ids, max_new: int, max_len: int, min_prompt: int = 16):
    """(prompt, max_new, prefill_width) with the invariants the slot pool
    needs: prompt fits its bucket, prompt_len + max_new <= max_len, and at
    least ``min_prompt`` prompt tokens survive even when the caller asks
    for max_new >= max_len (previously `[-0:]` kept the whole prompt and
    the width bucket collapsed to 1 — a broadcast crash)."""
    max_new = max(int(max_new), 1)
    budget = max_len - max_new
    if budget < min_prompt:
        budget = min(min_prompt, max_len - 1)
        max_new = max_len - budget
    prompt = list(prompt_ids)[-budget:]
    width = _bucket(len(prompt), budget)
    assert width >= len(prompt)
    return prompt, max_new, width


class ContinuousBatcher:
    """Token-level continuous-batching generator.

    ``generate(requests)`` takes ``[(prompt_ids, max_new_tokens), ...]`` and
    returns a token-id list per request (eos excluded). ``stop_check(i,
    tokens) -> bool`` lets the caller finish request ``i`` early (stop
    strings) — checked once per decode chunk.
    """

    def __init__(
        self,
        params,
        cfg,
        eos_id: int,
        slots: int = 8,
        max_len: int = 2048,
        chunk: int = 16,
        dtype=None,
        speculative: bool = False,
        draft_len: int = 7,
        ngram: int = 3,
        mesh=None,
        pipeline_depth: int = 4,
    ):
        if max_len > cfg.max_position_embeddings:
            max_len = cfg.max_position_embeddings
        if dtype is None:
            # match make_generate_fn: cache dtype follows the embedding
            from retrieval_scaling_tpu.models.llama import LlamaConfig as _LC

            embed = params["embed"] if isinstance(cfg, _LC) else params["embed_in"]
            dtype = embed.dtype
        self.params = params
        self.cfg = cfg
        # TP (``mesh`` with a >1 'model' axis, params Megatron-sharded):
        # decode-step flash must trace inside the head-sharding context or
        # GSPMD replicates the pallas_call and all-gathers the sharded
        # KV pool every chunk. Slots are not data-sharded (batch_axis=None).
        self.mesh = mesh

        def _tp_ctx():
            if mesh is not None and mesh.shape.get("model", 1) > 1:
                from retrieval_scaling_tpu.ops.flash_attention import (
                    attention_head_sharding,
                )

                return attention_head_sharding(mesh, batch_axis=None)
            import contextlib

            return contextlib.nullcontext()

        self._tp_ctx = _tp_ctx
        self.eos_id = int(eos_id)
        self.slots = int(slots)
        self.max_len = int(max_len)
        self.chunk = int(chunk)
        self.depth = max(1, int(pipeline_depth))
        # speculative rounds write draft_len+1 positions past a slot's last
        # real token; shrink the usable budget so verify segments stay
        # inside the pool (clamp_request keeps prompts within it)
        self.speculative = bool(speculative)
        self.draft_len = int(draft_len)
        self.ngram = int(ngram)
        self._headroom = self.draft_len + 1 if self.speculative else 0
        if self.speculative and (self.draft_len < 1 or self._headroom + 32 > self.max_len):
            # a silent negative prompt budget would index rotary tables with
            # negative positions and emit deterministic garbage — refuse
            raise ValueError(
                f"draft_len={self.draft_len} leaves no usable context in "
                f"max_len={self.max_len} (need draft_len+33 <= max_len)"
            )
        self.pool = init_cache(cfg, self.slots, self.max_len, dtype=dtype)
        self._prefill_fns = {}
        # device-work accounting (decode_chunks * slots * chunk = slot-steps
        # executed; wall clock through a relayed harness overstates the
        # per-chunk sync cost, slot-steps do not)
        self.stats = {"decode_chunks": 0, "prefills": 0, "spec_rounds": 0, "spec_emitted": 0}
        if self.speculative:
            # per-slot token history for the n-gram drafter (-1 = no token)
            self.hist = jnp.full((self.slots, self.max_len), -1, jnp.int32)

        # ---- decode chunk: scan `length` single-token steps over the pool.
        # Compiled per bucketed length: the scheduler picks the largest
        # bucket not exceeding the smallest remaining budget among active
        # slots, so chunks never overshoot a known budget (eos is the only
        # source of wasted steps).
        self._chunk_buckets = sorted(
            {c for c in (4, 8, 16, 32, 64, 128) if c <= self.chunk} | {self.chunk}
        )

        def decode_chunk(params, pool: KVCache, last, cur_len, *, length):
            with self._tp_ctx():
                return _decode_chunk(params, pool, last, cur_len, length)

        def _decode_chunk(params, pool: KVCache, last, cur_len, length):
            # last: [slots] int32; cur_len: [slots] int32 (next write pos).
            # Free slots still step, harmlessly: their writes land at a
            # stale position and are overwritten or masked out by
            # key_valid when the slot is reused.
            seed = last  # input token per slot: a freshly admitted slot's
            # FIRST generated token (set by the fused insert), prepended to
            # the output so admission never syncs on it host-side
            def step(carry, _):
                pool, last, cur_len = carry
                pos = jnp.minimum(cur_len, self.max_len - 1)[:, None]
                key_valid = (
                    jnp.arange(self.max_len)[None, :] <= pos
                )
                logits, pool = forward_with_cache(
                    params, self.cfg, last[:, None], pos, pool, key_valid
                )
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                return (pool, nxt, cur_len + 1), nxt

            (pool, last, cur_len), toks = jax.lax.scan(
                step, (pool, last, cur_len), None, length=length
            )
            # [slots, 1 + length]: column 0 is the seed token
            toks_full = jnp.concatenate([seed[:, None], toks.T], axis=1)
            return pool, last, cur_len, toks_full

        self._decode_chunk_fns = {}

        def _decode_chunk_fn(length: int):
            if length not in self._decode_chunk_fns:
                self._decode_chunk_fns[length] = jax.jit(
                    functools.partial(decode_chunk, length=length),
                    donate_argnums=(1,),
                )
            return self._decode_chunk_fns[length]

        self._decode_chunk_fn = _decode_chunk_fn

        # ---- speculative chunk: R draft+verify rounds over the pool.
        # Each round advances every slot by a VARIABLE 1..draft_len+1
        # tokens (accepted prefix + bonus); the host unpacks
        # (tokens [slots, R, g+1], counts [slots, R]) in order. The
        # emitted stream per slot is token-exact greedy — acceptance only
        # decides how many greedy tokens one weight-stream pass yields.
        self.rounds = max(1, self.chunk // 4)

        def spec_chunk(params, pool: KVCache, last, cur_len, hist):
            with self._tp_ctx():
                return _spec_chunk(params, pool, last, cur_len, hist)

        def _spec_chunk(params, pool: KVCache, last, cur_len, hist):
            from retrieval_scaling_tpu.models.speculative import (
                _draft_ngram,
                greedy_emission,
            )

            g = self.draft_len
            seed = last  # see _decode_chunk: prepended as a count-1 round

            def rnd(carry, _):
                pool, last, cur_len, hist = carry
                # keep verify segments inside the pool even for stale free
                # slots (live slots never clamp: clamp_request reserves
                # the headroom)
                n = jnp.minimum(cur_len, self.max_len - g - 1)
                draft = _draft_ngram(hist, last, n, self.ngram, g)
                seg = jnp.concatenate([last[:, None], draft], axis=1)
                positions = n[:, None] + jnp.arange(g + 1)[None, :]
                key_valid = jnp.arange(self.max_len)[None, :] < (n + g + 1)[:, None]
                logits, pool = forward_with_cache(
                    params, self.cfg, seg, positions, pool, key_valid,
                    contiguous_writes=True,
                )
                y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [slots, g+1]
                a, e = greedy_emission(draft, y)  # shared accept/emit core
                emit = a + 1
                last_new = e[:, g]  # positions >= a repeat the bonus token

                def wr(h, vec, off):
                    return jax.lax.dynamic_update_slice(h, vec, (off,))

                hist = jax.vmap(wr)(hist, e, n + 1)
                return (pool, last_new, n + emit, hist), (e, emit)

            (pool, last, cur_len, hist), (toks, counts) = jax.lax.scan(
                rnd, (pool, last, cur_len, hist), None, length=self.rounds
            )
            # scan stacks on axis 0: [R, slots, ...] -> slot-major, with a
            # synthetic count-1 "round 0" carrying the seed token
            seed_toks = jnp.broadcast_to(
                seed[:, None, None], (self.slots, 1, g + 1)
            ).astype(toks.dtype)
            toks_full = jnp.concatenate([seed_toks, toks.transpose(1, 0, 2)], axis=1)
            counts_full = jnp.concatenate(
                [jnp.ones((self.slots, 1), counts.dtype), counts.T], axis=1
            )
            return pool, last, cur_len, hist, toks_full, counts_full

        self._spec_chunk = jax.jit(spec_chunk, donate_argnums=(1,))

    def _admit_wave_fn(self, wave: int, width: int):
        """ONE device program per admission wave (coalesced multi-slot
        prefill): batch-prefill ``wave`` prompts at ``width`` and scatter
        K/V + decode state (+ drafter history) into the pool. Padding
        entries carry ``slot_idx == self.slots`` — out of bounds, so every
        ``.at[...].set(mode='drop')`` drops them. Replaces the round-3
        per-request prefill+insert pair (2 dispatches per admission)."""
        key = (wave, width)
        if key not in self._prefill_fns:

            def admit(params, pool: KVCache, last, cur_len, hist,
                      ids, lens, slot_idx):
                with self._tp_ctx():
                    return _admit(params, pool, last, cur_len, hist,
                                  ids, lens, slot_idx)

            def _admit(params, pool, last, cur_len, hist, ids, lens, slot_idx):
                cache = init_cache(
                    self.cfg, wave, width, dtype=self.pool.k[0].dtype
                )
                positions = jnp.broadcast_to(
                    jnp.arange(width)[None, :], (wave, width)
                )
                key_valid = jnp.arange(width)[None, :] < lens[:, None]
                logits, cache = forward_with_cache(
                    params, self.cfg, ids, positions, cache, key_valid,
                    key_valid,
                )
                lastlog = jnp.take_along_axis(
                    logits, (lens - 1)[:, None, None], axis=1
                )[:, 0]
                first = jnp.argmax(lastlog, axis=-1).astype(jnp.int32)
                new_k = tuple(
                    pk.at[slot_idx, :, :width, :].set(ck, mode="drop")
                    for pk, ck in zip(pool.k, cache.k)
                )
                new_v = tuple(
                    pv.at[slot_idx, :, :width, :].set(cv, mode="drop")
                    for pv, cv in zip(pool.v, cache.v)
                )
                last = last.at[slot_idx].set(first, mode="drop")
                cur_len = cur_len.at[slot_idx].set(lens, mode="drop")
                if hist is not None:
                    rows = jnp.pad(
                        ids[:, : self.max_len],
                        ((0, 0), (0, max(self.max_len - width, 0))),
                        constant_values=-1,
                    )
                    ar = jnp.arange(self.max_len)[None, :]
                    rows = jnp.where(ar < lens[:, None], rows, -1)
                    rows = jnp.where(ar == lens[:, None], first[:, None], rows)
                    hist = hist.at[slot_idx].set(rows, mode="drop")
                return KVCache(new_k, new_v), last, cur_len, hist

            self._prefill_fns[key] = jax.jit(
                admit, donate_argnums=(1, 2, 3, 4)
            )
        return self._prefill_fns[key]

    def admit_wave(self, entries, last_d, cur_d):
        """Admit ``entries = [(slot, prompt_ids), ...]`` in one device call.
        Returns the chained (last, cur_len) device arrays."""
        if not entries:
            return last_d, cur_d
        wv = 1
        while wv < len(entries):
            wv *= 2
        wv = min(wv, self.slots)
        width = _bucket(
            max(len(p) for _, p in entries), self.max_len - self._headroom
        )
        ids = np.full((wv, width), self.eos_id, np.int32)
        lens = np.ones((wv,), np.int32)
        slot_idx = np.full((wv,), self.slots, np.int32)  # OOB -> dropped
        for j, (slot, prompt) in enumerate(entries):
            ids[j, : len(prompt)] = prompt
            lens[j] = len(prompt)
            slot_idx[j] = slot
        hist = self.hist if self.speculative else None
        self.pool, last_d, cur_d, hist = self._admit_wave_fn(wv, width)(
            self.params, self.pool, last_d, cur_d, hist,
            jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(slot_idx),
        )
        if self.speculative:
            self.hist = hist
        self.stats["prefills"] += len(entries)
        return last_d, cur_d

    # ------------------------------------------------------------ schedule
    def generate(
        self,
        requests: Sequence[Tuple[List[int], int]],
        stop_check: Optional[Callable[[int, List[int]], bool]] = None,
        on_finish: Optional[Callable[[int], None]] = None,
    ) -> List[List[int]]:
        """Pipelined scheduler: device state chains between dispatches, up
        to ``self.depth`` decode chunks stay in flight, and the host blocks
        only on token fetches (overlapped with in-flight compute).

        Slots are freed EAGERLY: once a slot's schedule guarantees its
        request's full budget is in flight (greedy chunks yield exactly
        ``length`` tokens; a speculative round yields at least one), the
        slot re-admits immediately — the remaining tokens are assembled
        later from in-flight chunks, routed to per-request records by
        chunk sequence number. Waiting for the tokens to RETIRE before
        re-admitting (the round-3 scheme) wasted up to depth*chunk junk
        slot-steps per turnover. ``on_finish(i)`` fires when request ``i``
        completes (latency instrumentation)."""
        from collections import deque

        n = len(requests)
        results: List[Optional[List[int]]] = [None] * n
        # LPT admission: largest decode budget first (classic longest-
        # processing-time makespan heuristic — a 128-token request admitted
        # last would run alone at the tail while the other slots idle)
        pending = sorted(
            range(n), key=lambda i: (requests[i][1], len(requests[i][0]))
        )
        free = list(range(self.slots))
        cur: dict = {}  # slot -> request currently being SCHEDULED on it

        last_d = jnp.full((self.slots,), self.eos_id, jnp.int32)
        cur_d = jnp.zeros((self.slots,), jnp.int32)
        budget = [0] * n
        seq = 0                    # next chunk sequence number
        inflight: deque = deque()  # (seq, toks_handle, counts_handle)
        # guaranteed tokens scheduled for the slot's CURRENT request
        # (seed counts as 1; greedy chunk adds its length, a speculative
        # chunk adds `rounds` — each round emits >= 1 token)
        sched = [0] * self.slots
        # assembly records per slot, admission order: [a_seq, i, tokens,
        # done] — a retired chunk `s` belongs to the newest record with
        # a_seq <= s
        recs: List[List[list]] = [[] for _ in range(self.slots)]
        unfinished = 0

        def complete(rec):
            nonlocal unfinished
            rec[3] = True
            unfinished -= 1
            i = rec[1]
            toks = rec[2]
            if self.eos_id in toks:
                toks = toks[: toks.index(self.eos_id)]
            results[i] = toks
            if on_finish is not None:
                on_finish(i)

        def admit():
            nonlocal last_d, cur_d, unfinished
            # fully async: the prefill's first token never crosses to the
            # host here — the fused wave seeds it into last_d, and each
            # slot's first decode chunk returns it as its seed column.
            # All admissible requests go in ONE device call (batched
            # prefill + scatter insert), not one pair of calls each.
            entries = []
            while pending and free:
                i = pending.pop()  # shortest-first from the back
                prompt, max_new = requests[i]
                prompt, max_new, _ = clamp_request(
                    prompt, max_new, self.max_len - self._headroom
                )
                slot = free.pop()
                entries.append((slot, prompt))
                cur[slot] = i
                budget[i] = max_new
                recs[slot].append([seq, i, [], False])
                unfinished += 1
                sched[slot] = 1  # the seed token is already scheduled
            last_d, cur_d = self.admit_wave(entries, last_d, cur_d)

        def pick_chunk_len() -> int:
            # largest bucket not exceeding the smallest positive remaining
            # budget among scheduling slots
            remaining = [
                budget[cur[sl]] - sched[sl]
                for sl in cur
                if budget[cur[sl]] > sched[sl]
            ]
            if not remaining:
                return self._chunk_buckets[0]
            need = min(remaining)
            length = self._chunk_buckets[0]
            for c in self._chunk_buckets:
                if c <= need:
                    length = c
            return length

        def need_more() -> bool:
            return any(budget[cur[sl]] > sched[sl] for sl in cur)

        def free_covered():
            # eager turnover: the slot's guaranteed schedule covers its
            # budget -> every needed token is in flight; eos/stop can only
            # shorten the request, never extend it
            for sl in [s for s in cur if sched[s] >= budget[cur[s]]]:
                del cur[sl]
                free.append(sl)

        def dispatch():
            nonlocal seq, last_d, cur_d
            if self.speculative:
                self.pool, last_d, cur_d, self.hist, toks, counts = self._spec_chunk(
                    self.params, self.pool, last_d, cur_d, self.hist
                )
                guaranteed = self.rounds  # >= 1 emitted token per round
            else:
                guaranteed = pick_chunk_len()
                self.pool, last_d, cur_d, toks = self._decode_chunk_fn(guaranteed)(
                    self.params, self.pool, last_d, cur_d
                )
                counts = None
            self.stats["decode_chunks"] += 1
            self.stats["slot_steps"] = (
                self.stats.get("slot_steps", 0) + guaranteed * self.slots
            )
            for sl in cur:
                sched[sl] += guaranteed
            # start the device->host copy now; np.asarray at processing
            # time then finds the data already staged
            for h in (toks, counts):
                if h is not None and hasattr(h, "copy_to_host_async"):
                    h.copy_to_host_async()
            inflight.append((seq, toks, counts))
            seq += 1
            free_covered()
            admit()

        admit()
        while unfinished or cur:
            while len(inflight) < self.depth and (need_more() or not inflight):
                dispatch()
            if not inflight:
                break  # every owed token has been assembled
            s, toks_h, counts_h = inflight.popleft()
            toks_np = np.asarray(toks_h)  # overlaps in-flight chunk compute
            counts_np = np.asarray(counts_h) if counts_h is not None else None
            live_slots = []
            for slot in range(self.slots):
                rec = None
                for r in recs[slot]:
                    if r[0] <= s:
                        rec = r  # newest record whose window covers s
                    else:
                        break
                if rec is None or rec[3]:
                    continue
                live_slots.append(slot)
                i = rec[1]
                # the record's FIRST chunk carries its seed token in
                # column/round 0; later chunks' seed repeats an already-
                # emitted token and is skipped
                fresh = rec[0] == s and not rec[2]
                if counts_np is None:
                    emitted = toks_np[slot] if fresh else toks_np[slot, 1:]
                else:
                    r0 = 0 if fresh else 1
                    emitted = [
                        t
                        for r in range(r0, toks_np.shape[1])
                        for t in toks_np[slot, r, : counts_np[slot, r]]
                    ]
                done = False
                for t in emitted:
                    rec[2].append(int(t))
                    if int(t) == self.eos_id or len(rec[2]) >= budget[i]:
                        done = True
                        break
                if not done and stop_check and stop_check(i, rec[2]):
                    done = True
                if done:
                    complete(rec)
                    if cur.get(slot) == i:  # eos/stop beat the schedule
                        del cur[slot]
                        free.append(slot)
            if self.speculative and live_slots:
                # acceptance realized over slots whose tokens were valid
                # for this chunk (junk rounds from free/stale slots would
                # inflate tokens-per-round); the seed round 0 is bookkeeping
                self.stats["spec_rounds"] += int(self.rounds) * len(live_slots)
                self.stats["spec_emitted"] += int(counts_np[live_slots, 1:].sum())
            admit()
        # trailing in-flight chunks hold junk for already-finished slots;
        # the chained pool/hist handles stay valid for the next call
        inflight.clear()
        return [r if r is not None else [] for r in results]
