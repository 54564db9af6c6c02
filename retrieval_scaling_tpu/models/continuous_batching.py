"""Slot-based continuous-batching generation engine (the vLLM analog).

The reference ships a vLLM backend whose continuous batching removes
head-of-line blocking on generate_until workloads (reference:
rag-evaluation-harness/lm_eval/models/vllm_causallms.py:48,77). A TPU-native
equivalent under XLA's static-shape rules:

  * a fixed KV slot pool ``[slots, Hkv, max_len, hd]`` per layer (reuses
    ``models/generate.py``'s per-layer in-place cache buffers);
  * per-request PREFILL at a bucketed prompt width (batch 1), then INSERT
    copies the prefilled K/V into a free slot via ``dynamic_update_slice``;
  * one jitted DECODE CHUNK (``lax.scan`` over ``chunk`` steps) advances
    every occupied slot ``chunk`` tokens per device call, so eos and
    stop-string handling stay host-side without a per-token sync;
  * a finished slot frees immediately and the next queued request prefills
    into it while the other slots keep decoding.

Static-shape consequences: every device program is compiled once per
(prompt bucket) or once overall (decode chunk / insert); admission and
completion are pure host bookkeeping.

The scheduler is PIPELINED (round-4 rework; the round-3 version lost to
static bucketing on wall-clock because every chunk and every admission
blocked on a host↔device round trip):

  * decode state ``(pool, last, cur_len)`` chains between chunk dispatches
    as device arrays — the host never re-uploads it;
  * up to ``pipeline_depth`` decode chunks stay in flight, so fetching
    chunk k's tokens overlaps chunk k+1's device execution;
  * admission dispatches every prefill + fused insert of a wave
    asynchronously and blocks ONCE on the stacked first tokens;
  * the insert program also refreshes the slot's ``last``/``cur_len``
    entries, so admission costs one device call per request, zero syncs.

A chunk dispatched before a slot's (re)admission carries junk for that
slot (``valid_from`` filters it host-side); junk K/V writes are overwritten
before they are read, exactly like the free-slot stepping below.
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
        pipeline_depth: int = 2,
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

        # admission writes the prompt + first token into the drafter history
        def hist_write(hist, ids, slot, plen, first):
            row = jnp.full((self.max_len,), -1, jnp.int32)
            row = jax.lax.dynamic_update_slice(row, ids[0, : self.max_len], (0,))
            row = jnp.where(jnp.arange(self.max_len) < plen, row, -1)
            row = jnp.where(jnp.arange(self.max_len) == plen, first, row)
            return jax.lax.dynamic_update_slice(hist, row[None, :], (slot, 0))

        self._hist_write = jax.jit(hist_write, donate_argnums=(0,))

        # ---- insert: copy a batch-1 prefilled cache into slot `slot` AND
        # refresh the slot's decode state in the same device program (one
        # call per admission, no host sync)
        def insert(pool: KVCache, pre: KVCache, slot, last, cur_len, first, plen):
            new_k = tuple(
                jax.lax.dynamic_update_slice(pk, nk, (slot, 0, 0, 0))
                for pk, nk in zip(pool.k, pre.k)
            )
            new_v = tuple(
                jax.lax.dynamic_update_slice(pv, nv, (slot, 0, 0, 0))
                for pv, nv in zip(pool.v, pre.v)
            )
            last = last.at[slot].set(first)
            cur_len = cur_len.at[slot].set(plen)
            return KVCache(new_k, new_v), last, cur_len

        self._insert = jax.jit(insert, donate_argnums=(0, 3, 4))

    def _prefill_fn(self, width: int):
        if width not in self._prefill_fns:

            def prefill(params, ids, length):
                # batch-1 prefill into a fresh width-sized cache
                cache = init_cache(self.cfg, 1, width, dtype=self.pool.k[0].dtype)
                positions = jnp.arange(width)[None, :]
                key_valid = jnp.arange(width)[None, :] < length
                write_mask = jnp.arange(width)[None, :] < length
                logits, cache = forward_with_cache(
                    params, self.cfg, ids, positions, cache, key_valid, write_mask
                )
                last = jnp.take_along_axis(
                    logits, (length - 1)[:, None, None], axis=1
                )[:, 0]
                first = jnp.argmax(last, axis=-1).astype(jnp.int32)
                return first, cache

            self._prefill_fns[width] = jax.jit(prefill)
        return self._prefill_fns[width]

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
        ``on_finish(i)`` fires when request ``i`` completes (latency
        instrumentation)."""
        from collections import deque

        n = len(requests)
        results: List[Optional[List[int]]] = [None] * n
        # longest-first admission reduces tail latency (the longest prompts
        # otherwise sit behind a full pool at the end of the run)
        pending = sorted(range(n), key=lambda i: -len(requests[i][0]))
        free = list(range(self.slots))
        active: dict = {}  # slot -> request index

        last_d = jnp.full((self.slots,), self.eos_id, jnp.int32)
        cur_d = jnp.zeros((self.slots,), jnp.int32)
        tokens: List[List[int]] = [[] for _ in range(n)]
        budget = [0] * n
        seq = 0                       # next chunk sequence number
        valid_from = [0] * self.slots  # first chunk seq valid per slot
        inflight: deque = deque()     # (seq, toks_handle, counts_handle)
        # tokens scheduled per slot (seed + dispatched chunk lengths):
        # once every active slot's schedule covers its budget, dispatching
        # more chunks is pure waste — the needed tokens are already in
        # flight, and eos/stop can only shorten them
        sched = [0] * self.slots

        def finish(slot: int):
            i = active.pop(slot)
            toks = tokens[i]
            if self.eos_id in toks:
                toks = toks[: toks.index(self.eos_id)]
            results[i] = toks
            free.append(slot)
            if on_finish is not None:
                on_finish(i)

        def admit():
            nonlocal last_d, cur_d
            # fully async: the prefill's first token never crosses to the
            # host here — the fused insert seeds it into last_d, and the
            # slot's first decode chunk returns it as its seed column
            while pending and free:
                i = pending.pop()  # shortest-first from the back
                prompt, max_new = requests[i]
                prompt, max_new, width = clamp_request(
                    prompt, max_new, self.max_len - self._headroom
                )
                ids = np.full((1, width), self.eos_id, np.int32)
                ids[0, : len(prompt)] = prompt
                ids_j = jnp.asarray(ids)
                first, pre = self._prefill_fn(width)(
                    self.params, ids_j, jnp.asarray([len(prompt)], np.int32)
                )
                self.stats["prefills"] += 1
                slot = free.pop()
                # slot as a device scalar: a Python int would bake the
                # slot index into the compilation and recompile per slot
                slot_j = jnp.asarray(slot, jnp.int32)
                self.pool, last_d, cur_d = self._insert(
                    self.pool, pre, slot_j, last_d, cur_d,
                    first[0], jnp.asarray(len(prompt), jnp.int32),
                )
                if self.speculative:
                    self.hist = self._hist_write(
                        self.hist, ids_j, slot_j,
                        jnp.asarray(len(prompt), jnp.int32), first[0],
                    )
                active[slot] = i
                budget[i] = max_new
                tokens[i] = []
                valid_from[slot] = seq  # next dispatched chunk is valid
                sched[slot] = 1         # the seed token is already scheduled

        def pick_chunk_len() -> int:
            # largest bucket not exceeding the smallest positive remaining
            # budget among active slots (slots already fully scheduled are
            # waiting on detection; stepping them further is unavoidable
            # junk, so they don't cap the chunk)
            remaining = [
                budget[active[sl]] - sched[sl]
                for sl in active
                if budget[active[sl]] > sched[sl]
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
            return any(budget[active[sl]] > sched[sl] for sl in active)

        def dispatch():
            nonlocal seq, last_d, cur_d
            if self.speculative:
                self.pool, last_d, cur_d, self.hist, toks, counts = self._spec_chunk(
                    self.params, self.pool, last_d, cur_d, self.hist
                )
                length = self.rounds * (self.draft_len + 1)  # upper bound
            else:
                length = pick_chunk_len()
                self.pool, last_d, cur_d, toks = self._decode_chunk_fn(length)(
                    self.params, self.pool, last_d, cur_d
                )
                counts = None
            self.stats["decode_chunks"] += 1
            self.stats["slot_steps"] = (
                self.stats.get("slot_steps", 0)
                + (length if not self.speculative else self.rounds) * self.slots
            )
            for sl in active:
                sched[sl] += length
            # start the device->host copy now; np.asarray at processing
            # time then finds the data already staged
            for h in (toks, counts):
                if h is not None and hasattr(h, "copy_to_host_async"):
                    h.copy_to_host_async()
            inflight.append((seq, toks, counts))
            seq += 1

        admit()
        while active:
            while len(inflight) < self.depth and (
                self.speculative or need_more() or not inflight
            ):
                dispatch()
            s, toks_h, counts_h = inflight.popleft()
            toks_np = np.asarray(toks_h)  # overlaps in-flight chunk compute
            counts_np = np.asarray(counts_h) if counts_h is not None else None
            if self.speculative:
                # acceptance stats count slots whose tokens are valid for
                # this chunk — junk rounds from free/stale slots would
                # inflate the realized tokens-per-round metric; the seed
                # round 0 is bookkeeping, not speculation
                live = [sl for sl in active if valid_from[sl] <= s]
                self.stats["spec_rounds"] += int(self.rounds) * len(live)
                if live:
                    self.stats["spec_emitted"] += int(counts_np[live, 1:].sum())
            for slot in list(active):
                if valid_from[slot] > s:
                    continue  # chunk was dispatched before this admission
                # the slot's FIRST valid chunk carries its seed token in
                # column/round 0; later chunks' seed repeats an already-
                # emitted token and is skipped
                fresh = valid_from[slot] == s and not tokens[active[slot]]
                i = active[slot]
                done = False
                if counts_np is None:
                    emitted = toks_np[slot] if fresh else toks_np[slot, 1:]
                else:
                    r0 = 0 if fresh else 1
                    emitted = [
                        t
                        for r in range(r0, toks_np.shape[1])
                        for t in toks_np[slot, r, : counts_np[slot, r]]
                    ]
                for t in emitted:
                    tokens[i].append(int(t))
                    if int(t) == self.eos_id or len(tokens[i]) >= budget[i]:
                        done = True
                        break
                if not done and stop_check and stop_check(i, tokens[i]):
                    done = True
                if done:
                    finish(slot)
            admit()
        # trailing in-flight chunks hold junk for already-finished slots;
        # the chained pool/hist handles stay valid for the next call
        inflight.clear()
        return [r if r is not None else [] for r in results]
