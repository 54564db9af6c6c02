"""Serving-side generation service over the continuous-batching engine.

The reference serving tier has no generation endpoint (its readers run only
in offline eval); the vLLM analog in the harness is the closest bar
(reference: rag-evaluation-harness/lm_eval/models/vllm_causallms.py). Here a
single background thread owns the slot pool and runs the admission/decode
loop continuously: HTTP handler threads enqueue requests and block on a
per-request event, so concurrent requests share decode steps (true
continuous batching across requests, not per-call batches).
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class _Request:
    prompt_ids: List[int]
    max_new: int
    stop: List[str]
    done: threading.Event = field(default_factory=threading.Event)
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    error: Optional[str] = None


class GenerationService:
    """Background-threaded continuous-batching text generation."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        slots: int = 4,
        max_len: int = 1024,
        chunk: int = 8,
        default_max_new: int = 64,
        speculative: bool = False,
        draft_len: int = 7,
        mesh=None,
    ):
        from retrieval_scaling_tpu.models.continuous_batching import ContinuousBatcher

        self.tokenizer = tokenizer
        self.default_max_new = default_max_new
        eos = tokenizer.eos_token_id
        if eos is None:
            eos = tokenizer.pad_token_id or 0
        self.eos_id = int(eos)
        self.engine = ContinuousBatcher(
            params, cfg, self.eos_id, slots=slots, max_len=max_len, chunk=chunk,
            speculative=speculative, draft_len=draft_len, mesh=mesh,
        )
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ public
    def generate(
        self,
        prompt: str,
        max_tokens: int | None = None,
        stop: Optional[List[str]] = None,
        timeout_s: float = 120.0,
    ) -> dict:
        max_new = int(max_tokens or self.default_max_new)
        ids = self.tokenizer(prompt)["input_ids"]
        ids = ids[-(self.engine.max_len - max_new):]
        req = _Request(prompt_ids=ids, max_new=max_new, stop=list(stop or []))
        self._queue.put(req)
        if not req.done.wait(timeout_s):
            raise TimeoutError("generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return {"text": req.text, "n_tokens": len(req.tokens)}

    def shutdown(self):
        self._shutdown.set()
        self._queue.put(None)  # wake the loop
        self._thread.join(timeout=5)

    # ------------------------------------------------------------ loop
    def _decode_text(self, toks: List[int]) -> str:
        return self.tokenizer.decode(
            [t for t in toks if t != self.eos_id], skip_special_tokens=True
        )

    def _finish(self, req: _Request):
        toks = req.tokens
        if self.eos_id in toks:
            toks = toks[: toks.index(self.eos_id)]
        text = self._decode_text(toks)
        for stop in req.stop:
            idx = text.find(stop)
            if idx >= 0:
                text = text[:idx]
        req.tokens = toks
        req.text = text
        req.done.set()

    def _loop(self):
        from collections import deque

        eng = self.engine
        free = list(range(eng.slots))
        active: dict = {}  # slot -> _Request
        # decode state chains between dispatches as device arrays; up to
        # eng.depth chunks stay in flight (same pipelined scheduler as
        # ContinuousBatcher.generate — fetching chunk k's tokens overlaps
        # chunk k+1's device execution)
        last_d = jnp.full((eng.slots,), self.eos_id, jnp.int32)
        cur_d = jnp.zeros((eng.slots,), jnp.int32)
        seq = 0
        valid_from = [0] * eng.slots
        inflight: deque = deque()

        while not self._shutdown.is_set():
            # admit: block when idle, drain opportunistically when busy —
            # every drained request joins ONE coalesced admission wave
            # (batched prefill + scatter insert, a single device call)
            wave = []
            while free:
                idle = not active and not inflight and not wave
                try:
                    req = self._queue.get(block=idle, timeout=1.0 if idle else None)
                except queue.Empty:
                    break
                if req is None:
                    return
                from retrieval_scaling_tpu.models.continuous_batching import (
                    clamp_request,
                )

                prompt, max_new, _ = clamp_request(
                    req.prompt_ids, req.max_new, eng.max_len
                )
                req.max_new = max_new
                slot = free.pop()
                wave.append((slot, prompt))
                valid_from[slot] = seq
                # no host sync on the first token: the slot's first
                # decode chunk returns it as its seed column
                req.tokens = []
                active[slot] = req
            if wave:
                try:
                    last_d, cur_d = eng.admit_wave(wave, last_d, cur_d)
                except Exception as e:  # noqa: BLE001
                    logger.exception("admission wave failed")
                    for slot, _ in wave:
                        req = active.pop(slot)
                        free.append(slot)  # never leak capacity on failure
                        req.error = str(e)
                        req.done.set()
            if not active:
                # trailing in-flight chunks hold junk for finished slots;
                # drop them so the admission get() blocks again when idle
                inflight.clear()
                continue
            while len(inflight) < eng.depth:
                eng.pool, last_d, cur_d, toks = eng._decode_chunk_fn(eng.chunk)(
                    eng.params, eng.pool, last_d, cur_d
                )
                if hasattr(toks, "copy_to_host_async"):
                    toks.copy_to_host_async()
                inflight.append((seq, toks))
                seq += 1
            s, toks_h = inflight.popleft()
            toks_np = np.asarray(toks_h)
            for slot in list(active):
                if valid_from[slot] > s:
                    continue  # chunk predates this slot's admission
                req = active[slot]
                # column 0 is the seed token: real for the slot's first
                # valid chunk, an already-emitted repeat afterwards
                fresh = valid_from[slot] == s and not req.tokens
                done = False
                for t in (toks_np[slot] if fresh else toks_np[slot, 1:]):
                    req.tokens.append(int(t))
                    if int(t) == self.eos_id or len(req.tokens) >= req.max_new:
                        done = True
                        break
                if not done and req.stop:
                    # tail-window decode: full re-decode per chunk is
                    # O(n^2) in generated length
                    text = self._decode_text(req.tokens[-48:])
                    done = any(s in text for s in req.stop)
                if done:
                    self._finish(req)
                    del active[slot]
                    free.append(slot)
