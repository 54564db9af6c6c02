"""Online retrieval engine: micro-batched encode + search + passage fetch.

The reference serializes every search behind a lock (``SearchQueue``,
reference: api/serve_worker_node.py:74-113) because a GPU worker handles one
faiss query at a time. A TPU serves best with *batches*: concurrent requests
are collected for up to ``max_wait_ms`` (or until ``max_batch``), encoded
and searched as ONE device program, then results fan back out to their
waiters — same external behavior, strictly better concurrency.

``RetrievalEngine`` is the ``DatastoreAPI`` analog
(reference: api/api_index.py:21-95): query encoder + index + disk-resident
passage fetch, returning ``{scores, passages, IDs}`` per query.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclass
class _Pending:
    query: str
    n_docs: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[BaseException] = None


class MicroBatcher:
    """Collect concurrent requests into device-sized batches.

    ``process_fn(queries: List[str], n_docs: int) -> List[result]`` runs on
    the worker thread; requests with different ``n_docs`` are grouped per
    batch by the max requested (results truncated per caller).
    """

    def __init__(
        self,
        process_fn: Callable[[List[str], int], List[Any]],
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        timeout_s: float = 60.0,
        finish_fn: Optional[Callable[[List[str], int, Any], List[Any]]] = None,
    ):
        self._process = process_fn
        # Two-stage pipelining: when ``finish_fn`` is given, ``process_fn``
        # returns a staged intermediate (device work: encode + scan) and
        # ``finish_fn`` completes it on a separate thread (host work:
        # disk passage fetch) — so batch N's passage fetch overlaps batch
        # N+1's device program instead of serializing behind it.
        self._finish = finish_fn
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.timeout_s = timeout_s
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._finish_queue: "queue.Queue" = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        if finish_fn is not None:
            self._finish_thread = threading.Thread(target=self._finish_loop, daemon=True)
            self._finish_thread.start()
        self.current: Optional[str] = None

    @property
    def queue_size(self) -> int:
        return self._queue.qsize()

    def submit(self, query: str, n_docs: int) -> Any:
        item = _Pending(query, n_docs)
        self._queue.put(item)
        if not item.done.wait(self.timeout_s):
            raise TimeoutError(f"search timed out after {self.timeout_s}s")
        if item.error is not None:
            raise item.error
        return item.result

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)

    def _collect(self) -> List[_Pending]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            self.current = batch[0].query
            n_docs = max(item.n_docs for item in batch)
            try:
                staged = self._process([item.query for item in batch], n_docs)
                if self._finish is not None:
                    self._finish_queue.put((batch, n_docs, staged))
                else:
                    self._complete(batch, staged)
            except BaseException as e:  # propagate to waiters
                logger.exception("batch search failed")
                for item in batch:
                    item.error = e
                    item.done.set()
            finally:
                self.current = None

    def _finish_loop(self) -> None:
        while not self._stop.is_set():
            try:
                batch, n_docs, staged = self._finish_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                results = self._finish([item.query for item in batch], n_docs, staged)
                self._complete(batch, results)
            except BaseException as e:
                logger.exception("batch finish failed")
                for item in batch:
                    item.error = e
                    item.done.set()

    def _complete(self, batch: List[_Pending], results: List[Any]) -> None:
        for item, res in zip(batch, results):
            item.result = self._truncate(res, item.n_docs)
            item.done.set()

    @staticmethod
    def _truncate(res: Dict[str, list], n_docs: int) -> Dict[str, list]:
        return {key: val[:n_docs] for key, val in res.items()}


class RetrievalEngine:
    """Encoder + index + passage store for one datastore (or shard group)."""

    def __init__(
        self, encoder, index, encode_opts=None, max_batch: int = 32,
        max_wait_ms: float = 5.0, timeout_s: float = 60.0,
    ):
        from retrieval_scaling_tpu.search.encoder import EncodeOptions

        self.encoder = encoder
        self.index = index
        self.encode_opts = encode_opts or EncodeOptions(batch_size=max_batch, maxlength=512)
        # device stage (encode + ANN scan) pipelines with the host stage
        # (disk passage fetch) across consecutive batches
        self.batcher = MicroBatcher(
            self._device_batch, max_batch, max_wait_ms, timeout_s=timeout_s,
            finish_fn=self._finish_batch,
        )

    @classmethod
    def from_config(cls, cfg, index_shard_ids=None, mesh=None, encoder=None):
        from retrieval_scaling_tpu.index.base import Indexer
        from retrieval_scaling_tpu.search.encoder import (
            EncodeOptions,
            load_encoder,
            projection_out_dim,
        )

        if encoder is None:
            encoder = load_encoder(
                cfg.model.query_encoder, tokenizer_name=cfg.model.query_tokenizer, mesh=mesh
            )
        indexer = Indexer(cfg, index_shard_ids=index_shard_ids, mesh=mesh)
        opts = EncodeOptions(
            batch_size=cfg.evaluation.search.get("per_device_batch_size", 32),
            maxlength=cfg.evaluation.search.get("question_maxlength", 512),
            lowercase=cfg.evaluation.search.get("lowercase", False),
            normalize_text=cfg.evaluation.search.get("normalize_text", False),
            out_dim=projection_out_dim(cfg, encoder),
        )
        serve_cfg = getattr(cfg, "serve", None)

        def serve_opt(key, default):
            return getattr(serve_cfg, key, default) if serve_cfg is not None else default

        # Per-request timeout keeps the reference contract (60 s worker
        # timer, serve_worker_node.py:127-145) configurable via serve.*.
        return cls(
            encoder, indexer.datastore, encode_opts=opts,
            max_batch=int(serve_opt("max_batch_size", 32)),
            max_wait_ms=float(serve_opt("batch_timeout_ms", 5.0)),
            timeout_s=float(serve_opt("request_timeout_s", 60.0)),
        )

    def _device_batch(self, queries: List[str], n_docs: int):
        embeddings = self.encoder.encode(queries, self.encode_opts)
        if not hasattr(self.index, "search_ids"):
            # single-stage index (no separable passage fetch): finish inline
            scores, passages, ids = self.index.search(embeddings, n_docs)
            return [
                {"scores": list(s), "passages": list(p), "IDs": list(i)}
                for s, p, i in zip(scores, passages, ids)
            ]
        return self.index.search_ids(embeddings, n_docs)

    def _finish_batch(self, queries: List[str], n_docs: int, staged) -> List[Dict[str, list]]:
        if isinstance(staged, list):  # already finished by the device stage
            return staged
        from retrieval_scaling_tpu.index.flat import filter_pad_hits

        raw_scores, raw_ids = staged
        scores, id_rows = filter_pad_hits(raw_scores, raw_ids)
        passages, ids = self.index.get_retrieved_passages(id_rows)
        return [
            {"scores": list(s), "passages": list(p), "IDs": list(i)}
            for s, p, i in zip(scores, passages, ids)
        ]

    # ------------------------------------------------------------ api
    def search(self, query: str, n_docs: int = 10) -> Dict[str, list]:
        """Single query through the micro-batcher (thread-safe)."""
        return self.batcher.submit(query, n_docs)

    def search_batch(self, queries: List[str], n_docs: int = 10) -> List[Dict[str, list]]:
        """Direct batched search (bypasses the batcher; for bulk clients)."""
        staged = self._device_batch(queries, n_docs)
        return self._finish_batch(queries, n_docs, staged)

    def smoke_test(self, query: str = "when was the moon landing?") -> Dict[str, list]:
        """Startup self-check (reference: api/api_index.py:70-86)."""
        out = self.search(query, 3)
        logger.info("smoke test scores: %s IDs: %s", out["scores"], out["IDs"])
        return out

    def profile(self, n_queries: int = 20, n_docs: int = 10) -> float:
        """Average seconds/query (reference: api/api_index.py:88-95)."""
        t0 = time.perf_counter()
        for i in range(n_queries):
            self.search(f"profiling query number {i}", n_docs)
        return (time.perf_counter() - t0) / n_queries
