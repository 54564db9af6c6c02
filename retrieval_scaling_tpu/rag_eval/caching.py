"""Disk cache for LM request results.

Analog of the reference's request caching (reference:
rag-evaluation-harness/lm_eval/caching/cache.py): wraps any LM backend and
memoizes ``loglikelihood`` / ``generate_until`` results on disk, keyed by a
hash of the request, so re-running an evaluation (e.g. with new metrics or
more tasks) skips completed model calls.
"""

from __future__ import annotations

import hashlib
import json
import os
import sqlite3
import threading
from typing import List, Sequence, Tuple


def _request_key(kind: str, payload) -> str:
    blob = json.dumps([kind, payload], sort_keys=True, ensure_ascii=False)
    return hashlib.blake2b(blob.encode(), digest_size=16).hexdigest()


class RequestCache:
    """sqlite-backed request→result store (atomic, append-friendly)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS cache (key TEXT PRIMARY KEY, value TEXT)"
        )
        self._lock = threading.Lock()

    def get_many(self, keys: Sequence[str]):
        with self._lock:
            rows = self._conn.execute(
                f"SELECT key, value FROM cache WHERE key IN ({','.join('?' * len(keys))})",
                list(keys),
            ).fetchall()
        found = {k: json.loads(v) for k, v in rows}
        return [found.get(k) for k in keys]

    def put_many(self, items: Sequence[Tuple[str, object]]):
        with self._lock:
            self._conn.executemany(
                "INSERT OR REPLACE INTO cache (key, value) VALUES (?, ?)",
                [(k, json.dumps(v)) for k, v in items],
            )
            self._conn.commit()


class CachingLM:
    """LM wrapper that serves repeated requests from a RequestCache.

    The cache key includes a model tag so one cache file can hold results
    for several models (reference keys caches per-model the same way).
    """

    def __init__(self, lm, cache_path: str, model_tag: str = ""):
        self.lm = lm
        self.cache = RequestCache(cache_path)
        self.tag = model_tag

    # ------------------------------------------------------------------
    def _lookup(self, kind: str, payloads: List):
        keys = [_request_key(kind, [self.tag, p]) for p in payloads]
        cached = self.cache.get_many(keys)
        missing = [i for i, c in enumerate(cached) if c is None]
        return keys, cached, missing

    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        pairs = [tuple(p) for p in pairs]
        keys, cached, missing = self._lookup("ll", [list(p) for p in pairs])
        if missing:
            fresh = self.lm.loglikelihood([pairs[i] for i in missing])
            self.cache.put_many(
                [(keys[i], list(out)) for i, out in zip(missing, fresh)]
            )
            for i, out in zip(missing, fresh):
                cached[i] = list(out)
        return [(float(ll), bool(greedy)) for ll, greedy in cached]

    def generate_until(self, reqs: Sequence[dict]):
        payloads = [[r["context"], r.get("gen_kwargs", {})] for r in reqs]
        keys, cached, missing = self._lookup("gen", payloads)
        if missing:
            fresh = self.lm.generate_until([reqs[i] for i in missing])
            self.cache.put_many([(keys[i], out) for i, out in zip(missing, fresh)])
            for i, out in zip(missing, fresh):
                cached[i] = out
        return list(cached)

    def loglikelihood_rolling(self, texts):
        keys, cached, missing = self._lookup("llr", [[t] for t in texts])
        if missing:
            fresh = self.lm.loglikelihood_rolling([texts[i] for i in missing])
            self.cache.put_many([(keys[i], float(out)) for i, out in zip(missing, fresh)])
            for i, out in zip(missing, fresh):
                cached[i] = float(out)
        return [float(v) for v in cached]
