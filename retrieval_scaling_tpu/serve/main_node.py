"""Aggregator (main node): fan-out over worker endpoints + top-k merge.

Parity with the reference main node (reference: api/serve_main_node.py):
reads the shared-filesystem endpoint registry, health-checks with a real
query POST (:21-34), dedups to one live endpoint per (domain, chunk)
(:37-99), fans a search out with a thread pool (:281-323), and merges the
per-shard candidate sets by score (``rerank_elements``, :109-165).

On a TPU pod slice the merge normally happens on-device over ICI
(parallel/sharded_search.py); this HTTP tier is for spanning multiple
hosts/slices over DCN, where the reference's registry + REST contract is
kept verbatim.
"""

from __future__ import annotations

import json
import logging
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


def _post_json(url: str, payload: dict, timeout: float = 60.0) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def check_endpoint(endpoint: str, timeout: float = 5.0) -> bool:
    """Health check with a canned query (reference: serve_main_node.py:21-34)."""
    try:
        out = _post_json(endpoint, {"query": "health check", "n_docs": 1}, timeout)
        return "results" in out
    except Exception:
        return False


def extract_running_endpoints(
    registry_path: str,
    health_check: bool = True,
    expected: Optional[int] = None,
) -> Dict[Tuple[str, object], str]:
    """Live endpoint per (domain, chunk), last registration winning
    (reference: serve_main_node.py:37-99)."""
    entries = []
    with open(registry_path) as f:
        for line in f:
            if line.strip():
                entries.append(json.loads(line))

    endpoints: Dict[Tuple[str, object], str] = {}
    for entry in entries:  # later entries override earlier (restarted workers)
        key = (entry["domain_name"], entry["chunk_id"])
        endpoints[key] = entry["endpoint"]

    if health_check:
        alive = {}
        for key, ep in endpoints.items():
            if check_endpoint(ep):
                alive[key] = ep
            else:
                logger.warning("endpoint %s for %s is dead", ep, key)
        endpoints = alive

    if expected is not None and len(endpoints) != expected:
        logger.warning("expected %d endpoints, found %d", expected, len(endpoints))
    return endpoints


def rerank_elements(shard_results: List[dict], n_docs: int) -> dict:
    """Merge per-shard {scores, passages, IDs} into global top-k
    (reference: serve_main_node.py:109-165)."""
    scores, passages, ids = [], [], []
    for res in shard_results:
        scores.extend(res["scores"])
        passages.extend(res["passages"])
        ids.extend(res["IDs"])
    order = sorted(range(len(scores)), key=lambda i: float(scores[i]), reverse=True)[:n_docs]
    return {
        "scores": [scores[i] for i in order],
        "passages": [passages[i] for i in order],
        "IDs": [ids[i] for i in order],
    }


class MainNodeAggregator:
    def __init__(
        self,
        registry_path: str,
        expected_endpoints: Optional[int] = None,
        fanout_timeout: float = 60.0,
        retry_sleep_s: float = 900.0,
        max_workers: int = 32,
    ):
        self.registry_path = registry_path
        self.expected = expected_endpoints
        self.fanout_timeout = fanout_timeout
        self.retry_sleep_s = retry_sleep_s
        self.pool = ThreadPoolExecutor(max_workers=max_workers)
        self.endpoints = extract_running_endpoints(registry_path, expected=expected_endpoints)

    def refresh(self) -> None:
        self.endpoints = extract_running_endpoints(self.registry_path, expected=self.expected)

    def _selected(self, domains) -> List[str]:
        if domains in (None, "all"):
            return list(self.endpoints.values())
        if isinstance(domains, str):
            domains = [domains]
        return [ep for (dom, _), ep in self.endpoints.items() if dom in domains]

    def search(self, query: str, n_docs: int = 10, domains=None) -> dict:
        """Fan out + merge; on failure refresh endpoints and retry once
        (the reference sleeps 15 min then re-extracts, :304-311)."""
        endpoints = self._selected(domains)
        if not endpoints:
            raise RuntimeError(f"no live endpoints for domains={domains}")
        payload = {"query": query, "n_docs": n_docs}

        def call(ep):
            return _post_json(ep, payload, self.fanout_timeout)["results"]

        try:
            shard_results = list(self.pool.map(call, endpoints))
        except Exception:
            logger.exception("fan-out failed; refreshing endpoints and retrying")
            time.sleep(min(self.retry_sleep_s, 1.0))  # tests shrink this
            self.refresh()
            endpoints = self._selected(domains)
            shard_results = list(self.pool.map(call, endpoints))

        return rerank_elements(shard_results, n_docs)


def serve_main_node(
    registry_path: str,
    port: int | None = None,
    expected_endpoints: Optional[int] = None,
    default_n_docs: int = 10,
    block: bool = True,
):
    """HTTP frontend for the aggregator (same routes as workers)."""
    from retrieval_scaling_tpu.serve.engine import MicroBatcher
    from retrieval_scaling_tpu.serve.http_server import SearchAPIServer

    agg = MainNodeAggregator(registry_path, expected_endpoints)

    class _AggEngine:
        def __init__(self):
            self.batcher = MicroBatcher(self._process, max_batch=8, max_wait_ms=2.0)

        def _process(self, queries, n_docs):
            return list(agg.pool.map(lambda q: agg.search(q, n_docs), queries))

        def search(self, query, n_docs):
            return self.batcher.submit(query, n_docs)

    server = SearchAPIServer({"all": _AggEngine()}, default_n_docs=default_n_docs)
    return server.serve(port=port, block=block)
