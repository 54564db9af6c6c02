import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from retrieval_scaling_tpu.serve.engine import MicroBatcher, RetrievalEngine
from retrieval_scaling_tpu.serve.http_server import SearchAPIServer, find_free_port
from retrieval_scaling_tpu.serve.main_node import (
    MainNodeAggregator,
    extract_running_endpoints,
    rerank_elements,
)


# ---------------------------------------------------------------- batcher
def test_microbatcher_batches_concurrent_requests():
    seen_batches = []

    def process(queries, n_docs):
        seen_batches.append(len(queries))
        time.sleep(0.01)
        return [{"scores": [1.0] * n_docs, "passages": [q] * n_docs, "IDs": [[0, 0]] * n_docs} for q in queries]

    mb = MicroBatcher(process, max_batch=8, max_wait_ms=30.0)
    results = [None] * 6

    def worker(i):
        results[i] = mb.submit(f"q{i}", 3)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()
    assert all(r["passages"][0] == f"q{i}" for i, r in enumerate(results))
    assert max(seen_batches) > 1  # actually batched
    assert all(len(r["scores"]) == 3 for r in results)


def test_microbatcher_propagates_errors():
    def process(queries, n_docs):
        raise ValueError("boom")

    mb = MicroBatcher(process, max_batch=2, max_wait_ms=1.0)
    with pytest.raises(ValueError):
        mb.submit("q", 1)
    mb.shutdown()


# ---------------------------------------------------------------- merge
def test_rerank_elements_merges_by_score():
    a = {"scores": [9.0, 5.0], "passages": ["a9", "a5"], "IDs": [[0, 1], [0, 2]]}
    b = {"scores": [7.0, 6.0], "passages": ["b7", "b6"], "IDs": [[1, 1], [1, 2]]}
    merged = rerank_elements([a, b], 3)
    assert merged["passages"] == ["a9", "b7", "b6"]
    assert merged["IDs"] == [[0, 1], [1, 1], [1, 2]]


# ---------------------------------------------------------------- engine+http
class _FakeEncoder:
    def __init__(self, dim=8):
        self.dim = dim

    def encode(self, texts, opts=None):
        rng = np.random.RandomState(abs(hash(tuple(texts))) % (2**31))
        return rng.randn(len(texts), self.dim).astype(np.float16)


class _FakeIndex:
    def search(self, embs, k):
        b = len(embs)
        scores = [[float(10 - i) for i in range(k)] for _ in range(b)]
        passages = [[f"psg{i}" for i in range(k)] for _ in range(b)]
        ids = [[[0, i] for i in range(k)] for _ in range(b)]
        return scores, passages, ids


@pytest.fixture
def http_engine():
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    engine = RetrievalEngine(_FakeEncoder(), _FakeIndex(), EncodeOptions(batch_size=8, maxlength=64))
    server = SearchAPIServer({"wiki": engine}, default_n_docs=5)
    port = server.serve(port=find_free_port(7100, 7200), block=False)
    yield port, server
    server.shutdown()
    engine.batcher.shutdown()


def _post(port, payload, path="/search"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_http_search_roundtrip(http_engine):
    port, _ = http_engine
    out = _post(port, {"query": "what is the moon", "n_docs": 4})
    res = out["results"]
    assert res["query"] == "what is the moon"
    assert len(res["scores"]) == 4
    assert res["passages"][0] == "psg0"
    assert out["message"] == "Search completed successfully"


def test_http_introspection(http_engine):
    port, _ = http_engine
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/queue_size", timeout=5) as r:
        out = json.loads(r.read())
    assert "wiki" in out["queue_size"]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=5) as r:
        assert json.loads(r.read())["status"] == "ok"


# ---------------------------------------------------------------- main node
def test_main_node_fanout_and_merge(tmp_path):
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    registry = str(tmp_path / "registry.jsonl")
    servers = []
    for shard in range(2):
        class ShardIndex:
            def __init__(self, shard):
                self.shard = shard

            def search(self, embs, k):
                b = len(embs)
                base = 10.0 + self.shard  # shard1 scores higher
                scores = [[base - i for i in range(k)] for _ in range(b)]
                passages = [[f"s{self.shard}p{i}" for i in range(k)] for _ in range(b)]
                ids = [[[self.shard, i] for i in range(k)] for _ in range(b)]
                return scores, passages, ids

        engine = RetrievalEngine(_FakeEncoder(), ShardIndex(shard), EncodeOptions(batch_size=4, maxlength=32))
        server = SearchAPIServer({f"dom{shard}": engine}, default_n_docs=5)
        port = server.serve(port=find_free_port(7300 + shard * 50, 7300 + shard * 50 + 49), block=False)
        with open(registry, "a") as f:
            f.write(json.dumps({
                "domain_name": f"dom{shard}",
                "chunk_id": 0,
                "endpoint": f"http://127.0.0.1:{port}/search",
            }) + "\n")
        servers.append(server)

    try:
        eps = extract_running_endpoints(registry, health_check=True)
        assert len(eps) == 2
        agg = MainNodeAggregator(registry, expected_endpoints=2, retry_sleep_s=0.1)
        out = agg.search("test query", n_docs=4)
        # shard 1's scores (11, 10, ...) should lead
        assert out["passages"][0] == "s1p0"
        assert len(out["scores"]) == 4
        assert out["scores"] == sorted(out["scores"], reverse=True)
        # domain filter
        out0 = agg.search("q", n_docs=2, domains="dom0")
        assert out0["passages"][0] == "s0p0"
    finally:
        for s in servers:
            s.shutdown()


def test_registry_dedup_last_wins(tmp_path):
    registry = str(tmp_path / "reg.jsonl")
    with open(registry, "w") as f:
        f.write(json.dumps({"domain_name": "d", "chunk_id": 0, "endpoint": "http://old"}) + "\n")
        f.write(json.dumps({"domain_name": "d", "chunk_id": 0, "endpoint": "http://new"}) + "\n")
    eps = extract_running_endpoints(registry, health_check=False)
    assert eps[("d", 0)] == "http://new"


def test_main_node_recovers_from_dead_worker(tmp_path):
    """Fan-out failure -> refresh registry -> retry succeeds with live
    workers only (reference: serve_main_node.py:304-311 sleep + re-extract)."""
    import json

    from retrieval_scaling_tpu.serve.engine import MicroBatcher
    from retrieval_scaling_tpu.serve.http_server import SearchAPIServer
    from retrieval_scaling_tpu.serve.main_node import MainNodeAggregator

    class FakeEngine:
        def __init__(self, tag):
            self.tag = tag
            self.batcher = MicroBatcher(self._process, max_batch=4, max_wait_ms=1.0)

        def _process(self, queries, n_docs):
            return [
                {"scores": [1.0], "passages": [self.tag], "IDs": [[0, 0]]}
                for q in queries
            ]

        def search(self, query, n_docs=10):
            return self.batcher.submit(query, n_docs)

    srv = SearchAPIServer({"wiki": FakeEngine("alive")}, default_n_docs=3)
    port = srv.serve(port=None, registry_path=None, domain_name="wiki", chunk_id=0, block=False)

    registry = tmp_path / "reg.jsonl"
    rows = [
        {"domain_name": "wiki", "chunk_id": 0, "endpoint": f"http://127.0.0.1:{port}/search"},
        {"domain_name": "wiki", "chunk_id": 1, "endpoint": "http://127.0.0.1:9/search"},  # dead
    ]
    registry.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    agg = MainNodeAggregator(str(registry), fanout_timeout=5.0, retry_sleep_s=0.1)
    assert len(agg.endpoints) >= 1  # dead endpoint filtered or kept per probe

    # Before retry the dead endpoint may be selected; after refresh the
    # health probe drops it and the search must succeed with live workers.
    registry.write_text(json.dumps(rows[0]) + "\n")
    out = agg.search("moon", n_docs=1)
    assert out["passages"][0] == ["alive"] or out["passages"] == ["alive"]
    srv.shutdown()


def test_engine_pipelines_fetch_with_device_stage(tmp_path):
    """Passage fetch (host) must overlap the next batch's device stage:
    with device=20ms and fetch=20ms per batch, 4 sequential batches take
    ~5 stage-slots pipelined (~100ms) vs ~8 serialized (~160ms)."""
    import threading
    import time

    from retrieval_scaling_tpu.serve.engine import MicroBatcher

    DEV, FETCH = 0.02, 0.02
    timeline = []

    def device(queries, n_docs):
        timeline.append(("dev_start", time.monotonic()))
        time.sleep(DEV)
        timeline.append(("dev_end", time.monotonic()))
        return [f"staged:{q}" for q in queries]

    def finish(queries, n_docs, staged):
        timeline.append(("fetch_start", time.monotonic()))
        time.sleep(FETCH)
        timeline.append(("fetch_end", time.monotonic()))
        return [{"scores": [1.0], "passages": [s], "IDs": [[0, 0]]} for s in staged]

    # max_batch=1 so each request is its own batch
    mb = MicroBatcher(device, max_batch=1, max_wait_ms=0.1, finish_fn=finish)
    t0 = time.monotonic()
    threads = []
    results = [None] * 4
    for i in range(4):
        def run(i=i):
            results[i] = mb.submit(f"q{i}", 1)
        th = threading.Thread(target=run)
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    elapsed = time.monotonic() - t0
    mb.shutdown()
    assert all(r is not None for r in results)
    # serialized would be >= 8 * 0.02 = 0.16s; pipelined ~0.1s. Generous
    # bound to absorb scheduler noise while still proving overlap.
    assert elapsed < 0.15, elapsed
    # device stage of batch N+1 must start before fetch of batch N ends
    dev_starts = [t for k, t in timeline if k == "dev_start"]
    fetch_ends = [t for k, t in timeline if k == "fetch_end"]
    assert dev_starts[1] < fetch_ends[0]
