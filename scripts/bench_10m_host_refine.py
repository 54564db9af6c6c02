"""10M-passage host-streamed refinement under load (VERDICT r3 item 5).

The datastore-scale serving tier: HBM holds ONLY the PQ codes (32 B/row,
320 MB for 10M rows); the exact int8 rows live in a 7.7 GB sidecar file
and stream per query via threaded preads (native/rstpu_io.cpp) for the
re-rank. This is the one-chip version of the reference's 140B-token
story (reference README.md:35: <30 ms/query over a sharded GPU fleet;
our per-chip bound is HBM, so codes-in-HBM + rows-on-disk is how a big
datastore actually fits).

Measures, per query batch (b=48, k=10, refine_factor=4 -> R=40 unique-ish
candidate rows per query x 48 = ~1.9k scattered preads/batch):

  * device IVF-PQ scan ms (amortized in-program loop, relay-honest)
  * host pread + f32 re-rank ms per batch (p50/p99 across batches)
  * end-to-end per-query p50/p99 = device + host percentiles, and QPS

Writes bench_artifacts/host_refine_10m.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_10m_host_refine.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


N10 = 10_000_000
D = 768
M, KSUB = 16, 256
NLIST, TPL = 15_625, 5
NPROBE = 64
B, K, REFINE_FACTOR = 48, 10, 4
SIDE_FILE = "/tmp/bench_10m_rows.i8"
NEG_INF = float(np.finfo(np.float32).min)


def build_sidecar() -> None:
    """7.7 GB int8 sidecar, written in 64 MB slabs (PCG64 raw bytes —
    pread latency is content-independent; candidate ids from the random
    codes spread uniformly over the file = worst-case seek pattern)."""
    if os.path.exists(SIDE_FILE) and os.path.getsize(SIDE_FILE) == N10 * D:
        log(f"sidecar exists: {SIDE_FILE}")
        return
    rng = np.random.default_rng(0)
    slab_rows = 131_072  # 100 MB
    t0 = time.perf_counter()
    with open(SIDE_FILE, "wb") as f:
        done = 0
        while done < N10:
            rows = min(slab_rows, N10 - done)
            block = rng.integers(-127, 128, size=(rows, D), dtype=np.int8)
            f.write(block.tobytes())
            done += rows
    log(f"sidecar written: {N10 * D / 1e9:.2f} GB in {time.perf_counter() - t0:.0f}s")


def main() -> None:
    build_sidecar()

    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.data.native_io import pread_lines_native
    from retrieval_scaling_tpu.index.ivf_common import TILE, probe_tile_schedule
    from retrieval_scaling_tpu.ops.ivf_gather import pq_scan_topk_pallas, pq_sublane_pad

    log(f"backend={jax.default_backend()}")
    _ = np.asarray(jnp.ones(4))

    tiles = NLIST * TPL
    dsub = D // M
    refine_r = REFINE_FACTOR * K  # candidates per query entering the re-rank

    cent = jax.random.normal(jax.random.PRNGKey(9), (NLIST, D), jnp.float32)
    tstart = jnp.arange(NLIST, dtype=jnp.int32) * TPL
    tcount = jnp.full((NLIST,), TPL, jnp.int32)
    rid = jnp.arange(N10, dtype=jnp.int32)
    codebooks = jax.random.normal(jax.random.PRNGKey(2), (M, KSUB, dsub), jnp.float32)
    codes = jax.jit(
        lambda kk: jax.random.randint(
            kk, (tiles, pq_sublane_pad(M), TILE), 0, KSUB, jnp.uint8
        )
    )(jax.random.PRNGKey(10))
    codes.block_until_ready()
    log(f"codes on device: {tiles} tiles = {tiles * TILE / 1e6:.1f}M rows, "
        f"{codes.size / 1e6:.0f} MB HBM")
    scales = np.random.default_rng(1).uniform(0.5, 1.5, N10).astype(np.float32)

    def scan(codes_, q):
        sc = jnp.dot(q, cent.T, preferred_element_type=jnp.float32)
        coarse, probe_ids = jax.lax.top_k(sc, NPROBE)
        tile_ids, valid, probe_of = probe_tile_schedule(
            probe_ids, tstart, tcount, NPROBE * TPL
        )
        lut = jnp.einsum(
            "bmd,mkd->bmk", q.reshape(B, M, dsub), codebooks,
            preferred_element_type=jnp.float32,
        )
        return pq_scan_topk_pallas(
            lut, coarse, codes_, rid, tile_ids, valid, probe_of, refine_r
        )

    scan_j = jax.jit(scan)

    # relay-honest device cost: amortized in-program loop
    qv = jax.random.normal(jax.random.PRNGKey(3), (B, D), jnp.float32)
    fi = 8

    @jax.jit
    def scan_loop(codes_):
        def body(i, acc):
            s, _ = scan(codes_, qv + acc * 0)
            return acc + s[0, 0] * 0 + 1
        return jax.lax.fori_loop(0, fi, body, jnp.zeros((), jnp.float32))

    np.asarray(scan_loop(codes))
    t0 = time.perf_counter()
    np.asarray(scan_loop(codes))
    dev_ms = (time.perf_counter() - t0) * 1e3 / fi
    log(f"device PQ scan (amortized): {dev_ms:.2f} ms/batch of {B}")

    def refine_host(q_np, ids_np):
        t0 = time.perf_counter()
        safe = np.maximum(ids_np, 0)
        uniq, inv = np.unique(safe, return_inverse=True)
        spans = [(int(i) * D, D) for i in uniq]
        blobs = pread_lines_native(SIDE_FILE, spans)
        if blobs is None:
            blobs = []
            with open(SIDE_FILE, "rb") as f:
                for start, length in spans:
                    f.seek(start)
                    blobs.append(f.read(length))
        t_read = time.perf_counter() - t0
        rows_u = np.frombuffer(b"".join(blobs), np.int8).reshape(len(uniq), D)
        rows = rows_u[inv.reshape(ids_np.shape)].astype(np.float32)
        ip = np.einsum("brd,bd->br", rows, q_np)
        sc = np.where(ids_np >= 0, ip * scales[safe], NEG_INF).astype(np.float32)
        kk = min(K, sc.shape[1])
        top_pos = np.argpartition(-sc, kk - 1, axis=1)[:, :kk]
        part = np.take_along_axis(sc, top_pos, axis=1)
        order = np.argsort(-part, axis=1, kind="stable")
        top_pos = np.take_along_axis(top_pos, order, axis=1)
        return (
            np.take_along_axis(sc, top_pos, axis=1),
            np.take_along_axis(ids_np, top_pos, axis=1),
            time.perf_counter() - t0,
            t_read,
        )

    # under load: back-to-back batches, fresh queries each time (uncached
    # candidate sets -> every batch preads ~B*R scattered rows)
    n_batches = 30
    rngq = np.random.default_rng(4)
    host_ms, read_ms = [], []
    n_uniq = 0
    for bi in range(n_batches):
        q_np = rngq.standard_normal((B, D)).astype(np.float32)
        s_dev, ids_dev = scan_j(codes, jnp.asarray(q_np))
        ids_np = np.asarray(ids_dev)
        _, top_i, dt, tr = refine_host(q_np, ids_np)
        if bi == 0:
            log(f"first batch: {np.unique(np.maximum(ids_np, 0)).size} unique rows preaded")
        host_ms.append(dt * 1e3)
        read_ms.append(tr * 1e3)
        n_uniq += np.unique(np.maximum(ids_np, 0)).size
    host_ms_a = np.array(host_ms)
    read_ms_a = np.array(read_ms)
    h50, h99 = float(np.percentile(host_ms_a, 50)), float(np.percentile(host_ms_a, 99))
    r50 = float(np.percentile(read_ms_a, 50))
    per_q_p50 = (dev_ms + h50) / B
    per_q_p99 = (dev_ms + h99) / B
    qps = B / ((dev_ms + h50) / 1e3)
    log(
        f"host refine: p50 {h50:.1f} ms/batch (pread {r50:.1f}), "
        f"p99 {h99:.1f} ms/batch; ~{n_uniq // n_batches} rows/batch"
    )
    log(
        f"e2e 10M codes-in-HBM + rows-on-disk: p50 {per_q_p50:.2f} ms/query, "
        f"p99 {per_q_p99:.2f} ms/query, {qps:.0f} QPS (b{B})"
    )

    out = {
        "n_rows": N10,
        "hbm_bytes_per_row": M,
        "sidecar_gb": round(N10 * D / 1e9, 2),
        "batch": B,
        "k": K,
        "refine_factor": REFINE_FACTOR,
        "nprobe": NPROBE,
        "device_scan_ms_per_batch": round(dev_ms, 2),
        "host_refine_ms_p50": round(h50, 2),
        "host_refine_ms_p99": round(h99, 2),
        "pread_ms_p50": round(r50, 2),
        "e2e_ms_per_query_p50": round(per_q_p50, 3),
        "e2e_ms_per_query_p99": round(per_q_p99, 3),
        "qps": round(qps, 1),
        "unique_rows_per_batch": n_uniq // n_batches,
    }
    os.makedirs("bench_artifacts", exist_ok=True)
    with open("bench_artifacts/host_refine_10m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
