#!/usr/bin/env python
"""PQ memory-story ladder on REAL embeddings.

The round-2 quality gates measured recall only on synthetic clustered
Gaussians; real embedding geometry (anisotropic, low intrinsic dimension,
near-duplicate passages) is exactly what breaks PQ. This script builds that
geometry offline:

  1. harvests REAL English text from installed-package documentation
     (docstrings of numpy/scipy/pandas/sklearn/torch/jax/transformers —
     megabytes of natural language, heavy-tailed vocabulary, many
     near-duplicate passages);
  2. trains a tiny contriever on it with the in-tree InBatch contrastive
     trainer (random crops as positives), then encodes every passage —
     LEARNED embeddings of real text, not randn blobs;
  3. measures recall@10 vs exact MIPS for the ladder
     {raw PQ, +OPQ} x m in {16, 32, 64}, plus the refinement tiers
     (device int8 rows vs host-streamed rows), reporting bytes/row-in-HBM
     for each config.

Emits one JSON line per config; run with --json-out to save them.

    python scripts/pq_recall_ladder.py --n-passages 20000 --train-steps 150
"""

import argparse
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------- corpus
def harvest_docstrings(min_len: int = 300):
    """Real English from installed packages' documentation."""
    import importlib
    import inspect
    import pkgutil
    import warnings

    warnings.filterwarnings("ignore")
    texts, seen = [], set()

    def harvest(mod):
        doc = getattr(mod, "__doc__", None)
        if doc and len(doc) > 200:
            h = hash(doc)
            if h not in seen:
                seen.add(h)
                texts.append(doc)
        for name in dir(mod):
            try:
                obj = getattr(mod, name)
            except Exception:
                continue
            if inspect.isfunction(obj) or inspect.isclass(obj):
                d = inspect.getdoc(obj)
                if d and len(d) > min_len:
                    h = hash(d)
                    if h not in seen:
                        seen.add(h)
                        texts.append(d)

    for m in ("numpy", "scipy", "pandas", "sklearn", "torch", "jax", "transformers"):
        try:
            mod = importlib.import_module(m)
            harvest(mod)
            for sub in list(pkgutil.iter_modules(getattr(mod, "__path__", []), m + "."))[:40]:
                try:
                    harvest(importlib.import_module(sub.name))
                except Exception:
                    pass
        except Exception:
            pass
    return texts


def build_passages(texts, n_passages: int, words_per_passage: int = 48):
    """Chunk docs into word windows, then dedup (exact + MinHash) — the
    pipeline dedups before indexing, and docstring text is full of repeated
    boilerplate that would otherwise flood the neighborhood structure with
    exact ties."""
    raw = []
    for text in texts:
        # drop doctest/code lines; keep prose
        lines = [
            line for line in text.splitlines()
            if not line.lstrip().startswith((">>>", "...", "#"))
        ]
        words = re.findall(r"[A-Za-z][A-Za-z0-9_.-]*", " ".join(lines))
        for i in range(0, len(words) - 8, words_per_passage):
            raw.append(" ".join(words[i : i + words_per_passage]).lower())
            if len(raw) >= 3 * n_passages:
                break
        if len(raw) >= 3 * n_passages:
            break
    seen, passages = set(), []
    for p in raw:
        h = hash(p)
        if h not in seen:
            seen.add(h)
            passages.append(p)
    # near-duplicate removal with the in-tree MinHash-LSH
    from retrieval_scaling_tpu.utils.deduplication import remove_duplicates_with_minhash

    records = [{"retrieval text": p, "retrieval score": 1.0} for p in passages]
    marked = remove_duplicates_with_minhash(records, threshold=0.8)
    kept = [r["retrieval text"] for r in marked if r.get("quality score", 1)]
    return kept[:n_passages]


# ---------------------------------------------------------------- encoder
def train_and_encode(passages, hidden: int, train_steps: int, batch: int, seq: int, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.bert import BertConfig, contriever_embed, init_bert_params
    from retrieval_scaling_tpu.train.contrastive import (
        inbatch_init,
        make_inbatch_train_step,
        make_optimizer,
    )

    # word-level vocab over the real corpus (heavy-tailed by construction)
    vocab = {}
    for p in passages:
        for w in p.split():
            if w not in vocab:
                vocab[w] = len(vocab) + 2  # 0=pad, 1=unk
    vocab_size = len(vocab) + 2
    print(f"corpus vocab: {vocab_size} words", file=sys.stderr)

    def tokenize(text, length):
        ids = [vocab.get(w, 1) for w in text.split()][:length]
        mask = [1] * len(ids) + [0] * (length - len(ids))
        return ids + [0] * (length - len(ids)), mask

    cfg = BertConfig(
        vocab_size=vocab_size, hidden_size=hidden, num_layers=2,
        num_heads=4, intermediate_size=hidden * 2,
        max_position_embeddings=seq, pooling="mean", attention_impl="xla",
    )
    params = init_bert_params(cfg, jax.random.PRNGKey(seed))

    if train_steps > 0:
        # InBatch contrastive training on random crops (the contriever
        # recipe): two crops of the same passage are positives
        optimizer = make_optimizer(lr=3e-4, warmup_steps=10, total_steps=train_steps)
        state = inbatch_init(params, optimizer)
        step = make_inbatch_train_step(cfg, optimizer)
        rng = np.random.RandomState(seed)
        t0 = time.time()
        for it in range(train_steps):
            rows = rng.randint(0, len(passages), batch)
            qs, ks, qm, km = [], [], [], []
            for r in rows:
                words = passages[r].split()
                half = max(len(words) // 2, 4)
                lo1 = rng.randint(0, max(len(words) - half, 1))
                lo2 = rng.randint(0, max(len(words) - half, 1))
                q_ids, q_mask = tokenize(" ".join(words[lo1 : lo1 + half]), seq)
                k_ids, k_mask = tokenize(" ".join(words[lo2 : lo2 + half]), seq)
                qs.append(q_ids), ks.append(k_ids), qm.append(q_mask), km.append(k_mask)
            state, metrics = step(state, {
                "q_tokens": jnp.asarray(qs, jnp.int32), "q_mask": jnp.asarray(qm, jnp.int32),
                "k_tokens": jnp.asarray(ks, jnp.int32), "k_mask": jnp.asarray(km, jnp.int32),
            })
            if it % 25 == 0:
                print(f"  step {it}: loss {float(metrics['loss']):.4f}", file=sys.stderr)
        params = state.params
        print(f"trained {train_steps} steps in {time.time()-t0:.1f}s", file=sys.stderr)

    embed = jax.jit(lambda p, i, m: contriever_embed(p, cfg, i, m))

    def encode_texts(texts_in):
        out = []
        for lo in range(0, len(texts_in), 256):
            chunk = texts_in[lo : lo + 256]
            ids, masks = zip(*(tokenize(p, seq) for p in chunk))
            e = np.asarray(
                embed(params, jnp.asarray(ids, jnp.int32), jnp.asarray(masks, jnp.int32))
            )
            out.append(e)
        e = np.concatenate(out, 0).astype(np.float32)
        return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-9)

    return encode_texts(passages), encode_texts


# ---------------------------------------------------------------- ladder
def run_ladder(emb, queries, ncentroids, nprobe_list, ms, k, refine_factor, json_out):
    from retrieval_scaling_tpu.index.ivf_pq import IVFPQIndex

    d = emb.shape[1]
    n_queries = len(queries)
    exact = np.argsort(-(queries @ emb.T), axis=1)[:, :k]
    # neighborhood tightness diagnostic: the score margin PQ must resolve
    top_scores = np.take_along_axis(queries @ emb.T, exact, axis=1)
    margin = float(np.mean(top_scores[:, 0] - top_scores[:, -1]))
    print(json.dumps({"diagnostic": "top1_to_topk_margin", "mean": round(margin, 5)}))

    tmp = tempfile.mkdtemp(prefix="pq_ladder_")
    import pickle

    epath = os.path.join(tmp, "passages_00.pkl")
    with open(epath, "wb") as f:
        pickle.dump((list(range(len(emb))), emb.astype(np.float16)), f)

    def recall(index, nprobe):
        _, ids = index.search_ids(queries, k, nprobe=nprobe)
        return float(np.mean([
            len(set(map(int, ids[i])) & set(map(int, exact[i]))) / k
            for i in range(n_queries)
        ]))

    rows = []

    def report(tag, m, opq, refine, refine_mode, index, aniso=False):
        hbm_bytes = m  # PQ codes
        if refine and refine_mode == "device":
            hbm_bytes += d  # int8 exact rows resident
        for nprobe in nprobe_list:
            t0 = time.time()
            r = recall(index, nprobe)
            dt = (time.time() - t0) / n_queries * 1e3
            row = {
                "config": tag, "m": m, "opq": opq, "aniso": aniso,
                "refine": refine,
                "refine_mode": refine_mode if refine else None,
                "nprobe": nprobe, "recall_at_k": round(r, 4), "k": k,
                "hbm_bytes_per_row": hbm_bytes,
                "ms_per_query_batch": round(dt, 3),
            }
            rows.append(row)
            print(json.dumps(row))

    for m in ms:
        common = dict(
            embed_paths=[epath], dimension=d, sample_train_size=len(emb),
            ncentroids=ncentroids, probe=max(nprobe_list),
            n_subquantizers=m, kmeans_iters=10, pq_iters=10,
        )
        base = IVFPQIndex(**common)
        report(f"pq_m{m}", m, False, False, None, base)
        opq_idx = IVFPQIndex(**common, opq=True)
        report(f"opq_m{m}", m, True, False, None, opq_idx)
        # score-aware (anisotropic / ScaNN-style) codebooks + encoding at
        # the same bytes/row — raw-PQ recall is quantization-limited here
        # (identical at nprobe 32 vs 128), so better codebooks, not more
        # probes, is the lever
        aniso_idx = IVFPQIndex(**common, aniso=True)
        report(f"aniso_m{m}", m, False, False, None, aniso_idx, aniso=True)
        aniso_opq = IVFPQIndex(**common, opq=True, aniso=True)
        report(f"aniso_opq_m{m}", m, True, False, None, aniso_opq, aniso=True)
    # refinement tiers at the smallest m (where PQ alone is weakest)
    m0 = ms[0]
    common0 = dict(
        embed_paths=[epath], dimension=d, sample_train_size=len(emb),
        ncentroids=ncentroids, probe=max(nprobe_list),
        n_subquantizers=m0, kmeans_iters=10, pq_iters=10,
        refine_factor=refine_factor, opq=True,
    )
    idx_path = os.path.join(tmp, "idx", "index.npz")
    meta = os.path.join(tmp, "idx", "index.ids.npy")
    dev = IVFPQIndex(**common0, index_path=idx_path, meta_file=meta)
    report(f"opq_m{m0}_refine_device", m0, True, True, "device", dev)
    host = IVFPQIndex(**common0, index_path=idx_path, meta_file=meta, refine_mode="host")
    report(f"opq_m{m0}_refine_host", m0, True, True, "host", host)

    if json_out:
        with open(json_out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-passages", type=int, default=20000)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--train-batch", type=int, default=64)
    ap.add_argument("--ncentroids", type=int, default=512)  # ~4*sqrt(N) at 20k passages (FAISS guideline); r5 sweep: m16+OPQ 0.334 -> 0.364 vs 128 lists (smaller residuals)
    ap.add_argument("--nprobe", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--m", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--refine-factor", type=int, default=4)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--emb-cache", default=None,
                    help="npz path: reuse/save the encoded corpus+queries")
    args = ap.parse_args()
    if args.emb_cache and not args.emb_cache.endswith(".npz"):
        # np.savez appends .npz; keep the reload check on the same name
        args.emb_cache += ".npz"

    if args.emb_cache and os.path.exists(args.emb_cache):
        data = np.load(args.emb_cache)
        emb, queries = data["emb"], data["queries"]
        print(f"loaded cached embeddings {emb.shape}", file=sys.stderr)
    else:
        texts = harvest_docstrings()
        passages = build_passages(texts, args.n_passages)
        print(f"real corpus: {len(texts)} docs -> {len(passages)} passages (deduped)", file=sys.stderr)
        emb, encode_texts = train_and_encode(
            passages, args.hidden, args.train_steps, args.train_batch, args.seq
        )
        # realistic queries: held-out crops (the first ~60% of a sampled
        # passage's words), encoded with the same model
        rng = np.random.RandomState(1)
        q_rows = rng.choice(len(passages), args.n_queries, replace=False)
        q_texts = [
            " ".join(passages[i].split()[: max(int(len(passages[i].split()) * 0.6), 4)])
            for i in q_rows
        ]
        queries = encode_texts(q_texts)
        if args.emb_cache:
            np.savez(args.emb_cache, emb=emb, queries=queries)
    run_ladder(
        emb, queries, args.ncentroids, args.nprobe, args.m, args.k,
        args.refine_factor, args.json_out,
    )


if __name__ == "__main__":
    main()
