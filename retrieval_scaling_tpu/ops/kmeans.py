"""K-means training on TPU — the FAISS ``Clustering`` replacement.

Trains IVF coarse centroids and PQ codebooks
(reference: src/indicies/ivf_flat.py:145-171, ivf_pq.py:146-171 delegate to
``faiss.IndexIVF*.train``). TPU-first formulation:

  * Lloyd iterations are MXU matmuls end-to-end: the assignment distance
    uses ``||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2`` (one [N, k] matmul), and
    the centroid update is the one-hot-assignment matmul ``A^T X`` —
    no scatters in the inner loop.
  * Points stream through a ``lax.scan`` in fixed-size chunks, so N scales
    past VMEM while XLA overlaps HBM loads with compute.
  * Empty clusters re-seed by splitting the largest cluster (a perturbed
    copy of its centroid), FAISS's policy.

``kmeans`` matches FAISS's IVF defaults (L2 training; callers assign with
inner product at add/search time when the index metric is IP).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _chunk(n: int, target: int) -> int:
    return min(n, target)


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "metric"))
def assign_clusters(
    data: jax.Array,        # [N, D]
    centroids: jax.Array,   # [k, D]
    k: int,
    chunk_size: int = 65536,
    metric: str = "l2",
) -> jax.Array:
    """Nearest-centroid id per row ([N] int32), streamed in chunks."""
    n, d = data.shape
    chunk_size = _chunk(n, chunk_size)
    n_chunks = -(-n // chunk_size)
    total = n_chunks * chunk_size
    padded = jnp.pad(data, ((0, total - n), (0, 0))) if total != n else data
    chunks = padded.reshape(n_chunks, chunk_size, d)
    c_norms = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)

    def body(_, chunk):
        ip = jax.lax.dot_general(
            chunk, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if metric == "l2":
            score = 2.0 * ip - c_norms[None, :]  # argmax == argmin L2
        else:
            score = ip
        return None, jnp.argmax(score, axis=-1).astype(jnp.int32)

    _, assign = jax.lax.scan(body, None, chunks)
    return assign.reshape(total)[:n]


@functools.partial(jax.jit, static_argnames=("k", "chunk_size"))
def _lloyd_iteration(
    data: jax.Array,       # [N, D]
    centroids: jax.Array,  # [k, D] float32
    k: int,
    chunk_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Lloyd step: returns (sums [k, D], counts [k], objective)."""
    n, d = data.shape
    chunk_size = _chunk(n, chunk_size)
    n_chunks = -(-n // chunk_size)
    total = n_chunks * chunk_size
    padded = jnp.pad(data, ((0, total - n), (0, 0))) if total != n else data
    chunks = padded.reshape(n_chunks, chunk_size, d)
    valid = jnp.arange(total).reshape(n_chunks, chunk_size) < n
    c_norms = jnp.sum(centroids**2, axis=-1)

    def body(carry, inp):
        sums, counts, obj = carry
        chunk, v = inp
        chunk_f = chunk.astype(jnp.float32)
        ip = jax.lax.dot_general(
            chunk_f, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dist = c_norms[None, :] - 2.0 * ip  # + ||x||^2 (constant per row)
        best = jnp.argmin(jnp.where(v[:, None], dist, jnp.inf), axis=-1)
        onehot = jax.nn.one_hot(best, k, dtype=jnp.float32) * v[:, None]
        sums = sums + jax.lax.dot_general(
            onehot, chunk_f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        counts = counts + jnp.sum(onehot, axis=0)
        x_norms = jnp.sum(chunk_f**2, axis=-1)
        obj = obj + jnp.sum(jnp.where(v, jnp.min(dist, axis=-1) + x_norms, 0.0))
        return (sums, counts, obj), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (sums, counts, obj), _ = jax.lax.scan(body, init, (chunks, valid))
    return sums, counts, obj


def kmeans(
    data,
    k: int,
    iters: int = 20,
    seed: int = 1,
    chunk_size: int = 65536,
    spherical: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Train k-means. Returns (centroids [k, D] f32, objective history [iters]).

    Host-side loop over jitted Lloyd steps (iters is small and per-step
    results drive empty-cluster reseeding).
    """
    data = jnp.asarray(data)
    n, d = data.shape
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    init_idx = jax.random.choice(sub, n, shape=(min(k, n),), replace=False)
    centroids = data[init_idx].astype(jnp.float32)
    if k > n:  # degenerate: duplicate
        centroids = jnp.concatenate([centroids, centroids[: k - n]], axis=0)

    history = []
    for it in range(iters):
        sums, counts, obj = _lloyd_iteration(data, centroids, k, chunk_size)
        history.append(obj)
        new_centroids = sums / jnp.maximum(counts[:, None], 1.0)
        # Empty clusters: split the largest cluster (FAISS policy).
        key, sub = jax.random.split(key)
        largest = jnp.argmax(counts)
        noise = 1e-4 * jax.random.normal(sub, (k, d))
        donor = new_centroids[largest][None, :] * (1.0 + noise)
        empty = counts[:, None] < 0.5
        new_centroids = jnp.where(empty, donor, new_centroids)
        if spherical:
            new_centroids = new_centroids / jnp.clip(
                jnp.linalg.norm(new_centroids, axis=-1, keepdims=True), 1e-12, None
            )
        centroids = new_centroids

    return centroids, jnp.stack(history)


def pq_train_codebooks(
    data,
    n_subquantizers: int,
    n_bits: int = 8,
    iters: int = 20,
    seed: int = 1,
) -> jax.Array:
    """Train PQ codebooks: [m, 2^bits, D/m].

    Each subspace trains an independent k-means (reference behavior:
    faiss.IndexIVFPQ.train's ProductQuantizer). Subspaces loop on the host —
    m is small and each subspace reuses the jitted Lloyd step.
    """
    data = jnp.asarray(data)
    n, d = data.shape
    m = n_subquantizers
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    ksub = 1 << n_bits
    books = []
    for j in range(m):
        sub = data[:, j * dsub : (j + 1) * dsub]
        cb, _ = kmeans(sub, ksub, iters=iters, seed=seed + j)
        books.append(cb)
    return jnp.stack(books)  # [m, ksub, dsub]


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def pq_encode(
    data: jax.Array,       # [N, D]
    codebooks: jax.Array,  # [m, ksub, dsub]
    chunk_size: int = 65536,
) -> jax.Array:
    """Encode rows to uint8 codes [N, m] (nearest codeword per subspace)."""
    n, d = data.shape
    m, ksub, dsub = codebooks.shape
    chunk_size = _chunk(n, chunk_size)
    n_chunks = -(-n // chunk_size)
    total = n_chunks * chunk_size
    padded = jnp.pad(data, ((0, total - n), (0, 0))) if total != n else data
    chunks = padded.reshape(n_chunks, chunk_size, m, dsub)
    cb_norms = jnp.sum(codebooks.astype(jnp.float32) ** 2, axis=-1)  # [m, ksub]

    def body(_, chunk):
        chunk_f = chunk.astype(jnp.float32)
        ip = jnp.einsum("cmd,mkd->cmk", chunk_f, codebooks.astype(jnp.float32))
        dist = cb_norms[None] - 2.0 * ip
        return None, jnp.argmin(dist, axis=-1).astype(jnp.uint8)

    _, codes = jax.lax.scan(body, None, chunks)
    return codes.reshape(total, m)[:n]


def pq_decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Reconstruct [N, D] from codes (for tests / reconstruction error)."""
    m, ksub, dsub = codebooks.shape
    parts = [codebooks[j][codes[:, j].astype(jnp.int32)] for j in range(m)]
    return jnp.concatenate(parts, axis=-1)


def aniso_eta(dim: int, threshold: float = 0.2) -> float:
    """Parallel-error weight h_par (with h_orth = 1) for score-aware
    quantization (Guo et al. 2020, "Accelerating Large-Scale Inference with
    Anisotropic Vector Quantization" / ScaNN). ``threshold`` T is the
    minimum cosine a query must have with x for its score error to count;
    the induced weight ratio is eta = (d-1) T^2 / (1 - T^2)."""
    t2 = float(threshold) ** 2
    return max((dim - 1) * t2 / max(1.0 - t2, 1e-9), 1.0)


def _as_subspaces(x: jax.Array, m: int) -> jax.Array:
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    return x.reshape(n, m, d // m)


def _default_dirs(data: jax.Array) -> jax.Array:
    """Unit full-space direction per row (the score-relevant axis)."""
    norm = jnp.linalg.norm(data.astype(jnp.float32), axis=-1, keepdims=True)
    return data.astype(jnp.float32) / jnp.clip(norm, 1e-12, None)


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def _aniso_assign(
    data: jax.Array,       # [N, m, dsub] f32 (subspace view)
    dirs: jax.Array,       # [N, m, dsub] f32 — full-space unit dir, split
    codebooks: jax.Array,  # [m, ksub, dsub] f32
    eta: float,
    chunk_size: int = 8192,
) -> jax.Array:
    """Per-subspace assignment minimizing the anisotropic loss
    ``||c - x||^2 + (eta - 1) (v . (c - x))^2`` with v the row's full-space
    unit direction restricted to the subspace. eta = 1 is plain L2."""
    n, m, dsub = data.shape
    cs = _chunk(n, chunk_size)
    n_chunks = -(-n // cs)
    total = n_chunks * cs
    if total != n:
        data = jnp.pad(data, ((0, total - n), (0, 0), (0, 0)))
        dirs = jnp.pad(dirs, ((0, total - n), (0, 0), (0, 0)))
    xc = data.reshape(n_chunks, cs, m, dsub)
    vc = dirs.reshape(n_chunks, cs, m, dsub)
    c_norms = jnp.sum(codebooks**2, axis=-1)  # [m, ksub]

    def body(_, inp):
        x, v = inp  # [cs, m, dsub]
        cx = jnp.einsum("nmd,mkd->nmk", x, codebooks)  # c . x
        cv = jnp.einsum("nmd,mkd->nmk", v, codebooks)  # c . v
        vx = jnp.sum(v * x, axis=-1)  # [cs, m]
        # ||c||^2 - 2 c.x + (eta-1) ((c.v)^2 - 2 (v.x)(c.v))   (+ row consts)
        loss = c_norms[None] - 2.0 * cx + (eta - 1.0) * (cv**2 - 2.0 * vx[..., None] * cv)
        return None, jnp.argmin(loss, axis=-1).astype(jnp.int32)

    _, assign = jax.lax.scan(body, None, (xc, vc))
    return assign.reshape(total, m)[:n]  # [N, m]


def aniso_pq_encode(
    data,
    codebooks: jax.Array,
    dirs=None,
    eta: float | None = None,
    threshold: float = 0.2,
) -> jax.Array:
    """Score-aware PQ encoding: per-subspace codeword choice that weights
    the residual component PARALLEL to the row's direction ``eta`` times
    the orthogonal component — parallel error is what perturbs inner
    products with the queries that score this row highly. ``dirs`` defaults
    to the rows' own unit directions; for IVF residual coding pass the
    ORIGINAL vectors' directions. Returns uint8 codes [N, m]."""
    data = jnp.asarray(data, jnp.float32)
    m = codebooks.shape[0]
    if eta is None:
        eta = aniso_eta(data.shape[1], threshold)
    v = _default_dirs(data) if dirs is None else jnp.asarray(dirs, jnp.float32)
    assign = _aniso_assign(_as_subspaces(data, m), _as_subspaces(v, m), codebooks.astype(jnp.float32), float(eta))
    return assign.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("ksub", "chunk_size"))
def _aniso_stats(
    data: jax.Array,    # [N, m, dsub]
    dirs: jax.Array,    # [N, m, dsub]
    assign: jax.Array,  # [N, m] int32
    ksub: int,
    chunk_size: int = 4096,
):
    """Per-(subspace, codeword) sufficient statistics for the anisotropic
    codeword update: counts n_k, sums Sx_k = sum x, Sv2_k = sum v v^T,
    Svx_k = sum v (v.x). The v v^T grams go through one [ksub, cs] @
    [cs, dsub^2] matmul per subspace per chunk (MXU-shaped)."""
    n, m, dsub = data.shape
    cs = _chunk(n, chunk_size)
    n_chunks = -(-n // cs)
    total = n_chunks * cs
    if total != n:
        data = jnp.pad(data, ((0, total - n), (0, 0), (0, 0)))
        dirs = jnp.pad(dirs, ((0, total - n), (0, 0), (0, 0)))
        assign = jnp.pad(assign, ((0, total - n), (0, 0)), constant_values=-1)
    xc = data.reshape(n_chunks, cs, m, dsub)
    vc = dirs.reshape(n_chunks, cs, m, dsub)
    ac = assign.reshape(n_chunks, cs, m)

    def body(carry, inp):
        counts, sx, sv2, svx = carry
        x, v, a = inp
        onehot = jax.nn.one_hot(a, ksub, axis=-1, dtype=jnp.float32)  # [cs, m, k]
        counts = counts + jnp.sum(onehot, axis=0).T  # [k, m] -> transpose later
        sx = sx + jnp.einsum("nmk,nmd->mkd", onehot, x)
        vx = jnp.sum(v * x, axis=-1)  # [cs, m]
        svx = svx + jnp.einsum("nmk,nmd->mkd", onehot, v * vx[..., None])
        outer = (v[..., :, None] * v[..., None, :]).reshape(-1, m, dsub * dsub)
        sv2 = sv2 + jnp.einsum("nmk,nmp->mkp", onehot, outer)
        return (counts, sx, sv2, svx), None

    init = (
        jnp.zeros((ksub, m), jnp.float32),
        jnp.zeros((m, ksub, dsub), jnp.float32),
        jnp.zeros((m, ksub, dsub * dsub), jnp.float32),
        jnp.zeros((m, ksub, dsub), jnp.float32),
    )
    (counts, sx, sv2, svx), _ = jax.lax.scan(body, init, (xc, vc, ac))
    return counts.T, sx, sv2.reshape(m, ksub, dsub, dsub), svx


def aniso_pq_train(
    data,
    n_subquantizers: int,
    n_bits: int = 8,
    iters: int = 10,
    eta: float | None = None,
    threshold: float = 0.2,
    dirs=None,
    seed: int = 1,
    max_points: int = 65536,
):
    """Train anisotropic PQ codebooks [m, 2^bits, D/m] (ScaNN-style
    score-aware loss; see ``aniso_eta``). Alternates the anisotropic
    assignment with the exact weighted-least-squares codeword update

        (n_k I + (eta-1) sum v v^T) c_k = sum x + (eta-1) sum v (v.x)

    solved as a batched [ksub, dsub, dsub] system. Decoupled per-subspace
    formulation: the parallel direction is the row's FULL-space unit vector
    restricted to the subspace, so summed over subspaces the parallel
    penalties add up to the full-space score error (cross-subspace terms
    are dropped; Guo et al.'s ablations attribute most of the recall gain
    to the weighting itself). ``max_points`` caps the training sample
    (FAISS-style 256/centroid default) since the v v^T grams are the
    expensive part. Empty codewords re-seed by splitting the fullest
    (FAISS policy, as in ``kmeans``)."""
    data = jnp.asarray(data, jnp.float32)
    n, d = data.shape
    m = n_subquantizers
    dsub = d // m
    ksub = 1 << n_bits
    if eta is None:
        eta = aniso_eta(d, threshold)
    eta = float(eta)
    v = _default_dirs(data) if dirs is None else jnp.asarray(dirs, jnp.float32)
    key = jax.random.PRNGKey(seed)
    if n > max_points:
        key, sub = jax.random.split(key)
        idx = jax.random.choice(sub, n, shape=(max_points,), replace=False)
        data, v = data[idx], v[idx]
        n = max_points
    xs, vs = _as_subspaces(data, m), _as_subspaces(v, m)

    # init: random data points per subspace (FAISS k-means init)
    key, sub = jax.random.split(key)
    init_idx = jax.random.choice(sub, n, shape=(min(ksub, n),), replace=False)
    books = jnp.moveaxis(xs[init_idx], 0, 1)  # [m, min(ksub,n), dsub]
    if ksub > n:
        books = jnp.concatenate([books, books[:, : ksub - n]], axis=1)

    for _ in range(iters):
        assign = _aniso_assign(xs, vs, books, eta)
        counts, sx, sv2, svx = _aniso_stats(xs, vs, assign, ksub)
        eye = jnp.eye(dsub, dtype=jnp.float32)
        lhs = counts[..., None, None] * eye + (eta - 1.0) * sv2 + 1e-6 * eye
        rhs = sx + (eta - 1.0) * svx
        new_books = jnp.linalg.solve(lhs, rhs[..., None])[..., 0]  # [m, k, dsub]
        # empty codewords: perturbed copy of the fullest codeword
        key, sub = jax.random.split(key)
        largest = jnp.argmax(counts, axis=1)  # [m]
        donor = jnp.take_along_axis(new_books, largest[:, None, None], axis=1)
        noise = 1.0 + 1e-4 * jax.random.normal(sub, books.shape)
        books = jnp.where((counts < 0.5)[..., None], donor * noise, new_books)

    return books


def opq_eig_init(data, n_subquantizers: int):
    """Eigenvalue-allocation OPQ init (Ge et al.'s parametric OPQ): PCA the
    data, then greedily assign eigenvectors (descending eigenvalue) to the
    subspace with the smallest current eigenvalue PRODUCT and free slots —
    balancing per-subspace information. On anisotropic real embeddings
    (most variance in a few directions) this beats identity init by
    spreading the signal across subquantizers before the alternation even
    starts. Returns an orthogonal R [D, D] (columns = permuted
    eigenvectors)."""
    import numpy as np

    x = np.asarray(data, np.float32)
    d = x.shape[1]
    m = n_subquantizers
    dsub = d // m
    cov = np.cov(x - x.mean(0, keepdims=True), rowvar=False).astype(np.float64)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    # greedy balanced allocation on log-eigenvalues (product balance)
    logs = np.log(np.maximum(evals, 1e-12))
    bucket_log = np.zeros(m)
    bucket_fill: list[list[int]] = [[] for _ in range(m)]
    for i in range(d):
        free = [b for b in range(m) if len(bucket_fill[b]) < dsub]
        b = min(free, key=lambda b: bucket_log[b])
        bucket_fill[b].append(i)
        bucket_log[b] += logs[i]
    perm = [i for b in range(m) for i in bucket_fill[b]]
    return np.ascontiguousarray(evecs[:, perm], np.float32)


def opq_train(
    data,
    n_subquantizers: int,
    n_bits: int = 8,
    opq_iters: int = 8,
    pq_iters: int = 10,
    seed: int = 1,
    init: str = "auto",
):
    """OPQ: learn an orthogonal rotation R minimizing PQ quantization error
    (Ge et al., Optimized Product Quantization; FAISS's 'OPQ{m}' transform).

    ``init``: "identity" reproduces the round-2 behavior; "eig" starts from
    the eigenvalue-allocation rotation (``opq_eig_init``) — better on
    anisotropic real-embedding covariance, worse on some low-rank synthetic
    geometries; "auto" (default) trains from BOTH inits and keeps the pair
    with the lower final quantization error (the OPQ objective itself).
    Alternating optimization: train PQ codebooks on the rotated data, then
    solve the orthogonal Procrustes problem R = U V^T from the SVD of
    X^T X_hat. Scores are preserved because R is orthogonal:
    q.r == (qR).(rR), so queries rotate at LUT-build time.

    Returns (R [D, D], codebooks [m, ksub, dsub] trained on data @ R).
    """
    import numpy as np

    x = np.asarray(data, np.float32)
    d = x.shape[1]

    def train_from(r):
        for _ in range(max(opq_iters, 1)):
            z = x @ r
            codebooks = pq_train_codebooks(z, n_subquantizers, n_bits, iters=pq_iters, seed=seed)
            codes = pq_encode(jnp.asarray(z), codebooks)
            z_hat = np.asarray(pq_decode(codes, codebooks), np.float32)
            # min_R ||X R - Z_hat||_F with R orthogonal: SVD of X^T Z_hat
            u, _, vt = np.linalg.svd(x.T @ z_hat, full_matrices=False)
            r = (u @ vt).astype(np.float32)
        # final codebook fit on the FINAL rotation, so the returned (R,
        # codebooks) pair is matched (the loop's last step updates R after
        # fitting codebooks on the previous one)
        codebooks = pq_train_codebooks(x @ r, n_subquantizers, n_bits, iters=pq_iters, seed=seed)
        z = x @ r
        codes = pq_encode(jnp.asarray(z), codebooks)
        err = float(np.mean((np.asarray(pq_decode(codes, codebooks), np.float32) - z) ** 2))
        return r, codebooks, err

    inits = []
    if init in ("identity", "auto"):
        inits.append(np.eye(d, dtype=np.float32))
    if init in ("eig", "auto"):
        inits.append(opq_eig_init(x, n_subquantizers))
    best = min((train_from(r0) for r0 in inits), key=lambda t: t[2])
    return best[0], best[1]
