"""Measure per-pallas_call launch overhead on chip (round 4, decode).

The production decode step issues 65 weight-streaming pallas calls; if a
launch costs ~10 us, that alone is ~0.65 ms of the 2.7 ms step. This
times the SAME weight stream (16 qkv-sized int8 matmuls, [32,2048] x
[2048,6144]) two ways:

  many1  16 separate pallas calls (one per weight) - production shape
  one16  ONE pallas call, grid (16, 3): the layer axis folded into the
         grid, weights stacked [16, 2048, 6144]

Same bytes, same dots, same block size; the time difference / 15 is the
marginal cost of a pallas launch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_launch_overhead.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


D, N, L = 2048, 6144, 16
MPAD = 32
BN = 2048


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    log(f"backend={jax.default_backend()}")
    _ = np.asarray(jnp.ones(4))

    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randint(-127, 128, (L, D, N), np.int8))
    sc = jnp.asarray(np.abs(rng.randn(L, 1, N)).astype(np.float32) * 1e-2)
    x0 = jnp.asarray(rng.randn(MPAD, D).astype(np.float32), jnp.bfloat16)

    def kern(x_ref, w_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[:].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)

    def stream_one(x, w, s):
        return pl.pallas_call(
            kern,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((MPAD, D), lambda j: (0, 0)),
                pl.BlockSpec((D, BN), lambda j: (0, j)),
                pl.BlockSpec((1, BN), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, BN), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, N), jnp.bfloat16),
        )(x, w, s)

    def many1(x, wq_, sc_):
        acc = x
        for li in range(L):
            y = stream_one(acc, wq_[li], sc_[li])
            acc = acc + y[:, :D]  # chain to force sequencing
        return acc

    def kern3(x_ref, w_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], w_ref[0].astype(x_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc * s_ref[0]).astype(o_ref.dtype)

    def one16(x, wq_, sc_):
        y = pl.pallas_call(
            kern3,
            grid=(L, N // BN),
            in_specs=[
                pl.BlockSpec((MPAD, D), lambda i, j: (0, 0)),
                pl.BlockSpec((1, D, BN), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, 1, BN), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, MPAD, BN), lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((L, MPAD, N), jnp.bfloat16),
        )(x, wq_, sc_)
        # same adds as many1 (outside the kernel; cheap)
        return x + jnp.sum(y[:, :, :D], axis=0).astype(x.dtype)

    gbytes = L * D * N / 1e9

    def timed(name, fn):
        f = jax.jit(
            lambda x, w, s: jax.lax.fori_loop(
                0, iters, lambda i, a: fn(a * (1.0 / (1.0 + 1e-9)), w, s), x
            )
        )
        t0 = time.perf_counter()
        np.asarray(f(x0, wq, sc))
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        np.asarray(f(x0, wq, sc))
        ms = (time.perf_counter() - t0) * 1e3 / iters
        log(f"{name}: {ms:.3f} ms/iter  ({gbytes / ms * 1e3:.0f} GB/s effective)")
        return ms

    m1 = timed("many1 (16 launches)", many1)
    o16 = timed("one16 (1 launch)", one16)
    log(f"launch overhead: {(m1 - o16) / (L - 1) * 1e3:.1f} us/call")


if __name__ == "__main__":
    main()
