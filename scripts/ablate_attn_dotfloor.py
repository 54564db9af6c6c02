"""On-chip: is the flash kernel's 2.1 ms at b8 h16 S1024 d128 a Pallas
inefficiency or the hardware's matmul-shape floor? (VERDICT r3 item 3)

Round-3 ablations pinned the kernel at its dot floor (mm_only strips all
softmax/mask passes: 2.14 of 2.39 ms) and showed operand dtype is
irrelevant (f32mm 2.079 / bf16qk 2.071 / bf16both 2.212 ms). This script
times the SAME dot sequence as pure XLA batched einsums — no Pallas, no
masking, XLA free to schedule:

  attn_dots   s = q@k^T [128x(1024,128)@(128,1024)]; o = s@v
              (the exact QK^T/PV shape pair, batched over B*H=128)
  square      the same total FLOPs as one (2896,2896)@(2896,2896) dot
              per iteration (MXU-friendly aspect, peak sanity check)

If attn_dots lands at ~2 ms too, the bound is the d=128 attention shape
on this chip (K-depth 128 for QK^T, N-width 128 for PV), not the kernel;
'square' shows what the MXU does when the shape lets it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_attn_dotfloor.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax
    import jax.numpy as jnp

    log(f"backend={jax.default_backend()}")
    _ = np.asarray(jnp.ones(4))

    B, H, S, D = 8, 16, 1024, 128
    BH = B * H
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, S, D), jnp.bfloat16)
    flops = 2 * BH * S * S * D * 2  # QK^T + PV
    log(f"attention dot FLOPs/iter: {flops / 1e9:.1f} GF")

    def timed(name, fn, *args):
        @jax.jit
        def loop(*a):
            def body(_, carry):
                acc, qq = carry
                o = fn(qq, *a[1:])
                return acc + o[0, 0, 0].astype(jnp.float32), qq + o * 0.0
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0.0), a[0])
            )
            return acc

        t0 = time.perf_counter()
        r = np.asarray(loop(*args))
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        r = np.asarray(loop(*args))
        dt = (time.perf_counter() - t0) / iters
        log(f"{name}: {dt * 1e3:.3f} ms/iter = {flops / dt / 1e12:.1f} TFLOP/s "
            f"(sum={float(r):.3f})")
        return dt

    def attn_dots(qq, kk, vv):
        s = jnp.einsum("bqd,bkd->bqk", qq, kk, preferred_element_type=jnp.float32)
        return jnp.einsum(
            "bqk,bkd->bqd", s.astype(jnp.bfloat16), vv,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    timed("attn_dots (XLA, exact QK/PV shapes)", attn_dots, q, k, v)

    # same FLOPs in one square dot: side = (flops/2 / 2)^(1/3)
    side = 2896
    a_sq = jnp.asarray(rng.randn(side, side), jnp.bfloat16)
    b_sq = jnp.asarray(rng.randn(side, side), jnp.bfloat16)
    sq_flops = 2 * side**3

    def square(aa, bb):
        return jnp.dot(aa, bb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def sq_loop(aa, bb):
        def body(_, carry):
            acc, xx = carry
            o = square(xx, bb)
            return acc + o[0, 0].astype(jnp.float32), xx + o * 0.0
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), aa))
        return acc

    t0 = time.perf_counter()
    r = np.asarray(sq_loop(a_sq, b_sq))
    log(f"square: compile+run {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    r = np.asarray(sq_loop(a_sq, b_sq))
    dt = (time.perf_counter() - t0) / iters
    log(f"square ({side}^3 dot): {dt * 1e3:.3f} ms/iter = "
        f"{sq_flops / dt / 1e12:.1f} TFLOP/s (sum={float(r):.3f})")


if __name__ == "__main__":
    main()
