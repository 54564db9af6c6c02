"""Interleaved A/B of flash_attention one_shot=False vs True in ONE process
(the chip's clock state drifts across processes — min-of-N per variant,
variants alternated, is the only fair comparison). Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flash_ab.py d128
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


SHAPES = {
    "d128": (8, 16, 1024, 128, 16),
    "llama_d64": (8, 32, 1024, 64, 16),
    "s2048": (8, 16, 2048, 128, 8),
    "pythia": (8, 8, 1024, 256, 16),
}


def main() -> None:
    name = next((a for a in sys.argv[1:] if a in SHAPES), "d128")
    B, H, S, D, iters = SHAPES[name]

    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.ops.flash_attention import flash_attention

    log(f"backend={jax.default_backend()} shape={name}")
    _ = np.asarray(jnp.ones(4))

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    def make(one_shot):
        def loop(args):
            a, b_, c = args

            def body(i, acc):
                out = flash_attention(
                    a + acc * 0.0, b_, c, causal=True, one_shot=one_shot
                )
                return acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        return jax.jit(loop)

    fns = {"looped": make(False), "oneshot": make(True)}
    for nm, fn in fns.items():
        t0 = time.perf_counter()
        _ = np.asarray(fn((q, k, v)))
        log(f"{nm}: compile+first {time.perf_counter() - t0:.1f}s")
    best = {nm: float("inf") for nm in fns}
    for _round in range(6):
        for nm, fn in fns.items():
            t0 = time.perf_counter()
            _ = np.asarray(fn((q, k, v)))
            best[nm] = min(best[nm], (time.perf_counter() - t0) * 1e3 / iters)
    full_gf = 4 * B * H * S * S * D / 1e9
    for nm, ms in best.items():
        log(f"{name} {nm}: {ms:.3f} ms (min of 6) = "
            f"{full_gf / ms:.1f} TFLOP/s full-matrix")
    print(repr({name: best}))


if __name__ == "__main__":
    main()
