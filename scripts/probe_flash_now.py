"""Time the production flash_attention at a named shape (relay-safe), with
parity vs the f32 XLA reference. One shape per invocation so each run fits
a bounded timeout. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_flash_now.py d128 [--oneshot] [--noref]
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
    oneshot = "--oneshot" in sys.argv
    noref = "--noref" in sys.argv
    B, H, S, D, iters = SHAPES[name]

    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.ops.flash_attention import flash_attention, xla_attention

    log(f"backend={jax.default_backend()} shape={name} oneshot={oneshot}")
    _ = np.asarray(jnp.ones(4))

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)

    def fn(a, b_, c):
        return flash_attention(a, b_, c, causal=True, one_shot=oneshot or None)

    def loop(args):
        a, b_, c = args

        def body(i, acc):
            out = fn(a + acc * 0.0, b_, c)
            return acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    jl = jax.jit(loop)
    t0 = time.perf_counter()
    _ = np.asarray(jl((q, k, v)))
    log(f"compile+first {time.perf_counter() - t0:.1f}s")
    # the chip shows ~±15% run-to-run jitter through the relay: take the
    # min of 5 timed loops (the jitter is additive noise, so min = kernel)
    best = float("inf")
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(jl((q, k, v)))
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    ms = best
    full_tf = 4 * B * H * S * S * D / (ms / 1e3) / 1e12
    log(f"{name} flash(causal{', one_shot' if oneshot else ''}): {ms:.3f} ms/iter"
        f" = {full_tf:.1f} TFLOP/s full-matrix ({full_tf / 2:.1f} causal-useful)")
    if not noref:
        ref = np.asarray(
            xla_attention(
                q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
                causal=True,
            ),
            np.float32,
        )
        got = np.asarray(fn(q, k, v), np.float32)
        log(f"max|err| vs f32 XLA = {np.abs(got - ref).max():.4e}")
    print(f"{name} {'oneshot' if oneshot else 'looped'} {ms:.4f}")


if __name__ == "__main__":
    main()
