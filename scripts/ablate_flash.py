"""On-chip ablation of the flash-attention kernel's remaining cost at the
reader shapes (b8 h16 S1024 d128 / b8 h32 S1024 d64 / S2048).

The kernel sits at ~2.3 ms vs a ~0.35 ms pure-matmul bound at the d128
shape; BENCH.md calls the gap "per-program floor / future kernel work".
This script decomposes it on the real chip: each variant strips or
restructures one piece of the softmax/masking machinery so the deltas
localize the VPU passes.

Timing methodology: bench.py's — N dependent iterations inside one jitted
lax.fori_loop with a float-threaded data dependency, one scalar fetched with
np.asarray (relay-safe). Run with PYTHONPATH=/root/repo:/root/.axon_site.

Variants (* = numerically correct candidate, checked vs XLA):
  flash*            current flash_attention, causal
  flash_nc          current kernel, causal=False (drops mask passes)
  mm_only           s = q@k^T; o = s@v            (MXU + DMA floor)
  mm_exp            o = exp(s)@v                   (+ exp pass only)
  mm_exp_max        o = exp(s - rowmax(s))@v       (+ max reduce + sub)
  oneshot_where*    one softmax over the whole key row per q block (no
                    online rescale carry, no per-block loop); causal mask
                    via broadcast-1D-iota compare + where BEFORE max
                    (parity-safe for any score distribution)
  oneshot_mul       mask AFTER exp via multiply (1 fewer pass; unsafe if a
                    masked score exceeds the visible max by ~80 logits —
                    timing probe only)
  oneshot_bf16      oneshot_mul with post-sub elementwise math in bf16
                    (packed-VPU probe)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


NEG_INF = float(np.finfo(np.float32).min)


def main() -> None:
    interpret = "--interpret" in sys.argv  # CPU smoke mode (tiny shapes)
    if interpret:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from retrieval_scaling_tpu.ops.flash_attention import flash_attention, xla_attention

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones(4))
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    fa = functools.partial(flash_attention, interpret=interpret)

    # ---- variant kernels: grid (B, H, S // bq); whole-S K/V per program ----
    def make_kernel(mode: str, S: int, D: int, bq: int, sm_scale: float):
        def kern(q_ref, k_ref, v_ref, o_ref):
            qi = pl.program_id(2)
            qq = q_ref[0, 0].astype(jnp.float32) * sm_scale
            kk = k_ref[0, 0].astype(jnp.float32)
            vv = v_ref[0, 0].astype(jnp.float32)
            s = jax.lax.dot_general(
                qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, S]
            if mode.startswith("oneshot"):
                row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + qi * bq
                col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
                tri = col <= row  # [bq, S] broadcast compare
                if mode == "oneshot_where":
                    s = jnp.where(tri, s, NEG_INF)
                    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG_INF * 0.5)
                    p = jnp.exp(s - m)
                else:
                    # rowmax over the full block >= triangle max: stable,
                    # and multiplying by the 0/1 triangle zeroes the rest.
                    m = jnp.max(s, axis=-1, keepdims=True)
                    if mode == "oneshot_bf16":
                        p16 = jnp.exp((s - m).astype(jnp.bfloat16))
                        p = jnp.where(tri, p16, jnp.bfloat16(0)).astype(jnp.float32)
                    else:
                        p = jnp.exp(s - m) * tri.astype(jnp.float32)
                l = jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p, vv, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
                return
            if mode == "mm_only":
                p = s
            elif mode == "mm_exp":
                p = jnp.exp(s)
            elif mode == "mm_exp_max":
                p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            else:
                raise ValueError(mode)
            o = jax.lax.dot_general(
                p, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[0, 0] = o.astype(o_ref.dtype)

        return kern

    def variant(mode: str, B, H, S, D, bq):
        sm_scale = D**-0.5
        kern = make_kernel(mode, S, D, bq, sm_scale)

        @jax.jit
        def fn(qq, kk, vv):
            return pl.pallas_call(
                kern,
                grid=(B, H, S // bq),
                in_specs=[
                    pl.BlockSpec((1, 1, bq, D), lambda bi, hi, qi: (bi, hi, qi, 0)),
                    pl.BlockSpec((1, 1, S, D), lambda bi, hi, qi: (bi, hi, 0, 0)),
                    pl.BlockSpec((1, 1, S, D), lambda bi, hi, qi: (bi, hi, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 1, bq, D), lambda bi, hi, qi: (bi, hi, qi, 0)),
                out_shape=jax.ShapeDtypeStruct((B, H, S, D), qq.dtype),
                interpret=interpret,
            )(qq, kk, vv)

        return fn

    def make_timed(q, k, v, iters):
        """Relay-safe timer shared by every section (one methodology)."""

        def timed(label, fn):
            def loop(args):
                a, b_, c = args

                def body(i, acc):
                    out = fn(a + acc * 0.0, b_, c)
                    return acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

                return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

            jl = jax.jit(loop)
            t0 = time.perf_counter()
            _ = np.asarray(jl((q, k, v)))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(jl((q, k, v)))
            ms = (time.perf_counter() - t0) * 1e3 / iters
            log(f"{label:18s} {ms:8.3f} ms/iter   (compile+first {compile_s:.1f}s)")
            return ms

        return timed

    def run_shape(B, H, S, D, bq, modes, iters):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        sm_scale = D**-0.5
        log(f"---- B{B} H{H} S{S} D{D} bq{bq} ----")
        timed = make_timed(q, k, v, iters)

        results = {}
        results["flash"] = timed(
            "flash(causal)", lambda a, b_, c: fa(a, b_, c, causal=True)
        )
        results["flash_1shot"] = timed(
            "flash(one_shot)",
            lambda a, b_, c: fa(a, b_, c, causal=True, block_q=bq, one_shot=True),
        )
        if "flash_nc" in modes:
            results["flash_nc"] = timed(
                "flash(nc)", lambda a, b_, c: fa(a, b_, c, causal=False)
            )
        for mode in modes:
            if mode == "flash_nc":
                continue
            results[mode] = timed(mode, variant(mode, B, H, S, D, bq))

        ref = np.asarray(
            xla_attention(q, k, v, causal=True, sm_scale=sm_scale), np.float32
        )
        for mode in modes:
            if not mode.startswith("oneshot"):
                continue
            got = np.asarray(variant(mode, B, H, S, D, bq)(q, k, v), np.float32)
            err = float(np.abs(got - ref).max())
            log(f"max|err| {mode:14s} = {err:.4e}")
        if "mm_only" in results:
            log("deltas vs mm_only:")
            for mode, ms in results.items():
                log(f"  {mode:14s} +{ms - results['mm_only']:7.3f} ms")
        return results

    def run_window(B, H, S, D, bq, win, iters):
        # windows smaller than the key row always route to the looped
        # kernel (one_shot is gated off: key-block skipping keeps
        # O(S*window)); this section just records the looped window cost
        # next to the dense numbers measured above
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        log(f"---- window B{B} H{H} S{S} D{D} w{win} ----")
        timed = make_timed(q, k, v, iters)
        return {
            "flash_win": timed(
                "flash(window)", lambda a, b_, c: fa(a, b_, c, window=win)
            ),
        }

    all_modes = (
        "flash_nc", "mm_only", "mm_exp", "mm_exp_max",
        "oneshot_where", "oneshot_mul", "oneshot_bf16",
    )
    out = {}
    if interpret:
        out["tiny"] = run_shape(1, 2, 256, 64, 128, all_modes, 2)
    else:
        out["d128"] = run_shape(8, 16, 1024, 128, 1024, all_modes, 16)
        out["llama_d64"] = run_shape(8, 32, 1024, 64, 1024,
                                     ("flash_nc", "mm_only", "oneshot_where"), 16)
        # S=2048: whole-S key rows per program; [512, 2048] f32 s/p tiles
        out["s2048"] = run_shape(8, 16, 2048, 128, 512,
                                 ("mm_only", "oneshot_where"), 8)
        # windowed routing decision at S=2048 w=1024: the looped kernel
        # skips out-of-band key blocks (O(S*window)); one-shot pays full S
        out["s2048_window"] = run_window(8, 16, 2048, 128, 512, 1024, 8)
    print(repr(out))


if __name__ == "__main__":
    main()
