"""On-chip A/B: matmul operand dtype inside the flash kernels.

The session-8 ablation (scripts/ablate_flash.py) showed the kernel sits at
the *mm_only* floor: at b8 h16 S1024 d128, stripping every softmax/mask pass
leaves 2.14 ms of the 2.39 ms total — the two dot_generals dominate. Both
kernels upcast q/k/v to f32 before the dots; on the MXU bf16xbf16->f32 runs
at full rate while f32xf32 runs at a fraction of it, so the upcast (not the
VPU) would be the remaining cost. This script times one-shot-style bodies:

  f32mm      q/k/v upcast to f32 before both dots (current kernel behavior)
  bf16qk     QK^T with bf16 operands (f32 accumulate), PV with f32 p
  bf16both   QK^T bf16 operands; p cast to bf16 for PV (f32 accumulate)

and reports max|err| vs the f32 XLA reference (bf16 input resolution is
~1.6e-2 at these magnitudes, so anything of that order is input-noise).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_flash_bf16.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


NEG_INF = float(np.finfo(np.float32).min)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from retrieval_scaling_tpu.ops.flash_attention import xla_attention

    log(f"backend={jax.default_backend()}")
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones(4))
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    def make_kernel(mode: str, bq: int, sm_scale: float):
        def kern(q_ref, k_ref, v_ref, o_ref):
            qi = pl.program_id(2)
            sk = k_ref.shape[2]
            if mode == "f32mm":
                qq = q_ref[0, 0].astype(jnp.float32) * sm_scale
                kk = k_ref[0, 0].astype(jnp.float32)
            else:
                qq = q_ref[0, 0] * jnp.asarray(sm_scale, q_ref.dtype)
                kk = k_ref[0, 0]
            s = jax.lax.dot_general(
                qq, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, Sk] f32
            row = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0) + qi * bq
            col = jax.lax.broadcasted_iota(jnp.int32, (1, sk), 1)
            s = jnp.where(col <= row, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - jnp.maximum(m, NEG_INF * 0.5))
            l = jnp.sum(p, axis=-1, keepdims=True)
            if mode == "bf16both":
                p2 = p.astype(v_ref.dtype)
                vv = v_ref[0, 0]
            else:
                p2 = p
                vv = v_ref[0, 0].astype(jnp.float32)
            o = jax.lax.dot_general(
                p2, vv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

        return kern

    def build(mode: str, B, H, S, D, bq, sm_scale):
        kern = make_kernel(mode, bq, sm_scale)
        return pl.pallas_call(
            kern,
            grid=(B, H, S // bq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda bi, hi, qi: (bi, hi, qi, 0)),
                pl.BlockSpec((1, 1, S, D), lambda bi, hi, qi: (bi, hi, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda bi, hi, qi: (bi, hi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda bi, hi, qi: (bi, hi, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.bfloat16),
        )

    def make_timed(q, k, v, iters):
        def timed(name, fn):
            @jax.jit
            def loop():
                def body(_, carry):
                    acc, qq = carry
                    o = fn(qq, k, v)
                    return acc + o[0, 0, 0, 0].astype(jnp.float32), qq + o * 0.0

                acc, _ = jax.lax.fori_loop(
                    0, iters, body, (jnp.float32(0.0), q)
                )
                return acc

            t0 = time.perf_counter()
            r = np.asarray(loop())
            t1 = time.perf_counter()
            r = np.asarray(loop())
            t2 = time.perf_counter()
            ms = (t2 - t1) / iters * 1e3
            log(f"{name:12s} {ms:9.3f} ms/iter   (compile+first {t1 - t0:.1f}s)")
            return ms

        return timed

    mode_want = [a for a in sys.argv[1:] if a in ("f32mm", "bf16qk", "bf16both")]
    noref = "--noref" in sys.argv

    def run_shape(B, H, S, D, bq, iters):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
        sm_scale = D**-0.5
        log(f"---- B{B} H{H} S{S} D{D} bq{bq} ----")
        timed = make_timed(q, k, v, iters)
        out = {}
        # full-f32 reference: cast q/k/v up front so xla_attention's PV
        # contraction (which otherwise runs at v.dtype) accumulates in f32
        ref = None
        if not noref:
            ref = np.asarray(
                xla_attention(
                    q.astype(jnp.float32),
                    k.astype(jnp.float32),
                    v.astype(jnp.float32),
                    causal=True,
                    sm_scale=sm_scale,
                ),
                np.float32,
            )
        for mode in mode_want or ("f32mm", "bf16qk", "bf16both"):
            fn = build(mode, B, H, S, D, bq, sm_scale)
            out[mode] = timed(mode, lambda a, b_, c, fn=fn: fn(a, b_, c))
            if ref is not None:
                got = np.asarray(fn(q, k, v), np.float32)
                err = float(np.abs(got - ref).max())
                log(f"   max|err| {mode} = {err:.4e}")
        return out

    shapes = {
        "d128": (8, 16, 1024, 128, 1024, 16),
        "llama_d64": (8, 32, 1024, 64, 1024, 16),
        "s2048": (8, 16, 2048, 128, 512, 8),
    }
    # each mode pays a full relay compile: --shape runs one at a time so a
    # bounded driver timeout still yields numbers
    want = [a for a in sys.argv[1:] if a in shapes] or list(shapes)
    out = {}
    for name in want:
        out[name] = run_shape(*shapes[name])
    print(repr(out))


if __name__ == "__main__":
    main()
