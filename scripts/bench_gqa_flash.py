"""On-chip benchmark: GQA-native flash vs repeat-then-flash.

The torch reference (and our llama_forward until round 3 session 7)
materializes grouped K/V to the full query-head count before attention
(transformers repeat_kv; reference reader families Llama-3/Qwen2 use
num_key_value_heads < num_attention_heads). The flash kernel now maps
query head -> kv head in its BlockSpec index map, so grouped K/V stay
at [B, Hkv, S, D] in HBM and consecutive query-head programs reuse the
resident K/V block.

Measures, at Llama-3-8B-like prefill shapes:
  repeat+flash   jnp.repeat(k/v, n_rep, axis=1) then flash at full H
  gqa flash      grouped k/v straight into the kernel

Timing: bench.py methodology (N dependent iters in one jitted fori_loop,
scalar fetched with np.asarray). PYTHONPATH=/root/repo:/root/.axon_site.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    interpret = "--interpret" in sys.argv
    if interpret:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.ops.flash_attention import flash_attention

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones(4))
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    def timed(label, fn, args, iters):
        def loop(a):
            q, k, v = a

            def body(i, acc):
                out = fn(q + acc * 0.0, k, v)
                return acc + out[0, 0, 0, 0].astype(jnp.float32) * 1e-12

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        jl = jax.jit(loop)
        t0 = time.perf_counter()
        _ = np.asarray(jl(args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(jl(args))
        ms = (time.perf_counter() - t0) * 1e3 / iters
        log(f"{label:24s} {ms:8.3f} ms/iter   (compile+first {compile_s:.1f}s)")
        return ms

    def run(b, h, hkv, s, d, iters):
        rng = np.random.RandomState(0)
        n_rep = h // hkv
        q = jnp.asarray(rng.randn(b, h, s, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, hkv, s, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, hkv, s, d), jnp.bfloat16)
        log(f"---- B{b} H{h} Hkv{hkv} S{s} D{d} ----")

        def rep_flash(q_, k_, v_):
            return flash_attention(
                q_, jnp.repeat(k_, n_rep, axis=1), jnp.repeat(v_, n_rep, axis=1),
                causal=True, interpret=interpret,
            )

        def gqa_flash(q_, k_, v_):
            return flash_attention(q_, k_, v_, causal=True, interpret=interpret)

        t_rep = timed("repeat+flash", rep_flash, (q, k, v), iters)
        t_gqa = timed("gqa flash", gqa_flash, (q, k, v), iters)
        # parity on chip at bf16 resolution
        ref = np.asarray(rep_flash(q, k, v), np.float32)
        got = np.asarray(gqa_flash(q, k, v), np.float32)
        err = float(np.abs(ref - got).max())
        log(f"max|err| = {err:.4e}   speedup {t_rep / t_gqa:.2f}x")
        return {"repeat": t_rep, "gqa": t_gqa, "err": err}

    out = {}
    if interpret:
        out["tiny"] = run(1, 4, 2, 256, 64, 2)
    else:
        # Llama-3-8B attention shape (h32 hkv8 d128) at the two bench S
        out["llama3_s1024"] = run(8, 32, 8, 1024, 128, 16)
        out["llama3_s2048"] = run(4, 32, 8, 2048, 128, 8)
        # Qwen2-7B-like (h28 hkv4): deeper grouping
        out["qwen2_s1024"] = run(8, 28, 4, 1024, 128, 16)
    print(repr(out))


if __name__ == "__main__":
    main()
