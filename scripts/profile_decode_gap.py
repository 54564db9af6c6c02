"""Attribute the decode-step gap above the HBM weight-stream floor.

VERDICT r4 #3 follow-through: bench.py reports decode_pct_of_stream_floor
(int8 Pythia-1B decode step vs a pure-DMA touch probe over the exact
buffers the step streams). This script breaks the remaining gap down with
three on-chip measurements, each a single jitted ``fori_loop`` (relay-
honest amortized timing, same method as bench.py):

  full     the production decode step: forward_with_cache + argmax
  streams  ONLY the weight-stream dots, chained exactly as decode issues
           them (per layer: q8_dual_in_dot + q8_splitk_dot on the fused
           storage; then the q8_dot vocab head) — no attention, no LN,
           no rope, no cache writes
  launch   the same number of pallas_call launches doing near-zero work
           (one sublane copy each) — the pure dispatch floor

gap attribution:
  streams - floor  = in-kernel overhead above pure DMA (quantize epilogue,
                     grid bookkeeping) + launch costs
  full - streams   = attention + elementwise (LN/rope/writes/argmax) +
                     while-loop carry

Writes bench_artifacts/decode_gap_r05.json.

Run: python scripts/profile_decode_gap.py [iters]
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


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import (
        forward_with_cache,
        init_cache,
        make_generate_fn,
        quantize_decode_params,
    )
    from retrieval_scaling_tpu.models.gpt_neox import (
        GPTNeoXConfig,
        init_gpt_neox_params,
    )
    from retrieval_scaling_tpu.ops.quant_matmul import (
        q8_dot,
        q8_dual_in_dot,
        q8_splitk_dot,
    )

    log(f"backend={jax.default_backend()}")
    cfg = GPTNeoXConfig()  # pythia-1b shape
    b, s_prompt, s_new = 8, 32, 64
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    qparams = jax.jit(lambda p: quantize_decode_params(p, cfg))(params)
    jax.tree.leaves(qparams)[0].block_until_ready()

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (b, s_prompt)), jnp.int32)
    lens = jnp.full((b,), s_prompt, jnp.int32)

    def timed(fn, *args, label=""):
        np.asarray(jax.block_until_ready(fn(*args)))
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args)))
        dt = time.perf_counter() - t0
        log(f"{label}: {dt * 1e3:.2f} ms total")
        return dt

    # ---- full: production decode (s_new steps inside one jit) -----------
    gen = make_generate_fn(cfg, s_new, eos_id=-1)
    full_s = timed(gen, qparams, ids, lens, 0, label=f"full decode x{s_new}")
    full_ms = full_s * 1e3 / s_new

    # ---- streams: exactly the decode step's weight-stream dots ----------
    layers = qparams["layers"]
    nqkv = 3 * cfg.num_heads * cfg.head_dim

    # weights enter as a jit ARGUMENT (closure constants would be inlined
    # into the uploaded HLO — GBs over the remote-compile tunnel)
    @jax.jit
    def streams_loop(qp, x0):
        def body(_, x):
            for layer in qp["layers"]:
                qkv, h = q8_dual_in_dot(layer, "qkv_mi", x, x, nqkv)
                a = qkv[..., : cfg.hidden_size]
                x = x + q8_splitk_dot(layer, "ao_mo", a.astype(x.dtype), h.astype(x.dtype))
            logits = q8_dot(qp, "embed_out", x, out_dtype=jnp.float32)
            return x + logits[..., : cfg.hidden_size].astype(x.dtype) * 0
        return jax.lax.fori_loop(0, iters, body, x0)

    x0 = jnp.asarray(rng.randn(b, 1, cfg.hidden_size), jnp.bfloat16)
    streams_s = timed(streams_loop, qparams, x0, label=f"streams-only x{iters}")
    streams_ms = streams_s * 1e3 / iters

    # ---- launch: same call count, near-zero work -------------------------
    from jax.experimental import pallas as pl

    def touch_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    tiny = jnp.zeros((8, 128), jnp.float32)
    n_calls = 2 * cfg.num_layers + 1

    @jax.jit
    def launch_loop(t0_):
        def body(_, t):
            for _ in range(n_calls):
                t = pl.pallas_call(
                    touch_kernel, out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype)
                )(t)
            return t
        return jax.lax.fori_loop(0, iters, body, t0_)

    launch_s = timed(launch_loop, tiny, label=f"{n_calls} launches x{iters}")
    launch_ms = launch_s * 1e3 / iters

    # ---- floor: reuse bench.py's probe number (recompute here) ----------
    bufs = []
    for layer in layers:
        bufs.append(layer["qkv_mi@q8"])
        bufs.append(layer["ao_mo@q8"])
    bufs.append(qparams["embed_out@q8"])
    total_bytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in bufs)

    # The real whole-buffer DMA floor probe lives in bench.py; reuse its
    # published number if available.
    floor_ms = None
    try:
        with open("bench_artifacts/decode_floor.json") as f:
            floor_ms = json.load(f)["floor_ms"]
    except Exception:
        pass

    out = {
        "full_step_ms": round(full_ms, 3),
        "streams_only_ms": round(streams_ms, 3),
        "launch_floor_ms": round(launch_ms, 3),
        "stream_bytes_gb": round(total_bytes / 1e9, 3),
        "floor_ms_from_bench": floor_ms,
        "gap_full_minus_streams_ms": round(full_ms - streams_ms, 3),
        "iters": iters,
        "method": "amortized fori_loop, one jit per variant",
    }
    log(json.dumps(out))
    os.makedirs("bench_artifacts", exist_ok=True)
    with open("bench_artifacts/decode_gap_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
