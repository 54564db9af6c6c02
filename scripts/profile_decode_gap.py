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
    tiny = "--tiny" in sys.argv  # CPU logic check: small config, no artifact
    argv = [a for a in sys.argv[1:] if a != "--tiny"]
    iters = int(argv[0]) if argv else 20

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
    if tiny:
        cfg = GPTNeoXConfig(
            vocab_size=512, hidden_size=128, num_layers=2, num_heads=2,
            intermediate_size=256, max_position_embeddings=128,
        )
    else:
        cfg = GPTNeoXConfig()  # pythia-1b shape
    b, s_prompt, s_new = 8, 32, 64
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(3), dtype=jnp.bfloat16)
    qparams = jax.jit(lambda p: quantize_decode_params(p, cfg))(params)
    jax.tree.leaves(qparams)[0].block_until_ready()

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (b, s_prompt)), jnp.int32)
    lens = jnp.full((b,), s_prompt, jnp.int32)

    def timed(fn, *args, label="", reps=3):
        """(T(reps calls) - T(1 call)) / (reps - 1): the relay's ~25 ms
        dispatch+sync round trip is a constant in both, so it cancels —
        a single timed call divided by a small step count would otherwise
        inflate per-step numbers by rtt/steps (the round-5 first capture
        showed streams > full purely from this)."""
        jax.block_until_ready(fn(*args))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        tr = time.perf_counter() - t0
        dt = max((tr - t1) / (reps - 1), 1e-9)
        log(f"{label}: {dt * 1e3:.2f} ms/call differenced (1-call wall {t1 * 1e3:.2f} ms)")
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

    tbuf = jnp.zeros((8, 128), jnp.float32)
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

    launch_s = timed(launch_loop, tbuf, label=f"{n_calls} launches x{iters}")
    launch_ms = launch_s * 1e3 / iters

    # ---- non-stream pieces, standalone (attributes full - streams) -------
    # Built from the SAME helpers decode uses so shapes/dtypes match the
    # production step exactly (generate._block_with_cache).
    from retrieval_scaling_tpu.models.generate import (
        _attention_with_cache,
        _write_kv,
    )
    from retrieval_scaling_tpu.models.gpt_neox import _layer_norm

    cache = init_cache(cfg, b, s_prompt + s_new)
    h, hd = cfg.num_heads, cfg.head_dim
    pos = jnp.full((b, 1), s_prompt, jnp.int32)
    kv_mask = jnp.arange(s_prompt + s_new)[None, :] <= s_prompt
    kv_mask = jnp.broadcast_to(kv_mask, (b, s_prompt + s_new))
    qkv0 = jnp.asarray(rng.randn(b, h, 1, 3 * hd), jnp.bfloat16)

    # attention chain + dus cache write, x16 layers (data-dep chained)
    @jax.jit
    def attn_loop(qkv_, ck, cv):
        def body(_, carry):
            qkv, ck, cv = carry
            for _li in range(cfg.num_layers):
                q, k, v = qkv[..., :hd], qkv[..., hd : 2 * hd], qkv[..., 2 * hd :]
                ck, cv, _sc = _write_kv(ck, cv, k, v, pos, None)
                a = _attention_with_cache(q, ck, cv, pos, kv_mask, all_visible=True)
                qkv = qkv + jnp.concatenate([a, a, a], axis=-1) * 0.01
            return qkv, ck, cv
        return jax.lax.fori_loop(0, iters, body, (qkv_, ck, cv))

    attn_s = timed(attn_loop, qkv0, cache.k[0], cache.v[0],
                   label=f"attn+write x{cfg.num_layers} x{iters}")
    attn_ms = attn_s * 1e3 / iters

    # elementwise: 2 LNs + rope + bias/reshape/residual, x16 layers
    l0 = qparams["layers"][0]
    rot = cfg.rotary_dims
    cos_all = jnp.asarray(rng.randn(cfg.max_position_embeddings, rot), jnp.float32)
    sin_all = jnp.asarray(rng.randn(cfg.max_position_embeddings, rot), jnp.float32)

    @jax.jit
    def elem_loop(x_):
        def body(_, x):
            for _li in range(cfg.num_layers):
                ln1 = _layer_norm(x, l0["ln1_scale"], l0["ln1_bias"], cfg.layer_norm_eps)
                ln2 = _layer_norm(x, l0["ln2_scale"], l0["ln2_bias"], cfg.layer_norm_eps)
                qkv = (ln1 + ln2).reshape(b, 1, 1, cfg.hidden_size)
                qkv = jnp.broadcast_to(qkv, (b, 1, 3, cfg.hidden_size))
                qkv = qkv.reshape(b, 1, 3, h, hd) + l0["qkv_b"][None, None]
                q = jnp.moveaxis(qkv[:, :, 0], 2, 1)
                tr = q[..., :rot].astype(jnp.float32)
                half = rot // 2
                t1, t2 = tr[..., :half], tr[..., half:]
                rotated = jnp.concatenate([-t2, t1], axis=-1)
                cos = cos_all[pos][:, None]
                sin = sin_all[pos][:, None]
                out = tr * cos + rotated * sin
                q = jnp.concatenate([out.astype(q.dtype), q[..., rot:]], axis=-1)
                x = x + jnp.moveaxis(q, 1, 2).reshape(b, 1, cfg.hidden_size) * 0.01
            return x
        return jax.lax.fori_loop(0, iters, body, x_)

    elem_s = timed(elem_loop, x0, label=f"LN/rope/bias x{cfg.num_layers} x{iters}")
    elem_ms = elem_s * 1e3 / iters

    # argmax + state update (once per step, over the f32 vocab logits)
    logits0 = jnp.asarray(rng.randn(b, 1, cfg.vocab_size), jnp.float32)

    @jax.jit
    def argmax_loop(lg):
        def body(_, carry):
            lg, acc = carry
            nxt = jnp.argmax(lg[:, -1], axis=-1)
            return lg + 1e-6, acc + nxt
        _, acc = jax.lax.fori_loop(0, iters, body, (lg, jnp.zeros((b,), jnp.int32)))
        return acc

    argmax_s = timed(argmax_loop, logits0, label=f"argmax x{iters}")
    argmax_ms = argmax_s * 1e3 / iters

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
        "attn_plus_write_ms": round(attn_ms, 3),
        "elementwise_ln_rope_ms": round(elem_ms, 3),
        "argmax_ms": round(argmax_ms, 3),
        "pieces_sum_ms": round(streams_ms + attn_ms + elem_ms + argmax_ms, 3),
        "iters": iters,
        "method": "amortized fori_loop, one jit per variant, relay RTT differenced out",
    }
    log(json.dumps(out))
    if not tiny:
        os.makedirs("bench_artifacts", exist_ok=True)
        with open("bench_artifacts/decode_gap_r05.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
