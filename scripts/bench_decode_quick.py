"""Standalone reader-decode throughput bench (bench.py's decode section
extracted so kernel iterations don't pay the full bench).

Pythia-1B config, b8 prompts of 32, 64 new tokens — identical workload,
engine, and timing methodology to bench.py's `decode_tok_s` (compile+run
once, then time one full generate call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode_quick.py [bf16,int8,bf16s,int4]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else ["bf16", "int8"]
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import (
        make_generate_fn,
        quantize_decode_params,
    )
    from retrieval_scaling_tpu.models.gpt_neox import (
        GPTNeoXConfig,
        init_gpt_neox_params,
    )

    log(f"backend={jax.default_backend()}")
    _ = np.asarray(jnp.ones(4))

    rcfg = GPTNeoXConfig()  # pythia-1b shape: 16 layers x 2048 hidden
    rparams = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            init_gpt_neox_params(rcfg, k),
        )
    )(jax.random.PRNGKey(0))
    jax.tree.leaves(rparams)[0].block_until_ready()

    rng = np.random.RandomState(0)
    gb, gs, gnew = 8, 32, 64
    g_ids = jnp.asarray(rng.randint(0, rcfg.vocab_size, (gb, gs)), jnp.int32)
    g_lens = jnp.full((gb,), gs, jnp.int32)
    gen_fn = make_generate_fn(rcfg, gnew, eos_id=-1)

    def decode_tok_s(p, label):
        t0 = time.perf_counter()
        np.asarray(gen_fn(p, g_ids, g_lens, 0))  # compile + first run
        log(f"decode {label} compile+run: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        np.asarray(gen_fn(p, g_ids, g_lens, 0))
        dt = time.perf_counter() - t0
        tok_s = gb * gnew / dt
        log(f"decode {label}: {tok_s:.0f} tok/s ({dt * 1e3 / gnew:.2f} ms/step, b{gb})")
        return tok_s

    res = {}
    if "bf16" in which:
        res["bf16"] = decode_tok_s(rparams, "bf16")
    for scheme, key in (("int8", "int8"), ("bf16", "bf16s"), ("int4", "int4")):
        if key not in which:
            continue
        pq = jax.jit(
            lambda p, s=scheme: quantize_decode_params(p, rcfg, scheme=s)
        )(rparams)
        jax.tree.leaves(pq)[0].block_until_ready()
        res[key] = decode_tok_s(pq, key)
        del pq
    log(f"summary: {res}")


if __name__ == "__main__":
    main()
