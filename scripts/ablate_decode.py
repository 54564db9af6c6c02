"""On-chip ablation: where the decode step's time goes, and which kernel
shape closes it to the weight-streaming roofline (VERDICT r3 item 2).

Decode at Pythia-1B b8 is weight-bytes/HBM-bandwidth bound: ~0.91 GB of
int8 projection+head weights per step -> ~1.17 ms floor at ~780 GB/s, yet
the full step measured 2.80 ms (int8) / 3.92 ms (bf16) in round 3. Suspects:

  * the streaming kernel re-runs the activation row-quantization on the
    VPU once per GRID STEP (the x block is resident, the quantize is not
    hoisted) — ~1,500 redundant quantize passes per decode step;
  * 65 pallas_call launches per step (4 per layer + head);
  * the vocab head's 128-wide column blocks (50304 % 256 != 0) make 393
    tiny grid steps.

Variants timed here (matmul chain only, Pythia-1B shapes, all weights as
jit args, N steps chained through x inside one jitted fori_loop):

  mm_cur     today's kernel: in-kernel rowquant per grid step
  mm_preq    x quantized ONCE per matmul in XLA; kernel = int8 dot + scales
  mm_fused   preq + qkv||mlp_in concatenated [D, 14336] single stream +
             attn_out/mlp_out dual-stream kernel with fused residual add
  mm_bf16    XLA bf16 dots (the current bf16 decode matmul path)
  mm_bf16k   bf16 dual/concat streaming kernels (launch + fusion parity
             with mm_fused, no quantization)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_decode.py [iters] [variants]
(variants: comma-separated subset of mm_bf16,mm_cur,mm_preq,mm_preq384,
mm_fused,mm_bf16k — each compiles ~1-2 min through the relay, so bounded
runs should pick a subset)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


D, FF, NQKV, V, L = 2048, 8192, 6144, 50304, 16
M = 8        # decode batch
MPAD = 32    # sublane-aligned resident rows


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    log(f"backend={jax.default_backend()}")
    t0 = time.perf_counter()
    _ = np.asarray(jnp.ones(4))
    log(f"warmup: {time.perf_counter() - t0:.1f}s")

    # relay round-trip probe: a dispatch+fetch of trivial work. Every
    # timed loop pays this ONCE; at `iters` iterations the per-step
    # inflation is rtt/iters, so report it for honesty.
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.ones(4)))
    t0 = time.perf_counter()
    np.asarray(tiny(jnp.ones(4)))
    rtt = time.perf_counter() - t0
    log(f"relay rtt: {rtt * 1e3:.1f} ms (per-step inflation = rtt/iters)")

    rng = np.random.RandomState(0)

    def qweight(k, n):
        w = rng.randn(k, n).astype(np.float32) * 0.02
        s = np.abs(w).max(axis=0, keepdims=True) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return jnp.asarray(wq), jnp.asarray(s.astype(np.float32))

    # per-layer weights
    layers = []
    for _ in range(L):
        layers.append(
            dict(
                qkv=qweight(D, NQKV),
                ao=qweight(D, D),
                mi=qweight(D, FF),
                mo=qweight(FF, D),
            )
        )
    head = qweight(D, V)
    # fused variants: qkv||mlp_in along N
    layers_f = []
    for ly in layers:
        cat_q = jnp.concatenate([ly["qkv"][0], ly["mi"][0]], axis=1)
        cat_s = jnp.concatenate([ly["qkv"][1], ly["mi"][1]], axis=1)
        layers_f.append(dict(cat=(cat_q, cat_s), ao=ly["ao"], mo=ly["mo"]))

    int8_bytes = (D * NQKV + D * D + D * FF + FF * D) * L + D * V
    log(f"int8 weight bytes/step: {int8_bytes / 1e9:.3f} GB "
        f"(floor at 780 GB/s = {int8_bytes / 780e9 * 1e3:.2f} ms)")

    NEG = 1e-30

    def rowquant_xla(x):
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, NEG)
        xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return xq, s

    # ---- kernels ----------------------------------------------------------
    def kern_cur(x_ref, wq_ref, s_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, NEG)
        xq = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = (acc.astype(jnp.float32) * sc * s_ref[:]).astype(o_ref.dtype)

    def kern_preq(xq_ref, xs_ref, wq_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * s_ref[:]).astype(o_ref.dtype)

    def kern_dual(aq_ref, as_ref, hq_ref, hs_ref, res_ref, wo_ref, so_ref,
                  w2_ref, s2_ref, o_ref):
        a1 = jax.lax.dot_general(
            aq_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        a2 = jax.lax.dot_general(
            hq_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = (
            res_ref[:].astype(jnp.float32)
            + a1.astype(jnp.float32) * as_ref[:] * so_ref[:]
            + a2.astype(jnp.float32) * hs_ref[:] * s2_ref[:]
        ).astype(o_ref.dtype)

    def stream_cur(x, wq, s, bn):
        k, n = wq.shape
        return pl.pallas_call(
            kern_cur,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((MPAD, k), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, n), jnp.bfloat16),
        )(x, wq, s)

    def stream_preq(xq, xs, wq, s, bn):
        k, n = wq.shape
        return pl.pallas_call(
            kern_preq,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((MPAD, k), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, 1), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, n), jnp.bfloat16),
        )(xq, xs, wq, s)

    def stream_dual(aq, asc, hq, hsc, res, wo, so, w2, s2, bn):
        ka, n = wo.shape
        kh = w2.shape[0]
        return pl.pallas_call(
            kern_dual,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((MPAD, ka), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, 1), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, kh), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, 1), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
                pl.BlockSpec((ka, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
                pl.BlockSpec((kh, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, n), jnp.bfloat16),
        )(aq, asc, hq, hsc, res, wo, so, w2, s2)

    # bf16 streaming kernels (same shapes, no quant)
    def kern_preq_bf16(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def kern_dual_bf16(a_ref, h_ref, res_ref, wo_ref, w2_ref, o_ref):
        a1 = jax.lax.dot_general(
            a_ref[:], wo_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a2 = jax.lax.dot_general(
            h_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (res_ref[:].astype(jnp.float32) + a1 + a2).astype(o_ref.dtype)

    def stream_bf16(x, w, bn):
        k, n = w.shape
        return pl.pallas_call(
            kern_preq_bf16,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((MPAD, k), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, n), jnp.bfloat16),
        )(x, w)

    def stream_dual_bf16(a, h, res, wo, w2, bn):
        ka, n = wo.shape
        kh = w2.shape[0]
        return pl.pallas_call(
            kern_dual_bf16,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((MPAD, ka), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, kh), lambda j: (0, 0)),
                pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
                pl.BlockSpec((ka, bn), lambda j: (0, j)),
                pl.BlockSpec((kh, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((MPAD, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((MPAD, n), jnp.bfloat16),
        )(a, h, res, wo, w2)

    # ---- per-step bodies ---------------------------------------------------
    # stand-in data flow between matmuls: qkv[:, :D] plays the attention
    # output, gelu(mlp_in) feeds mlp_out, head folds into a scalar
    def step_cur(x, lys, hd, bn_head):
        for ly in lys:
            qkv = stream_cur(x, *ly["qkv"], 256)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_cur(x, *ly["mi"], 256))
            ao = stream_cur(a, *ly["ao"], 256)
            mo = stream_cur(hh, *ly["mo"], 256)
            x = x + ao + mo
        lg = stream_cur(x, *hd, bn_head)
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    def step_preq(x, lys, hd, bn_head):
        for ly in lys:
            xq, xs = rowquant_xla(x)
            qkv = stream_preq(xq, xs, *ly["qkv"], 256)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_preq(xq, xs, *ly["mi"], 256))
            aq, asc = rowquant_xla(a)
            hq, hsc = rowquant_xla(hh)
            ao = stream_preq(aq, asc, *ly["ao"], 256)
            mo = stream_preq(hq, hsc, *ly["mo"], 256)
            x = x + ao + mo
        xq, xs = rowquant_xla(x)
        lg = stream_preq(xq, xs, *hd, bn_head)
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    def step_fused(x, lysf, hd, bn_head):
        for ly in lysf:
            xq, xs = rowquant_xla(x)
            cat = stream_preq(xq, xs, *ly["cat"], 256)
            a = cat[:, :D]
            hh = jax.nn.gelu(cat[:, NQKV:])
            aq, asc = rowquant_xla(a)
            hq, hsc = rowquant_xla(hh)
            x = stream_dual(aq, asc, hq, hsc, x, *ly["ao"], *ly["mo"], 256)
        xq, xs = rowquant_xla(x)
        lg = stream_preq(xq, xs, *hd, bn_head)
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    def step_bf16(x, lysb, hdb):
        for ly in lysb:
            qkv = jnp.dot(x, ly["qkv"], preferred_element_type=jnp.float32).astype(x.dtype)
            a = qkv[:, :D]
            hh = jax.nn.gelu(jnp.dot(x, ly["mi"], preferred_element_type=jnp.float32)).astype(x.dtype)
            ao = jnp.dot(a, ly["ao"], preferred_element_type=jnp.float32)
            mo = jnp.dot(hh, ly["mo"], preferred_element_type=jnp.float32)
            x = (x.astype(jnp.float32) + ao + mo).astype(x.dtype)
        lg = jnp.dot(x, hdb, preferred_element_type=jnp.float32)
        return x + jnp.mean(lg, axis=-1, keepdims=True).astype(x.dtype) * 0.0

    def step_bf16k(x, lysbf, hdb, bn_head):
        for ly in lysbf:
            cat = stream_bf16(x, ly["cat"], 256)
            a = cat[:, :D]
            hh = jax.nn.gelu(cat[:, NQKV:]).astype(x.dtype)
            x = stream_dual_bf16(a, hh, x, ly["ao"], ly["mo"], 256)
        lg = stream_bf16(x, hdb, bn_head)
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    # ---- big-block variants: per-grid-step overhead is the suspect (the
    # 256-col config runs 1,545 grid steps/decode step at <=512 KB each);
    # 2-4 MB blocks cut that to ~450, and the head pads 50304 -> 51200 so
    # 2048-wide blocks divide it (25 steps of 4 MB vs 393 of 256 KB).
    VPAD = 51_200
    head_pad = (
        jnp.pad(head[0], ((0, 0), (0, VPAD - V))),
        jnp.pad(head[1], ((0, 0), (0, VPAD - V)), constant_values=1.0),
    )

    def step_preq_big(x, lys, hd):
        for ly in lys:
            xq, xs = rowquant_xla(x)
            qkv = stream_preq(xq, xs, *ly["qkv"], 1024)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_preq(xq, xs, *ly["mi"], 1024))
            aq, asc = rowquant_xla(a)
            hq, hsc = rowquant_xla(hh)
            ao = stream_preq(aq, asc, *ly["ao"], 1024)
            mo = stream_preq(hq, hsc, *ly["mo"], 512)
            x = x + ao + mo
        xq, xs = rowquant_xla(x)
        lg = stream_preq(xq, xs, *hd, 2048)[:, :V]
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    def step_bf16_big(x, lysb, hdb):
        for ly in lysb:
            qkv = stream_bf16(x, ly["qkv"], 1024)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_bf16(x, ly["mi"], 1024)).astype(x.dtype)
            ao = stream_bf16(a, ly["ao"], 1024)
            mo = stream_bf16(hh, ly["mo"], 256)
            x = x + ao + mo
        lg = stream_bf16(x, hdb, 1024)[:, :V]
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    # bf16 weight sets
    layers_b = [
        dict(
            qkv=(ly["qkv"][0].astype(jnp.bfloat16) * ly["qkv"][1].astype(jnp.bfloat16)),
            ao=(ly["ao"][0].astype(jnp.bfloat16) * ly["ao"][1].astype(jnp.bfloat16)),
            mi=(ly["mi"][0].astype(jnp.bfloat16) * ly["mi"][1].astype(jnp.bfloat16)),
            mo=(ly["mo"][0].astype(jnp.bfloat16) * ly["mo"][1].astype(jnp.bfloat16)),
        )
        for ly in layers
    ]
    layers_bf = [
        dict(
            cat=jnp.concatenate([ly["qkv"], ly["mi"]], axis=1),
            ao=ly["ao"],
            mo=ly["mo"],
        )
        for ly in layers_b
    ]
    head_b = head[0].astype(jnp.bfloat16) * head[1].astype(jnp.bfloat16)

    x0 = jnp.asarray(rng.randn(MPAD, D).astype(np.float32), jnp.bfloat16)

    def timed(name, step_fn, *args):
        # weights as jit args; static ints (bn_head) must be baked into
        # step_fn closures, never passed through here
        @jax.jit
        def loop(x, *a):
            def body(_, xx):
                return step_fn(xx, *a)
            return jax.lax.fori_loop(0, iters, body, x)

        t0 = time.perf_counter()
        r = np.asarray(loop(x0, *args))
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        r = np.asarray(loop(x0, *args))
        dt = (time.perf_counter() - t0) / iters
        log(f"{name}: {dt * 1e3:.3f} ms/step   (sum={float(r.sum()):.3f})")
        return dt

    menu = {
        "mm_bf16": ("mm_bf16 (XLA dots)", step_bf16, (layers_b, head_b)),
        "mm_cur": ("mm_cur  (in-kernel quant, bn_head=128)",
                   lambda x, lys, hd: step_cur(x, lys, hd, 128), (layers, head)),
        "mm_preq": ("mm_preq (hoisted quant, bn_head=128)",
                    lambda x, lys, hd: step_preq(x, lys, hd, 128), (layers, head)),
        "mm_preq384": ("mm_preq (hoisted quant, bn_head=384)",
                       lambda x, lys, hd: step_preq(x, lys, hd, 384), (layers, head)),
        "mm_fused": ("mm_fused (concat+dual, bn_head=384)",
                     lambda x, lys, hd: step_fused(x, lys, hd, 384), (layers_f, head)),
        "mm_bf16k": ("mm_bf16k (concat+dual bf16 kernels)",
                     lambda x, lys, hd: step_bf16k(x, lys, hd, 384), (layers_bf, head_b)),
        "mm_preq_big": ("mm_preq_big (hoisted quant, 2-4MB blocks, padded head)",
                        step_preq_big, (layers, head_pad)),
        "mm_bf16_big": ("mm_bf16_big (bf16 stream, 2-4MB blocks, padded head)",
                        step_bf16_big,
                        (layers_b, jnp.pad(head_b, ((0, 0), (0, VPAD - V))))),
    }
    res = {}
    for key, (name, fn, args) in menu.items():
        if only is not None and key not in only:
            continue
        res[key] = timed(name, fn, *args)

    bf16_bytes = 2 * int8_bytes
    log("---- summary ----")
    for k, v in res.items():
        byt = bf16_bytes if "bf16" in k else int8_bytes
        log(f"{k:12s} {v * 1e3:7.3f} ms/step  -> {byt / v / 1e9:6.1f} GB/s effective")


if __name__ == "__main__":
    main()
