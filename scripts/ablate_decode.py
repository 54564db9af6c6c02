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
        mp = xq.shape[0]
        return pl.pallas_call(
            kern_preq,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((mp, k), lambda j: (0, 0)),
                pl.BlockSpec((mp, 1), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((mp, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
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

    # int8-streamed weight, bf16 MXU dot: every int8 value is exact in
    # bf16 and products/accumulation are exact in f32, so this equals the
    # dequantized-weight matmul bit-for-bit — while streaming HALF the
    # bytes of bf16 AND skipping activation quantization entirely. Tests
    # whether the int8x int8->int32 dot (not DMA) caps the int8 variants
    # at ~300 GB/s effective.
    def kern_w8bf16(x_ref, wq_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[:], wq_ref[:].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)

    def stream_w8bf16(x, wq, s, bn):
        k, n = wq.shape
        mp = x.shape[0]
        return pl.pallas_call(
            kern_w8bf16,
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((mp, k), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((mp, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        )(x, wq, s)

    # pure-DMA probes: the kernel copies ONE sublane row of the streamed
    # block (the BlockSpec still DMAs the full [K, bn] block into VMEM),
    # so the loop time is the stream floor with near-zero compute.
    def kern_touch(w_ref, o_ref):
        o_ref[:] = w_ref[:8, :].astype(jnp.float32)

    def stream_touch(w, bn):
        k, n = w.shape
        return pl.pallas_call(
            kern_touch,
            grid=(n // bn,),
            in_specs=[pl.BlockSpec((k, bn), lambda j: (0, j))],
            out_specs=pl.BlockSpec((8, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        )(w)

    def step_dma(x, ws):
        # ws: flat list of weight arrays prebuilt OUTSIDE the loop (an
        # in-loop astype would add a convert+write pass and ruin the probe)
        acc = x
        for w in ws:
            bn = _divcap(w.shape[1], (4 << 20) // (w.shape[0] * w.dtype.itemsize))
            acc = acc + (stream_touch(w, bn)[:1, :1] * 0.0).astype(acc.dtype)
        return acc

    def _divcap(n, cap):
        best = 128
        for bn in range(128, min(n, max(cap, 128)) + 1, 128):
            if n % bn == 0:
                best = bn
        return best

    # reduced resident-row variants: if the chain is MXU-issue-bound at
    # m_pad=32 (25% row occupancy), fewer resident rows cut dot work
    def step_preq_m(x, lys, hd, rows):
        y = step_preq_big(x[:rows], lys, hd)
        return jnp.concatenate([y, x[rows:]], axis=0)

    def step_w8_m(x, lys, hd, rows):
        y = step_w8bf16_huge(x[:rows], lys, hd)
        return jnp.concatenate([y, x[rows:]], axis=0)

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

    def step_w8bf16(x, lys, hd):
        for ly in lys:
            qkv = stream_w8bf16(x, *ly["qkv"], 1024)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_w8bf16(x, *ly["mi"], 1024)).astype(x.dtype)
            ao = stream_w8bf16(a, *ly["ao"], 1024)
            mo = stream_w8bf16(hh, *ly["mo"], 512)
            x = x + ao + mo
        lg = stream_w8bf16(x, *hd, 2048)[:, :V]
        return x + jnp.mean(lg, axis=-1, keepdims=True) * 0.0

    def step_w8bf16_huge(x, lys, hd):
        # 4 MB int8 blocks (byte-matched to mm_bf16_big's 1024-wide bf16
        # blocks) in case the DMA engine is issue-bound, not byte-bound
        for ly in lys:
            qkv = stream_w8bf16(x, *ly["qkv"], 2048)
            a = qkv[:, :D]
            hh = jax.nn.gelu(stream_w8bf16(x, *ly["mi"], 2048)).astype(x.dtype)
            ao = stream_w8bf16(a, *ly["ao"], 2048)
            mo = stream_w8bf16(hh, *ly["mo"], 512)
            x = x + ao + mo
        lg = stream_w8bf16(x, *hd, 2048)[:, :V]
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
    ws_i8 = []
    for ly in layers:
        ws_i8 += [ly["qkv"][0], ly["ao"][0], ly["mi"][0], ly["mo"][0]]
    ws_i8.append(head_pad[0])
    ws_b16 = [w.astype(jnp.bfloat16) for w in ws_i8]

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
        "mm_w8bf16": ("mm_w8bf16 (int8 stream, bf16 MXU dot, 2-4MB blocks)",
                      step_w8bf16, (layers, head_pad)),
        "mm_dma_i8": ("mm_dma_i8 (pure int8 weight-stream floor)",
                      lambda x, ws: step_dma(x, ws), (ws_i8,)),
        "mm_dma_bf16": ("mm_dma_bf16 (pure bf16 weight-stream floor)",
                        lambda x, ws: step_dma(x, ws), (ws_b16,)),
        "mm_preq_m16": ("mm_preq_big at 16 resident rows",
                        lambda x, lys, hd: step_preq_m(x, lys, hd, 16),
                        (layers, head_pad)),
        "mm_w8_m16": ("mm_w8bf16_huge at 16 resident rows",
                      lambda x, lys, hd: step_w8_m(x, lys, hd, 16),
                      (layers, head_pad)),
        "mm_w8_m8": ("mm_w8bf16_huge at 8 resident rows",
                     lambda x, lys, hd: step_w8_m(x, lys, hd, 8),
                     (layers, head_pad)),
        "mm_w8bf16_huge": ("mm_w8bf16 (int8 stream, bf16 dot, 4MB blocks)",
                           step_w8bf16_huge, (layers, head_pad)),
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
