"""Mamba (S6 selective state space) causal LM — TPU-native.

The reference harness ships a ``mamba_ssm`` model backend
(reference: rag-evaluation-harness/lm_eval/models/mamba_lm.py) that binds
to the CUDA-only ``mamba_ssm`` package; round-4 MIGRATION.md therefore
excluded it. This module REPLACES that exclusion with a TPU-first
implementation: the selective scan is a first-order linear recurrence
  h_t = exp(dt_t * A) * h_{t-1} + (dt_t * B_t) * u_t
which we evaluate with ``jax.lax.associative_scan`` inside fixed-size
sequence chunks and a ``lax.scan`` carrying the SSM state across chunks —
O(log C) depth per chunk on the VPU, bounded memory
(B * chunk * d_inner * d_state f32), static shapes throughout, no CUDA
kernels needed. Decode keeps a recurrent state (conv tail + SSM state)
instead of a KV cache, so per-token cost is O(1) in context length.

Numerics match the HF ``MambaForCausalLM`` sequential fallback
(transformers ``modeling_mamba.py::slow_forward``): SSM math in float32,
ZOH discretization for A, Euler for B, softplus(dt_proj(x_proj_dt) + bias),
SiLU conv/gate activations, and the D skip term.

Loss contract matches ``gpt_neox_lm``: labels equal to -100 are excluded
(reference: src/evaluate_perplexity.py:119-124).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    vocab_size: int = 50280
    hidden_size: int = 768
    state_size: int = 16
    num_layers: int = 24
    conv_kernel: int = 4
    expand: int = 2
    time_step_rank: int | None = None     # None -> ceil(hidden/16) (HF default)
    use_conv_bias: bool = True
    use_bias: bool = False                 # in/out projection bias
    rms_eps: float = 1e-5
    tie_embeddings: bool = True
    scan_chunk: int = 128                  # sequence chunk for the assoc. scan
    # SSMs have no positional table; this only caps harness batch widths.
    # 2048 mirrors the reference backend's default max_length
    # (rag-evaluation-harness/lm_eval/models/mamba_lm.py).
    max_position_embeddings: int = 2048

    @property
    def d_inner(self) -> int:
        return self.expand * self.hidden_size

    @property
    def dt_rank(self) -> int:
        if self.time_step_rank is not None:
            return self.time_step_rank
        return math.ceil(self.hidden_size / 16)


def _rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def _causal_conv(u: jax.Array, conv_w: jax.Array, conv_b: jax.Array | None) -> jax.Array:
    """Depthwise causal conv along time. u: [B, L, C]; conv_w: [K, C].

    K is tiny (4), so the conv is K shifted adds — pure VPU work that XLA
    fuses with the surrounding elementwise ops; no im2col materialization.
    """
    k = conv_w.shape[0]
    pad = jnp.pad(u, ((0, 0), (k - 1, 0), (0, 0)))
    L = u.shape[1]
    out = jnp.zeros_like(u)
    for i in range(k):
        out = out + pad[:, i : i + L, :] * conv_w[i]
    if conv_b is not None:
        out = out + conv_b
    return out


def _scan_combine(c1, c2):
    a1, b1 = c1
    a2, b2 = c2
    return a1 * a2, a2 * b1 + b2


def _selective_scan_chunked(
    dA: jax.Array,     # [B, L, Din, N] f32
    dBu: jax.Array,    # [B, L, Din, N] f32
    C: jax.Array,      # [B, L, N] f32
    h0: jax.Array,     # [B, Din, N] f32
    chunk: int,
) -> Tuple[jax.Array, jax.Array]:
    """h_t = dA_t * h_{t-1} + dBu_t; y_t = <h_t, C_t>.

    Associative scan within chunks + a sequential lax.scan carrying the
    state across chunks. Returns (y [B, L, Din] f32, h_final).
    """
    b, L, din, n = dA.shape
    chunk = min(chunk, L)
    pad = (-L) % chunk
    if pad:
        # identity steps: dA=1, dBu=0 leave the state untouched
        dA = jnp.pad(dA, ((0, 0), (0, pad), (0, 0), (0, 0)), constant_values=1.0)
        dBu = jnp.pad(dBu, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
    nchunks = (L + pad) // chunk

    def to_chunks(x):
        return x.reshape(b, nchunks, chunk, *x.shape[2:]).swapaxes(0, 1)

    dA_c, dBu_c, C_c = to_chunks(dA), to_chunks(dBu), to_chunks(C)

    def step(h, inp):
        da, dbu, c = inp  # [B, chunk, Din, N] x2, [B, chunk, N]
        acc_a, acc_b = jax.lax.associative_scan(_scan_combine, (da, dbu), axis=1)
        h_all = acc_b + acc_a * h[:, None]          # [B, chunk, Din, N]
        y = jnp.einsum("blds,bls->bld", h_all, c)
        return h_all[:, -1], y

    h_final, y_chunks = jax.lax.scan(step, h0, (dA_c, dBu_c, C_c))
    y = y_chunks.swapaxes(0, 1).reshape(b, L + pad, din)
    return y[:, :L], h_final


def _mixer(layer: Params, cfg: MambaConfig, x: jax.Array, lens: jax.Array | None = None):
    """One Mamba mixer over a full sequence. x: [B, L, D] -> [B, L, D].

    With ``lens`` [B] (right-padded prompts): dt is zeroed at positions
    >= len, turning them into identity steps (dA=1, dBu=0) so the scan's
    final state equals the state AT each row's own length — parallel
    prefill for decode. Returns (out, state|None): state carries the SSM
    state plus the conv tail (raw inputs at len-K+1..len-1) gathered
    per row, matching ``_mixer_step``'s recurrent layout exactly.
    """
    proj = jnp.dot(x, layer["in_proj_w"])
    if "in_proj_b" in layer:
        proj = proj + layer["in_proj_b"]
    u_raw, z = jnp.split(proj, 2, axis=-1)                   # [B, L, Din]
    u = jax.nn.silu(_causal_conv(u_raw, layer["conv_w"], layer.get("conv_b")))

    ssm_in = jnp.dot(u, layer["x_proj_w"])                   # [B, L, R+2N]
    r, n = cfg.dt_rank, cfg.state_size
    dt_raw = ssm_in[..., :r]
    Bm = ssm_in[..., r : r + n].astype(jnp.float32)          # [B, L, N]
    Cm = ssm_in[..., r + n :].astype(jnp.float32)
    dt = jax.nn.softplus(
        jnp.dot(dt_raw, layer["dt_proj_w"]) + layer["dt_proj_b"]
    ).astype(jnp.float32)                                     # [B, L, Din]
    L = x.shape[1]
    if lens is not None:
        valid = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.float32)
        dt = dt * valid[..., None]

    A = -jnp.exp(layer["A_log"].astype(jnp.float32))          # [Din, N]
    uf = u.astype(jnp.float32)
    dA = jnp.exp(dt[..., None] * A[None, None])               # [B, L, Din, N]
    dBu = (dt * uf)[..., None] * Bm[:, :, None, :]

    bsz, din = x.shape[0], cfg.d_inner
    h0 = jnp.zeros((bsz, din, n), jnp.float32)
    y, h_final = _selective_scan_chunked(dA, dBu, Cm, h0, cfg.scan_chunk)
    y = y + uf * layer["D"].astype(jnp.float32)
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)
    out = jnp.dot(y, layer["out_proj_w"])
    if "out_proj_b" in layer:
        out = out + layer["out_proj_b"]

    state = None
    if lens is not None:
        k = cfg.conv_kernel
        # conv tail = last K-1 RAW inputs before each row's length; in
        # left-zero-padded coordinates those are indices len..len+K-2
        padded = jnp.pad(u_raw, ((0, 0), (k - 1, 0), (0, 0)))
        idx = lens[:, None] + jnp.arange(k - 1)[None, :]      # [B, K-1]
        tail = jnp.take_along_axis(padded, idx[..., None], axis=1)
        state = {"conv": tail, "ssm": h_final}
    return out, state


def mamba_forward(
    params: Params,
    cfg: MambaConfig,
    input_ids: jax.Array,   # [B, L]
    return_hidden: bool = False,
) -> jax.Array:
    """Logits [B, L, V] (or final-norm hidden states)."""
    # jnp.asarray: converted params may be host numpy; numpy fancy-indexing
    # rejects tracers under jit/scan
    x = jnp.asarray(params["embed"])[input_ids]
    for layer in params["layers"]:
        out, _ = _mixer(layer, cfg, _rms_norm(x, layer["norm_scale"], cfg.rms_eps))
        x = x + out
    x = _rms_norm(x, params["final_norm_scale"], cfg.rms_eps)
    if return_hidden:
        return x
    return mamba_logits(params, cfg, x)


def mamba_prefill_parallel(
    params: Params,
    cfg: MambaConfig,
    input_ids: jax.Array,   # [B, L] right-padded
    lens: jax.Array,        # [B] true prompt lengths
):
    """Chunked-parallel prompt processing that ALSO extracts the recurrent
    decode state at each row's own length (see _mixer's lens contract).
    Returns (last-real-token logits [B, V] f32, per-layer state list)."""
    x = jnp.asarray(params["embed"])[input_ids]
    states = []
    for layer in params["layers"]:
        out, st = _mixer(layer, cfg, _rms_norm(x, layer["norm_scale"], cfg.rms_eps), lens)
        x = x + out
        states.append(st)
    x = _rms_norm(x, params["final_norm_scale"], cfg.rms_eps)
    last = jnp.take_along_axis(x, (lens - 1)[:, None, None], axis=1)[:, 0]
    return mamba_logits(params, cfg, last), states


def mamba_logits(params: Params, cfg: MambaConfig, hidden: jax.Array) -> jax.Array:
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


def mamba_lm(
    params: Params,
    cfg: MambaConfig,
    input_ids: jax.Array,
    labels: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(sum_loss, n_scored) with the shift-by-one/-100 contract of
    ``gpt_neox_lm`` (reference: src/evaluate_perplexity.py:119-124)."""
    logits = mamba_forward(params, cfg, input_ids)
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE_INDEX
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    sum_loss = -jnp.sum(jnp.where(mask, tok, 0.0))
    return sum_loss, jnp.sum(mask)


# ---------------------------------------------------------------------------
# Recurrent decode: O(1) state per token (conv tail + SSM state), no KV cache.
# ---------------------------------------------------------------------------

def init_mamba_state(cfg: MambaConfig, batch: int, dtype=jnp.float32) -> list:
    """Per-layer (conv_tail [B, K-1, Din], ssm_state [B, Din, N])."""
    k, din, n = cfg.conv_kernel, cfg.d_inner, cfg.state_size
    return [
        {
            "conv": jnp.zeros((batch, k - 1, din), dtype),
            "ssm": jnp.zeros((batch, din, n), jnp.float32),
        }
        for _ in range(cfg.num_layers)
    ]


def _mixer_step(layer: Params, cfg: MambaConfig, x: jax.Array, state: Params):
    """Single-token mixer. x: [B, D]; returns (out [B, D], new_state)."""
    proj = jnp.dot(x, layer["in_proj_w"])
    if "in_proj_b" in layer:
        proj = proj + layer["in_proj_b"]
    u, z = jnp.split(proj, 2, axis=-1)                        # [B, Din]

    window = jnp.concatenate([state["conv"], u[:, None]], axis=1)  # [B, K, Din]
    conv = jnp.einsum("bkd,kd->bd", window, layer["conv_w"])
    if "conv_b" in layer:
        conv = conv + layer["conv_b"]
    u = jax.nn.silu(conv)
    new_conv = window[:, 1:]

    ssm_in = jnp.dot(u, layer["x_proj_w"])
    r, n = cfg.dt_rank, cfg.state_size
    dt_raw = ssm_in[..., :r]
    Bm = ssm_in[..., r : r + n].astype(jnp.float32)           # [B, N]
    Cm = ssm_in[..., r + n :].astype(jnp.float32)
    dt = jax.nn.softplus(
        jnp.dot(dt_raw, layer["dt_proj_w"]) + layer["dt_proj_b"]
    ).astype(jnp.float32)                                      # [B, Din]

    A = -jnp.exp(layer["A_log"].astype(jnp.float32))
    uf = u.astype(jnp.float32)
    dA = jnp.exp(dt[..., None] * A[None])                      # [B, Din, N]
    dBu = (dt * uf)[..., None] * Bm[:, None, :]
    h = dA * state["ssm"] + dBu
    y = jnp.einsum("bds,bs->bd", h, Cm) + uf * layer["D"].astype(jnp.float32)
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)
    out = jnp.dot(y, layer["out_proj_w"])
    if "out_proj_b" in layer:
        out = out + layer["out_proj_b"]
    return out, {"conv": new_conv, "ssm": h}


def mamba_step(params: Params, cfg: MambaConfig, token_ids: jax.Array, state: list):
    """One decode step. token_ids: [B] -> (logits [B, V] f32, new_state)."""
    x = jnp.asarray(params["embed"])[token_ids]
    new_state = []
    for layer, st in zip(params["layers"], state):
        out, nst = _mixer_step(layer, cfg, _rms_norm(x, layer["norm_scale"], cfg.rms_eps), st)
        x = x + out
        new_state.append(nst)
    x = _rms_norm(x, params["final_norm_scale"], cfg.rms_eps)
    return mamba_logits(params, cfg, x), new_state


def mamba_prefill_state(params: Params, cfg: MambaConfig, input_ids: jax.Array):
    """Run the prompt token-by-token via lax.scan, returning (last-token
    logits [B, V], state). Per-token cost is O(1) so prompt cost is O(L);
    the chunked parallel scan covers the scoring path, this covers decode
    priming with exact state equality to stepping."""
    b, L = input_ids.shape
    state0 = init_mamba_state(cfg, b, params["embed"].dtype)

    def step(carry, tok):
        logits, new_state = mamba_step(params, cfg, tok, carry)
        return new_state, logits

    state, logits_seq = jax.lax.scan(step, state0, input_ids.T)
    return logits_seq[-1], state


def mamba_generate_greedy(
    params: Params,
    cfg: MambaConfig,
    input_ids: jax.Array,   # [B, L] left-padded prompts NOT supported; pass exact
    max_new_tokens: int,
) -> jax.Array:
    """Greedy decode: [B, max_new_tokens] generated ids."""
    logits, state = mamba_prefill_state(params, cfg, input_ids)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(carry, _):
        tok, st = carry
        logits, nst = mamba_step(params, cfg, tok, st)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, nst), tok

    (_, _), toks = jax.lax.scan(step, (tok0, state), None, length=max_new_tokens)
    return toks.T  # [B, T]


def make_mamba_generate_fn(cfg: MambaConfig, max_new_tokens: int, eos_id: int,
                           temperature: float = 0.0, mesh=None):
    """Build a jitted ``(params, prompt_ids, prompt_lens, seed) -> tokens``
    fn with the same contract as ``models.generate.make_generate_fn``
    (right-padded prompts, eos fill after each row finishes, identical
    rng fold-in schedule so sampling semantics match the transformer
    engines). Prefill is the chunked parallel scan; decode carries the
    O(1) recurrent state — no KV cache, so context length never limits
    batch slots."""

    def _fn(params, prompt_ids, prompt_lens, seed):
        b = prompt_ids.shape[0]
        last_logits, state = mamba_prefill_parallel(params, cfg, prompt_ids, prompt_lens)

        def sample(lg, rng):
            if temperature <= 0.0:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)
            rng_next = jax.random.fold_in(rng, 0)
            return jax.random.categorical(rng_next, lg / temperature, axis=-1).astype(jnp.int32)

        rng0 = jax.random.PRNGKey(seed)
        first = sample(last_logits, rng0)
        tokens0 = jnp.full((b, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(first)
        carry0 = (tokens0, first, first == eos_id, jnp.ones((), jnp.int32), state)

        def cond(c):
            _, _, finished, step, _ = c
            return (step < max_new_tokens) & ~jnp.all(finished)

        def body(c):
            tokens, last, finished, step, state = c
            logits, state = mamba_step(params, cfg, last, state)
            rng = jax.random.fold_in(rng0, step)
            nxt = sample(logits, rng)
            nxt = jnp.where(finished, eos_id, nxt)
            return (tokens.at[:, step].set(nxt), nxt,
                    finished | (nxt == eos_id), step + 1, state)

        tokens, *_ = jax.lax.while_loop(cond, body, carry0)
        return tokens

    if mesh is None:
        return jax.jit(_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rows = NamedSharding(mesh, P("data"))
    rows2d = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        _fn, in_shardings=(rep, rows2d, rows, rep), out_shardings=rows2d
    )


def init_mamba_params(cfg: MambaConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init mirroring HF MambaForCausalLM shapes (for tests/bench)."""
    keys = jax.random.split(key, 2 + cfg.num_layers)
    d, din, n, r, k = cfg.hidden_size, cfg.d_inner, cfg.state_size, cfg.dt_rank, cfg.conv_kernel

    def dense(kk, shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (jax.random.normal(kk, shape, jnp.float32) * scale).astype(dtype)

    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[2 + i], 8)
        layer = {
            "norm_scale": jnp.ones((d,), dtype),
            "in_proj_w": dense(lk[0], (d, 2 * din)),
            "conv_w": dense(lk[1], (k, din), scale=1.0 / math.sqrt(k)),
            "x_proj_w": dense(lk[2], (din, r + 2 * n)),
            "dt_proj_w": dense(lk[3], (r, din)),
            "dt_proj_b": jnp.log(jnp.expm1(
                jnp.clip(jax.random.uniform(lk[4], (din,), jnp.float32) * 0.1, 1e-3)
            )).astype(dtype),
            "A_log": jnp.log(jnp.tile(
                jnp.arange(1, n + 1, dtype=jnp.float32)[None], (din, 1)
            )).astype(dtype),
            "D": jnp.ones((din,), dtype),
            "out_proj_w": dense(lk[5], (din, d)),
        }
        if cfg.use_conv_bias:
            layer["conv_b"] = jnp.zeros((din,), dtype)
        if cfg.use_bias:
            layer["in_proj_b"] = jnp.zeros((2 * din,), dtype)
            layer["out_proj_b"] = jnp.zeros((d,), dtype)
        layers.append(layer)

    params: Params = {
        "embed": dense(keys[0], (cfg.vocab_size, d), scale=0.02),
        "layers": layers,
        "final_norm_scale": jnp.ones((d,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[1], (d, cfg.vocab_size), scale=0.02)
    return params
