"""Blockwise (streamed) causal-LM loss.

The dense loss materializes [B, S, V] f32 logits AND a same-sized
log-softmax tensor in HBM — at Pythia-1B scoring shapes (b8 x 1024, vocab
50304) that is 2 x 1.65 GB of write+read traffic for a reduction whose
output is one scalar per row. Applying the vocab head per sequence block
keeps the logits tile-sized and lets XLA fuse head-matmul -> logsumexp ->
gather without round-tripping HBM (the fused-softmax-crossentropy recipe).

Numerics are identical to the dense path up to f32 summation order; parity
is pinned in tests/test_models.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def blockwise_row_lm_loss(head_fn, hidden: jax.Array, labels: jax.Array, block: int = 128):
    """Per-row (NLL sum [B], scored-token count [B]).

    ``head_fn(h_blk) -> logits`` applies the vocab head (including any
    final-logit soft-capping and int8-head dispatch) to a [B, C, H] block.
    ``hidden`` is the UNSHIFTED [B, S, H] final hidden; position t scores
    label t+1 (HF convention).
    """
    h = hidden[:, :-1]
    lab = labels[:, 1:]
    b, sm1, hd = h.shape
    nb = -(-sm1 // block)
    pad = nb * block - sm1
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    h = h.reshape(b, nb, block, hd).transpose(1, 0, 2, 3)      # [nb, B, C, H]
    lab = lab.reshape(b, nb, block).transpose(1, 0, 2)         # [nb, B, C]

    def body(carry, inp):
        loss_sum, count = carry
        h_blk, lab_blk = inp
        mask = lab_blk != IGNORE_INDEX
        logits = head_fn(h_blk).astype(jnp.float32)            # [B, C, V]
        lse = jax.nn.logsumexp(logits, axis=-1)                # [B, C]
        safe = jnp.where(mask, lab_blk, 0)
        picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        ll = picked - lse
        loss_sum = loss_sum - jnp.sum(ll * mask, axis=-1)
        count = count + jnp.sum(mask, axis=-1)
        return (loss_sum, count), None

    init = (jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.int32))
    (loss_sum, count), _ = jax.lax.scan(body, init, (h, lab))
    return loss_sum, count


def use_blockwise(seq_len: int, vocab: int) -> bool:
    """Route scoring-sized workloads to the streamed loss on TPU.

    Threshold: once the dense [S, V] f32 logits tensor stops being cache-
    friendly (>= 32M elements) the streamed loss wins on HBM traffic;
    below that the dense path's single fused matmul is fine.
    """
    return jax.default_backend() == "tpu" and seq_len * vocab >= (1 << 25)
