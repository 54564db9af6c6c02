"""Numeric parity of the T5 encoder (GTR-style retrievers) against HF torch."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from retrieval_scaling_tpu.models.hf_convert import t5_encoder_from_hf_model  # noqa: E402
from retrieval_scaling_tpu.models.t5 import t5_embed, t5_encode  # noqa: E402


def _tiny_t5(gated: bool):
    cfg = transformers.T5Config(
        vocab_size=120,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        feed_forward_proj="gated-gelu" if gated else "relu",
    )
    torch.manual_seed(4 + int(gated))
    model = transformers.T5EncoderModel(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated, rng):
    hf = _tiny_t5(gated)
    params, cfg = t5_encoder_from_hf_model(hf)
    assert cfg.gated_act == gated

    ids = rng.randint(3, 120, (2, 14)).astype(np.int32)
    mask = np.ones((2, 14), np.int32)
    mask[1, 9:] = 0
    ids[1, 9:] = 0

    with torch.no_grad():
        ref = hf(
            torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], ref[0], atol=3e-4, rtol=3e-3)
    np.testing.assert_allclose(got[1, :9], ref[1, :9], atol=3e-4, rtol=3e-3)


def test_t5_embed_projection_and_norm(rng):
    hf = _tiny_t5(False)
    proj = rng.randn(32, 16).astype(np.float32)
    params, cfg = t5_encoder_from_hf_model(hf, projection=proj)
    assert cfg.projection_dim == 16

    ids = jnp.asarray(rng.randint(3, 120, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    emb = np.asarray(t5_embed(params, cfg, ids, mask, normalize=True))
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    # projection applied after mean pooling
    hidden = np.asarray(t5_encode(params, cfg, ids, mask))
    pooled = hidden.mean(axis=1) @ proj
    want = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)
    np.testing.assert_allclose(emb, want, atol=1e-4)


def test_load_encoder_dispatches_t5(tmp_path, rng):
    """load_encoder routes model_type=t5 to the GTR embedder (with Dense)."""
    from tests.helpers import make_word_tokenizer

    hf = _tiny_t5(False)
    mdir = tmp_path / "tiny-gtr-t5"
    hf.save_pretrained(mdir)
    make_word_tokenizer(["alpha beta gamma delta"]).save_pretrained(mdir)
    dense = mdir / "2_Dense"
    dense.mkdir()
    torch.save({"linear.weight": torch.randn(16, 32)}, dense / "pytorch_model.bin")

    from retrieval_scaling_tpu.search.encoder import EncodeOptions, load_encoder

    enc = load_encoder(str(mdir), dtype=jnp.float32)
    out = enc.encode(["alpha beta", "gamma delta"], EncodeOptions(batch_size=2, maxlength=16))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(out.astype(np.float32), axis=-1), 1.0, atol=1e-2
    )
