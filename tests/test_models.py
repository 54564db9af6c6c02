"""Numeric parity of the JAX models against HF torch implementations.

Tiny randomly-initialized HF models are built locally (no network) and
converted; logits/hidden states must agree to float32 tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from retrieval_scaling_tpu.models.bert import (  # noqa: E402
    BertConfig,
    bert_encode,
    contriever_embed,
    init_bert_params,
    pool_embeddings,
)
from retrieval_scaling_tpu.models.gpt_neox import (  # noqa: E402
    GPTNeoXConfig,
    gpt_neox_forward,
    gpt_neox_lm,
    init_gpt_neox_params,
)
from retrieval_scaling_tpu.models.hf_convert import (  # noqa: E402
    bert_from_hf_model,
    gpt_neox_from_hf_model,
)


@pytest.fixture(scope="module")
def tiny_hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def tiny_hf_neox():
    cfg = transformers.GPTNeoXConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        rotary_pct=0.25,
        use_parallel_residual=True,
    )
    torch.manual_seed(1)
    model = transformers.GPTNeoXForCausalLM(cfg)
    model.eval()
    return model


def test_bert_parity_with_hf(tiny_hf_bert):
    params, cfg = bert_from_hf_model(tiny_hf_bert, pooling="mean")
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(3, 20)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 12:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = tiny_hf_bert(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    out = np.asarray(bert_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    # only compare non-padded positions (HF computes garbage at padded ones too)
    for b in range(3):
        n = int(mask[b].sum())
        np.testing.assert_allclose(out[b, :n], ref[b, :n], atol=2e-5, rtol=1e-4)


def test_contriever_mean_pooling_matches_reference_formula(tiny_hf_bert):
    params, cfg = bert_from_hf_model(tiny_hf_bert, pooling="mean")
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 128, size=(2, 16)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[1, 9:] = 0

    with torch.no_grad():
        hidden = tiny_hf_bert(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state
    # reference: contriever/src/contriever.py:45-51 masked mean pooling
    m = torch.tensor(mask)[..., None].bool()
    ref_emb = (hidden.masked_fill(~m, 0.0).sum(dim=1) / m.sum(dim=1)).numpy()

    emb = np.asarray(contriever_embed(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(emb, ref_emb, atol=2e-5, rtol=1e-4)


def test_cls_pooling():
    hidden = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    mask = jnp.ones((2, 5))
    out = pool_embeddings(hidden, mask, "cls")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(hidden[:, 0]))


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_gpt_neox_parity_with_hf(parallel_residual):
    cfg_hf = transformers.GPTNeoXConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        rotary_pct=0.25,
        use_parallel_residual=parallel_residual,
    )
    torch.manual_seed(2)
    model = transformers.GPTNeoXForCausalLM(cfg_hf)
    model.eval()
    params, cfg = gpt_neox_from_hf_model(model)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, 256, size=(2, 24)).astype(np.int64)
    with torch.no_grad():
        ref_logits = model(input_ids=torch.tensor(ids)).logits.numpy()

    logits = np.asarray(gpt_neox_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(logits, ref_logits, atol=5e-4, rtol=1e-3)


def test_gpt_neox_loss_matches_hf(tiny_hf_neox):
    params, cfg = gpt_neox_from_hf_model(tiny_hf_neox)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 256, size=(1, 20)).astype(np.int64)
    labels = ids.copy()
    labels[0, :8] = -100  # mask the "context" prefix like the reference

    with torch.no_grad():
        ref = tiny_hf_neox(input_ids=torch.tensor(ids), labels=torch.tensor(labels))
    loss_sum, count = gpt_neox_lm(params, cfg, jnp.asarray(ids), jnp.asarray(labels))
    jax_loss = float(loss_sum / count)
    assert abs(jax_loss - float(ref.loss)) < 2e-4


def test_random_init_shapes_run():
    import jax

    cfg = BertConfig(vocab_size=50, hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32, max_position_embeddings=32)
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    out = bert_encode(params, cfg, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8)))
    assert out.shape == (1, 8, 16)

    ncfg = GPTNeoXConfig(vocab_size=64, hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32, max_position_embeddings=32)
    nparams = init_gpt_neox_params(ncfg, jax.random.PRNGKey(1))
    logits = gpt_neox_forward(nparams, ncfg, jnp.zeros((1, 8), jnp.int32))
    assert logits.shape == (1, 8, 64)


def test_roberta_parity_with_padding():
    """XLM-R/RoBERTa encoders use pad-offset position ids
    (reference: contriever/src/contriever.py:58-100 XLMRetriever)."""
    import transformers

    cfg = transformers.RobertaConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=66,  # HF reserves padding_idx offset
        pad_token_id=1,
    )
    torch.manual_seed(3)
    hf = transformers.RobertaModel(cfg, add_pooling_layer=False)
    hf.eval()

    params, jcfg = bert_from_hf_model(hf, pooling="mean")
    assert jcfg.roberta_position_ids

    rng = np.random.RandomState(0)
    ids = rng.randint(3, 100, (2, 10)).astype(np.int32)
    ids[1, 7:] = 1  # right padding with pad_token_id
    mask = np.ones((2, 10), np.int32)
    mask[1, 7:] = 0

    import torch as _torch

    with _torch.no_grad():
        ref = hf(
            _torch.tensor(ids.astype(np.int64)), attention_mask=_torch.tensor(mask.astype(np.int64))
        ).last_hidden_state.numpy()

    from retrieval_scaling_tpu.models.bert import bert_encode

    got = np.asarray(bert_encode(params, jcfg, jnp.asarray(ids), jnp.asarray(mask)))
    # only compare non-pad positions (HF computes garbage on pads too, but
    # with identical pos ids; pads are excluded from pooling anyway)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got[1, :7], ref[1, :7], atol=2e-4, rtol=2e-3)


def test_gelu_auto_matches_exact_within_bf16_noise(tiny_hf_bert):
    """gelu='auto' uses tanh for bf16 activations; the approximation error
    (~1e-3) must stay below bf16 quantization noise, so embeddings from
    exact-vs-tanh bf16 forwards are indistinguishable at bf16 tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.bert import contriever_embed

    params, cfg = bert_from_hf_model(tiny_hf_bert, pooling="mean")
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), jnp.int32)
    params_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    cfg_exact = dataclasses.replace(cfg, gelu="exact")
    cfg_tanh = dataclasses.replace(cfg, gelu="tanh")
    e_exact = np.asarray(contriever_embed(params_bf16, cfg_exact, ids, mask), np.float32)
    e_tanh = np.asarray(contriever_embed(params_bf16, cfg_tanh, ids, mask), np.float32)
    cos = np.sum(e_exact * e_tanh, -1) / (
        np.linalg.norm(e_exact, axis=-1) * np.linalg.norm(e_tanh, axis=-1)
    )
    assert cos.min() > 0.9995, cos.min()

    # f32 'auto' stays exact (HF parity unaffected)
    cfg_auto = dataclasses.replace(cfg, gelu="auto")
    e_auto32 = np.asarray(contriever_embed(params, cfg_auto, ids, mask))
    e_exact32 = np.asarray(contriever_embed(params, cfg_exact, ids, mask))
    np.testing.assert_array_equal(e_auto32, e_exact32)


# ---------------------------------------------------------------- packing
def test_pack_token_rows_layout():
    from retrieval_scaling_tpu.search.encoder import pack_token_rows

    seqs = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    ids, pos, seg, seg_starts, mapping = pack_token_rows(seqs, capacity=8, pad_id=0)
    # every sequence present exactly once at its mapped (row, slot)
    for i, (r, slot) in enumerate(mapping):
        start = seg_starts[r, slot]
        got = ids[r, start : start + len(seqs[i])].tolist()
        assert got == seqs[i], (i, got)
        assert (seg[r, start : start + len(seqs[i])] == slot + 1).all()
        assert pos[r, start] == 0
    # capacity respected, segments have no overlaps
    assert ids.shape[1] == 8
    total_tokens = sum(len(s) for s in seqs)
    assert int((seg > 0).sum()) == total_tokens


def test_packed_embed_matches_unpacked():
    """Block-diagonal attention + per-segment positions/pooling must equal
    encoding each passage alone (same math, one compiled shape)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_word_tokenizer, tiny_encoder
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    rng = np.random.RandomState(0)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, rng.randint(3, 20))) for _ in range(17)]
    tok = make_word_tokenizer([" ".join(words)])
    enc = tiny_encoder(tok)

    a = enc.encode(texts, EncodeOptions(batch_size=4, maxlength=32))
    b = enc.encode(texts, EncodeOptions(batch_size=4, maxlength=32, packed=True))
    assert b.shape == a.shape
    cos = np.sum(a.astype(np.float32) * b.astype(np.float32), axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_packed_embed_mesh_and_out_dim():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_word_tokenizer, tiny_encoder
    from retrieval_scaling_tpu.parallel.mesh import build_mesh
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    rng = np.random.RandomState(1)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, rng.randint(2, 16))) for _ in range(23)]
    tok = make_word_tokenizer([" ".join(words)])
    enc = tiny_encoder(tok, mesh=build_mesh())

    a = enc.encode(texts, EncodeOptions(batch_size=8, maxlength=32, out_dim=16))
    b = enc.encode(texts, EncodeOptions(batch_size=8, maxlength=32, out_dim=16, packed=True))
    assert a.shape == b.shape == (23, 16)
    cos = np.sum(a.astype(np.float32) * b.astype(np.float32), axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_packed_falls_back_for_unsupported_family():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_word_tokenizer
    import dataclasses
    import jax
    from retrieval_scaling_tpu.models.bert import BertConfig, init_bert_params
    from retrieval_scaling_tpu.search.encoder import EncodeOptions, JaxEncoder
    import jax.numpy as jnp

    tok = make_word_tokenizer(["alpha beta gamma"])
    cfg = BertConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, pooling="mean",
        attention_impl="xla", roberta_position_ids=True,
    )
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    enc = JaxEncoder(params, cfg, tok, dtype=jnp.float32)
    out = enc.encode(["alpha beta", "gamma"], EncodeOptions(batch_size=2, maxlength=16, packed=True))
    assert out.shape == (2, 32)


# ---------------------------------------------------------------- gpt2
def test_gpt2_parity_with_hf():
    """GPT-2 (learned positions, sequential residual, gelu_new, tied head)
    on the GPT-NeoX machinery must match HF logits."""
    import torch
    import transformers
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_forward
    from retrieval_scaling_tpu.models.hf_convert import gpt2_from_hf_model

    torch.manual_seed(3)
    hf = transformers.GPT2LMHeadModel(
        transformers.GPT2Config(
            vocab_size=128, n_embd=32, n_layer=2, n_head=4, n_positions=64,
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        )
    ).eval()
    params, cfg = gpt2_from_hf_model(hf)
    assert cfg.learned_positions and not cfg.use_parallel_residual
    assert cfg.rotary_dims == 0 and cfg.gelu == "tanh"

    rng = np.random.RandomState(2)
    ids = rng.randint(0, 128, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(gpt_neox_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_gpt2_generation_matches_hf():
    import torch
    import transformers
    import jax, jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import make_generate_fn
    from retrieval_scaling_tpu.models.hf_convert import gpt2_from_hf_model

    torch.manual_seed(5)
    hf = transformers.GPT2LMHeadModel(
        transformers.GPT2Config(
            vocab_size=96, n_embd=32, n_layer=2, n_head=4, n_positions=64,
            attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        )
    ).eval()
    params, cfg = gpt2_from_hf_model(hf)

    rng = np.random.RandomState(6)
    prompt = rng.randint(2, 96, (1, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt.astype(np.int64)), max_new_tokens=5,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, 10:].numpy()
    gen = make_generate_fn(cfg, max_new_tokens=5, eos_id=0)
    out = np.asarray(gen(params, jnp.asarray(prompt), jnp.asarray([10], jnp.int32), 0))
    np.testing.assert_array_equal(out[0], ref)


# ---------------------------------------------------------------- opt
def test_opt_parity_with_hf():
    """OPT (learned positions offset 2, ReLU MLP, sequential residual,
    separate biased projections, tied head) must match HF logits."""
    import torch
    import transformers
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.gpt_neox import gpt_neox_forward
    from retrieval_scaling_tpu.models.hf_convert import opt_from_hf_model

    torch.manual_seed(7)
    hf = transformers.OPTForCausalLM(
        transformers.OPTConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
            do_layer_norm_before=True, word_embed_proj_dim=32, dropout=0.0,
            attention_dropout=0.0, pad_token_id=1, bos_token_id=2, eos_token_id=2,
        )
    ).eval()
    params, cfg = opt_from_hf_model(hf)
    assert cfg.position_offset == 2 and cfg.gelu == "relu"

    rng = np.random.RandomState(3)
    ids = rng.randint(3, 128, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(gpt_neox_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_opt_generation_matches_hf():
    import torch
    import transformers
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import make_generate_fn
    from retrieval_scaling_tpu.models.hf_convert import opt_from_hf_model

    torch.manual_seed(8)
    hf = transformers.OPTForCausalLM(
        transformers.OPTConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=64, max_position_embeddings=64,
            do_layer_norm_before=True, word_embed_proj_dim=32, dropout=0.0,
            attention_dropout=0.0, pad_token_id=1, bos_token_id=2, eos_token_id=2,
        )
    ).eval()
    params, cfg = opt_from_hf_model(hf)
    rng = np.random.RandomState(9)
    prompt = rng.randint(3, 96, (1, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(prompt.astype(np.int64)), max_new_tokens=5,
            do_sample=False, pad_token_id=1, eos_token_id=None,
        )[0, 10:].numpy()
    gen = make_generate_fn(cfg, max_new_tokens=5, eos_id=1)
    out = np.asarray(gen(params, jnp.asarray(prompt), jnp.asarray([10], jnp.int32), 0))
    np.testing.assert_array_equal(out[0], ref)


def test_reader_conversion_cache_roundtrip(tmp_path, monkeypatch):
    """load_hf_reader(cache_dir=...) caches converted params keyed on the
    checkpoint's weight files: an unchanged checkpoint reloads from cache
    (no torch load), and an EDITED weight file misses the cache instead of
    silently serving stale params (round-2 advisor finding)."""
    import torch
    import transformers
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.hf_convert import load_hf_reader, reader_logits

    model_dir = tmp_path / "model"
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
            max_position_embeddings=64, tie_word_embeddings=False,
        )
    )
    hf.save_pretrained(model_dir)

    cache = tmp_path / "cache"
    params1, cfg1 = load_hf_reader(str(model_dir), cache_dir=str(cache))
    assert list(cache.glob("reader_*.npz"))
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 96, (2, 8)), jnp.int32)
    ref = np.asarray(reader_logits(params1, cfg1, ids))

    # unchanged checkpoint: the reload must come from cache (torch load
    # poisoned to prove it is skipped)
    def boom(*a, **k):
        raise AssertionError("cache miss: torch load was invoked")

    monkeypatch.setattr(
        transformers.AutoModelForCausalLM, "from_pretrained", boom
    )
    params2, cfg2 = load_hf_reader(str(model_dir), cache_dir=str(cache))
    assert cfg2 == cfg1
    np.testing.assert_array_equal(np.asarray(reader_logits(params2, cfg2, ids)), ref)
    monkeypatch.undo()

    # edited weights (config.json untouched): stale cache must NOT be
    # served — the changed key forces a reconversion, which reads the now-
    # corrupt weights and fails loudly instead of returning old params
    import os
    import time

    for f in list(model_dir.glob("*.safetensors")) + list(model_dir.glob("*.bin")):
        f.write_bytes(b"garbage")
        os.utime(f, (time.time() + 5, time.time() + 5))
    with pytest.raises(Exception):
        load_hf_reader(str(model_dir), cache_dir=str(cache))


# ------------------------------------------------------------ blockwise loss
def test_blockwise_loss_matches_dense():
    """The streamed (blockwise) LM loss must equal the dense path — per-row
    sums and counts — including -100 masking, pad tails, and odd lengths."""
    import jax

    from retrieval_scaling_tpu.models.gpt_neox import (
        GPTNeoXConfig,
        gpt_neox_forward,
        gpt_neox_lm,
        init_gpt_neox_params,
        neox_logits,
    )
    from retrieval_scaling_tpu.models.loss import blockwise_row_lm_loss

    cfg = GPTNeoXConfig(
        vocab_size=131, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 131, (3, 37)), jnp.int32)  # odd length
    labels = np.asarray(ids).copy()
    labels[0, :10] = -100
    labels[1, 20:] = -100
    labels[2, :] = -100  # fully masked row
    labels = jnp.asarray(labels)

    dense_sum, dense_n = gpt_neox_lm(params, cfg, ids, labels)

    hidden = gpt_neox_forward(params, cfg, ids, return_hidden=True)
    row_loss, row_n = blockwise_row_lm_loss(
        lambda h: neox_logits(params, h), hidden, labels, block=16
    )
    assert row_loss.shape == (3,) and row_n.shape == (3,)
    assert int(row_n[2]) == 0 and float(row_loss[2]) == 0.0
    np.testing.assert_allclose(float(jnp.sum(row_loss)), float(dense_sum), rtol=1e-5)
    assert int(jnp.sum(row_n)) == int(dense_n)

    # per-row values match a dense per-row recomputation
    logits = gpt_neox_forward(params, cfg, ids)
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    lab = np.asarray(labels)[:, 1:]
    for b in range(3):
        want = -sum(
            float(lp[b, t, lab[b, t]]) for t in range(lab.shape[1]) if lab[b, t] != -100
        )
        np.testing.assert_allclose(float(row_loss[b]), want, rtol=1e-5, atol=1e-5)


def test_blockwise_loss_llama_softcap_head():
    """Blockwise loss through llama_logits keeps the Gemma-2 final-logit
    soft-cap (head_fn owns the head, cap included)."""
    import jax

    from retrieval_scaling_tpu.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_forward,
        llama_lm,
        llama_logits,
    )
    from retrieval_scaling_tpu.models.loss import blockwise_row_lm_loss

    cfg = LlamaConfig(
        vocab_size=97, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
        final_logit_softcap=10.0, attention_impl="xla",
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 97, (2, 24)), jnp.int32)
    labels = jnp.asarray(np.where(np.arange(24)[None, :] < 5, -100, np.asarray(ids)))

    dense_sum, dense_n = llama_lm(params, cfg, ids, labels)
    hidden = llama_forward(params, cfg, ids)
    row_loss, row_n = blockwise_row_lm_loss(
        lambda h: llama_logits(params, cfg, h), hidden, labels, block=8
    )
    np.testing.assert_allclose(float(jnp.sum(row_loss)), float(dense_sum), rtol=1e-5)
    assert int(jnp.sum(row_n)) == int(dense_n)


def test_encoder_mesh_matches_single_device():
    """The shard_map DP embed path (pallas kernels shard over 'data'
    instead of GSPMD-replicating) reproduces single-device embeddings."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_word_tokenizer, tiny_encoder
    from retrieval_scaling_tpu.parallel.mesh import build_mesh
    from retrieval_scaling_tpu.search.encoder import EncodeOptions

    rng = np.random.RandomState(2)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, rng.randint(2, 16))) for _ in range(19)]
    tok = make_word_tokenizer([" ".join(words)])
    single = tiny_encoder(tok)
    sharded = tiny_encoder(tok, mesh=build_mesh())
    for packed in (False, True):
        a = single.encode(texts, EncodeOptions(batch_size=8, maxlength=32, packed=packed))
        b = sharded.encode(texts, EncodeOptions(batch_size=8, maxlength=32, packed=packed))
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32), atol=2e-3, rtol=2e-3
        )
