"""Mamba (S6 selective scan) reader: HF parity, scan/decode equivalence.

Replaces the reference harness's CUDA-only ``mamba_ssm`` backend
(reference: rag-evaluation-harness/lm_eval/models/mamba_lm.py) with the
TPU-native chunked associative scan in ``models/mamba.py``. Parity is
pinned against transformers' ``MambaForCausalLM`` sequential fallback
(``modeling_mamba.py::slow_forward``), which needs no CUDA kernels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from retrieval_scaling_tpu.models.mamba import (
    MambaConfig,
    init_mamba_params,
    init_mamba_state,
    mamba_forward,
    mamba_generate_greedy,
    mamba_lm,
    mamba_prefill_state,
    mamba_step,
)

TINY = MambaConfig(
    vocab_size=64,
    hidden_size=32,
    state_size=8,
    num_layers=2,
    conv_kernel=4,
    expand=2,
    time_step_rank=4,
    scan_chunk=5,  # deliberately not dividing L: exercises identity padding
)


def _tiny_params(key=0):
    return init_mamba_params(TINY, jax.random.PRNGKey(key))


def _hf_tiny():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.MambaConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        state_size=TINY.state_size,
        num_hidden_layers=TINY.num_layers,
        conv_kernel=TINY.conv_kernel,
        expand=TINY.expand,
        time_step_rank=TINY.time_step_rank,
    )
    torch.manual_seed(0)
    model = transformers.MambaForCausalLM(hf_cfg).eval()
    return torch, model


def test_hf_logits_parity():
    """JAX forward matches the HF sequential fallback on random weights."""
    torch, hf = _hf_tiny()
    from retrieval_scaling_tpu.models.hf_convert import mamba_from_hf_model

    params, cfg = mamba_from_hf_model(hf)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, (2, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(mamba_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_hf_loss_parity():
    """mamba_lm's shift/-100 loss matches torch cross-entropy on HF logits."""
    torch, hf = _hf_tiny()
    from retrieval_scaling_tpu.models.hf_convert import mamba_from_hf_model

    params, cfg = mamba_from_hf_model(hf)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (2, 9))
    labels = ids.copy()
    labels[:, :3] = -100  # context positions unscored

    with torch.no_grad():
        logits = hf(torch.tensor(ids)).logits.float()
    shift_logits = logits[:, :-1].reshape(-1, cfg.vocab_size)
    shift_labels = torch.tensor(labels[:, 1:]).reshape(-1)
    ref = torch.nn.functional.cross_entropy(
        shift_logits, shift_labels, ignore_index=-100, reduction="sum"
    ).item()
    n_ref = int((shift_labels != -100).sum())

    sum_loss, n = mamba_lm(params, cfg, jnp.asarray(ids), jnp.asarray(labels))
    assert int(n) == n_ref
    np.testing.assert_allclose(float(sum_loss), ref, rtol=1e-4)


def test_chunked_scan_matches_stepping():
    """The chunked associative scan equals token-by-token recurrence: the
    parallel prefill's last-token logits == mamba_prefill_state's."""
    params = _tiny_params()
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, (3, 13)))

    full = mamba_forward(params, TINY, ids)           # chunked parallel scan
    last_par = np.asarray(full[:, -1])
    last_seq, _ = mamba_prefill_state(params, TINY, ids)  # sequential steps
    np.testing.assert_allclose(last_par, np.asarray(last_seq), rtol=1e-5, atol=1e-5)


def test_decode_state_continues_prefill():
    """Stepping after prefill equals running the longer sequence in full."""
    params = _tiny_params(1)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, (2, 8)))
    nxt = jnp.asarray(rng.randint(0, TINY.vocab_size, (2,)))

    _, state = mamba_prefill_state(params, TINY, ids)
    step_logits, _ = mamba_step(params, TINY, nxt, state)

    full = mamba_forward(params, TINY, jnp.concatenate([ids, nxt[:, None]], 1))
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full[:, -1]), rtol=1e-5, atol=1e-5
    )


def test_greedy_generate_matches_hf_generate():
    torch, hf = _hf_tiny()
    from retrieval_scaling_tpu.models.hf_convert import mamba_from_hf_model

    params, cfg = mamba_from_hf_model(hf)
    rng = np.random.RandomState(4)
    ids = rng.randint(0, cfg.vocab_size, (1, 6))
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor(ids), max_new_tokens=5, do_sample=False
        ).numpy()[:, 6:]
    got = np.asarray(mamba_generate_greedy(params, cfg, jnp.asarray(ids), 5))
    np.testing.assert_array_equal(got, ref)


def test_parallel_prefill_matches_sequential_padded():
    """mamba_prefill_parallel's per-row state/logits equal sequential
    stepping at each row's own length, on a right-padded batch."""
    from retrieval_scaling_tpu.models.mamba import mamba_prefill_parallel

    params = _tiny_params(4)
    rng = np.random.RandomState(8)
    lens = np.array([9, 4, 7])
    width = 9
    ids_np = np.full((3, width), 1, np.int32)
    for r, ln in enumerate(lens):
        ids_np[r, :ln] = rng.randint(0, TINY.vocab_size, ln)

    logits_par, state_par = mamba_prefill_parallel(
        params, TINY, jnp.asarray(ids_np), jnp.asarray(lens)
    )
    for r, ln in enumerate(lens):
        row = jnp.asarray(ids_np[r : r + 1, :ln])
        logits_seq, state_seq = mamba_prefill_state(params, TINY, row)
        np.testing.assert_allclose(
            np.asarray(logits_par[r]), np.asarray(logits_seq[0]), rtol=1e-4, atol=1e-4
        )
        for lp, ls in zip(state_par, state_seq):
            np.testing.assert_allclose(
                np.asarray(lp["ssm"][r]), np.asarray(ls["ssm"][0]), rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(lp["conv"][r]), np.asarray(ls["conv"][0]), rtol=1e-4, atol=1e-4
            )


def test_make_mamba_generate_fn_padded_batch():
    """The generate-fn contract (right-padded prompts, eos fill) produces
    the same tokens as per-row unpadded greedy generation."""
    from retrieval_scaling_tpu.models.mamba import make_mamba_generate_fn

    params = _tiny_params(5)
    rng = np.random.RandomState(9)
    lens = np.array([8, 5])
    ids_np = np.full((2, 8), 0, np.int32)
    for r, ln in enumerate(lens):
        ids_np[r, :ln] = rng.randint(0, TINY.vocab_size, ln)

    gen = make_mamba_generate_fn(TINY, 6, eos_id=-1)
    toks = np.asarray(gen(params, jnp.asarray(ids_np), jnp.asarray(lens), 0))
    for r, ln in enumerate(lens):
        row = jnp.asarray(ids_np[r : r + 1, :ln])
        ref = np.asarray(mamba_generate_greedy(params, TINY, row, 6))
        np.testing.assert_array_equal(toks[r], ref[0])


def test_jax_reader_lm_mamba_backend(tmp_path):
    """End-to-end harness backend: loglikelihood + generate_until on a
    saved tiny HF mamba checkpoint (the mamba_ssm backend replacement)."""
    torch, hf = _hf_tiny()
    import sys

    sys.path.insert(0, "tests")
    from helpers import make_word_tokenizer

    from retrieval_scaling_tpu.models.hf_convert import mamba_from_hf_model
    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    params, cfg = mamba_from_hf_model(hf)
    tok = make_word_tokenizer(["a b c x y z hello world"])
    lm = JaxReaderLM(params, cfg, tok, batch_size=2)
    assert isinstance(lm.cfg, MambaConfig)

    lls = lm.loglikelihood([("a b", " c"), ("x", " y z")])
    assert len(lls) == 2 and all(np.isfinite(ll) for ll, _ in lls)

    outs = lm.generate_until(
        [{"context": "hello", "gen_kwargs": {"max_gen_toks": 4, "until": [], "do_sample": False}}]
    )
    assert len(outs) == 1 and isinstance(outs[0], str)


def test_mamba_backend_rejects_transformer_only_options(tmp_path):
    params = _tiny_params(6)
    with pytest.raises(ValueError, match="mamba readers do not support"):
        from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

        JaxReaderLM(params, TINY, tokenizer=None, quantization="int8")


def test_cached_reader_roundtrip(tmp_path):
    """Mamba params/config survive the converted-reader npz cache."""
    from retrieval_scaling_tpu.models.hf_convert import (
        _load_cached_reader,
        _save_cached_reader,
    )

    params = _tiny_params(2)
    base = str(tmp_path / "reader_mamba")
    _save_cached_reader(base, params, TINY)
    params2, cfg2 = _load_cached_reader(base)
    assert cfg2 == TINY
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, (1, 7)))
    np.testing.assert_allclose(
        np.asarray(mamba_forward(params, TINY, ids)),
        np.asarray(mamba_forward(params2, cfg2, ids)),
        rtol=1e-6,
    )


def test_load_hf_reader_dispatches_mamba(tmp_path):
    """load_hf_reader routes model_type=mamba through mamba_from_hf_model."""
    torch, hf = _hf_tiny()
    save_dir = tmp_path / "tiny-mamba"
    hf.save_pretrained(save_dir)
    # tokenizers aren't needed for conversion; load params+cfg directly
    from retrieval_scaling_tpu.models.hf_convert import load_hf_reader

    params, cfg = load_hf_reader(str(save_dir))
    assert isinstance(cfg, MambaConfig)
    rng = np.random.RandomState(6)
    ids = rng.randint(0, cfg.vocab_size, (1, 5))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.float().numpy()
    got = np.asarray(mamba_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_reader_dispatch_functions():
    """reader_lm_loss/hidden/logits dispatch on MambaConfig."""
    from retrieval_scaling_tpu.models.hf_convert import (
        reader_hidden,
        reader_lm_loss,
        reader_logits,
        reader_logits_from_hidden,
    )

    params = _tiny_params(3)
    rng = np.random.RandomState(7)
    ids = jnp.asarray(rng.randint(0, TINY.vocab_size, (2, 6)))
    labels = ids

    direct = mamba_forward(params, TINY, ids)
    np.testing.assert_allclose(
        np.asarray(reader_logits(params, TINY, ids)), np.asarray(direct), rtol=1e-6
    )
    hid = reader_hidden(params, TINY, ids)
    np.testing.assert_allclose(
        np.asarray(reader_logits_from_hidden(params, TINY, hid)),
        np.asarray(direct),
        rtol=1e-5, atol=1e-5,
    )
    sl, n = reader_lm_loss(params, TINY, ids, labels)
    sl2, n2 = mamba_lm(params, TINY, ids, labels)
    assert int(n) == int(n2)
    np.testing.assert_allclose(float(sl), float(sl2), rtol=1e-6)
