"""Mesh data-parallel reader eval == single-device numbers.

VERDICT round-1 item 4: the reference evaluates readers under accelerate
DDP/FSDP (lm_eval/models/huggingface.py:151-333); the TPU analog shards
scoring batches over the mesh 'data' axis with replicated weights, and
must produce identical numbers on 1 and 8 virtual devices.
"""

import numpy as np
import pytest

from retrieval_scaling_tpu.parallel.mesh import build_mesh
from tests.helpers import make_word_tokenizer


def _texts(n=24):
    rng = np.random.RandomState(0)
    return [" ".join(f"w{rng.randint(0, 80)}" for _ in range(12)) for _ in range(n)]


def test_jax_reader_mesh_matches_single_device():
    import jax.numpy as jnp

    from retrieval_scaling_tpu.evals.perplexity import JaxReader
    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    import jax

    tok = make_word_tokenizer(_texts())
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=64,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    texts = _texts()
    contexts = texts[:12]
    targets = texts[12:]

    single = JaxReader(params, cfg, tok, batch_size=8, dtype=jnp.float32)
    mesh = build_mesh()  # 8 virtual devices
    sharded = JaxReader(params, cfg, tok, batch_size=8, dtype=jnp.float32, mesh=mesh)
    np.testing.assert_allclose(
        single.score(contexts, targets), sharded.score(contexts, targets),
        rtol=1e-5, atol=1e-6,
    )


def test_jax_reader_lm_mesh_matches_single_device():
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    tok = make_word_tokenizer(_texts())
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=64,
        attention_impl="xla",
    )
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        init_gpt_neox_params(cfg, jax.random.PRNGKey(1)),
    )
    texts = _texts()
    pairs = list(zip(texts[:10], [" " + t for t in texts[10:20]]))

    single = JaxReaderLM(params, cfg, tok, batch_size=8)
    mesh = build_mesh()
    sharded = JaxReaderLM(params, cfg, tok, batch_size=8, mesh=mesh)
    ll_s = single.loglikelihood(pairs)
    ll_m = sharded.loglikelihood(pairs)
    np.testing.assert_allclose(
        [v for v, _ in ll_s], [v for v, _ in ll_m], rtol=1e-5, atol=1e-6
    )
    assert [g for _, g in ll_s] == [g for _, g in ll_m]


def test_reader_batch_size_rounds_up_to_mesh():
    import jax

    from retrieval_scaling_tpu.evals.perplexity import JaxReader
    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params

    tok = make_word_tokenizer(_texts())
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=1,
        num_heads=4, intermediate_size=64, max_position_embeddings=64,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    mesh = build_mesh()
    reader = JaxReader(params, cfg, tok, batch_size=3, mesh=mesh)
    assert reader.batch_size % mesh.shape["data"] == 0


def test_jax_reader_tensor_parallel_matches_single_device():
    """Megatron-layout reader TP over the mesh 'model' axis (the vLLM
    tensor_parallel_size analog) must reproduce single-device numbers."""
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.evals.perplexity import JaxReader
    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params

    tok = make_word_tokenizer(_texts())
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=64,
        attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    texts = _texts()
    contexts, targets = texts[:8], texts[8:16]

    single = JaxReader(params, cfg, tok, batch_size=4, dtype=jnp.float32)
    mesh = build_mesh(data_axis=4, model_axis=2)
    tp = JaxReader(
        params, cfg, tok, batch_size=4, dtype=jnp.float32,
        mesh=mesh, tensor_parallel=True,
    )
    np.testing.assert_allclose(
        single.score(contexts, targets), tp.score(contexts, targets),
        rtol=1e-4, atol=1e-5,
    )


def test_jax_reader_lm_tensor_parallel_matches_single_device():
    """JaxReaderLM tensor_parallel (the vLLM tensor_parallel_size analog):
    dp x tp scoring AND static greedy generation match single-device."""
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

    tok = make_word_tokenizer(_texts())
    cfg = GPTNeoXConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, max_position_embeddings=64,
        attention_impl="xla",
    )
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        init_gpt_neox_params(cfg, jax.random.PRNGKey(1)),
    )
    texts = _texts()
    pairs = list(zip(texts[:8], [" " + t for t in texts[8:16]]))
    reqs = [
        {"context": t, "gen_kwargs": {"max_new_tokens": 8, "until": []}}
        for t in texts[:4]
    ]

    single = JaxReaderLM(params, cfg, tok, batch_size=4)
    mesh = build_mesh(data_axis=4, model_axis=2)
    tp = JaxReaderLM(
        params, cfg, tok, batch_size=4, mesh=mesh, tensor_parallel=True
    )
    ll_s = single.loglikelihood(pairs)
    ll_t = tp.loglikelihood(pairs)
    np.testing.assert_allclose(
        [v for v, _ in ll_s], [v for v, _ in ll_t], rtol=1e-4, atol=1e-5
    )
    assert [g for _, g in ll_s] == [g for _, g in ll_t]
    assert single.generate_until(reqs) == tp.generate_until(reqs)

    # the slot-pool and speculative engines run under TP too (the vLLM
    # analog combines tensor_parallel_size with continuous batching):
    # greedy output stays token-exact vs the single-device static engine
    for engine in ("continuous", "speculative"):
        tp_e = JaxReaderLM(
            params, cfg, tok, batch_size=4, mesh=mesh, tensor_parallel=True,
            gen_engine=engine, draft_len=3,
        )
        assert tp_e.generate_until(reqs) == single.generate_until(reqs), engine


def test_jax_reader_tp_flash_shard_map_matches_single_device():
    """TP + the Pallas flash kernel: the attention_head_sharding context
    routes the kernel through shard_map over the 'model' axis (GSPMD would
    replicate a bare pallas_call), and numbers match single-device. Uses a
    GQA llama config so grouped K/V shard with the heads."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from retrieval_scaling_tpu.evals.perplexity import JaxReader
    from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params

    tok = make_word_tokenizer(_texts())
    cfg = LlamaConfig(
        vocab_size=tok.vocab_size + 10, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, intermediate_size=64,
        max_position_embeddings=64, attention_impl="flash",
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    texts = _texts()
    contexts, targets = texts[:8], texts[8:16]

    with pltpu.force_tpu_interpret_mode():
        single = JaxReader(params, cfg, tok, batch_size=4, dtype=jnp.float32)
        ref = single.score(contexts, targets)
        mesh = build_mesh(data_axis=4, model_axis=2)
        tp = JaxReader(
            params, cfg, tok, batch_size=4, dtype=jnp.float32,
            mesh=mesh, tensor_parallel=True,
        )
        got = tp.score(contexts, targets)
    np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)


def test_llama_reader_tp_specs_cover_params():
    import jax

    from retrieval_scaling_tpu.models.llama import LlamaConfig, init_llama_params
    from retrieval_scaling_tpu.parallel.reader_tp import reader_param_specs

    # plain llama, OLMo-2-style (post-output norms + full qk norm), and
    # Gemma-2-style (pre_post norms) trees must all be covered
    for kw in (
        {},
        {"norm_placement": "post_output", "qk_norm_full": True},
        {"norm_placement": "pre_post", "hidden_act": "gelu_tanh"},
    ):
        cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
            **kw,
        )
        params = init_llama_params(cfg, jax.random.PRNGKey(0))
        specs = reader_param_specs(params)
        # every param leaf has a spec leaf
        jax.tree.map(lambda p, s: None, params, specs,
                     is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))


def test_generation_identical_on_mesh():
    """generate_until batches shard over the mesh 'data' axis; greedy
    tokens must be identical to the single-device run."""
    import jax
    import jax.numpy as jnp

    from retrieval_scaling_tpu.models.generate import make_generate_fn
    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    from retrieval_scaling_tpu.parallel.mesh import build_mesh

    cfg = GPTNeoXConfig(
        vocab_size=96, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, attention_impl="xla",
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.RandomState(5)
    b = 8
    prompts = jnp.asarray(rng.randint(2, 96, (b, 10)), jnp.int32)
    lens = jnp.asarray(rng.randint(4, 11, (b,)), jnp.int32)

    single = make_generate_fn(cfg, 6, eos_id=0)
    mesh = build_mesh()
    sharded = make_generate_fn(cfg, 6, eos_id=0, mesh=mesh)
    a = np.asarray(single(params, prompts, lens, 0))
    bb = np.asarray(sharded(params, prompts, lens, 0))
    np.testing.assert_array_equal(a, bb)


def test_tp_specs_fit_odd_vocab():
    """Dims the mesh doesn't divide (GPT-2's 50257-vocab head under
    model=2) replicate instead of erroring."""
    import jax
    import numpy as np_

    from retrieval_scaling_tpu.models.gpt_neox import GPTNeoXConfig, init_gpt_neox_params
    from retrieval_scaling_tpu.parallel.reader_tp import reader_param_shardings

    cfg = GPTNeoXConfig(
        vocab_size=73, hidden_size=32, num_layers=1, num_heads=4,
        intermediate_size=64, max_position_embeddings=32,
    )
    params = init_gpt_neox_params(cfg, jax.random.PRNGKey(0))
    mesh = build_mesh(data_axis=4, model_axis=2)
    sh = reader_param_shardings(mesh, params)
    # odd vocab head falls back to replicated
    assert sh["embed_out"].spec == jax.sharding.PartitionSpec()
    # head-divisible projections stay sharded
    assert "model" in str(sh["layers"][0]["qkv_w"].spec)
