"""LM backends for the RAG evaluation harness.

Interface (the lm-eval ``LM`` contract, reference:
rag-evaluation-harness/lm_eval/api/model.py):

  * ``loglikelihood(pairs) -> [(ll_sum, is_greedy)]``
  * ``generate_until(reqs) -> [text]``

``JaxReaderLM`` drives the GPT-NeoX JAX reader (length-bucketed batches,
KV-cache generation); ``DummyLM`` is the deterministic fake backend for
tests (reference: lm_eval/models/dummy.py:10-40).
"""

from __future__ import annotations

import hashlib
import logging
from typing import List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def encode_pair(tokenizer, ctx: str, cont: str, eos_id: int):
    """(ctx_ids, cont_ids) — jointly encoded then split, lm-eval style.

    Tokenizing the continuation alone would prepend special tokens (BOS for
    llama/mistral tokenizers), scoring a spurious mid-sequence BOS as part
    of the continuation; the reference encodes the pair jointly and splits
    at the context length (lm_eval/models/huggingface.py ``_encode_pair``).
    Trailing context whitespace is moved onto the continuation so the split
    point falls on a token boundary.
    """
    n_spaces = len(ctx) - len(ctx.rstrip())
    if n_spaces > 0:
        cont = ctx[-n_spaces:] + cont
        ctx = ctx[:-n_spaces]
    if not ctx:
        return [eos_id], tokenizer(cont, add_special_tokens=False)["input_ids"]
    whole = tokenizer(ctx + cont)["input_ids"]
    ctx_ids = tokenizer(ctx)["input_ids"]
    cont_ids = whole[len(ctx_ids):]
    if not cont_ids:
        # Retokenization merged the boundary token; fall back to a plain
        # continuation encode so there is always something to score.
        cont_ids = tokenizer(cont, add_special_tokens=False)["input_ids"]
        ctx_ids = whole[: max(len(whole) - len(cont_ids), 1)]
    return ctx_ids, cont_ids


class DummyLM:
    """Deterministic fake: loglikelihoods hash the text; generations echo."""

    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        out = []
        for ctx, cont in pairs:
            h = int(hashlib.blake2b((ctx + "|" + cont).encode(), digest_size=8).hexdigest(), 16)
            out.append((-(h % 1000) / 100.0, bool(h % 2)))
        return out

    def generate_until(self, reqs: Sequence[dict]):
        return ["dummy answer" for _ in reqs]

    def loglikelihood_rolling(self, texts: Sequence[str]):
        return [-(len(t.split())) * 1.0 for t in texts]


class EchoAnswerLM:
    """Test backend that 'knows' answers embedded in the prompt context."""

    def __init__(self, answer_fn):
        self.answer_fn = answer_fn

    def loglikelihood(self, pairs):
        return [(-float(len(cont)), False) for _, cont in pairs]

    def generate_until(self, reqs):
        return [self.answer_fn(r["context"]) for r in reqs]


class JaxReaderLM:
    """JAX reader backend: GPT-NeoX/GPT-2/OPT, the llama family, and
    Mamba (recurrent SSM — replaces the reference's CUDA-only mamba_ssm
    backend, rag-evaluation-harness/lm_eval/models/mamba_lm.py)."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        batch_size: int = 8,
        max_length: int | None = None,
        mesh=None,
        quantization: str | None = None,
        kv_cache: str | None = None,
        gen_engine: str | None = None,
        draft_len: int = 7,
        tensor_parallel: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from retrieval_scaling_tpu.models.hf_convert import reader_logits

        if quantization not in (None, "", "none", "int8", "int4", "bf16"):
            raise ValueError(f"unknown reader quantization {quantization!r}")
        from retrieval_scaling_tpu.models.mamba import MambaConfig

        self._is_mamba = isinstance(cfg, MambaConfig)
        if self._is_mamba:
            # recurrent reader: scoring + static generation only (the KV-
            # cache engines — speculative/continuous — and the Megatron TP
            # layout are transformer-specific; quantize_decode_params
            # covers transformer weight layouts)
            bad = []
            if quantization in ("int8", "int4", "bf16"):
                bad.append(f"quantization={quantization}")
            if tensor_parallel:
                bad.append("tensor_parallel")
            if gen_engine in ("speculative", "continuous", "continuous_spec"):
                bad.append(f"gen_engine={gen_engine}")
            if kv_cache == "int8":
                bad.append("kv_cache=int8 (mamba has no KV cache)")
            if bad:
                raise ValueError(
                    "mamba readers do not support: " + ", ".join(bad)
                )
        if kv_cache not in (None, "", "none", "int8"):
            raise ValueError(f"unknown kv_cache {kv_cache!r}")
        self.kv_cache = kv_cache if kv_cache == "int8" else None
        if tensor_parallel and mesh is None:
            raise ValueError(
                "tensor_parallel=True requires a mesh (pass mesh=... or use "
                "the CLI's --model_args tensor_parallel=M, which builds one)"
            )
        self.tensor_parallel = bool(tensor_parallel)
        if self.tensor_parallel and quantization in ("int8", "int4", "bf16"):
            raise ValueError(
                "tensor_parallel and reader quantization are mutually "
                "exclusive (TP shard specs cover float keys only)"
            )
        if quantization in ("int8", "int4", "bf16"):
            # Weight-only int8 (per-output-channel): halves the decode
            # weight stream and quarters reader HBM vs f32. The model
            # forwards dispatch per-weight, so scoring AND generation run
            # off this one param set (models/generate.py
            # quantize_decode_params).
            from retrieval_scaling_tpu.models.generate import quantize_decode_params

            params = quantize_decode_params(params, cfg, scheme=quantization)

        self.cfg = cfg
        self.tokenizer = tokenizer
        # Data-parallel eval: the fixed batch splits over the mesh 'data'
        # axis (reference analog: HF-accelerate DDP,
        # lm_eval/models/huggingface.py:151-333).
        if mesh is not None and batch_size % mesh.shape["data"]:
            batch_size = -(-batch_size // mesh.shape["data"]) * mesh.shape["data"]
        self.batch_size = batch_size
        self.max_length = max_length or cfg.max_position_embeddings
        self.params = params
        self.mesh = mesh
        self._jnp = jnp
        self._jax = jax

        def row_ll_greedy(params, ids, labels):
            logits = reader_logits(params, cfg, ids)
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            mask = shift_labels != -100
            safe = jnp.where(mask, shift_labels, 0)
            logprobs = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
            token_ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
            ll = jnp.sum(token_ll * mask, axis=-1)
            greedy = jnp.argmax(shift_logits, axis=-1) == safe
            is_greedy = jnp.all(jnp.where(mask, greedy, True), axis=-1)
            return ll, is_greedy

        self._param_shardings = None
        if mesh is None:
            self._row_ll = jax.jit(row_ll_greedy)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rows = NamedSharding(mesh, P("data", None))
            rep = NamedSharding(mesh, P())
            if self.tensor_parallel:
                # Megatron layout over the mesh 'model' axis (the vLLM
                # tensor_parallel_size analog); the flash kernel routes
                # through shard_map via attention_head_sharding so GSPMD
                # never replicates the pallas_call.
                from retrieval_scaling_tpu.ops.flash_attention import (
                    attention_head_sharding,
                )
                from retrieval_scaling_tpu.parallel.reader_tp import (
                    reader_param_shardings,
                )

                self._param_shardings = reader_param_shardings(mesh, params)
                self.params = params = jax.device_put(params, self._param_shardings)

                def row_ll_tp(params, ids, labels):
                    with attention_head_sharding(mesh):
                        return row_ll_greedy(params, ids, labels)

                self._row_ll = jax.jit(
                    row_ll_tp,
                    in_shardings=(self._param_shardings, rows, rows),
                    out_shardings=(rep, rep),
                )
            else:
                # plain DP still needs the sharding context: scoring at
                # S >= 1024 takes the flash route on TPU, and GSPMD would
                # replicate the pallas_call across the data axis
                from retrieval_scaling_tpu.ops.flash_attention import (
                    attention_head_sharding,
                )

                def row_ll_dp(params, ids, labels):
                    with attention_head_sharding(mesh):
                        return row_ll_greedy(params, ids, labels)

                self._row_ll = jax.jit(
                    row_ll_dp,
                    in_shardings=(rep, rows, rows),
                    out_shardings=(rep, rep),
                )
        self._gen_fns = {}
        if gen_engine not in (
            None, "", "static", "continuous", "speculative", "continuous_spec",
        ):
            raise ValueError(f"unknown gen_engine {gen_engine!r}")
        self.gen_engine = gen_engine or "static"
        # tensor_parallel generation: static + speculative jits take the
        # Megatron param shardings explicitly; the slot-pool engines' jits
        # infer them from the sharded param arrays (GSPMD partitions the
        # decode einsums over 'model' — no pallas in the cache path).
        # speculative: prompt-lookup drafting + one-forward verification —
        # exact greedy equivalence, ~acceptance-rate x fewer decode rounds
        # on RAG workloads (generations copy retrieved-context spans)
        self.draft_len = int(draft_len)
        self._cb_engine = None
        self.apply_chat_template = chat_template_formatter(tokenizer)

    @classmethod
    def from_pretrained(
        cls, name_or_path: str, batch_size: int = 8, mesh=None,
        quantization: str | None = None, kv_cache: str | None = None,
        cache_dir: str | None = None, gen_engine: str | None = None,
        draft_len: int = 7, tensor_parallel: bool = False,
    ):
        from retrieval_scaling_tpu.models.hf_convert import load_hf_reader, load_tokenizer

        params, cfg = load_hf_reader(name_or_path, cache_dir=cache_dir)
        return cls(
            params, cfg, load_tokenizer(name_or_path), batch_size,
            mesh=mesh, quantization=quantization, kv_cache=kv_cache,
            gen_engine=gen_engine, draft_len=draft_len,
            tensor_parallel=tensor_parallel,
        )

    # ------------------------------------------------------------ ll
    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        jnp = self._jnp
        rows = []
        for i, (ctx, cont) in enumerate(pairs):
            ctx_ids, cont_ids = encode_pair(self.tokenizer, ctx, cont, self._eos_id())
            ids = (ctx_ids + cont_ids)[-self.max_length :]
            labels = ([-100] * len(ctx_ids) + cont_ids)[-self.max_length :]
            rows.append((i, ids, labels))

        rows.sort(key=lambda r: len(r[1]))
        out: List[Tuple[float, bool]] = [None] * len(rows)  # type: ignore[list-item]
        pad_id = self._eos_id()
        pos = 0
        while pos < len(rows):
            batch = rows[pos : pos + self.batch_size]
            width = _bucket(max(len(r[1]) for r in batch), self.max_length)
            ids_np = np.full((self.batch_size, width), pad_id, np.int32)
            lab_np = np.full((self.batch_size, width), -100, np.int32)
            for r, (_, ids, labels) in enumerate(batch):
                ids_np[r, : len(ids)] = ids
                lab_np[r, : len(labels)] = labels
            ll, greedy = self._row_ll(self.params, jnp.asarray(ids_np), jnp.asarray(lab_np))
            ll = np.asarray(ll, np.float64)
            greedy = np.asarray(greedy)
            for r, (orig, _, _) in enumerate(batch):
                out[orig] = (float(ll[r]), bool(greedy[r]))
            pos += self.batch_size
        return out

    def loglikelihood_rolling(self, texts: Sequence[str]):
        """Full-document loglikelihood in disjoint max_length windows
        (reference: lm-eval loglikelihood_rolling for wikitext-style
        word/byte perplexity): every token is scored exactly once, each
        window anchored by the previous token (EOS for the first).

        Windows from ALL documents pack together into length-sorted full
        batches, like ``loglikelihood`` does — one row per device forward
        would waste (batch_size-1)/batch_size of every pass."""
        jnp = self._jnp
        rows = []  # (doc_idx, row_ids, labels)
        for di, text in enumerate(texts):
            # no special tokens: a BOS would be scored as the first
            # "predicted" token of every document (lm-eval encodes rolling
            # text plain and anchors the first window with EOS)
            ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
            pos = 0
            while pos < len(ids):
                prev = self._eos_id() if pos == 0 else ids[pos - 1]
                window = ids[pos : pos + self.max_length - 1]
                rows.append((di, [prev] + window, [-100] + window))
                pos += len(window)

        rows.sort(key=lambda r: len(r[1]))
        totals = np.zeros(len(texts), np.float64)
        pad_id = self._eos_id()
        pos = 0
        while pos < len(rows):
            batch = rows[pos : pos + self.batch_size]
            width = _bucket(max(len(r[1]) for r in batch), self.max_length)
            ids_np = np.full((self.batch_size, width), pad_id, np.int32)
            lab_np = np.full((self.batch_size, width), -100, np.int32)
            for r, (_, row_ids, labels) in enumerate(batch):
                ids_np[r, : len(row_ids)] = row_ids
                lab_np[r, : len(labels)] = labels
            ll, _ = self._row_ll(self.params, jnp.asarray(ids_np), jnp.asarray(lab_np))
            ll = np.asarray(ll, np.float64)
            for r, (di, _, _) in enumerate(batch):
                totals[di] += ll[r]
            pos += self.batch_size
        return totals.tolist()

    # ------------------------------------------------------------ gen
    def _eos_id(self) -> int:
        return (
            self.tokenizer.eos_token_id
            if self.tokenizer.eos_token_id is not None
            else (self.tokenizer.pad_token_id or 0)
        )

    def _gen_fn(self, max_new: int, temperature: float = 0.0):
        key = (max_new, temperature)
        if key not in self._gen_fns:
            if self._is_mamba:
                from retrieval_scaling_tpu.models.mamba import (
                    make_mamba_generate_fn,
                )

                self._gen_fns[key] = make_mamba_generate_fn(
                    self.cfg, max_new, self._eos_id(),
                    temperature=temperature, mesh=self.mesh,
                )
            elif self.gen_engine == "speculative":
                from retrieval_scaling_tpu.models.speculative import (
                    make_speculative_generate_fn,
                )

                # temperature > 0 runs speculative rejection sampling —
                # distribution-identical to the static sampler
                self._gen_fns[key] = make_speculative_generate_fn(
                    self.cfg, max_new, self._eos_id(), draft_len=self.draft_len,
                    kv_cache=self.kv_cache, mesh=self.mesh,
                    temperature=temperature,
                    param_shardings=self._param_shardings,
                )
            else:
                from retrieval_scaling_tpu.models.generate import make_generate_fn

                self._gen_fns[key] = make_generate_fn(
                    self.cfg, max_new, self._eos_id(), kv_cache=self.kv_cache,
                    temperature=temperature, mesh=self.mesh,
                    param_shardings=self._param_shardings,
                )
        return self._gen_fns[key]

    def _gen_headroom(self) -> int:
        # speculative verify segments write draft_len+1 positions past the
        # last real token; shave the prompt budget ONLY by however much
        # that overflows the position-embedding table, so prompt truncation
        # (and therefore the generated text) matches the static engine
        # whenever max_length leaves any slack
        if self.gen_engine != "speculative":
            return 0
        overflow = (
            self.max_length + self.draft_len + 1
            - self.cfg.max_position_embeddings
        )
        return max(0, overflow)

    def _generate_continuous(self, reqs: Sequence[dict]) -> List[str]:
        """Continuous-batching generate_until: slot-based admission removes
        head-of-line blocking on mixed-length workloads (reference bar:
        lm_eval/models/vllm_causallms.py continuous batching)."""
        from retrieval_scaling_tpu.models.continuous_batching import ContinuousBatcher

        eos = self._eos_id()
        if self._cb_engine is None:
            self._cb_engine = ContinuousBatcher(
                self.params, self.cfg, eos,
                slots=self.batch_size, max_len=self.max_length,
                speculative=self.gen_engine == "continuous_spec",
                draft_len=self.draft_len,
                mesh=self.mesh if self.tensor_parallel else None,
            )
        engine = self._cb_engine
        requests = []
        stops: List[List[str]] = []
        for r in reqs:
            max_new = r["gen_kwargs"].get("max_gen_toks", 32)
            ids = self.tokenizer(r["context"])["input_ids"]
            # the engine clamps (prompt, max_new) to its pool invariants
            requests.append((ids, max_new))
            stops.append([s for s in r["gen_kwargs"].get("until", []) if s])

        def decode(toks: List[int]) -> str:
            return self.tokenizer.decode(
                [t for t in toks if t != eos], skip_special_tokens=True
            )

        # per-chunk stop checks decode only a tail window: re-decoding the
        # full accumulated list every chunk is O(n^2) in generated length
        # (48 tokens comfortably covers any stop string plus boundary slop)
        def stop_check(i: int, toks: List[int]) -> bool:
            return bool(stops[i]) and any(s in decode(toks[-48:]) for s in stops[i])

        out = []
        for i, toks in enumerate(engine.generate(requests, stop_check)):
            text = decode(toks)
            for stop in stops[i]:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            out.append(text)
        return out

    @staticmethod
    def _req_temperature(r: dict) -> float:
        # vLLM-backend semantics (this backend's reference analog,
        # lm_eval/models/vllm_causallms.py:495-497 modify_gen_kwargs):
        # do_sample=False or missing temperature -> greedy; a present
        # temperature otherwise samples. (The HF backend differs — it
        # inherits GenerationConfig's do_sample=False — but task YAMLs
        # that want greedy set do_sample: false explicitly.)
        gk = r.get("gen_kwargs", {})
        if not gk.get("do_sample", True):
            return 0.0
        return max(float(gk.get("temperature", 0.0)), 0.0)

    def generate_until(self, reqs: Sequence[dict]):
        if self.gen_engine in ("continuous", "continuous_spec"):
            # the slot-pool engines decode greedily; requests that ask for
            # sampling route through the static sampled path instead of
            # having their temperature silently dropped
            sampled = [i for i, r in enumerate(reqs) if self._req_temperature(r) > 0]
            if not sampled:
                return self._generate_continuous(reqs)
            greedy = [i for i in range(len(reqs)) if self._req_temperature(reqs[i]) == 0]
            results = [""] * len(reqs)
            if greedy:
                for i, text in zip(greedy, self._generate_continuous([reqs[i] for i in greedy])):
                    results[i] = text
            sampled_out = self._generate_static([reqs[i] for i in sampled])
            for i, text in zip(sampled, sampled_out):
                results[i] = text
            return results
        return self._generate_static(reqs)

    def _generate_static(self, reqs: Sequence[dict]):
        jnp = self._jnp
        results: List[str] = [""] * len(reqs)
        # temperature-homogeneous batches: sort by (temperature, length)
        # and never let a batch span a temperature boundary
        order = sorted(
            range(len(reqs)),
            key=lambda i: (self._req_temperature(reqs[i]), len(reqs[i]["context"])),
        )
        pos = 0
        while pos < len(order):
            temp = self._req_temperature(reqs[order[pos]])
            take = [
                i for i in order[pos : pos + self.batch_size]
                if self._req_temperature(reqs[i]) == temp
            ]
            batch = [reqs[i] for i in take]
            max_new = max(r["gen_kwargs"].get("max_gen_toks", 32) for r in batch)
            # keep at least 16 prompt tokens even when max_gen_toks >= the
            # model context (a `[-0:]` slice would keep everything and
            # overflow the position budget)
            budget = self.max_length - self._gen_headroom()
            max_new = min(max_new, budget - 16)
            enc = [
                self.tokenizer(r["context"])["input_ids"][-(budget - max_new):]
                for r in batch
            ]
            lens = [len(e) for e in enc]
            width = _bucket(max(lens), budget - max_new)
            ids_np = np.full((self.batch_size, width), self._eos_id(), np.int32)
            len_np = np.ones(self.batch_size, np.int32)
            for r, e in enumerate(enc):
                ids_np[r, : len(e)] = e
                len_np[r] = len(e)
            tokens = np.asarray(
                self._gen_fn(max_new, temp)(
                    self.params, jnp.asarray(ids_np), jnp.asarray(len_np), pos
                )
            )
            for r, i in enumerate(take):
                # a mixed batch decodes to the BATCH max; honor each
                # request's own max_gen_toks (lm-eval semantics)
                own_max = reqs[i]["gen_kwargs"].get("max_gen_toks", 32)
                text = self.tokenizer.decode(
                    [t for t in tokens[r, :own_max].tolist() if t != self._eos_id()],
                    skip_special_tokens=True,
                )
                for stop in reqs[i]["gen_kwargs"].get("until", []):
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
                results[i] = text
            pos += len(take)
        return results


def chat_template_formatter(tokenizer):
    """Backend helper: render a prompt through the tokenizer's chat template
    (reference: lm_eval --apply_chat_template)."""

    def fmt(context: str, system_instruction=None, shots=None) -> str:
        messages = []
        if system_instruction:
            messages.append({"role": "system", "content": system_instruction})
        for shot_q, shot_a in shots or []:  # fewshot_as_multiturn
            messages.append({"role": "user", "content": shot_q})
            messages.append({"role": "assistant", "content": shot_a})
        messages.append({"role": "user", "content": context})
        return tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )

    return fmt


def _bucket(length: int, cap: int) -> int:
    b = 32
    while b < length:
        b *= 2
    return min(b, max(cap, 1))


class HFTorchLM:
    """HF transformers (torch) backend — the reference's HFLM analog
    (reference: rag-evaluation-harness/lm_eval/models/huggingface.py:68+).

    Host-side torch (CPU in this image); useful for cross-checking the JAX
    backend numerically and for architectures without a JAX port yet.
    """

    def __init__(self, model, tokenizer, batch_size: int = 4, max_length: int | None = None):
        self.model = model.eval()
        self.tokenizer = tokenizer
        self.apply_chat_template = chat_template_formatter(tokenizer)
        self.batch_size = batch_size
        self.max_length = max_length or getattr(model.config, "max_position_embeddings", 2048)

    @classmethod
    def from_pretrained(cls, name_or_path: str, batch_size: int = 4, dtype: str = "float32"):
        import torch
        import transformers

        model = transformers.AutoModelForCausalLM.from_pretrained(
            name_or_path, torch_dtype=getattr(torch, dtype)
        )
        tokenizer = transformers.AutoTokenizer.from_pretrained(name_or_path)
        return cls(model, tokenizer, batch_size=batch_size)

    def _eos_id(self) -> int:
        return (
            self.tokenizer.eos_token_id
            if self.tokenizer.eos_token_id is not None
            else (self.tokenizer.pad_token_id or 0)
        )

    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        import torch

        results = []
        for pos in range(0, len(pairs), self.batch_size):
            batch = pairs[pos : pos + self.batch_size]
            rows = []
            for ctx, cont in batch:
                ctx_ids, cont_ids = encode_pair(self.tokenizer, ctx, cont, self._eos_id())
                ids = (ctx_ids + cont_ids)[-self.max_length:]
                n_cont = min(len(cont_ids), len(ids) - 1)
                rows.append((ids, n_cont))
            width = max(len(ids) for ids, _ in rows)
            ids_t = torch.full((len(rows), width), self._eos_id(), dtype=torch.long)
            for r, (ids, _) in enumerate(rows):
                ids_t[r, : len(ids)] = torch.tensor(ids)
            with torch.no_grad():
                logits = self.model(ids_t).logits.float()
            logprobs = torch.log_softmax(logits, dim=-1)
            for r, (ids, n_cont) in enumerate(rows):
                # position t predicts token t+1
                tgt = torch.tensor(ids[len(ids) - n_cont:])
                pred_rows = logprobs[r, len(ids) - n_cont - 1 : len(ids) - 1]
                token_ll = pred_rows.gather(-1, tgt[:, None])[:, 0]
                greedy = bool((pred_rows.argmax(-1) == tgt).all())
                results.append((float(token_ll.sum()), greedy))
        return results

    def loglikelihood_rolling(self, texts: Sequence[str]):
        import torch

        out = []
        for text in texts:
            ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
            total, pos = 0.0, 0
            while pos < len(ids):
                prev = self._eos_id() if pos == 0 else ids[pos - 1]
                window = ids[pos : pos + self.max_length - 1]
                row = torch.tensor([[prev] + window])
                with torch.no_grad():
                    logits = self.model(row).logits.float()
                logprobs = torch.log_softmax(logits, dim=-1)
                tgt = torch.tensor(window)
                total += float(logprobs[0, :-1].gather(-1, tgt[:, None]).sum())
                pos += len(window)
            out.append(total)
        return out

    def generate_until(self, reqs: Sequence[dict]):
        import torch

        results = []
        for req in reqs:
            max_new = req["gen_kwargs"].get("max_gen_toks", 32)
            ids = self.tokenizer(req["context"])["input_ids"][-(self.max_length - max_new):]
            with torch.no_grad():
                out = self.model.generate(
                    torch.tensor(ids)[None],
                    max_new_tokens=max_new,
                    do_sample=False,
                    pad_token_id=self._eos_id(),
                    eos_token_id=self._eos_id(),
                )
            text = self.tokenizer.decode(out[0, len(ids):].tolist(), skip_special_tokens=True)
            for stop in req["gen_kwargs"].get("until", []):
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            results.append(text)
        return results


class OpenAICompatLM:
    """Backend for OpenAI-compatible completion APIs (vLLM serve, llama.cpp,
    OpenAI, ...) — the reference's API-model backends analog
    (reference: lm_eval/models/openai_completions.py, anthropic_llms.py).

    Uses the legacy /v1/completions surface because loglikelihood scoring
    needs ``echo=True`` + ``logprobs``; generation works on any server.
    No SDK dependency — plain urllib against ``base_url``.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        batch_size: int = 8,
        timeout_s: float = 120.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.batch_size = batch_size
        self.timeout_s = timeout_s

    # ------------------------------------------------------------ http
    def _post(self, route: str, payload: dict) -> dict:
        import json as _json
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.base_url + route, data=_json.dumps(payload).encode(), headers=headers
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return _json.loads(resp.read())

    # ------------------------------------------------------------ api
    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        """Sum of continuation-token logprobs via echo=True + logprobs.

        The continuation's token span is located by character offset —
        the lm-eval approach for completion APIs."""
        out = []
        for ctx, cont in pairs:
            resp = self._post(
                "/v1/completions",
                {
                    "model": self.model,
                    "prompt": ctx + cont,
                    "max_tokens": 0,
                    "echo": True,
                    "logprobs": 1,
                    "temperature": 0.0,
                },
            )
            lp = resp["choices"][0]["logprobs"]
            offsets = lp["text_offset"]
            token_lps = lp["token_logprobs"]
            top = lp.get("top_logprobs") or [None] * len(token_lps)
            start = len(ctx)
            ll, greedy = 0.0, True
            for i, off in enumerate(offsets):
                if off >= start and token_lps[i] is not None:
                    ll += token_lps[i]
                    if top[i]:
                        best = max(top[i].values())
                        greedy = greedy and token_lps[i] >= best - 1e-8
            out.append((ll, greedy))
        return out

    def generate_until(self, reqs: Sequence[dict]):
        results = []
        for req in reqs:
            gen = req["gen_kwargs"]
            resp = self._post(
                "/v1/completions",
                {
                    "model": self.model,
                    "prompt": req["context"],
                    "max_tokens": gen.get("max_gen_toks", 32),
                    "temperature": 0.0,
                    "stop": gen.get("until", None),
                },
            )
            results.append(resp["choices"][0]["text"])
        return results


class AnthropicCompatLM:
    """Backend for Anthropic-compatible Messages APIs — the reference's
    anthropic_llms.py analog (reference: lm_eval/models/anthropic_llms.py).

    The Messages surface exposes no logprobs, so like the reference this
    backend supports ``generate_until`` only and raises on loglikelihood
    requests. No SDK dependency — plain urllib against ``base_url``.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        batch_size: int = 8,
        timeout_s: float = 120.0,
        anthropic_version: str = "2023-06-01",
        system: str | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.batch_size = batch_size
        self.timeout_s = timeout_s
        self.anthropic_version = anthropic_version
        self.system = system

    # Transient statuses worth retrying (rate limit, overloaded, 5xx) —
    # the reference backend retries via the SDK's retry_on_specific_exceptions
    # (reference: lm_eval/models/anthropic_llms.py).
    _RETRY_STATUSES = frozenset({408, 409, 429, 500, 502, 503, 504, 529})
    _MAX_RETRIES = 5

    def _post(self, route: str, payload: dict) -> dict:
        import json as _json
        import time
        import urllib.error
        import urllib.request

        headers = {
            "Content-Type": "application/json",
            "anthropic-version": self.anthropic_version,
        }
        if self.api_key:
            headers["x-api-key"] = self.api_key
        data = _json.dumps(payload).encode()
        for attempt in range(self._MAX_RETRIES + 1):
            req = urllib.request.Request(
                self.base_url + route, data=data, headers=headers
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return _json.loads(resp.read())
            except urllib.error.HTTPError as e:
                if e.code not in self._RETRY_STATUSES or attempt == self._MAX_RETRIES:
                    raise
                delay = min(2.0**attempt, 30.0)
                retry_after = e.headers.get("retry-after") if e.headers else None
                if retry_after:
                    try:
                        delay = max(delay, float(retry_after))
                    except ValueError:
                        pass
                logger.warning(
                    "Anthropic API %d on %s; retry %d/%d in %.1fs",
                    e.code, route, attempt + 1, self._MAX_RETRIES, delay,
                )
                time.sleep(delay)
            except urllib.error.URLError:
                if attempt == self._MAX_RETRIES:
                    raise
                time.sleep(min(2.0**attempt, 30.0))
        raise RuntimeError("unreachable")

    def loglikelihood(self, pairs: Sequence[Tuple[str, str]]):
        raise NotImplementedError(
            "Anthropic Messages API exposes no logprobs; loglikelihood/"
            "multiple_choice tasks need a logits backend (reference parity: "
            "lm_eval/models/anthropic_llms.py raises the same)"
        )

    def loglikelihood_rolling(self, texts: Sequence[str]):
        raise NotImplementedError(
            "Anthropic Messages API exposes no logprobs (see loglikelihood)"
        )

    def generate_until(self, reqs: Sequence[dict]):
        results = []
        for req in reqs:
            gen = req["gen_kwargs"]
            # honor sampling kwargs (reference backends pass temperature
            # through); default remains greedy
            temperature = float(gen.get("temperature", 0.0))
            if not gen.get("do_sample", True):
                temperature = 0.0
            payload = {
                "model": self.model,
                "max_tokens": gen.get("max_gen_toks", 32),
                "temperature": temperature,
                "messages": [{"role": "user", "content": req["context"]}],
            }
            if self.system:
                payload["system"] = self.system
            until = [s for s in gen.get("until", []) if s.strip()]
            if until:
                # the API rejects whitespace-only stop sequences
                payload["stop_sequences"] = until
            resp = self._post("/v1/messages", payload)
            text = "".join(
                block.get("text", "")
                for block in resp.get("content", [])
                if block.get("type", "text") == "text"
            )
            # API stops BEFORE emitting the stop sequence, but lm-eval
            # semantics truncate at the first occurrence anyway in case the
            # server echoed it.
            for stop in gen.get("until", []):
                if stop and stop in text:
                    text = text.split(stop)[0]
            results.append(text)
        return results
