"""CLI for the RAG evaluation harness.

Mirrors the reference's lm_eval CLI including the RAG flags
(reference: rag-evaluation-harness/lm_eval/__main__.py:253-304):

    python -m retrieval_scaling_tpu.rag_eval \
        --model jax --model_args pretrained=EleutherAI/pythia-1b \
        --tasks nq_open --data_root data/ \
        --retrieval_file results.jsonl --concat_k 3 \
        --results_only_save_path results.log
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def parse_model_args(spec: str) -> dict:
    out = {}
    if spec:
        for part in spec.split(","):
            key, _, val = part.partition("=")
            out[key.strip()] = val.strip()
    return out


def build_lm(model: str, model_args: dict, batch_size: int, data_parallel: int = 1):
    if model == "dummy":
        from retrieval_scaling_tpu.rag_eval.models import DummyLM

        return DummyLM()
    if model in ("jax", "jax-reader", "hf"):
        from retrieval_scaling_tpu.rag_eval.models import JaxReaderLM

        mesh = None
        # the vLLM backend's tensor_parallel_size analog
        # (reference: lm_eval/models/vllm_causallms.py:34)
        tensor_parallel = int(model_args.get("tensor_parallel", 1))
        if data_parallel > 1 or tensor_parallel > 1:
            # DDP analog: batches shard over the mesh 'data' axis
            # (reference: accelerate multi-GPU, lm_eval/models/huggingface.py:151-333).
            import jax

            from retrieval_scaling_tpu.parallel.mesh import build_mesh

            mesh = build_mesh(
                data_axis=data_parallel, model_axis=tensor_parallel,
                devices=jax.devices()[: data_parallel * tensor_parallel],
            )
        return JaxReaderLM.from_pretrained(
            model_args["pretrained"], batch_size=batch_size, mesh=mesh,
            quantization=model_args.get("quantization"),
            kv_cache=model_args.get("kv_cache"),
            cache_dir=model_args.get("cache_dir"),
            gen_engine=model_args.get("gen_engine"),
            draft_len=int(model_args.get("draft_len", 7)),
            tensor_parallel=tensor_parallel > 1,
        )
    if model in ("openai", "openai-completions", "local-completions"):
        from retrieval_scaling_tpu.rag_eval.models import OpenAICompatLM

        return OpenAICompatLM(
            base_url=model_args.get("base_url", "https://api.openai.com"),
            model=model_args.get("model", model_args.get("pretrained", "")),
            api_key=model_args.get("api_key", None),
            batch_size=batch_size,
        )
    if model in ("anthropic", "anthropic-chat"):
        from retrieval_scaling_tpu.rag_eval.models import AnthropicCompatLM

        return AnthropicCompatLM(
            base_url=model_args.get("base_url", "https://api.anthropic.com"),
            model=model_args.get("model", model_args.get("pretrained", "")),
            api_key=model_args.get("api_key", None),
            batch_size=batch_size,
        )
    if model == "hf-torch":
        from retrieval_scaling_tpu.rag_eval.models import HFTorchLM

        return HFTorchLM.from_pretrained(
            model_args["pretrained"],
            batch_size=batch_size,
            dtype=model_args.get("dtype", "float32"),
        )
    raise ValueError(f"unknown model backend {model!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="jax")
    parser.add_argument("--model_args", default="")
    parser.add_argument(
        "--tasks", required=True,
        help="comma-separated task names; 'list' prints the registry and exits",
    )
    parser.add_argument("--num_fewshot", type=int, default=None)
    parser.add_argument(
        "--batch_size", default="8",
        help="int, or the reference's 'auto'/'auto:N' (XLA scoring runs "
        "fixed length-bucketed shapes, so auto resolves to the default "
        "batch and auto:N to N)",
    )
    parser.add_argument(
        "--data_parallel", type=int, default=1,
        help="shard reader batches over this many devices (DDP analog)",
    )
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--output_path", default=None)
    # RAG flags (reference: lm_eval/__main__.py:253-304)
    parser.add_argument(
        "--use_cache", default=None,
        help="path to a request-cache sqlite file (reference: lm_eval --use_cache)",
    )
    parser.add_argument("--save_inputs_only", action="store_true")
    parser.add_argument("--inputs_save_dir", default=None)
    parser.add_argument("--answer_save_dir", default=None)
    parser.add_argument("--overwrite_saved_inputs", action="store_true")
    parser.add_argument("--retrieval_file", default=None)
    parser.add_argument("--retrieval_dir", default=None)
    parser.add_argument("--concat_k", type=int, default=0)
    parser.add_argument("--additional_system_prompt", default=None)
    parser.add_argument("--apply_chat_template", action="store_true")
    parser.add_argument("--system_instruction", default=None)
    parser.add_argument("--fewshot_as_multiturn", action="store_true")
    parser.add_argument(
        "--decontamination_ngrams", type=int, default=0,
        help="drop retrieved ctxs sharing an n-gram with the eval set",
    )
    parser.add_argument(
        "--log_to", default=None,
        help="result sinks, e.g. jsonl:out.jsonl,wandb:myproject",
    )
    parser.add_argument("--results_only_save_path", default=None)
    parser.add_argument(
        "--bootstrap_iters", type=int, default=1000,
        help="bootstrap iterations for stderr of set-level metrics; 0 disables stderr",
    )
    parser.add_argument(
        "--log_samples", action="store_true",
        help="write per-instance prompt/response/metric records (samples_<task>.jsonl)",
    )
    parser.add_argument(
        "--predict_only", action="store_true",
        help="generate and log predictions without computing metrics (implies --log_samples)",
    )
    parser.add_argument(
        "--cache_dir", default=None,
        help="dataset ingestion cache directory ({task}/{split}.jsonl files)",
    )
    # remaining reference-CLI flags (reference: lm_eval/__main__.py)
    parser.add_argument(
        "--gen_kwargs", default=None,
        help="key=value[,key=value..] merged into every generate_until "
        "request (e.g. temperature=0.7,do_sample=True,max_gen_toks=64)",
    )
    parser.add_argument(
        "--seed", default=None,
        help="one int, or up to 4 comma-separated ints seeding "
        "python,numpy,torch,fewshot-sampling (reference --seed format)",
    )
    parser.add_argument(
        "--include_path", default=None,
        help="extra task-config YAML directory (searched before built-ins); "
        "os.pathsep-separated list allowed",
    )
    parser.add_argument(
        "--write_out", action="store_true",
        help="log each task's first rendered prompt and target",
    )
    parser.add_argument(
        "--show_config", action="store_true",
        help="print the resolved run configuration before evaluating",
    )
    parser.add_argument(
        "--check_integrity", action="store_true",
        help="fail fast if a requested task has no docs or renders an empty prompt",
    )
    parser.add_argument("--verbosity", default="INFO")
    parser.add_argument(
        "--wandb_args", default=None,
        help="wandb init args, e.g. project=rag-eval,name=run1",
    )
    parser.add_argument(
        "--device", default=None,
        help="force a JAX platform for the run (cpu/tpu); default = auto",
    )
    parser.add_argument(
        "--max_batch_size", type=int, default=None,
        help="upper bound on --batch_size",
    )
    parser.add_argument(
        "--trust_remote_code", action="store_true",
        help="allow HF datasets ingestion to run dataset scripts",
    )
    parser.add_argument(
        "--cache_requests", default=None,
        help="accepted for reference-CLI compatibility; request construction "
        "here reads the local/ingested jsonl cache directly (see --cache_dir)",
    )
    parser.add_argument(
        "--hf_hub_log_args", default=None,
        help="accepted for reference-CLI compatibility; no hub telemetry here",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=getattr(logging, str(args.verbosity).upper(), logging.INFO),
        stream=sys.stdout,
    )
    # reference interop: --batch_size auto / auto:N (HF backend memory
    # probing). Scoring here compiles fixed length-bucketed shapes, so
    # "auto" keeps the default batch and "auto:N" takes N.
    bs = str(args.batch_size)
    if bs.startswith("auto"):
        _, _, n = bs.partition(":")
        args.batch_size = int(n) if n.strip() else 8
        logging.getLogger(__name__).info(
            "--batch_size %s -> %d (fixed-shape XLA batching)", bs, args.batch_size
        )
    else:
        args.batch_size = int(bs)
    if args.device:
        # must land before the first jax import in build_lm
        import os as _os

        _os.environ["JAX_PLATFORMS"] = args.device
    if args.trust_remote_code:
        import os as _os

        _os.environ["HF_DATASETS_TRUST_REMOTE_CODE"] = "1"
    if args.include_path:
        import os as _os

        from retrieval_scaling_tpu.rag_eval.tasks import register_task_dir

        for p in args.include_path.split(_os.pathsep):
            if p:
                register_task_dir(p)
    if args.max_batch_size is not None:
        args.batch_size = min(args.batch_size, args.max_batch_size)
    if args.cache_requests:
        logging.getLogger(__name__).info(
            "--cache_requests: request construction reads the on-disk "
            "ingestion cache directly; nothing further to cache"
        )

    fewshot_seed = 1234
    if args.seed is not None:
        import random as _random

        parts = [s.strip() for s in str(args.seed).split(",")]
        if len(parts) == 1:
            parts = parts * 4
        if parts[0] not in ("", "None"):
            _random.seed(int(parts[0]))
        if len(parts) > 1 and parts[1] not in ("", "None"):
            import numpy as _np

            _np.random.seed(int(parts[1]))
        if len(parts) > 2 and parts[2] not in ("", "None"):
            try:
                import torch as _torch

                _torch.manual_seed(int(parts[2]))
            except ImportError:
                pass
        if len(parts) > 3 and parts[3] not in ("", "None"):
            fewshot_seed = int(parts[3])

    gen_kwargs = None
    if args.gen_kwargs:
        import ast

        gen_kwargs = {}
        for part in args.gen_kwargs.split(","):
            key, _, val = part.partition("=")
            try:
                gen_kwargs[key.strip()] = ast.literal_eval(val.strip())
            except (ValueError, SyntaxError):
                gen_kwargs[key.strip()] = val.strip()

    if args.show_config:
        print(json.dumps({k: v for k, v in vars(args).items()}, indent=2, default=str))

    if args.tasks == "list":
        from retrieval_scaling_tpu.rag_eval.tasks import list_tasks

        print("\n".join(list_tasks()))
        return None

    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate

    lm = build_lm(args.model, parse_model_args(args.model_args), args.batch_size, args.data_parallel)
    if args.use_cache:
        from retrieval_scaling_tpu.rag_eval.caching import CachingLM

        lm = CachingLM(lm, args.use_cache, model_tag=f"{args.model}:{args.model_args}")
    from retrieval_scaling_tpu.rag_eval.loggers import build_loggers

    extra_loggers = []
    if args.wandb_args:
        from retrieval_scaling_tpu.rag_eval.loggers import WandbLogger

        wb = {}
        for part in args.wandb_args.split(","):
            key, _, val = part.partition("=")
            wb[key.strip()] = val.strip()
        extra_loggers.append(
            WandbLogger(
                project=wb.pop("project", "rag-eval"),
                run_name=wb.pop("name", wb.pop("run_name", None)),
                **wb,
            )
        )

    samples_save_dir = None
    if args.log_samples or args.predict_only:
        import os

        samples_save_dir = (
            os.path.dirname(os.path.abspath(args.output_path))
            if args.output_path
            else os.getcwd()
        )

    results = simple_evaluate(
        lm,
        tasks=args.tasks.split(","),
        num_fewshot=args.num_fewshot,
        decontamination_ngrams=args.decontamination_ngrams,
        loggers=build_loggers(args.log_to) + extra_loggers,
        data_root=args.data_root,
        limit=args.limit,
        save_inputs_only=args.save_inputs_only,
        inputs_save_dir=args.inputs_save_dir,
        answer_save_dir=args.answer_save_dir,
        overwrite_saved_inputs=args.overwrite_saved_inputs,
        retrieval_file=args.retrieval_file,
        retrieval_dir=args.retrieval_dir,
        concat_k=args.concat_k,
        additional_system_prompt=args.additional_system_prompt,
        results_only_save_path=args.results_only_save_path,
        apply_chat_template=args.apply_chat_template,
        system_instruction=args.system_instruction,
        fewshot_as_multiturn=args.fewshot_as_multiturn,
        bootstrap_iters=args.bootstrap_iters,
        log_samples=args.log_samples,
        predict_only=args.predict_only,
        samples_save_dir=samples_save_dir,
        cache_dir=args.cache_dir,
        gen_kwargs=gen_kwargs,
        fewshot_seed=fewshot_seed,
        write_out=args.write_out,
        check_integrity=args.check_integrity,
    )
    if results is not None:
        printable = {k: v for k, v in results.items() if k != "samples"}
        print(json.dumps(printable, indent=2))
        if args.output_path:
            with open(args.output_path, "w") as f:
                json.dump(printable, f, indent=2)


if __name__ == "__main__":
    main()
