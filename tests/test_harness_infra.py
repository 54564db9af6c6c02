"""Harness infra: n-gram janitor, fewshot samplers, result loggers
(reference: lm_eval/decontamination/, lm_eval/api/samplers.py,
lm_eval/loggers/)."""

import json

import numpy as np
import pytest


# ---------------------------------------------------------------- janitor
def test_janitor_detects_and_cleans():
    from retrieval_scaling_tpu.rag_eval.janitor import Janitor

    contaminant = "the quick brown fox jumps over the lazy dog every single day"
    jan = Janitor(ngram_n=5, window_to_remove=10, minimum_slice_length=5)
    jan.register_contaminant(contaminant)

    # normalization: punctuation/case must not block the match
    dirty = "Prefix words here. The QUICK, brown fox JUMPS over... the lazy dog and more trailing words follow here"
    assert jan.is_contaminated(dirty)
    slices = jan.clean(dirty)
    assert all("quick" not in s.lower() or "jumps" not in s.lower() for s in slices)
    assert jan.ngrams_removed > 0

    clean_text = "completely unrelated content about mountains and rivers flowing"
    assert not jan.is_contaminated(clean_text)
    assert jan.clean(clean_text) == [clean_text]


def test_janitor_too_dirty_drops_document():
    from retrieval_scaling_tpu.rag_eval.janitor import Janitor

    words = [f"w{i}" for i in range(100)]
    text = " ".join(words)
    jan = Janitor(ngram_n=3, too_dirty_cutoff=5)
    jan.register_contaminant(text)
    assert jan.clean(text) == []  # every 3-gram matches -> dropped


def test_decontaminate_ctxs():
    from retrieval_scaling_tpu.rag_eval.janitor import decontaminate_ctxs

    eval_doc = "what is the capital city of the republic of france exactly"
    rows = [
        {
            "raw_query": "q1",
            "ctxs": [
                {"retrieval text": "the capital city of the republic of france exactly matches"},
                {"retrieval text": "unrelated passage about something else entirely different"},
            ],
        }
    ]
    out, removed = decontaminate_ctxs([eval_doc], rows, ngram_n=5)
    assert removed == 1
    assert len(out[0]["ctxs"]) == 1
    assert "unrelated" in out[0]["ctxs"][0]["retrieval text"]


def test_evaluator_decontamination_flag(tmp_path):
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
    from retrieval_scaling_tpu.rag_eval.models import EchoAnswerLM

    d = tmp_path / "nq_open"
    d.mkdir()
    q = "alpha beta gamma delta epsilon zeta eta theta"
    with open(d / "validation.jsonl", "w") as f:
        f.write(json.dumps({"question": q, "answer": ["iota"]}) + "\n")
    # ctx contains the full question -> contaminated at n=5
    rfile = tmp_path / "retrieval.jsonl"
    with open(rfile, "w") as f:
        f.write(json.dumps({
            "raw_query": f"Q: {q}?\nA:",
            "ctxs": [{"retrieval text": f"Q {q} A iota", "retrieval score": "9"}],
        }) + "\n")

    seen = []

    class SpyLM:
        def generate_until(self, reqs):
            seen.extend(r["context"] for r in reqs)
            return ["iota" for _ in reqs]

        def loglikelihood(self, pairs):
            return [(0.0, True) for _ in pairs]

    simple_evaluate(
        SpyLM(), ["nq_open"], data_root=str(tmp_path),
        retrieval_file=str(rfile), concat_k=1, decontamination_ngrams=5,
    )
    assert seen and all("iota" not in ctx.split("?")[0] for ctx in seen)


# ---------------------------------------------------------------- samplers
def _mc_task(tmp_path, sampler):
    from retrieval_scaling_tpu.rag_eval.tasks import Task, TaskConfig

    d = tmp_path / "toy"
    d.mkdir(exist_ok=True)
    with open(d / "test.jsonl", "w") as f:
        for i in range(12):
            f.write(json.dumps({"question": f"q{i}", "choices": ["no", "yes"], "gold": i % 2}) + "\n")
    cfg = TaskConfig(
        task="toy", dataset_path="toy", output_type="multiple_choice",
        doc_to_text="Q: {question}\nA:", doc_to_choice="choices",
        fewshot_sampler=sampler,
    )
    return Task(cfg, data_root=str(tmp_path))


def test_first_n_sampler(tmp_path):
    task = _mc_task(tmp_path, "first_n")
    shots = task.sample_shots(task.docs[5], 3)
    assert [s["question"] for s in shots] == ["q0", "q1", "q2"]


def test_balanced_sampler(tmp_path):
    task = _mc_task(tmp_path, "balanced")
    shots = task.sample_shots(task.docs[0], 4)
    golds = [s["gold"] for s in shots]
    assert golds.count(0) == 2 and golds.count(1) == 2


# ---------------------------------------------------------------- loggers
def test_jsonl_logger(tmp_path):
    from retrieval_scaling_tpu.rag_eval.loggers import JsonlLogger, build_loggers

    path = tmp_path / "res.jsonl"
    lg = JsonlLogger(str(path))
    lg.log_results({"results": {"nq_open": {"exact_match": 0.5}}})
    lg.log_results({"results": {"nq_open": {"exact_match": 0.7}}})
    rows = [json.loads(line) for line in open(path)]
    assert len(rows) == 2
    assert rows[1]["results"]["nq_open"]["exact_match"] == 0.7

    out = build_loggers(f"jsonl:{path}")
    assert len(out) == 1


def test_wandb_zeno_stubs_degrade_gracefully():
    from retrieval_scaling_tpu.rag_eval.loggers import WandbLogger, ZenoLogger

    w = WandbLogger()
    w.log_results({"results": {}})  # no-op without wandb installed
    w.finish()
    z = ZenoLogger()
    z.log_results({"results": {}})


# ---------------------------------------------------------------- api backend
def test_openai_compat_backend_against_mock_server():
    """OpenAICompatLM drives any /v1/completions server (reference analog:
    lm_eval/models/openai_completions.py); verified against a local mock."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from retrieval_scaling_tpu.rag_eval.models import OpenAICompatLM

    requests_seen = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            requests_seen.append((self.path, payload))
            if payload.get("echo"):
                # echo scoring: tokenize the prompt as words; continuation
                # tokens get logprob -0.5 each, greedy for all
                prompt = payload["prompt"]
                offsets, pos = [], 0
                for w in prompt.split(" "):
                    offsets.append(pos)
                    pos += len(w) + 1
                resp = {
                    "choices": [{
                        "text": prompt,
                        "logprobs": {
                            "text_offset": offsets,
                            "token_logprobs": [None] + [-0.5] * (len(offsets) - 1),
                            "top_logprobs": [None] + [{"x": -0.5}] * (len(offsets) - 1),
                        },
                    }]
                }
            else:
                resp = {"choices": [{"text": " mocked answer"}]}
            blob = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        lm = OpenAICompatLM(f"http://127.0.0.1:{server.server_port}", model="mock", api_key="k")
        # "alpha beta" = context; " gamma delta" = continuation (2 tokens)
        ll = lm.loglikelihood([("alpha beta", " gamma delta")])
        assert abs(ll[0][0] - (-1.0)) < 1e-9
        assert ll[0][1] is True

        outs = lm.generate_until([
            {"context": "q?", "gen_kwargs": {"until": ["\n"], "max_gen_toks": 8}}
        ])
        assert outs == [" mocked answer"]
        assert requests_seen[0][0] == "/v1/completions"
        assert requests_seen[0][1]["echo"] is True
        assert requests_seen[1][1]["max_tokens"] == 8
    finally:
        server.shutdown()


def test_regex_match_metric():
    """CuratedTREC references are regex patterns (DPR convention,
    reference: contriever/src/evaluation.py regex mode)."""
    from retrieval_scaling_tpu.rag_eval.metrics import regex_match

    assert regex_match("He was born in 1809.", [r"18[0-9]{2}"]) == 1.0
    assert regex_match("no date here", [r"18[0-9]{2}"]) == 0.0
    assert regex_match("WASHINGTON D.C.", [r"washington"]) == 1.0  # case-insensitive
    # malformed regex falls back to containment
    assert regex_match("the answer is foo(", ["foo("]) == 1.0


def test_janitor_native_matches_python():
    """The C++ scanner (native/rstpu_janitor.cpp) must agree with the pure
    python path span-for-span, including punctuation-only tokens and
    non-ascii text."""
    from retrieval_scaling_tpu.rag_eval.janitor import Janitor, _native_lib

    if _native_lib() is None:
        pytest.skip("no C++ toolchain")

    contaminants = [
        "the quick brown fox jumps over the lazy dog",
        "voici une phrase assez longue pour etre detectee sans doute",
    ]
    docs = [
        "prefix The QUICK, brown fox --- jumps over the LAZY dog suffix words",
        "nothing matching here at all in this one really",
        "bla voici une phrase assez longue pour etre detectee sans doute bla",
        "café unicode préfix the quick brown fox jumps over the lazy dog!",
    ]
    for n in (3, 5, 9):
        jn = Janitor(ngram_n=n, use_native=True)
        jp = Janitor(ngram_n=n, use_native=False)
        assert jn._native is not None and jp._native is None
        for c in contaminants:
            jn.register_contaminant(c)
            jp.register_contaminant(c)
        for doc in docs:
            assert jn.contamination_spans(doc) == jp.contamination_spans(doc), (n, doc)
            assert jn.clean(doc) == jp.clean(doc)


def test_named_filter_pipelines_gsm8k_style(tmp_path):
    """Named filter pipelines produce per-filter metric columns
    (reference: lm_eval gsm8k strict-match vs flexible-extract)."""
    from retrieval_scaling_tpu.rag_eval.evaluator import simple_evaluate
    from retrieval_scaling_tpu.rag_eval.tasks import get_task

    d = tmp_path / "gsm8k"
    d.mkdir()
    with open(d / "test.jsonl", "w") as f:
        f.write(json.dumps({"question": "2+2?", "answer": "It is four.\n#### 4"}) + "\n")
        f.write(json.dumps({"question": "3+4?", "answer": "Seven.\n#### 7"}) + "\n")

    class LM:
        def generate_until(self, reqs):
            outs = []
            for r in reqs:
                if "2+2" in r["context"]:
                    outs.append("The answer is 4. #### 4")     # both filters hit
                else:
                    outs.append("I think it is 7")             # only flexible hits
            return outs

        def loglikelihood(self, pairs):
            return [(0.0, True) for _ in pairs]

    res = simple_evaluate(LM(), ["gsm8k"], data_root=str(tmp_path), num_fewshot=0)
    row = res["results"]["gsm8k"]
    assert row["exact_match,strict-match"] == 0.5
    assert row["exact_match,flexible-extract"] == 1.0

    cfg = get_task("gsm8k")
    assert cfg.apply_filter_steps("x #### 1,234", cfg.filters[0]["steps"]) == "1234"
    assert cfg.apply_filter_steps("no canonical", cfg.filters[0]["steps"]) == "[invalid]"


def test_anthropic_compat_backend_against_mock_server():
    """AnthropicCompatLM drives any /v1/messages server (reference analog:
    lm_eval/models/anthropic_llms.py); verified against a local mock."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from retrieval_scaling_tpu.rag_eval.models import AnthropicCompatLM

    requests_seen = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            requests_seen.append((self.path, dict(self.headers), payload))
            resp = {
                "content": [{"type": "text", "text": "Paris\nextra trailing"}],
                "stop_reason": "end_turn",
            }
            blob = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        lm = AnthropicCompatLM(
            f"http://127.0.0.1:{server.server_port}", model="mock-model", api_key="k"
        )
        outs = lm.generate_until([
            {"context": "Q: capital of France?\nA:",
             "gen_kwargs": {"until": ["\n", "Q:"], "max_gen_toks": 16}}
        ])
        assert outs == ["Paris"]  # client-side truncation at "\n"
        path, headers, payload = requests_seen[0]
        assert path == "/v1/messages"
        assert headers["x-api-key".title()] == "k" or headers.get("x-api-key") == "k"
        assert payload["model"] == "mock-model"
        assert payload["max_tokens"] == 16
        assert payload["messages"] == [
            {"role": "user", "content": "Q: capital of France?\nA:"}
        ]
        # whitespace-only stop sequences are filtered out
        assert payload["stop_sequences"] == ["Q:"]

        with pytest.raises(NotImplementedError):
            lm.loglikelihood([("a", "b")])
    finally:
        server.shutdown()
