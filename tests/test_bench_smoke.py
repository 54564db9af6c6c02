"""bench.py CPU smoke test.

Runs the driver benchmark end-to-end at tiny shapes (RST_BENCH_SMOKE=1:
interpret-mode Pallas, small models) so a bench-crashing regression fails
the test suite on CPU instead of surfacing only in the on-chip driver run
(round 4 shipped exactly such a regression: the fused int8/bf16 NeoX
decode path crashed `python bench.py` and the round lost its perf
capture).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Keys the driver/judge read from the bench JSON; the smoke run must
# produce every one of them (values are meaningless at tiny shapes).
REQUIRED_AUX = (
    "batch64_exact_qps",
    "batch64_sq8_int8_qps",
    "encoder_passages_per_s",
    "encoder_int8_passages_per_s",
    "ivf_flat_qps_nprobe64",
    "ivf_pq_qps_nprobe64_m16",
    "ivf_pq_refine_qps_recall098",
    "serving_p50_ms",
    "reader_tokens_per_s",
    "gen_cb_wall_speedup_vs_static",
    "gen_spec_tok_s",
    "gen_spec_rag_measured_tok_per_round",
    "gen_spec_rag_measured_speedup",
    "gen_spec_rag_copy_fidelity",
    "decode_bf16_tok_s",
    "decode_int8_tok_s",
    "decode_pct_of_stream_floor",
    "decode_stream_floor_gb_s",
)


def test_bench_smoke_runs_end_to_end():
    env = dict(os.environ)
    env.update(
        RST_BENCH_SMOKE="1",
        JAX_PLATFORMS="cpu",
        # config-level CPU force (a site hook may override JAX_PLATFORMS)
        RST_BENCH_FORCE_CPU="1",
        # single CPU device: the smoke run is one process, no virtual mesh
        XLA_FLAGS="",
        TOKENIZERS_PARALLELISM="false",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"bench.py smoke run failed (rc={proc.returncode})\n"
        f"--- stderr tail ---\n{proc.stderr[-4000:]}"
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert lines, f"no stdout from bench.py; stderr:\n{proc.stderr[-2000:]}"
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "e2e_query_latency_p50_1M"
    assert parsed["value"] > 0 and parsed["unit"] == "ms"
    aux = parsed["aux"]
    missing = [k for k in REQUIRED_AUX if k not in aux]
    assert not missing, f"bench JSON missing aux keys: {missing}"
