"""True multi-process distributed search: two OS processes rendezvous via
jax.distributed and run the sharded search over a hybrid (dcn, data, model)
mesh — the reference's cross-machine story (HTTP fan-out / NCCL rendezvous)
as one SPMD program (reference: api/serve_main_node.py:281-323,
contriever/src/slurm.py:43-80)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from retrieval_scaling_tpu.parallel.distributed import (
    build_hybrid_mesh, init_distributed_from_env, row_shard_axes,
)

assert init_distributed_from_env()
assert jax.process_count() == 2
assert jax.device_count() == 4  # 2 processes x 2 local virtual devices

import jax.numpy as jnp
import numpy as np
from retrieval_scaling_tpu.parallel.sharded_search import (
    replicate, shard_rows, sharded_flat_search,
)

mesh = build_hybrid_mesh(model_axis=1)
assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 2
axes = row_shard_axes(mesh)

rng = np.random.RandomState(0)
rows_per_shard = 32
n = rows_per_shard * 4
db = rng.randn(n, 16).astype(np.float32)
q = rng.randn(2, 16).astype(np.float32)

scores, ids = sharded_flat_search(
    mesh,
    replicate(mesh, jnp.asarray(q)),
    shard_rows(mesh, jnp.asarray(db), row_axes=axes),
    n, k=5, rows_per_shard=rows_per_shard, chunk_size=rows_per_shard,
    row_axes=axes,
)
out = {
    "ids": np.asarray(ids).tolist(),
    "scores": np.asarray(scores).tolist(),
}
with open(os.environ["RST_TEST_OUT"] + f".{os.environ['RST_PROCESS_ID']}", "w") as f:
    json.dump(out, f)
print("worker ok", flush=True)
"""


def test_two_process_distributed_sharded_search(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    out_base = str(tmp_path / "result.json")
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["RST_COORDINATOR"] = f"127.0.0.1:{port}"
        env["RST_NUM_PROCESSES"] = "2"
        env["RST_PROCESS_ID"] = str(pid)
        env["RST_TEST_OUT"] = out_base
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    # both processes computed the same replicated global result...
    with open(out_base + ".0") as f:
        r0 = json.load(f)
    with open(out_base + ".1") as f:
        r1 = json.load(f)
    assert r0 == r1

    # ...and it matches the exact single-process ground truth
    rng = np.random.RandomState(0)
    db = rng.randn(128, 16).astype(np.float32)
    q = rng.randn(2, 16).astype(np.float32)
    exact = q @ db.T
    for r in range(2):
        order = np.argsort(-exact[r])[:5]
        assert sorted(r0["ids"][r]) == sorted(order.tolist())
