"""Multi-process / multi-slice initialization and hybrid meshes.

The reference spans machines with HTTP (serving fan-out) and SLURM env
rendezvous for NCCL training (reference: api/serve_main_node.py:281-323,
contriever/src/slurm.py:43-80). The TPU-native equivalent is a single
JAX multi-process program: ``jax.distributed.initialize`` rendezvouses
the processes, every process sees the global device set, and a hybrid
mesh lays the slow DCN axis over slices and the fast ICI axes within a
slice — collectives then ride the right fabric automatically.

Environment contract (the serve/train launchers' analog of the
reference's ``DS_DOMAIN/WORKER_ID`` topology env vars):

  RST_COORDINATOR   host:port of process 0 (required for multi-process)
  RST_NUM_PROCESSES world size
  RST_PROCESS_ID    this process's rank

On Cloud TPU these are auto-detected by JAX; the env vars are for CPU
fleets, tests, and manual DCN setups.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def init_distributed_from_env() -> bool:
    """Initialize JAX's multi-process runtime from RST_* env vars.

    Returns True if distributed mode was initialized; False for the
    single-process case (no coordinator configured). Idempotent.
    """
    coord = os.environ.get("RST_COORDINATOR")
    if not coord:
        return False
    num = int(os.environ["RST_NUM_PROCESSES"])
    pid = int(os.environ["RST_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=pid
    )
    logger.info(
        "distributed init: process %d/%d, %d global / %d local devices",
        pid, num, jax.device_count(), jax.local_device_count(),
    )
    return True


def build_hybrid_mesh(
    model_axis: int = 1,
    dcn_data_axis: int | None = None,
) -> Mesh:
    """``(dcn, data, model)`` mesh: the leading axis crosses processes
    (slices) over DCN, the trailing axes stay within a slice on ICI.

    Shard datastore rows over ``("dcn", "data")`` jointly (each slice owns
    a contiguous stripe; the cross-shard top-k all_gather then does one
    slow DCN hop after the fast ICI reduction) and keep ``model`` for
    tensor parallelism inside a slice.
    """
    n_proc = jax.process_count()
    dcn = dcn_data_axis if dcn_data_axis is not None else n_proc
    total = jax.device_count()
    assert total % (dcn * model_axis) == 0, (total, dcn, model_axis)
    data = total // (dcn * model_axis)

    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in jax.devices()}
    if dcn > 1 and len(slice_ids) == dcn:
        # Real multi-slice TPU topology: let mesh_utils place the DCN axis
        # across slices and the ICI axes within.
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model_axis),
            dcn_mesh_shape=(dcn, 1, 1),
            devices=jax.devices(),
        )
    else:
        # CPU fleets / tests: ``jax.devices()`` orders devices by process,
        # so a contiguous reshape puts each process's local devices in one
        # DCN stripe — exactly the hybrid layout.
        devices = np.asarray(jax.devices()).reshape(dcn, data, model_axis)
    return Mesh(devices, ("dcn", "data", "model"))


def row_shard_axes(mesh: Mesh) -> tuple:
    """Axes datastore rows shard over: DCN stripes outermost when present."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)
