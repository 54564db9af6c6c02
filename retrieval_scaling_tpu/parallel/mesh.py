"""Device-mesh construction for datastore sharding + model parallelism.

The reference distributes by launching independent SLURM processes per
datastore shard with no inter-process communication (reference:
README.md:283-330, SURVEY §2.7). On TPU a single JAX program owns every
shard: datastore rows are sharded over the ``data`` mesh axis (in HBM),
queries are replicated, and the cross-shard merge is an ICI collective.
The ``model`` axis is reserved for tensor-parallel encoders/readers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def build_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Create a ``(data, model)`` mesh. ``-1`` absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis == -1 and data_axis == -1:
        data_axis, model_axis = n, 1
    elif data_axis == -1:
        data_axis = n // model_axis
    elif model_axis == -1:
        model_axis = n // data_axis
    if data_axis * model_axis != n:
        raise ValueError(
            f"mesh {data_axis}x{model_axis} does not cover {n} devices"
        )
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def single_device_mesh(device=None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([device]).reshape(1, 1), ("data", "model"))


def mesh_from_config(cfg) -> Mesh:
    mesh_cfg = cfg.get("mesh", None)
    if mesh_cfg is None:
        return build_mesh()
    return build_mesh(mesh_cfg.get("data_axis", -1), mesh_cfg.get("model_axis", 1))
