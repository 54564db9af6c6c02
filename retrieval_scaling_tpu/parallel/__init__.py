from retrieval_scaling_tpu.parallel.mesh import build_mesh, single_device_mesh  # noqa: F401
from retrieval_scaling_tpu.parallel.sharded_search import sharded_flat_search  # noqa: F401
