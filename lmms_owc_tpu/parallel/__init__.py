"""Device-mesh construction and sharding rules (pjit/GSPMD).

Replaces the reference's accelerate/NCCL stack (src/models/_base.py:146-186,
src/engine/_engine.py:294-322): data parallelism is a sharded batch axis, model
parallelism is sharded weights, and multi-host aggregation uses JAX multihost utils.
"""

from lmms_owc_tpu.parallel.mesh import MeshConfig, create_mesh, local_mesh

__all__ = ["MeshConfig", "create_mesh", "local_mesh"]
