"""Device mesh construction.

The canonical mesh has axes ("data", "model"): benchmark samples shard over "data"
(the reference's per-rank request sharding becomes a sharded batch dimension), weights
shard over "model" for 7B+ checkpoints (replacing HF device_map pipeline splits,
reference src/models/_base.py:178-181 and src/models/_internvl2.py:215-270).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["MeshConfig", "create_mesh", "local_mesh"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. ``data * model`` must divide the device count; -1 infers."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        data, model = self.data, self.model
        if data == -1 and model == -1:
            raise ValueError("at most one mesh axis may be -1")
        if model == -1:
            model = n_devices // data
        if data == -1:
            data = n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not match device count {n_devices}"
            )
        return data, model


def create_mesh(config: MeshConfig | None = None, devices=None):
    """Build a 2D ("data", "model") Mesh over the given (default: all) devices."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    config = config or MeshConfig()
    data, model = config.resolve(len(devices))
    device_array = np.asarray(devices).reshape(data, model)
    log.info("created mesh: data=%d model=%d over %d devices", data, model, len(devices))
    return Mesh(device_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh(model_parallel: int = 1):
    """Mesh over this process's addressable devices only."""
    import jax

    return create_mesh(MeshConfig(data=-1, model=model_parallel), jax.local_devices())
