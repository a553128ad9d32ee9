"""Checkpoint loading: HF safetensors -> parameter pytrees.

Replaces the reference's ``from_pretrained(device_map=...)`` torch loading
(e.g. src/models/_qwen2_vl.py:89-121) with a torch-free path: tensors are read
directly from safetensors shards (bf16 preserved) and placed on device —
optionally with GSPMD shardings so 7B+ checkpoints stream straight into their
sharded layout without materializing on one chip.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["load_safetensors_state", "load_config_json", "cast_tree"]


def load_safetensors_state(path: str | Path, device=None) -> dict:
    """Load all tensors from a checkpoint dir (sharded or single-file) or one file.

    Returns a flat dict name -> jax.Array (host-committed; placement happens when the
    converted tree is device_put with shardings).
    """
    from safetensors import safe_open

    path = Path(path)
    if path.is_file():
        files = [path]
    else:
        index_file = path / "model.safetensors.index.json"
        if index_file.exists():
            index = json.loads(index_file.read_text())
            files = sorted({path / shard for shard in index["weight_map"].values()})
        else:
            files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors found under {path}")

    state: dict = {}
    for file in files:
        with safe_open(str(file), framework="flax") as f:
            for name in f.keys():
                state[name] = f.get_tensor(name)
    log.info("loaded %d tensors from %s", len(state), path)
    return state


def load_config_json(path: str | Path) -> dict:
    """Read the HF config.json next to a checkpoint."""
    path = Path(path)
    config_file = path / "config.json" if path.is_dir() else path
    return json.loads(config_file.read_text())


def cast_tree(tree, dtype) -> dict:
    """Cast every floating leaf of a pytree to dtype (int leaves untouched)."""

    def cast(leaf):
        if isinstance(leaf, (jax.Array, np.ndarray)) and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)
