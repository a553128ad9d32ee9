"""GSPMD sharding rules for the stacked-layer parameter trees.

Tensor parallelism follows the Megatron split: attention q/k/v and MLP up/gate are
column-sharded over the "model" axis, o/down row-sharded, so each layer needs one
all-reduce (inserted automatically by GSPMD) per attention/MLP block. The batch
dimension of activations shards over "data". This replaces the reference's
``device_map="auto"`` layer-wise pipeline split (src/models/_base.py:178-181),
which leaves all but one GPU idle per microstep, with true parallel matmuls.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["QWEN_DECODER_RULES", "shard_params", "make_param_shardings", "data_sharding"]

# Rules: regex over the "/"-joined tree path -> PartitionSpec.
# Decoder layer params carry a leading stacked-layer axis (None).
QWEN_DECODER_RULES: list[tuple[str, P]] = [
    (r"layers/attn/[qkv]/w$", P(None, None, "model")),
    (r"layers/attn/[qkv]/b$", P(None, "model")),
    (r"layers/attn/o/w$", P(None, "model", None)),
    (r"layers/mlp/(gate|up)/w$", P(None, None, "model")),
    (r"layers/mlp/down/w$", P(None, "model", None)),
    # CLIP/SigLIP/InternViT-style tower MLPs (fc1/fc2 under layers/mlp).
    (r"layers/mlp/fc1/w$", P(None, None, "model")),
    (r"layers/mlp/fc1/b$", P(None, "model")),
    (r"layers/mlp/fc2/w$", P(None, "model", None)),
    (r"embed_tokens$", P("model", None)),
    (r"lm_head/w$", P(None, "model")),
    (r"vision/layers/qkv/w$", P(None, None, "model")),
    (r"vision/layers/qkv/b$", P(None, "model")),
    (r"vision/layers/proj/w$", P(None, "model", None)),
    (r"vision/layers/fc1/w$", P(None, None, "model")),
    (r"vision/layers/fc1/b$", P(None, "model")),
    (r"vision/layers/fc2/w$", P(None, "model", None)),
    (r"vision/merger/fc1/w$", P(None, "model")),
    (r"vision/merger/fc1/b$", P("model")),
    (r"vision/merger/fc2/w$", P("model", None)),
]


def _spec_for_path(path: str, rules: list[tuple[str, P]]) -> P:
    """Resolve a tree path to a PartitionSpec; int8 trees reuse the "w" rules.

    A quantized dense stores ``w_q8/q`` ([..., in, out] int8, sharded exactly like
    the full-precision "w") and ``w_q8/scale`` ([..., out] — the "w" spec with the
    contraction axis removed).
    """
    scale = False
    if path.endswith("w_q8/q"):
        path = path[: -len("w_q8/q")] + "w"
    elif path.endswith("w_q4/q4"):
        # int4 packs pairs along the contraction axis; the out axis (and any
        # leading stack axis) keeps the full-precision "w" sharding.
        path = path[: -len("w_q4/q4")] + "w"
    elif path.endswith("w_q8/scale"):
        path = path[: -len("w_q8/scale")] + "w"
        scale = True
    elif path.endswith("w_q4/scale"):
        # Groupwise scale [..., groups, out]: same rank as "w" (groups stand in
        # for the contraction axis), so the "w" spec applies directly — but the
        # groups axis must never carry the "model" axis of a row-parallel split.
        path = path[: -len("w_q4/scale")] + "w"
    for pattern, spec in rules:
        if re.search(pattern, path):
            if scale:
                dims = list(spec)
                if len(dims) >= 2:
                    dims.pop(-2)
                return P(*dims)
            return spec
    return P()  # replicated


def make_param_shardings(params: dict, mesh: Mesh, rules: list[tuple[str, P]] | None = None):
    """Pytree of NamedShardings matching ``params`` structure."""
    rules = rules if rules is not None else QWEN_DECODER_RULES
    model_size = mesh.shape.get("model", 1)

    def assign(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path_tuple)
        spec = _spec_for_path(path, rules)
        # Drop sharding for dims not divisible by the mesh axis (e.g. tiny test models).
        dims = list(spec)
        for i, axis in enumerate(dims):
            if axis == "model" and (i >= leaf.ndim or leaf.shape[i] % model_size != 0):
                dims = [None] * len(dims)
                break
        if len(dims) > leaf.ndim:
            dims = [None] * leaf.ndim
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params: dict, mesh: Mesh, rules: list[tuple[str, P]] | None = None) -> dict:
    """device_put the tree with the rule-derived shardings."""
    shardings = make_param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings)


def data_sharding(mesh: Mesh, *batch_axes_then_none: int):
    """NamedSharding that shards axis 0 over "data" and replicates the rest."""
    ndim = batch_axes_then_none[0] if batch_axes_then_none else 2
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
