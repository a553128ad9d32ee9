"""LLaVA (1.5 / HF-style) in JAX: CLIP vision tower + MLP projector + Llama decoder.

Model assembly for the reference's llava-hf family (src/models/_llava_hf.py):
  - vision features from CLIP layer ``vision_feature_layer`` (-2), CLS dropped
    ("default" select strategy),
  - 2-layer GELU projector into the text embedding space,
  - Llama/Vicuna decoder from :mod:`lmms_owc_tpu.nn.llama`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.clip import ClipVisionConfig, clip_vision_forward, convert_hf_clip_weights, init_clip_vision_params
from lmms_owc_tpu.nn.layers import dense, gelu
from lmms_owc_tpu.nn.llama import (
    LlamaConfig,
    convert_hf_llama_weights,
    init_llama_params,
    llama_config_from_hf,
)
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["LlavaConfig", "convert_hf_llava_weights", "encode_images", "init_llava_params", "llava_config_from_hf"]


@dataclass(frozen=True)
class LlavaConfig:
    text: LlamaConfig = field(default_factory=LlamaConfig)
    vision: ClipVisionConfig = field(default_factory=lambda: ClipVisionConfig(image_size=336))
    image_token_id: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    pad_token_id: int = 32001

    @property
    def image_seq_length(self) -> int:
        patches = (self.vision.image_size // self.vision.patch_size) ** 2
        return patches if self.vision_feature_select_strategy == "default" else patches + 1


def llava_config_from_hf(cfg: dict) -> LlavaConfig:
    text = llama_config_from_hf(cfg["text_config"])
    vis = cfg.get("vision_config", {})
    vision = ClipVisionConfig(
        hidden_size=vis.get("hidden_size", 1024),
        num_layers=vis.get("num_hidden_layers", 24),
        num_heads=vis.get("num_attention_heads", 16),
        intermediate_size=vis.get("intermediate_size", 4096),
        image_size=vis.get("image_size", 336),
        patch_size=vis.get("patch_size", 14),
        projection_dim=vis.get("projection_dim", 768),
    )
    return LlavaConfig(
        text=text,
        vision=vision,
        image_token_id=cfg.get("image_token_index", 32000),
        vision_feature_layer=cfg.get("vision_feature_layer", -2),
        vision_feature_select_strategy=cfg.get("vision_feature_select_strategy", "default"),
        pad_token_id=cfg.get("pad_token_id") or 32001,
    )


def init_llava_params(key: jax.Array, config: LlavaConfig, dtype=jnp.bfloat16) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    e, h = config.vision.hidden_size, config.text.hidden_size

    def w(k, shape):
        return (jax.random.normal(k, shape) * 0.02).astype(dtype)

    return {
        "text": init_llama_params(k1, config.text, dtype),
        "vision": init_clip_vision_params(k2, config.vision, dtype),
        "projector": {
            "fc1": {"w": w(jax.random.fold_in(k3, 0), (e, h)), "b": jnp.zeros(h, dtype)},
            "fc2": {"w": w(jax.random.fold_in(k3, 1), (h, h)), "b": jnp.zeros(h, dtype)},
        },
    }


def convert_hf_llava_weights(state: dict, config: LlavaConfig, dtype=jnp.bfloat16) -> dict:
    """Map HF llava safetensors ("model.vision_tower.", "model.multi_modal_projector.",
    "model.language_model." / "language_model.model.") to our tree."""

    def find(name):
        for prefix in ("model.", ""):
            if prefix + name in state:
                return np.asarray(state[prefix + name])
        raise KeyError(f"tensor {name!r} not found")

    def lin(name):
        return {
            "w": jnp.asarray(find(name + ".weight").T, dtype),
            "b": jnp.asarray(find(name + ".bias"), dtype),
        }

    clip_tree = convert_hf_clip_weights(
        state, config.vision, None, dtype, prefix="model.vision_tower."
    )
    return {
        "text": convert_hf_llama_weights(state, config.text, dtype),
        "vision": clip_tree["vision"],
        "projector": {
            "fc1": lin("multi_modal_projector.linear_1"),
            "fc2": lin("multi_modal_projector.linear_2"),
        },
    }


@functools.partial(jax.jit, static_argnames=("config",))
def encode_images(params: dict, pixel_values: jax.Array, config: LlavaConfig) -> jax.Array:
    """Pixels [N, 3, S, S] -> projected vision embeddings [N, image_seq_length, H]."""
    features = clip_vision_forward(
        params["vision"], pixel_values, config.vision, feature_layer=config.vision_feature_layer
    )
    if config.vision_feature_select_strategy == "default":
        features = features[:, 1:, :]  # drop CLS
    x = dense(params["projector"]["fc1"], features)
    return dense(params["projector"]["fc2"], gelu(x))
