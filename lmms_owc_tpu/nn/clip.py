"""CLIP (ViT + text transformer) in JAX.

Backs two consumers:
  - the image pipeline's ``encode_clip`` scorer (reference:
    src/data/pipelines/image/_image.py — CLIP ViT-L/14 image-text logits), and
  - the LLaVA family's vision tower (CLIP ViT-L/14-336 features from a hidden layer).

Encoder layers are stacked and run under ``lax.scan``; attention uses the shared
flash-attention op (full bidirectional for vision, causal for text).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import dense, layer_norm
from lmms_owc_tpu.ops.attention import flash_attention
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "ClipTextConfig",
    "ClipVisionConfig",
    "ClipScorer",
    "clip_text_encode",
    "clip_vision_forward",
    "convert_hf_clip_weights",
    "init_clip_vision_params",
    "resolve_clip_weights",
]


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    eos_token_id: int = 49407


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _encoder_block(layer, x, *, num_heads: int, causal: bool, eps: float):
    b, l, e = x.shape
    hd = e // num_heads
    normed = layer_norm(layer["ln1"], x, eps=eps)
    q = dense(layer["attn"]["q"], normed).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(layer["attn"]["k"], normed).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    v = dense(layer["attn"]["v"], normed).reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)
    attn = flash_attention(q, k, v, causal=causal)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, l, e)
    x = x + dense(layer["attn"]["o"], attn)
    normed2 = layer_norm(layer["ln2"], x, eps=eps)
    x = x + dense(layer["mlp"]["fc2"], _quick_gelu(dense(layer["mlp"]["fc1"], normed2)))
    return x


@functools.partial(jax.jit, static_argnames=("config", "feature_layer"))
def clip_vision_forward(
    params: dict,
    pixel_values: jax.Array,
    config: ClipVisionConfig,
    feature_layer: int | None = None,
) -> jax.Array:
    """CLIP vision tower.

    Args:
        pixel_values: [B, 3, H, W] normalized pixels.
        feature_layer: if set (e.g. -2 for LLaVA), return that encoder layer's
            hidden states [B, 1+P, E] (no post-LN); otherwise return the projected
            pooled embedding [B, projection_dim].
    """
    b = pixel_values.shape[0]
    e = config.hidden_size
    p = config.patch_size

    # Conv patchify as unfold + matmul (kernel stored flat [3*p*p, E]).
    x = pixel_values.reshape(b, 3, pixel_values.shape[2] // p, p, pixel_values.shape[3] // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, 3 * p * p)
    x = jnp.dot(x, params["patch_embed"]["w"], preferred_element_type=x.dtype)

    cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (b, 1, e)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1], :]
    x = layer_norm(params["pre_ln"], x, eps=config.layer_norm_eps)

    num_layers = config.num_layers if feature_layer is None else config.num_layers + 1 + feature_layer

    def block(carry, layer):
        return _encoder_block(
            layer, carry, num_heads=config.num_heads, causal=False, eps=config.layer_norm_eps
        ), None

    sliced = jax.tree_util.tree_map(lambda leaf: leaf[:num_layers], params["layers"])
    x, _ = jax.lax.scan(block, x, sliced)

    if feature_layer is not None:
        return x

    pooled = layer_norm(params["post_ln"], x[:, 0, :], eps=config.layer_norm_eps)
    return jnp.dot(pooled, params["visual_projection"]["w"], preferred_element_type=pooled.dtype)


@functools.partial(jax.jit, static_argnames=("config",))
def clip_text_encode(params: dict, input_ids: jax.Array, config: ClipTextConfig) -> jax.Array:
    """CLIP text encoder -> projected embedding [B, projection_dim] (causal, EOS-pooled)."""
    b, l = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :l, :]

    def block(carry, layer):
        return _encoder_block(
            layer, carry, num_heads=config.num_heads, causal=True, eps=config.layer_norm_eps
        ), None

    x, _ = jax.lax.scan(block, x, params["layers"])
    x = layer_norm(params["final_ln"], x, eps=config.layer_norm_eps)
    # Pool at the first EOS position (HF CLIPTextModel pooling).
    eos_positions = jnp.argmax((input_ids == config.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_positions]
    return jnp.dot(pooled, params["text_projection"]["w"], preferred_element_type=pooled.dtype)


# ---------------------------------------------------------------------- weights


def init_clip_vision_params(key: jax.Array, config: ClipVisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    e, inter, L = config.hidden_size, config.intermediate_size, config.num_layers

    def lin(k, din, dout):
        return {"w": w(k, (L, din, dout)), "b": jnp.zeros((L, dout), dtype)}

    def lnp():
        return {"scale": jnp.ones((L, e), dtype), "bias": jnp.zeros((L, e), dtype)}

    lk = jax.random.split(keys[0], 6)
    return {
        "patch_embed": {"w": w(keys[1], (3 * config.patch_size**2, e))},
        "class_embedding": w(keys[2], (e,)),
        "position_embedding": w(keys[3], (config.num_positions, e)),
        "pre_ln": {"scale": jnp.ones(e, dtype), "bias": jnp.zeros(e, dtype)},
        "layers": {
            "ln1": lnp(),
            "ln2": lnp(),
            "attn": {"q": lin(lk[0], e, e), "k": lin(lk[1], e, e), "v": lin(lk[2], e, e), "o": lin(lk[3], e, e)},
            "mlp": {"fc1": lin(lk[4], e, inter), "fc2": lin(lk[5], inter, e)},
        },
        "post_ln": {"scale": jnp.ones(e, dtype), "bias": jnp.zeros(e, dtype)},
        "visual_projection": {"w": w(keys[4], (e, config.projection_dim))},
    }


def convert_hf_clip_weights(
    state: dict, vision_config: ClipVisionConfig, text_config: ClipTextConfig | None = None,
    dtype=jnp.float32, prefix: str = "",
) -> dict:
    """Map HF CLIPModel / CLIPVisionModel safetensors names to our trees.

    Returns {"vision": ..., optionally "text": ..., "logit_scale": ...}.
    ``prefix`` handles towers embedded in other checkpoints (e.g. LLaVA's
    "model.vision_tower.vision_tower.").
    """

    def find(name):
        # Transformers has moved embedded towers between "model.vision_tower."
        # and bare "vision_tower." across versions; probe both spellings.
        for pre in (prefix, prefix.removeprefix("model."), "model." + prefix, ""):
            if pre + name in state:
                return np.asarray(state[pre + name])
        raise KeyError(f"tensor {name!r} not found")

    def t(name):
        arr = find(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(find(name), dtype)

    def stack_layers(base: str, L: int) -> dict:
        def lin(sub):
            return {
                "w": jnp.stack([t(f"{base}.{i}.{sub}.weight") for i in range(L)]),
                "b": jnp.stack([raw(f"{base}.{i}.{sub}.bias") for i in range(L)]),
            }

        def ln(sub):
            return {
                "scale": jnp.stack([raw(f"{base}.{i}.{sub}.weight") for i in range(L)]),
                "bias": jnp.stack([raw(f"{base}.{i}.{sub}.bias") for i in range(L)]),
            }

        return {
            "ln1": ln("layer_norm1"),
            "ln2": ln("layer_norm2"),
            "attn": {
                "q": lin("self_attn.q_proj"),
                "k": lin("self_attn.k_proj"),
                "v": lin("self_attn.v_proj"),
                "o": lin("self_attn.out_proj"),
            },
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        }

    patch_w = find("vision_model.embeddings.patch_embedding.weight")  # [E, 3, p, p]
    vision = {
        "patch_embed": {"w": jnp.asarray(patch_w.reshape(patch_w.shape[0], -1).T, dtype)},
        "class_embedding": raw("vision_model.embeddings.class_embedding"),
        "position_embedding": raw("vision_model.embeddings.position_embedding.weight"),
        "pre_ln": {
            "scale": raw("vision_model.pre_layrnorm.weight"),
            "bias": raw("vision_model.pre_layrnorm.bias"),
        },
        "layers": stack_layers("vision_model.encoder.layers", vision_config.num_layers),
        "post_ln": {
            "scale": raw("vision_model.post_layernorm.weight"),
            "bias": raw("vision_model.post_layernorm.bias"),
        },
    }
    out: dict = {"vision": vision}
    try:
        vision["visual_projection"] = {"w": t("visual_projection.weight")}
    except KeyError:
        pass

    if text_config is not None:
        out["text"] = {
            "token_embedding": raw("text_model.embeddings.token_embedding.weight"),
            "position_embedding": raw("text_model.embeddings.position_embedding.weight"),
            "layers": stack_layers("text_model.encoder.layers", text_config.num_layers),
            "final_ln": {
                "scale": raw("text_model.final_layer_norm.weight"),
                "bias": raw("text_model.final_layer_norm.bias"),
            },
            "text_projection": {"w": t("text_projection.weight")},
        }
        out["logit_scale"] = raw("logit_scale")
    return out


def resolve_clip_weights() -> str | None:
    env_path = os.environ.get("LMMS_OWC_CLIP_PATH")
    if env_path and Path(env_path).exists():
        return env_path
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download("openai/clip-vit-large-patch14", local_files_only=True)
    except Exception:
        return None


class ClipScorer:
    """Image-text logits, parity with the reference image pipeline."""

    def __init__(self, params, vision_config, text_config, processor) -> None:
        self.params = params
        self.vision_config = vision_config
        self.text_config = text_config
        self.processor = processor

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32) -> "ClipScorer":
        from transformers import AutoProcessor

        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        cfg = load_config_json(path)
        vision_cfg = cfg.get("vision_config", {})
        text_cfg = cfg.get("text_config", {})
        vision_config = ClipVisionConfig(
            hidden_size=vision_cfg.get("hidden_size", 1024),
            num_layers=vision_cfg.get("num_hidden_layers", 24),
            num_heads=vision_cfg.get("num_attention_heads", 16),
            intermediate_size=vision_cfg.get("intermediate_size", 4096),
            image_size=vision_cfg.get("image_size", 224),
            patch_size=vision_cfg.get("patch_size", 14),
            projection_dim=cfg.get("projection_dim", 768),
        )
        text_config = ClipTextConfig(
            vocab_size=text_cfg.get("vocab_size", 49408),
            hidden_size=text_cfg.get("hidden_size", 768),
            num_layers=text_cfg.get("num_hidden_layers", 12),
            num_heads=text_cfg.get("num_attention_heads", 12),
            intermediate_size=text_cfg.get("intermediate_size", 3072),
            projection_dim=cfg.get("projection_dim", 768),
            eos_token_id=text_cfg.get("eos_token_id", 49407),
        )
        state = load_safetensors_state(path)
        params = convert_hf_clip_weights(state, vision_config, text_config, dtype)
        processor = AutoProcessor.from_pretrained(path)
        return cls(params, vision_config, text_config, processor)

    def score(self, images: list, texts: list[str]) -> np.ndarray:
        inputs = self.processor(images=images, text=texts, return_tensors="np", padding=True)
        image_embeds = clip_vision_forward(
            self.params["vision"], jnp.asarray(inputs["pixel_values"]), self.vision_config
        )
        text_embeds = clip_text_encode(
            self.params["text"], jnp.asarray(inputs["input_ids"]), self.text_config
        )
        image_embeds = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
        text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
        scale = jnp.exp(self.params["logit_scale"])
        return np.asarray(scale * image_embeds @ text_embeds.T)
