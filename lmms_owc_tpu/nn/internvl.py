"""InternVL (2/2.5/3 "-hf" ports) in JAX: InternViT tower + pixel-shuffle projector
+ Qwen2/Llama decoder.

Replaces the reference's trust-remote-code InternVL2 adapter compute
(src/models/_internvl2.py): dynamic aspect-ratio tiling happens host-side in the
model adapter; each 448x448 tile runs through the InternViT encoder (layer-scale
residuals, optional QK RMSNorm over the full embed dim), is pixel-shuffle
downsampled 2x2, and projected into the text embedding space.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import dense, layer_norm, rms_norm
from lmms_owc_tpu.nn.llama import LlamaConfig, llama_config_from_hf
from lmms_owc_tpu.nn.qwen2_vl import convert_hf_decoder_weights, init_decoder_params
from lmms_owc_tpu.ops.attention import flash_attention
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "InternVLConfig",
    "InternVLVisionConfig",
    "convert_hf_internvl_weights",
    "encode_tiles",
    "init_internvl_params",
    "internvl_config_from_hf",
]


@dataclass(frozen=True)
class InternVLVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    use_qk_norm: bool = False
    attention_bias: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class InternVLConfig:
    text: LlamaConfig = field(default_factory=LlamaConfig)
    vision: InternVLVisionConfig = field(default_factory=InternVLVisionConfig)
    image_token_id: int = 151667
    downsample_ratio: float = 0.5
    vision_feature_select_strategy: str = "default"
    text_attn_bias: bool = True  # Qwen2 backbones carry qkv biases

    @property
    def tokens_per_tile(self) -> int:
        side = self.vision.image_size // self.vision.patch_size
        side = int(side * self.downsample_ratio)
        return side * side


def internvl_config_from_hf(cfg: dict) -> InternVLConfig:
    text_cfg = cfg["text_config"]
    text = llama_config_from_hf(text_cfg)
    vis = cfg.get("vision_config", {})
    vision = InternVLVisionConfig(
        hidden_size=vis.get("hidden_size", 1024),
        num_layers=vis.get("num_hidden_layers", 24),
        num_heads=vis.get("num_attention_heads", 16),
        intermediate_size=vis.get("intermediate_size", 4096),
        image_size=vis.get("image_size", 448) if not isinstance(vis.get("image_size"), list)
        else vis.get("image_size")[0],
        patch_size=vis.get("patch_size", 14) if not isinstance(vis.get("patch_size"), list)
        else vis.get("patch_size")[0],
        layer_norm_eps=vis.get("layer_norm_eps", 1e-6),
        use_qk_norm=vis.get("use_qk_norm", False),
        attention_bias=vis.get("attention_bias", False),
    )
    return InternVLConfig(
        text=text,
        vision=vision,
        image_token_id=cfg.get("image_token_id", 151667),
        downsample_ratio=cfg.get("downsample_ratio", 0.5),
        vision_feature_select_strategy=cfg.get("vision_feature_select_strategy", "default"),
        text_attn_bias=text_cfg.get("model_type", "qwen2") == "qwen2",
    )


# ======================================================================= vision


@functools.partial(jax.jit, static_argnames=("config",))
def _vision_tower(params: dict, pixel_values: jax.Array, config: InternVLVisionConfig) -> jax.Array:
    """InternViT forward -> last hidden states [B, 1+P, E] (post final LN)."""
    b = pixel_values.shape[0]
    p, e = config.patch_size, config.hidden_size
    x = pixel_values.reshape(b, 3, pixel_values.shape[2] // p, p, pixel_values.shape[3] // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, 3 * p * p)
    x = jnp.dot(x, params["patch_embed"]["w"], preferred_element_type=x.dtype)
    x = x + params["patch_embed"]["b"]

    cls = jnp.broadcast_to(params["cls_token"][None, None, :], (b, 1, e)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embeddings"][None, : x.shape[1], :].astype(x.dtype)

    nh, hd = config.num_heads, e // config.num_heads
    eps = config.layer_norm_eps

    def block(x, layer):
        normed = layer_norm(layer["ln_before"], x, eps=eps)
        q = dense(layer["attn"]["q"], normed)
        k = dense(layer["attn"]["k"], normed)
        v = dense(layer["attn"]["v"], normed)
        if config.use_qk_norm:
            # QK RMSNorm over the FULL embed dim, before the head split.
            q = rms_norm(layer["attn"]["q_norm"], q, eps=eps)
            k = rms_norm(layer["attn"]["k_norm"], k, eps=eps)
        L = x.shape[1]
        q = q.reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        attn = flash_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, L, e)
        x = x + layer["lambda_1"] * dense(layer["attn"]["o"], attn)
        normed2 = layer_norm(layer["ln_after"], x, eps=eps)
        mlp = dense(layer["mlp"]["fc2"], jax.nn.gelu(dense(layer["mlp"]["fc1"], normed2), approximate=False))
        x = x + layer["lambda_2"] * mlp
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    if "final_ln" in params:
        x = layer_norm(params["final_ln"], x, eps=eps)
    return x


def _pixel_shuffle(x: jax.Array, scale_factor: float) -> jax.Array:
    """HF InternVL pixel shuffle: [B, W, H, C] -> [B, H*s, W*s, C/s^2] (exact op order)."""
    b, w, h, c = x.shape
    x = x.reshape(b, w, int(h * scale_factor), int(c / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, int(h * scale_factor), int(w * scale_factor), int(c / (scale_factor**2)))
    x = x.transpose(0, 2, 1, 3)
    return x


@functools.partial(jax.jit, static_argnames=("config",))
def encode_tiles(params: dict, pixel_values: jax.Array, config: InternVLConfig) -> jax.Array:
    """Tiles [N, 3, S, S] -> projected vision tokens [N, tokens_per_tile, H_text]."""
    features = _vision_tower(params["vision"], pixel_values, config.vision)
    if config.vision_feature_select_strategy == "default":
        features = features[:, 1:, :]
    n, channels = features.shape[0], features.shape[1]
    side = int(channels**0.5)
    features = features.reshape(n, side, side, -1)
    features = _pixel_shuffle(features, config.downsample_ratio)
    features = features.reshape(n, -1, features.shape[-1])

    proj = params["projector"]
    x = layer_norm(proj["ln"], features, eps=1e-5)
    x = dense(proj["fc2"], jax.nn.gelu(dense(proj["fc1"], x), approximate=False))
    return x


# ====================================================================== weights


def init_internvl_params(key: jax.Array, config: InternVLConfig, dtype=jnp.bfloat16) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    v = config.vision
    e, inter, L = v.hidden_size, v.intermediate_size, v.num_layers

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def lin(k, din, dout, bias=True):
        out = {"w": w(k, (L, din, dout))}
        if bias:
            out["b"] = jnp.zeros((L, dout), dtype)
        return out

    def lnp():
        return {"scale": jnp.ones((L, e), dtype), "bias": jnp.zeros((L, e), dtype)}

    lk = jax.random.split(k2, 8)
    layers = {
        "ln_before": lnp(),
        "ln_after": lnp(),
        "lambda_1": jnp.full((L, e), 0.1, dtype),
        "lambda_2": jnp.full((L, e), 0.1, dtype),
        "attn": {
            "q": lin(lk[0], e, e, v.attention_bias),
            "k": lin(lk[1], e, e, v.attention_bias),
            "v": lin(lk[2], e, e, v.attention_bias),
            "o": lin(lk[3], e, e),
        },
        "mlp": {"fc1": lin(lk[4], e, inter), "fc2": lin(lk[5], inter, e)},
    }
    if v.use_qk_norm:
        layers["attn"]["q_norm"] = {"scale": jnp.ones((L, e), dtype)}
        layers["attn"]["k_norm"] = {"scale": jnp.ones((L, e), dtype)}

    merge_ch = v.hidden_size * int(1 / config.downsample_ratio) ** 2
    h_text = config.text.hidden_size
    return {
        "text": init_decoder_params(
            k1, config.text.to_decoder_config(), dtype, attn_bias=config.text_attn_bias
        ),
        "vision": {
            "patch_embed": {"w": w(lk[6], (3 * v.patch_size**2, e)), "b": jnp.zeros(e, dtype)},
            "cls_token": jnp.zeros(e, dtype),
            "position_embeddings": w(lk[7], (v.num_patches + 1, e)),
            "layers": layers,
            "final_ln": {"scale": jnp.ones(e, dtype), "bias": jnp.zeros(e, dtype)},
        },
        "projector": {
            "ln": {"scale": jnp.ones(merge_ch, dtype), "bias": jnp.zeros(merge_ch, dtype)},
            "fc1": {"w": w(jax.random.fold_in(k3, 0), (merge_ch, h_text)), "b": jnp.zeros(h_text, dtype)},
            "fc2": {"w": w(jax.random.fold_in(k3, 1), (h_text, h_text)), "b": jnp.zeros(h_text, dtype)},
        },
    }


def convert_hf_internvl_weights(state: dict, config: InternVLConfig, dtype=jnp.bfloat16) -> dict:
    """Map HF internvl ("-hf" port) safetensors names to our tree."""

    def find(name):
        for prefix in ("model.", ""):
            if prefix + name in state:
                return np.asarray(state[prefix + name])
        raise KeyError(f"tensor {name!r} not found")

    def t(name):
        arr = find(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(find(name), dtype)

    def lin(name):
        return {"w": t(name + ".weight"), "b": raw(name + ".bias")}

    v = config.vision
    L = v.num_layers
    base = "vision_tower.encoder.layer"

    def stack(fn, fmt):
        return jnp.stack([fn(fmt.format(i)) for i in range(L)])

    def stack_lin(fmt, bias=True):
        out = {"w": stack(lambda n: t(n + ".weight"), fmt)}
        if bias:
            out["b"] = stack(lambda n: raw(n + ".bias"), fmt)
        return out

    def stack_ln(fmt):
        return {
            "scale": stack(lambda n: raw(n + ".weight"), fmt),
            "bias": stack(lambda n: raw(n + ".bias"), fmt),
        }

    layers = {
        "ln_before": stack_ln(base + ".{}.layernorm_before"),
        "ln_after": stack_ln(base + ".{}.layernorm_after"),
        "lambda_1": stack(raw, base + ".{}.lambda_1"),
        "lambda_2": stack(raw, base + ".{}.lambda_2"),
        "attn": {
            "q": stack_lin(base + ".{}.attention.q_proj", v.attention_bias),
            "k": stack_lin(base + ".{}.attention.k_proj", v.attention_bias),
            "v": stack_lin(base + ".{}.attention.v_proj", v.attention_bias),
            "o": stack_lin(base + ".{}.attention.projection_layer"),
        },
        "mlp": {
            "fc1": stack_lin(base + ".{}.mlp.fc1"),
            "fc2": stack_lin(base + ".{}.mlp.fc2"),
        },
    }
    if v.use_qk_norm:
        layers["attn"]["q_norm"] = {"scale": stack(raw, base + ".{}.attention.q_norm")}
        layers["attn"]["k_norm"] = {"scale": stack(raw, base + ".{}.attention.k_norm")}

    patch_w = find("vision_tower.embeddings.patch_embeddings.projection.weight")
    vision = {
        "patch_embed": {
            "w": jnp.asarray(patch_w.reshape(patch_w.shape[0], -1).T, dtype),
            "b": raw("vision_tower.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": raw("vision_tower.embeddings.cls_token").reshape(-1),
        "position_embeddings": raw("vision_tower.embeddings.position_embeddings").reshape(
            -1, v.hidden_size
        ),
        "layers": layers,
    }
    try:
        vision["final_ln"] = {
            "scale": raw("vision_tower.layernorm.weight"),
            "bias": raw("vision_tower.layernorm.bias"),
        }
    except KeyError:
        pass

    return {
        "text": convert_hf_decoder_weights(
            state, config.text.to_decoder_config(), dtype, attn_bias=config.text_attn_bias
        ),
        "vision": vision,
        "projector": {
            "ln": {
                "scale": raw("multi_modal_projector.layer_norm.weight"),
                "bias": raw("multi_modal_projector.layer_norm.bias"),
            },
            "fc1": lin("multi_modal_projector.linear_1"),
            "fc2": lin("multi_modal_projector.linear_2"),
        },
    }
