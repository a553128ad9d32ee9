"""Idefics2 in JAX: SigLIP vision tower + perceiver resampler connector + Mistral decoder.

Replaces the reference's torch Idefics2 adapter compute (src/models/_idefics2.py):
vision features are projected by a SwiGLU modality projection, then compressed to
``resampler_n_latents`` tokens by a perceiver resampler (latents attend to
[context; latents]), and spliced into the Mistral sequence.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import dense, layer_norm, mlp_swiglu, repeat_kv, rms_norm
from lmms_owc_tpu.nn.llama import LlamaConfig, llama_config_from_hf
from lmms_owc_tpu.nn.qwen2_vl import convert_hf_decoder_weights, init_decoder_params
from lmms_owc_tpu.ops.attention import attention_reference, flash_attention
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "Idefics2Config",
    "SiglipVisionConfig",
    "convert_hf_idefics2_weights",
    "encode_images",
    "idefics2_config_from_hf",
    "init_idefics2_params",
    "variable_patch_layout",
]


def variable_patch_layout(
    dims: list[tuple[int, int]], grid_hw: tuple[int, int], num_side: int, patch_size: int
):
    """HF variable-aspect layout (modeling_idefics2.Idefics2VisionEmbeddings:136-166).

    For images of pixel dims ``(h, w)`` padded bottom/right into a common grid of
    ``grid_hw`` patches: a patch is valid iff fully covered by real pixels, and
    position ids come from fractional coordinates bucketized over ``num_side``
    boundaries (torch.bucketize(right=True) == np.searchsorted(side='left')).

    Returns (position_ids [N, gh*gw] int64, patch_mask [N, gh*gw] int32).
    """
    gh, gw = grid_hw
    n = len(dims)
    patch_mask = np.zeros((n, gh * gw), np.int32)
    position_ids = np.zeros((n, gh * gw), np.int64)
    boundaries = np.arange(1 / num_side, 1.0, 1 / num_side)
    for i, (h, w) in enumerate(dims):
        nph, npw = h // patch_size, w // patch_size
        grid = np.zeros((gh, gw), bool)
        grid[:nph, :npw] = True
        patch_mask[i] = grid.reshape(-1)
        bh = np.searchsorted(boundaries, np.arange(nph) / nph * (1 - 1e-6), side="left")
        bw = np.searchsorted(boundaries, np.arange(npw) / npw * (1 - 1e-6), side="left")
        position_ids[i][grid.reshape(-1)] = (bh[:, None] * num_side + bw[None, :]).reshape(-1)
    return position_ids, patch_mask


@dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    image_size: int = 980
    patch_size: int = 14
    layer_norm_eps: float = 1e-6


@dataclass(frozen=True)
class PerceiverConfig:
    n_latents: int = 64
    depth: int = 3
    n_heads: int = 16
    head_dim: int = 96
    num_kv_heads: int = 4
    rms_norm_eps: float = 1e-6


@dataclass(frozen=True)
class Idefics2Config:
    text: LlamaConfig = field(default_factory=LlamaConfig)
    vision: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    perceiver: PerceiverConfig = field(default_factory=PerceiverConfig)
    image_token_id: int = 32001


def idefics2_config_from_hf(cfg: dict) -> Idefics2Config:
    vis = cfg.get("vision_config", {})
    per = cfg.get("perceiver_config", {})
    text = llama_config_from_hf(cfg["text_config"])
    return Idefics2Config(
        text=text,
        vision=SiglipVisionConfig(
            hidden_size=vis.get("hidden_size", 1152),
            num_layers=vis.get("num_hidden_layers", 27),
            num_heads=vis.get("num_attention_heads", 16),
            intermediate_size=vis.get("intermediate_size", 4304),
            image_size=vis.get("image_size", 980),
            patch_size=vis.get("patch_size", 14),
            layer_norm_eps=vis.get("layer_norm_eps", 1e-6),
        ),
        perceiver=PerceiverConfig(
            n_latents=per.get("resampler_n_latents", 64),
            depth=per.get("resampler_depth", 3),
            n_heads=per.get("resampler_n_heads", 16),
            head_dim=per.get("resampler_head_dim", 96),
            num_kv_heads=per.get("num_key_value_heads", 4),
            rms_norm_eps=per.get("rms_norm_eps", 1e-6),
        ),
        image_token_id=cfg.get("image_token_id", 32001),
    )


def _gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


@functools.partial(jax.jit, static_argnames=("config", "bucket_positions"))
def siglip_vision_forward(
    params: dict,
    pixel_values: jax.Array,
    config: SiglipVisionConfig,
    bucket_positions: bool = True,
    position_ids: jax.Array | None = None,
    patch_mask: jax.Array | None = None,
) -> jax.Array:
    """SigLIP ViT (no CLS token) -> post-LN hidden states [B, P, E].

    Variable-aspect Idefics2 semantics (HF modeling_idefics2.Idefics2VisionEmbeddings):
    pass ``position_ids`` [B, P] (host-computed fractional-coordinate buckets) and
    ``patch_mask`` [B, P] (1 = real patch) for batches padded to a common H x W.
    Without them, ``bucket_positions=True`` reproduces the full-grid special case
    (position id max(i-1, 0) per axis); False uses plain arange positions (the
    standard SigLIP used by LLaVA-OneVision).
    """
    b = pixel_values.shape[0]
    p, e = config.patch_size, config.hidden_size
    nh, hd = config.num_heads, config.hidden_size // config.num_heads
    eps = config.layer_norm_eps

    grid_h = pixel_values.shape[2] // p
    grid_w = pixel_values.shape[3] // p
    x = pixel_values[:, :, : grid_h * p, : grid_w * p].reshape(b, 3, grid_h, p, grid_w, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, 3 * p * p)
    x = jnp.dot(x, params["patch_embed"]["w"], preferred_element_type=x.dtype) + params["patch_embed"]["b"]
    if position_ids is not None:
        x = x + jnp.take(params["position_embedding"], position_ids, axis=0).astype(x.dtype)
    elif bucket_positions:
        # Full-grid special case of the fractional bucketing: id max(i-1, 0) per axis.
        num_side = int(round(params["position_embedding"].shape[0] ** 0.5))
        h_ids = np.maximum(np.arange(grid_h) - 1, 0)
        w_ids = np.maximum(np.arange(grid_w) - 1, 0)
        pos_ids = (h_ids[:, None] * num_side + w_ids[None, :]).reshape(-1)
        x = x + jnp.take(params["position_embedding"], jnp.asarray(pos_ids), axis=0)[None].astype(x.dtype)
    else:
        x = x + params["position_embedding"][None, : x.shape[1], :].astype(x.dtype)

    def block(x, layer):
        L = x.shape[1]
        normed = layer_norm(layer["ln1"], x, eps=eps)
        q = dense(layer["attn"]["q"], normed).reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        k = dense(layer["attn"]["k"], normed).reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        v = dense(layer["attn"]["v"], normed).reshape(b, L, nh, hd).transpose(0, 2, 1, 3)
        attn = flash_attention(q, k, v, kv_mask=patch_mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, L, e)
        x = x + dense(layer["attn"]["o"], attn)
        normed2 = layer_norm(layer["ln2"], x, eps=eps)
        x = x + dense(layer["fc2"], _gelu_tanh(dense(layer["fc1"], normed2)))
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return layer_norm(params["post_ln"], x, eps=eps)


@functools.partial(jax.jit, static_argnames=("config",))
def encode_images(
    params: dict,
    pixel_values: jax.Array,
    config: Idefics2Config,
    position_ids: jax.Array | None = None,
    patch_mask: jax.Array | None = None,
) -> jax.Array:
    """Pixels [N, 3, H, W] -> resampled vision tokens [N, n_latents, H_text].

    ``position_ids`` / ``patch_mask`` enable HF-exact variable-aspect batches
    (images padded bottom/right to a common H x W); the perceiver's latents then
    attend only to real patches.
    """
    per = config.perceiver
    eps = per.rms_norm_eps
    vision = siglip_vision_forward(
        params["vision"], pixel_values, config.vision,
        position_ids=position_ids, patch_mask=patch_mask,
    )
    context = mlp_swiglu(params["modality_projection"], vision)

    n = context.shape[0]
    latents = jnp.broadcast_to(
        params["perceiver"]["latents"][None], (n, per.n_latents, context.shape[-1])
    ).astype(context.dtype)
    kv_mask = None
    if patch_mask is not None:
        kv_mask = jnp.concatenate(
            [patch_mask.astype(jnp.int32), jnp.ones((n, per.n_latents), jnp.int32)], axis=1
        )

    for layer in params["perceiver"]["layers"]:
        residual = latents
        lat_n = rms_norm(layer["input_latents_norm"], latents, eps=eps)
        ctx_n = rms_norm(layer["input_context_norm"], context, eps=eps)
        kv_src = jnp.concatenate([ctx_n, lat_n], axis=1)
        q = dense(layer["attn"]["q"], lat_n).reshape(n, per.n_latents, per.n_heads, per.head_dim).transpose(0, 2, 1, 3)
        k = dense(layer["attn"]["k"], kv_src).reshape(n, kv_src.shape[1], per.num_kv_heads, per.head_dim).transpose(0, 2, 1, 3)
        v = dense(layer["attn"]["v"], kv_src).reshape(n, kv_src.shape[1], per.num_kv_heads, per.head_dim).transpose(0, 2, 1, 3)
        rep = per.n_heads // per.num_kv_heads
        out = attention_reference(q, repeat_kv(k, rep), repeat_kv(v, rep), kv_mask=kv_mask)
        out = out.transpose(0, 2, 1, 3).reshape(n, per.n_latents, -1)
        latents = residual + dense(layer["attn"]["o"], out)
        residual = latents
        latents = residual + mlp_swiglu(layer["mlp"], rms_norm(layer["post_ln"], latents, eps=eps))

    return rms_norm(params["perceiver"]["norm"], latents, eps=eps)


# ====================================================================== weights


def init_idefics2_params(key: jax.Array, config: Idefics2Config, dtype=jnp.bfloat16) -> dict:
    kv, kp, kt = jax.random.split(key, 3)
    v, per = config.vision, config.perceiver
    e, inter, L = v.hidden_size, v.intermediate_size, v.num_layers
    h = config.text.hidden_size

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def slin(k, din, dout):
        return {"w": w(k, (L, din, dout)), "b": jnp.zeros((L, dout), dtype)}

    def slnp():
        return {"scale": jnp.ones((L, e), dtype), "bias": jnp.zeros((L, e), dtype)}

    vk = jax.random.split(kv, 8)
    vision = {
        "patch_embed": {"w": w(vk[0], (3 * v.patch_size**2, e)), "b": jnp.zeros(e, dtype)},
        "position_embedding": w(vk[1], ((v.image_size // v.patch_size) ** 2, e)),
        "layers": {
            "ln1": slnp(),
            "ln2": slnp(),
            "attn": {"q": slin(vk[2], e, e), "k": slin(vk[3], e, e), "v": slin(vk[4], e, e), "o": slin(vk[5], e, e)},
            "fc1": slin(vk[6], e, inter),
            "fc2": slin(vk[7], inter, e),
        },
        "post_ln": {"scale": jnp.ones(e, dtype), "bias": jnp.zeros(e, dtype)},
    }

    def plain(k, din, dout):
        return {"w": w(k, (din, dout))}

    pk = jax.random.split(kp, 16)
    players = []
    qdim = per.n_heads * per.head_dim
    kvdim = per.num_kv_heads * per.head_dim
    for i in range(per.depth):
        base = jax.random.fold_in(pk[0], i)
        bk = jax.random.split(base, 8)
        players.append(
            {
                "input_latents_norm": {"scale": jnp.ones(h, dtype)},
                "input_context_norm": {"scale": jnp.ones(h, dtype)},
                "attn": {
                    "q": plain(bk[0], h, qdim), "k": plain(bk[1], h, kvdim),
                    "v": plain(bk[2], h, kvdim), "o": plain(bk[3], qdim, h),
                },
                "post_ln": {"scale": jnp.ones(h, dtype)},
                "mlp": {
                    "gate": plain(bk[4], h, 4 * h), "up": plain(bk[5], h, 4 * h),
                    "down": plain(bk[6], 4 * h, h),
                },
            }
        )

    return {
        "text": init_decoder_params(kt, config.text.to_decoder_config(), dtype, attn_bias=False),
        "vision": vision,
        "modality_projection": {
            "gate": plain(pk[1], e, h), "up": plain(pk[2], e, h), "down": plain(pk[3], h, h),
        },
        "perceiver": {
            "latents": w(pk[4], (per.n_latents, h)),
            "layers": players,
            "norm": {"scale": jnp.ones(h, dtype)},
        },
    }


def convert_hf_idefics2_weights(
    state: dict, config: Idefics2Config, dtype=jnp.bfloat16, vision_only: bool = False
) -> dict:
    """vision_only: convert just the SigLIP tower (LLaVA-OneVision reuses it
    without the Idefics2 perceiver/connector)."""
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

    v = config.vision
    L = v.num_layers
    base = "vision_model.encoder.layers"

    def vlin(sub):
        return {
            "w": jnp.stack([t(f"{base}.{i}.{sub}.weight") for i in range(L)]),
            "b": jnp.stack([raw(f"{base}.{i}.{sub}.bias") for i in range(L)]),
        }

    def vln(sub):
        return {
            "scale": jnp.stack([raw(f"{base}.{i}.{sub}.weight") for i in range(L)]),
            "bias": jnp.stack([raw(f"{base}.{i}.{sub}.bias") for i in range(L)]),
        }

    patch_w = find("vision_model.embeddings.patch_embedding.weight")
    vision = {
        "patch_embed": {
            "w": jnp.asarray(patch_w.reshape(patch_w.shape[0], -1).T, dtype),
            "b": raw("vision_model.embeddings.patch_embedding.bias"),
        },
        "position_embedding": raw("vision_model.embeddings.position_embedding.weight"),
        "layers": {
            "ln1": vln("layer_norm1"),
            "ln2": vln("layer_norm2"),
            "attn": {
                "q": vlin("self_attn.q_proj"), "k": vlin("self_attn.k_proj"),
                "v": vlin("self_attn.v_proj"), "o": vlin("self_attn.out_proj"),
            },
            "fc1": vlin("mlp.fc1"),
            "fc2": vlin("mlp.fc2"),
        },
        "post_ln": {
            "scale": raw("vision_model.post_layernorm.weight"),
            "bias": raw("vision_model.post_layernorm.bias"),
        },
    }

    if vision_only:
        return {"vision": vision}

    def plain(name):
        return {"w": t(name + ".weight")}

    players = []
    for i in range(config.perceiver.depth):
        pb = f"connector.perceiver_resampler.layers.{i}"
        players.append(
            {
                "input_latents_norm": {"scale": raw(f"{pb}.input_latents_norm.weight")},
                "input_context_norm": {"scale": raw(f"{pb}.input_context_norm.weight")},
                "attn": {
                    "q": plain(f"{pb}.self_attn.q_proj"), "k": plain(f"{pb}.self_attn.k_proj"),
                    "v": plain(f"{pb}.self_attn.v_proj"), "o": plain(f"{pb}.self_attn.o_proj"),
                },
                "post_ln": {"scale": raw(f"{pb}.post_attention_layernorm.weight")},
                "mlp": {
                    "gate": plain(f"{pb}.mlp.gate_proj"), "up": plain(f"{pb}.mlp.up_proj"),
                    "down": plain(f"{pb}.mlp.down_proj"),
                },
            }
        )

    return {
        "text": convert_hf_decoder_weights(
            state, config.text.to_decoder_config(), dtype, attn_bias=False
        ),
        "vision": vision,
        "modality_projection": {
            "gate": plain("connector.modality_projection.gate_proj"),
            "up": plain("connector.modality_projection.up_proj"),
            "down": plain("connector.modality_projection.down_proj"),
        },
        "perceiver": {
            "latents": raw("connector.perceiver_resampler.latents"),
            "layers": players,
            "norm": {"scale": raw("connector.perceiver_resampler.norm.weight")},
        },
    }
