"""Qwen2-VL / Qwen2.5-VL in JAX — vision tower + M-RoPE decoder with KV-cache generation.

TPU-first reimplementation of the model family the reference drives through HF torch
(reference: src/models/_qwen2_vl.py). Design:
  - Decoder layers are *stacked* along a leading axis and executed with ``lax.scan``,
    so one compiled layer body serves all layers (fast compiles, uniform sharding).
  - Prefill uses the Pallas flash-attention kernel (causal + padding mask); decode
    attends to a preallocated KV cache under ``lax.while_loop`` with early exit when
    every sequence has emitted EOS.
  - Prompts are LEFT-padded to shape buckets so decode writes the cache at a uniform
    position for the whole batch.
  - M-RoPE (temporal/height/width rotary sections) follows the HF semantics
    (transformers qwen2_vl.modeling: apply_multimodal_rotary_pos_emb) but is computed
    in the half-dim convention used by :mod:`lmms_owc_tpu.nn.layers`.
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import (
    apply_rope,
    dense,
    dense_fm,
    embedding,
    gelu,
    layer_norm,
    layer_norm_fm,
    mlp_swiglu,
    rms_norm,
)
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    fused_qkv_attention,
    fused_qkv_attention_fm,
    gqa_attention_reference,
    gqa_decode_attention,
    packed_vision_attention,
)
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "Qwen2VLConfig",
    "Qwen2VLVisionConfig",
    "write_pool_chunk",
    "write_pool_scales",
    "convert_hf_decoder_weights",
    "convert_hf_weights",
    "decode_pool",
    "decode_step",
    "greedy_generate",
    "prefill_logits",
    "init_decoder_params",
    "init_params",
    "mrope_cos_sin",
    "prefill",
    "score_continuation",
    "vision_encode",
    "vision_encode_batch",
    "vision_rope_cos_sin",
    "get_rope_index",
]


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


@dataclass(frozen=True)
class Qwen2VLConfig:
    vocab_size: int = 151936
    hidden_size: int = 1536
    num_layers: int = 28
    num_heads: int = 12
    num_kv_heads: int = 2
    intermediate_size: int = 8960
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = True
    mrope_section: tuple = (16, 24, 24)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    eos_token_id: int = 151645
    pad_token_id: int = 151643
    # Llama3-style RoPE frequency scaling: (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings), or None for plain RoPE.
    rope_llama3: tuple | None = None
    # Phi-3 longrope scaling: (attention_factor, per-dim rescale factors tuple).
    rope_longrope: tuple | None = None
    vision: Qwen2VLVisionConfig = field(default_factory=Qwen2VLVisionConfig)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf_dict(cls, cfg: dict) -> "Qwen2VLConfig":
        """Build from an HF config.json dict (qwen2_vl / qwen2_5_vl)."""
        text = cfg.get("text_config", cfg)
        vis = cfg.get("vision_config", {})
        vision = Qwen2VLVisionConfig(
            depth=vis.get("depth", 32),
            embed_dim=vis.get("embed_dim", vis.get("hidden_size", 1280)),
            num_heads=vis.get("num_heads", 16),
            mlp_ratio=vis.get("mlp_ratio", 4.0),
            in_channels=vis.get("in_channels", vis.get("in_chans", 3)),
            patch_size=vis.get("patch_size", 14),
            temporal_patch_size=vis.get("temporal_patch_size", 2),
            spatial_merge_size=vis.get("spatial_merge_size", 2),
            hidden_act=vis.get("hidden_act", "quick_gelu"),
        )
        rope_scaling = text.get("rope_scaling") or {}
        eos = text.get("eos_token_id", 151645)
        return cls(
            vocab_size=text["vocab_size"],
            hidden_size=text["hidden_size"],
            num_layers=text["num_hidden_layers"],
            num_heads=text["num_attention_heads"],
            num_kv_heads=text.get("num_key_value_heads", text["num_attention_heads"]),
            intermediate_size=text["intermediate_size"],
            rms_norm_eps=text.get("rms_norm_eps", 1e-6),
            rope_theta=text.get("rope_theta", 1000000.0),
            max_position_embeddings=text.get("max_position_embeddings", 32768),
            tie_word_embeddings=cfg.get("tie_word_embeddings", text.get("tie_word_embeddings", False)),
            mrope_section=tuple(rope_scaling.get("mrope_section", (16, 24, 24))),
            image_token_id=cfg.get("image_token_id", 151655),
            video_token_id=cfg.get("video_token_id", 151656),
            vision_start_token_id=cfg.get("vision_start_token_id", 151652),
            eos_token_id=eos[0] if isinstance(eos, list) else eos,
            pad_token_id=cfg.get("pad_token_id", 151643) or 151643,
            vision=vision,
        )


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


_VISION_ACTS = {"quick_gelu": quick_gelu, "gelu": gelu, "silu": jax.nn.silu}


# ======================================================================== init


def _make_w(dtype, host_rng: bool):
    """Weight initializer: jax threefry, or numpy PCG64 for huge host builds.

    Threefry on CPU takes tens of minutes for a 7B+ tree; the streaming-int8
    path (random-init benchmarking only — checkpoints never touch this) seeds
    numpy from the jax key data instead, cutting host init to seconds. Same
    distribution, different stream.
    """
    if not host_rng:
        def w(k, shape, scale=0.02):
            return (jax.random.normal(k, shape) * scale).astype(dtype)

        return w

    def w(k, shape, scale=0.02):
        try:
            data = np.asarray(jax.random.key_data(k))  # typed PRNG keys
        except TypeError:
            data = np.asarray(k)  # raw uint32 key arrays
        rng = np.random.default_rng(int(data.ravel()[-1]))
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale, dtype)

    return w


def init_decoder_params(
    key: jax.Array, config: Qwen2VLConfig, dtype=jnp.bfloat16, attn_bias: bool = True,
    host_rng: bool = False,
) -> dict:
    """Random-init the text decoder tree (stacked layers, no vision tower)."""
    keys = jax.random.split(key, 4)
    kit = iter(keys)

    w = _make_w(dtype, host_rng)

    h, kvh, hd = config.hidden_size, config.num_kv_heads, config.head_dim
    nh, inter, L = config.num_heads, config.intermediate_size, config.num_layers

    def stack_linears(k, din, dout, bias):
        out = {"w": w(k, (L, din, dout))}
        if bias:
            out["b"] = jnp.zeros((L, dout), dtype)
        return out

    lk = jax.random.split(next(kit), 8)
    layers = {
        "attn": {
            "q": stack_linears(lk[0], h, nh * hd, bias=attn_bias),
            "k": stack_linears(lk[1], h, kvh * hd, bias=attn_bias),
            "v": stack_linears(lk[2], h, kvh * hd, bias=attn_bias),
            "o": stack_linears(lk[3], nh * hd, h, bias=False),
        },
        "input_ln": {"scale": jnp.ones((L, h), dtype)},
        "post_ln": {"scale": jnp.ones((L, h), dtype)},
        "mlp": {
            "gate": stack_linears(lk[4], h, inter, bias=False),
            "up": stack_linears(lk[5], h, inter, bias=False),
            "down": stack_linears(lk[6], inter, h, bias=False),
        },
    }
    params = {
        "embed_tokens": w(next(kit), (config.vocab_size, h)),
        "layers": layers,
        "final_norm": {"scale": jnp.ones(h, dtype)},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"w": w(next(kit), (h, config.vocab_size))}
    return params


def init_params(
    key: jax.Array, config: Qwen2VLConfig, dtype=jnp.bfloat16, host_rng: bool = False
) -> dict:
    """Random-init full parameter tree (decoder layers stacked on axis 0)."""
    keys = jax.random.split(key, 16)
    kit = iter(keys)
    params = init_decoder_params(next(kit), config, dtype, attn_bias=True, host_rng=host_rng)

    w = _make_w(dtype, host_rng)

    h = config.hidden_size

    v = config.vision
    vk = jax.random.split(next(kit), 8)
    vision_layers = {
        "norm1": {"scale": jnp.ones((v.depth, v.embed_dim), dtype), "bias": jnp.zeros((v.depth, v.embed_dim), dtype)},
        "norm2": {"scale": jnp.ones((v.depth, v.embed_dim), dtype), "bias": jnp.zeros((v.depth, v.embed_dim), dtype)},
        "qkv": {"w": w(vk[0], (v.depth, v.embed_dim, 3 * v.embed_dim)), "b": jnp.zeros((v.depth, 3 * v.embed_dim), dtype)},
        "proj": {"w": w(vk[1], (v.depth, v.embed_dim, v.embed_dim)), "b": jnp.zeros((v.depth, v.embed_dim), dtype)},
        "fc1": {"w": w(vk[2], (v.depth, v.embed_dim, v.mlp_hidden)), "b": jnp.zeros((v.depth, v.mlp_hidden), dtype)},
        "fc2": {"w": w(vk[3], (v.depth, v.mlp_hidden, v.embed_dim)), "b": jnp.zeros((v.depth, v.embed_dim), dtype)},
    }
    merge_dim = v.embed_dim * v.spatial_merge_size**2
    params["vision"] = {
        "patch_embed": {"w": w(next(kit), (v.patch_dim, v.embed_dim))},
        "layers": vision_layers,
        "merger": {
            "ln_q": {"scale": jnp.ones(v.embed_dim, dtype), "bias": jnp.zeros(v.embed_dim, dtype)},
            "fc1": {"w": w(next(kit), (merge_dim, merge_dim)), "b": jnp.zeros(merge_dim, dtype)},
            "fc2": {"w": w(next(kit), (merge_dim, h)), "b": jnp.zeros(h, dtype)},
        },
    }
    return params


# ================================================================== converter


def convert_hf_decoder_weights(
    state: dict, config: Qwen2VLConfig, dtype=jnp.bfloat16, attn_bias: bool = True
) -> dict:
    """Map HF llama-style decoder safetensors names to the stacked-layer tree.

    Handles the prefix variants used across model families/versions
    ("model.", "model.language_model.", "language_model.").
    """

    def find(name: str):
        for prefix in (
            "", "model.", "model.language_model.", "language_model.",
            "language_model.model.", "model.text_model.",
        ):
            if prefix + name in state:
                return state[prefix + name]
        raise KeyError(f"tensor {name!r} not found (available sample: {list(state)[:5]})")

    def t(name):  # transposed 2D
        arr = find(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(find(name), dtype)

    def stack_lin(fmt, L, bias):
        out = {"w": jnp.stack([t(fmt.format(i) + ".weight") for i in range(L)])}
        if bias:
            out["b"] = jnp.stack([raw(fmt.format(i) + ".bias") for i in range(L)])
        return out

    def stack_norm(fmt, L, bias=False):
        out = {"scale": jnp.stack([raw(fmt.format(i) + ".weight") for i in range(L)])}
        if bias:
            out["bias"] = jnp.stack([raw(fmt.format(i) + ".bias") for i in range(L)])
        return out

    L = config.num_layers
    lp = "layers.{}"
    layers = {
        "attn": {
            "q": stack_lin(lp + ".self_attn.q_proj", L, attn_bias),
            "k": stack_lin(lp + ".self_attn.k_proj", L, attn_bias),
            "v": stack_lin(lp + ".self_attn.v_proj", L, attn_bias),
            "o": stack_lin(lp + ".self_attn.o_proj", L, False),
        },
        "input_ln": stack_norm(lp + ".input_layernorm", L),
        "post_ln": stack_norm(lp + ".post_attention_layernorm", L),
        "mlp": {
            "gate": stack_lin(lp + ".mlp.gate_proj", L, False),
            "up": stack_lin(lp + ".mlp.up_proj", L, False),
            "down": stack_lin(lp + ".mlp.down_proj", L, False),
        },
    }
    params = {
        "embed_tokens": raw("embed_tokens.weight"),
        "layers": layers,
        "final_norm": {"scale": raw("norm.weight")},
    }
    if not config.tie_word_embeddings:
        if "lm_head.weight" in state:
            params["lm_head"] = {"w": jnp.asarray(np.asarray(state["lm_head.weight"]).T, dtype)}
        else:
            params["lm_head"] = {"w": t("lm_head.weight")}
    return params


def convert_hf_weights(state: dict, config: Qwen2VLConfig, dtype=jnp.bfloat16) -> dict:
    """Map HF qwen2_vl safetensors names (decoder + vision tower) to the param tree."""
    params = convert_hf_decoder_weights(state, config, dtype, attn_bias=True)

    def vfind(name: str):
        for prefix in ("visual.", "model.visual."):
            if prefix + name in state:
                return state[prefix + name]
        raise KeyError(f"vision tensor {name!r} not found")

    def vt(name):
        arr = vfind(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def vraw(name):
        return jnp.asarray(vfind(name), dtype)

    v = config.vision
    D = v.depth

    def vstack(fmt, key, transpose):
        return jnp.stack(
            [
                jnp.asarray(
                    np.asarray(vfind(fmt.format(i))).T if transpose else np.asarray(vfind(fmt.format(i))),
                    dtype,
                )
                for i in range(D)
            ]
        )

    vision_layers = {
        "norm1": {
            "scale": vstack("blocks.{}.norm1.weight", None, False),
            "bias": vstack("blocks.{}.norm1.bias", None, False),
        },
        "norm2": {
            "scale": vstack("blocks.{}.norm2.weight", None, False),
            "bias": vstack("blocks.{}.norm2.bias", None, False),
        },
        "qkv": {
            "w": vstack("blocks.{}.attn.qkv.weight", None, True),
            "b": vstack("blocks.{}.attn.qkv.bias", None, False),
        },
        "proj": {
            "w": vstack("blocks.{}.attn.proj.weight", None, True),
            "b": vstack("blocks.{}.attn.proj.bias", None, False),
        },
        "fc1": {
            "w": vstack("blocks.{}.mlp.fc1.weight", None, True),
            "b": vstack("blocks.{}.mlp.fc1.bias", None, False),
        },
        "fc2": {
            "w": vstack("blocks.{}.mlp.fc2.weight", None, True),
            "b": vstack("blocks.{}.mlp.fc2.bias", None, False),
        },
    }

    # Conv3d patch kernel [embed, 3, t, p, p] -> flat [patch_dim, embed].
    patch_w = np.asarray(vfind("patch_embed.proj.weight"))
    patch_w = patch_w.reshape(v.embed_dim, -1).T

    params["vision"] = {
        "patch_embed": {"w": jnp.asarray(patch_w, dtype)},
        "layers": vision_layers,
        "merger": {
            "ln_q": {"scale": vraw("merger.ln_q.weight"), "bias": vraw("merger.ln_q.bias")},
            "fc1": {"w": vt("merger.mlp.0.weight"), "b": vraw("merger.mlp.0.bias")},
            "fc2": {"w": vt("merger.mlp.2.weight"), "b": vraw("merger.mlp.2.bias")},
        },
    }
    return params


# ==================================================================== vision


def vision_rope_cos_sin(grid_thw: list[tuple[int, int, int]], config: Qwen2VLVisionConfig) -> np.ndarray:
    """Host-side 2D rotary table per packed patch, shape [num_patches, head_dim/2] (f32).

    Follows HF rot_pos_emb (modeling_qwen2_vl: Qwen2VisionTransformer.rot_pos_emb):
    h/w position ids are permuted into spatial-merge-window order before lookup.
    """
    merge = config.spatial_merge_size
    dim = config.head_dim // 2  # rotary dim (half for h, half for w)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))

    pos_list = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, axis=1)
        hpos = hpos.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, axis=0)
        wpos = wpos.reshape(h // merge, merge, w // merge, merge).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], axis=-1)
        pos_list.append(np.tile(pos, (t, 1)))
    pos = np.concatenate(pos_list, axis=0)  # [P, 2]

    freqs_h = pos[:, 0:1].astype(np.float32) * inv_freq[None, :]
    freqs_w = pos[:, 1:2].astype(np.float32) * inv_freq[None, :]
    return np.concatenate([freqs_h, freqs_w], axis=-1)  # [P, head_dim/2]


def _vision_packed_enabled(qkv_params: dict) -> bool:
    """Packed-qkv vision attention gate, read at TRACE time.

    DEFAULT OFF — measured e2e LOSS on hardware (r3 interleaved A/B, 7B int8
    W8A8 B=48: packed 18.95 img/s vs unpacked 20.1-20.3 in the same session
    window). The kernel does eliminate the ~4.5 ms/layer qkv layout copies,
    but padding head_dim 80 -> 128 inflates the qkv dense output (3840 -> 6144
    cols) and proj contraction (1280 -> 2048 rows): ~+20% real MXU work on
    zero columns, which outweighs the copies saved. Kept as an opt-in probe
    (``LMMS_OWC_VISION_PACKED=1`` on TPU, ``force`` anywhere) because the
    balance could flip for a head_dim-128 tower (zero padding waste).

    Weight-only int4 keeps the unpacked path regardless (the groupwise nibble
    layout doesn't re-pad cheaply). If you flip the env after programs are
    traced, drop the jit caches (``jax.clear_caches()``) like the W8A8 toggle.
    """
    import os

    mode = os.environ.get("LMMS_OWC_VISION_PACKED", "")
    if "w_q4" in qkv_params:
        return False
    if mode == "force":
        return True
    return mode == "1" and jax.default_backend() == "tpu"


def _vision_fm_enabled() -> bool:
    """Feature-major vision tower gate (``LMMS_OWC_VISION_FM``), TRACE time.

    Activations stay [N, C, P] (channels on sublanes, tokens on lanes) through
    the whole tower, with weights pre-transposed at load
    (:func:`vision_params_to_fm`) — so the qkv projection output is consumed
    by :func:`ops.fused_qkv_attention_fm` IN PLACE (head offsets are 8-aligned
    SUBLANE offsets) and the per-layer 2-pass token-major transpose
    (r3e xplane copy.41 + copy.42, ~2.8 ms/layer at 7B bench shapes)
    disappears. **Default ON on TPU** since the r3 final-session interleaved
    hardware A/B (two clean pairs: 23.5 vs 21.7/21.7 and 21.7 vs 20.1
    img/s/chip, ~+8% e2e each). ``LMMS_OWC_VISION_FM=0`` opts out; ``force``
    enables anywhere (CPU parity tests). Takes precedence over
    LMMS_OWC_VISION_PACKED (mutually exclusive layouts).
    """
    import os

    mode = os.environ.get("LMMS_OWC_VISION_FM", "1")
    if mode == "force":
        return True
    return mode == "1" and jax.default_backend() == "tpu"


def vision_params_to_fm(vision: dict) -> dict:
    """Pre-transpose the vision tower's dense weights to feature-major
    [C_out, C_in] (stacked layer leaves keep their leading depth axis). The
    merger stays token-major — the tower exit transposes once per chunk
    instead of twice per layer. int8 per-output-channel scales are unchanged
    (they apply along the fm SUBLANE axis, ``layers.dense_fm``)."""

    def t(dense_p: dict) -> dict:
        out = dict(dense_p)
        if "w" in out:
            out["w"] = jnp.swapaxes(out["w"], -1, -2)
        if "w_q8" in out:
            q8 = dict(out["w_q8"])
            q8["q"] = jnp.swapaxes(q8["q"], -1, -2)
            out["w_q8"] = q8
        return out

    layers = dict(vision["layers"])
    for key in ("qkv", "proj", "fc1", "fc2"):
        layers[key] = t(layers[key])
    new = dict(vision)
    new["layers"] = layers
    new["patch_embed"] = t(vision["patch_embed"])
    return new


def _vision_fused_qkv_enabled() -> bool:
    """Combined-heads qkv attention gate, read at TRACE time.

    One [N, 3*nh, P, hd] transpose feeds :func:`fused_qkv_attention` (q/k/v as
    head-offset views of the same array) instead of three per-role slice
    materializations. ``LMMS_OWC_VISION_FUSED_QKV``: "0" disables, "force"
    enables off-TPU (CPU parity tests), default = TPU backend only. Flip the
    env after tracing -> drop jit caches (``jax.clear_caches()``).
    """
    import os

    mode = os.environ.get("LMMS_OWC_VISION_FUSED_QKV", "")
    if mode == "0":
        return False
    if mode == "force":
        return True
    return jax.default_backend() == "tpu"


def _pad_vision_attn_params(layers: dict, nh: int, hd: int, hp: int) -> dict:
    """Trace-time re-layout of the stacked vision attention weights for the
    packed kernel: each head's qkv columns pad hd -> hp (zeros; quant scales
    pad with ones) so per-head lane offsets are hp-aligned, and the output
    projection's input rows pad to match. Padding columns produce exact zeros
    through the attention (zero weight + zero bias), and the zero projection
    rows consume them exactly, so the math is unchanged. One [D, in, 3*NH*HP]
    materialization per jitted call (~0.5 ms at 7B shapes) replaces ~4.5 ms of
    qkv layout copies per LAYER (r3d xplane: copy.41/copy.42/slice_bitcast).
    """
    pad = hp - hd

    def pad_cols(a, fill):
        lead = a.shape[:-1]
        a = a.reshape(*lead, 3, nh, hd)
        a = jnp.pad(
            a, [(0, 0)] * (a.ndim - 1) + [(0, pad)], constant_values=fill
        )
        return a.reshape(*lead, 3 * nh * hp)

    def pad_rows(a):
        D, _, out = a.shape
        a = a.reshape(D, nh, hd, out)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return a.reshape(D, nh * hp, out)

    qkv = dict(layers["qkv"])
    proj = dict(layers["proj"])
    if "w_q8" in qkv:
        qkv["w_q8"] = {
            "q": pad_cols(qkv["w_q8"]["q"], 0),
            "scale": pad_cols(qkv["w_q8"]["scale"], 1.0),
        }
    else:
        qkv["w"] = pad_cols(qkv["w"], 0)
    if qkv.get("b") is not None:
        qkv["b"] = pad_cols(qkv["b"], 0)
    if "w_q8" in proj:
        proj["w_q8"] = {"q": pad_rows(proj["w_q8"]["q"]), "scale": proj["w_q8"]["scale"]}
    else:
        proj["w"] = pad_rows(proj["w"])
    out = dict(layers)
    out["qkv"] = qkv
    out["proj"] = proj
    return out


@functools.partial(jax.jit, static_argnames=("config",))
def vision_encode_batch(
    params: dict,
    patches: jax.Array,
    rope_freqs: jax.Array,
    patch_mask: jax.Array | None,
    config: Qwen2VLVisionConfig,
) -> jax.Array:
    """Vision tower over a batch of images' packed (padded) patches.

    Images never attend across each other (full attention is per image, reference
    cu_seqlens semantics), so a batch of independently padded images is exact.

    Args:
        patches: [N, P, patch_dim] flattened conv patches (P padded to a bucket).
        rope_freqs: [N, P, head_dim/2] from :func:`vision_rope_cos_sin` (zero at padding).
        patch_mask: [N, P] 1 = real patch, or None when every patch is real
            (P == bucket) — skips the masked-select over the score tensor.
        patch_mask: [N, P] 1 = real patch.
    Returns: [N, P/merge^2, hidden_size] merged vision embeddings (padding rows garbage).
    """
    act = _VISION_ACTS[config.hidden_act]
    param_dtype = params["patch_embed"]["w"].dtype
    # The env gate says whether the LOADER transposed the tree to feature-major
    # (vision_params_to_fm); confirm against the actual patch_embed layout so a
    # tree that skipped the transpose (TP-sharded load, hand-built fixtures)
    # always takes the matching token-major trace even when the gate is on.
    fm = (
        _vision_fm_enabled()
        and params["patch_embed"]["w"].shape[-1] == patches.shape[-1]
        # dense_fm supports bf16/int8 leaves only; an int4 tree (w_q4) must
        # take the token-major trace (its packed-nibble layout has no fm form).
        and "w_q4" not in params["layers"]["qkv"]
    )
    if fm:
        # Feature-major tower: params were pre-transposed at load
        # (vision_params_to_fm), so patch_embed's w is [embed_dim, patch_dim]
        # and the embed lands [N, C, P] directly — XLA folds the patches
        # transpose into this one dot.
        x = jnp.einsum(
            "ed,npd->nep", params["patch_embed"]["w"], patches.astype(param_dtype),
            preferred_element_type=param_dtype,
        )
        n, _, P = x.shape
    else:
        x = jnp.einsum(
            "npd,de->npe", patches.astype(param_dtype), params["patch_embed"]["w"],
            preferred_element_type=param_dtype,
        )
        n, P, _ = x.shape
    nh, hd = config.num_heads, config.head_dim
    packed = not fm and _vision_packed_enabled(params["layers"]["qkv"])

    if packed:
        # Packed-qkv path: the attention kernel consumes the qkv projection
        # output in place (per-head columns padded to 128 lanes at trace time)
        # and emits the padded layout the row-padded proj consumes — zero
        # unpack/transpose copies, and rope cos/sin computed in-kernel from
        # the frequency table.
        layers_tree = _pad_vision_attn_params(params["layers"], nh, hd, 128)
        freqs = rope_freqs.astype(jnp.float32)

        def block(x, layer):
            normed = layer_norm(layer["norm1"], x, eps=1e-6)
            qkv = dense(layer["qkv"], normed)  # [n, P, 3*nh*128]
            attn = packed_vision_attention(
                qkv, nh, hd, kv_mask=patch_mask, freqs=freqs,
            )
            x = x + dense(layer["proj"], attn)
            normed2 = layer_norm(layer["norm2"], x, eps=1e-6)
            x = x + dense(layer["fc2"], act(dense(layer["fc1"], normed2)))
            return x, None

    elif fm:
        layers_tree = params["layers"]
        freqs_fm = jnp.swapaxes(rope_freqs, 1, 2).astype(jnp.float32)  # [N, hd/2, P]
        cos_fm = jnp.cos(freqs_fm)
        sin_fm = jnp.sin(freqs_fm)
        # NOTE (r5 xplane): the per-layer f32[48,40,1024] cos/sin copies into
        # each pallas call (copy-start.2/.3) are ASYNC DMAs overlapped with
        # compute — forcing a dense materialization out of the scan (flat-
        # reshape roundtrip) measured 379.8 vs 370.5 ms/call, i.e. they are
        # not on the critical path. Leave the layout to XLA.

        def block(x, layer):  # x [N, C, P]
            normed = layer_norm_fm(layer["norm1"], x, eps=1e-6)
            # qkv dense output consumed IN PLACE: the kernel's q/k/v operands
            # are sublane-offset views of this [N, 3*nh*hd, P] array, rope
            # rides the kernel's block loads, and the attention output stays
            # feature-major for the proj — no layout copies anywhere.
            qkv = dense_fm(layer["qkv"], normed)
            attn = fused_qkv_attention_fm(
                qkv, nh, hd, kv_mask=patch_mask, rope_cos=cos_fm, rope_sin=sin_fm,
            )
            x = x + dense_fm(layer["proj"], attn)
            normed2 = layer_norm_fm(layer["norm2"], x, eps=1e-6)
            x = x + dense_fm(layer["fc2"], act(dense_fm(layer["fc1"], normed2)))
            return x, None

    elif _vision_fused_qkv_enabled():
        layers_tree = params["layers"]
        cos = jnp.cos(rope_freqs)  # [N, P, hd/2] f32, shared by q and k
        sin = jnp.sin(rope_freqs)

        def block(x, layer):
            normed = layer_norm(layer["norm1"], x, eps=1e-6)
            # ONE transpose of the qkv projection output to a combined-heads
            # [N, 3*nh, P, hd] array; the flash kernel's q/k/v operands are
            # head-offset BlockSpec views of it, so no per-role slice copies
            # are materialized (r3d xplane: the three-array form cost ~4.5 ms
            # of layout copies per layer at the 7B bench shapes).
            qkvh = dense(layer["qkv"], normed).reshape(n, P, 3 * nh, hd)
            qkvh = qkvh.transpose(0, 2, 1, 3)
            attn = fused_qkv_attention(
                qkvh, nh, nh, kv_mask=patch_mask, rope_cos=cos, rope_sin=sin,
                kv_mask_contiguous=True,  # [:num_patches] prefix run (models/qwen2_vl)
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(n, P, nh * hd)
            x = x + dense(layer["proj"], attn)
            normed2 = layer_norm(layer["norm2"], x, eps=1e-6)
            x = x + dense(layer["fc2"], act(dense(layer["fc1"], normed2)))
            return x, None

    else:
        layers_tree = params["layers"]
        cos = jnp.cos(rope_freqs)  # [N, P, hd/2] f32, shared by q and k
        sin = jnp.sin(rope_freqs)

        def block(x, layer):
            normed = layer_norm(layer["norm1"], x, eps=1e-6)
            # NOTE: the middle-dim gather + transpose reads better than lane-axis
            # slicing here — A/B'd on hardware (14.1 vs 13.1-13.7 img/s/chip e2e);
            # XLA fuses this layout into the attention consumers.
            qkv = dense(layer["qkv"], normed).reshape(n, P, 3, nh, hd)
            # One transpose of the packed tensor, then free leading-axis slices
            # (vs three gather+transpose fusions; A/B'd r3).
            qkv_t = qkv.transpose(2, 0, 3, 1, 4)  # [3, N, nh, P, hd]
            q, k, v = qkv_t[0], qkv_t[1], qkv_t[2]
            # Rope rides the attention kernel's q/k loads (r3 xplane: standalone
            # rotation + cos/sin staging cost ~4.3 ms of the 23.6 ms layer).
            attn = flash_attention(
                q, k, v, kv_mask=patch_mask, rope_cos=cos, rope_sin=sin,
                kv_mask_contiguous=True,  # [:num_patches] prefix run (models/qwen2_vl)
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(n, P, nh * hd)
            x = x + dense(layer["proj"], attn)
            normed2 = layer_norm(layer["norm2"], x, eps=1e-6)
            x = x + dense(layer["fc2"], act(dense(layer["fc1"], normed2)))
            return x, None

    x, _ = jax.lax.scan(block, x, layers_tree)
    if fm:
        # ONE tower-exit transpose back to token-major for the merger — vs the
        # token-major tower's two relayout passes per layer.
        x = jnp.swapaxes(x, 1, 2)

    # Patch merger: LN then merge spatial_merge_size^2 neighbors -> MLP.
    merged_dim = config.embed_dim * config.spatial_merge_size**2
    x = layer_norm(params["merger"]["ln_q"], x, eps=1e-6).reshape(n, -1, merged_dim)
    x = dense(params["merger"]["fc2"], gelu(dense(params["merger"]["fc1"], x)))
    return x


def vision_encode(
    params: dict,
    patches: jax.Array,
    rope_freqs: jax.Array,
    patch_mask: jax.Array,
    config: Qwen2VLVisionConfig,
) -> jax.Array:
    """Single-image convenience wrapper over :func:`vision_encode_batch`."""
    out = vision_encode_batch(
        params, patches[None], rope_freqs[None], patch_mask[None], config
    )
    return out[0]


# =============================================================== M-RoPE utils


def get_rope_index(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    image_grid_thw: list[tuple[int, int, int]],
    config: Qwen2VLConfig,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side 3D (t/h/w) position ids, shape [3, B, L]; plus per-seq next position.

    Semantics match HF Qwen2VLModel.get_rope_index: text tokens advance all three
    dims together; each image block advances t by timestep and h/w by grid position,
    then text resumes at max+1.
    """
    bsz, seqlen = input_ids.shape
    position_ids = np.ones((3, bsz, seqlen), dtype=np.int64)
    next_pos = np.zeros(bsz, dtype=np.int64)
    merge = config.vision.spatial_merge_size
    image_index = 0

    for i in range(bsz):
        mask = attention_mask[i] == 1
        ids = input_ids[i][mask]
        tokens = ids.tolist()
        pos_chunks = []
        st = 0
        num_images = int(np.sum(ids == config.image_token_id) > 0) and tokens.count(config.image_token_id)
        # Count image placeholders (one run of image_token_id per image).
        remain = []
        idx = 0
        vision_starts = np.where(ids == config.vision_start_token_id)[0]
        n_imgs = int(np.sum(ids[vision_starts + 1] == config.image_token_id)) if len(vision_starts) else 0

        for _ in range(n_imgs):
            ed = tokens.index(config.image_token_id, st)
            t, h, w = image_grid_thw[image_index]
            image_index += 1
            gt, gh, gw = t, h // merge, w // merge
            text_len = ed - st
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            pos_chunks.append(np.tile(np.arange(text_len), (3, 1)) + st_idx)
            t_idx = np.repeat(np.arange(gt), gh * gw)
            h_idx = np.tile(np.repeat(np.arange(gh), gw), gt)
            w_idx = np.tile(np.arange(gw), gt * gh)
            pos_chunks.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
            st = ed + gt * gh * gw

        if st < len(tokens):
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            pos_chunks.append(np.tile(np.arange(len(tokens) - st), (3, 1)) + st_idx)

        positions = np.concatenate(pos_chunks, axis=1)
        position_ids[:, i, mask] = positions
        next_pos[i] = positions.max() + 1
    return position_ids, next_pos


def _llama3_scale_inv_freq(inv_freq: jax.Array, scaling: tuple) -> jax.Array:
    """HF llama3 rope scaling: damp low-frequency components by ``factor`` with a
    smooth transition band (transformers modeling_rope_utils._compute_llama3_parameters)."""
    factor, low_freq_factor, high_freq_factor, old_context_len = scaling
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2 * np.pi / inv_freq
    scaled = jnp.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_context_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen >= high_freq_wavelen) & (wavelen <= low_freq_wavelen)
    return jnp.where(is_medium, smoothed, scaled)


def mrope_cos_sin(
    position_ids: jax.Array, config: Qwen2VLConfig
) -> tuple[jax.Array, jax.Array]:
    """Combine t/h/w rotary tables into [B, L, head_dim/2] cos/sin (f32)."""
    hd2 = config.head_dim // 2
    inv_freq = 1.0 / (config.rope_theta ** (jnp.arange(0, hd2, dtype=jnp.float32) / hd2))
    attention_factor = 1.0
    if config.rope_llama3 is not None:
        inv_freq = _llama3_scale_inv_freq(inv_freq, config.rope_llama3)
    if config.rope_longrope is not None:
        attention_factor, ext_factors = config.rope_longrope
        inv_freq = inv_freq / jnp.asarray(ext_factors, jnp.float32)
    # freqs: [3, B, L, hd/2]
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq[None, None, None, :]
    sections = np.cumsum(np.array(config.mrope_section))[:-1]
    chunks = jnp.split(freqs, sections.tolist(), axis=-1)
    combined = jnp.concatenate([chunk[i % 3] for i, chunk in enumerate(chunks)], axis=-1)
    return jnp.cos(combined) * attention_factor, jnp.sin(combined) * attention_factor


# ===================================================================== decoder


def _decoder_fused_qkv_enabled(q_params: dict) -> bool:
    """Combined-qkv decoder PREFILL gate, read at TRACE time.

    DEFAULT OFF — measured e2e LOSS on hardware (r3 interleaved A/B, 7B int8
    W8A8 B=48: fused 19.41/20.41 vs split 20.65/20.66 img/s). Unlike the
    vision tower (one fused dense, clean win), the decoder's q/k/v are
    separate projections, so the fused form must CONCAT the weights per layer
    inside the scan (~16.5 MB/layer of extra HBM write+read at 7B), and k/v
    must still materialize for the KV cache — only q's relayout is saved,
    which doesn't cover the concat cost. Kept as an opt-in probe
    (``LMMS_OWC_DECODER_FUSED_QKV=1`` on TPU, ``force`` anywhere); a
    load-time weight merge (no per-call concat) is the round-4 shape if the
    lead is revisited. int4 keeps the split path regardless.
    """
    import os

    mode = os.environ.get("LMMS_OWC_DECODER_FUSED_QKV", "")
    if "w_q4" in q_params:
        return False
    if mode == "force":
        return True
    return mode == "1" and jax.default_backend() == "tpu"


def _merged_qkv_params(attn: dict) -> dict:
    """Concat q/k/v projection weights along the output axis -> one dense.

    Runs at trace time inside the prefill program (inside the layer scan): one
    [D, (nh+2*kvh)*hd] weight concat per layer per call (~0.6 ms/chunk total at
    7B — noise next to the relayouts it removes). int8 per-output-channel
    scales and biases concat the same way; bias may be absent (Llama).
    """
    parts = [attn["q"], attn["k"], attn["v"]]
    merged: dict = {}
    if "w_q8" in attn["q"]:
        merged["w_q8"] = {
            "q": jnp.concatenate([p["w_q8"]["q"] for p in parts], axis=-1),
            "scale": jnp.concatenate([p["w_q8"]["scale"] for p in parts], axis=-1),
        }
    else:
        merged["w"] = jnp.concatenate([p["w"] for p in parts], axis=-1)
    if attn["q"].get("b") is not None:
        merged["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
    return merged


def merge_decoder_qkv(params: dict) -> dict:
    """LOAD-TIME q/k/v weight merge: replace ``layers.attn.{q,k,v}`` with one
    combined ``layers.attn.qkv`` dense of output width (nh + 2*kvh) * hd.

    This is the round-4 shape of the fused-qkv decoder lead: the trace-time
    concat probe (``_merged_qkv_params`` inside the scan) measured an e2e LOSS
    because every layer call re-wrote ~16.5 MB of weights; merging ONCE at
    load time removes that cost entirely, so prefill gets the combined-heads
    single-transpose layout (q's relayout and rope ride the flash kernel) and
    decode replaces three projections — two of them lane-starved [D, 512]
    GEMVs at 7B GQA — with one [D, 4608] matmul and free head-axis slices.

    Works on the STACKED layer tree (leaves carry a leading num_layers axis;
    the concat axis is -1 either way) for bf16 (``w``) and int8 (``w_q8``
    {q, scale}) trees; int4 trees are returned unchanged (the int4 kernel
    dispatches per-projection). Not applied under a TP mesh — the Megatron
    sharding rules partition q/k/v per-role (a merged GQA axis would split
    28q+4k+4v unevenly across model shards).
    """
    attn = params["layers"]["attn"]
    if "q" not in attn or "w_q4" in attn["q"]:
        return params
    merged_attn = {"qkv": _merged_qkv_params(attn), "o": attn["o"]}
    layers = {k: v for k, v in params["layers"].items() if k != "attn"}
    layers["attn"] = merged_attn
    return {**{k: v for k, v in params.items() if k != "layers"}, "layers": layers}


def kv_cache_int8_enabled() -> bool:
    """Gate for the int8 KV cache (``LMMS_OWC_KV_INT8``).

    After the weights, the stacked KV cache is the second-largest HBM read of
    every decode step (~1.1 GB/step at 7B B=48 bucket shapes); storing it int8
    with per-token/head scales halves that stream and the cache's footprint.
    ``force`` enables anywhere (CPU parity tests); ``1`` enables on TPU.
    Default OFF pending the interleaved hardware A/B. Read at trace time —
    tests toggling it must ``jax.clear_caches()``.
    """
    import os

    mode = os.environ.get("LMMS_OWC_KV_INT8", "")
    if mode == "force":
        return True
    return mode == "1" and jax.default_backend() == "tpu"


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8: amax over the trailing head_dim axis.

    Returns (q [..., D] int8, scale [...] f32) with x ~= q * scale[..., None].
    All-zero vectors (cache padding) get scale 1e-6/127 and quantize to zeros.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-6) / 127.0
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale


def quantize_kv_cache(
    ks: jax.Array, vs: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """[L, B, KVH, S, D] bf16 caches -> (k_q, v_q, k_scale, v_scale).

    Scales are stored [L, B, KVH, 8, S] f32 — the value replicated over an
    8-sublane axis so the decode kernel's per-layer scale block meets the
    Mosaic (8, 128) tile minimum (same trick as its kv_mask operand), and S
    lands on the LANE axis where the kernel's live score/softmax rows already
    are. ~2 x 77 MB at 7B bench shapes: 0.5% of HBM against a halved cache.
    """
    kq, sk = _quantize_kv(ks)
    vq, sv = _quantize_kv(vs)
    shape = (*sk.shape[:3], 8, sk.shape[3])
    sk8 = jnp.broadcast_to(sk[:, :, :, None, :], shape)
    sv8 = jnp.broadcast_to(sv[:, :, :, None, :], shape)
    return kq, vq, sk8, sv8


def maybe_merge_decoder_qkv(params: dict) -> dict:
    """Apply :func:`merge_decoder_qkv` when the env gate is on (else identity)."""
    return merge_decoder_qkv(params) if decoder_qkv_merge_enabled() else params


def decoder_qkv_merge_enabled() -> bool:
    """Gate for the load-time qkv merge (``LMMS_OWC_DECODER_QKV_MERGE``).

    ``force`` enables anywhere (CPU parity tests); ``1`` enables on TPU.
    Default OFF pending the interleaved hardware A/B.
    """
    import os

    mode = os.environ.get("LMMS_OWC_DECODER_QKV_MERGE", "")
    if mode == "force":
        return True
    return mode == "1" and jax.default_backend() == "tpu"


def _attention_block(layer, x, cos, sin, config, kv_mask, causal, cache=None, cache_pos=None):
    """Shared attention math for prefill (flash) and decode (cache GEMV)."""
    b, l, _ = x.shape
    nh, kvh, hd = config.num_heads, config.num_kv_heads, config.head_dim

    merged = layer["attn"].get("qkv")  # load-time merge (merge_decoder_qkv)
    if cache is None and (
        merged is not None or _decoder_fused_qkv_enabled(layer["attn"]["q"])
    ):
        # Combined-heads prefill: one qkv dense + ONE [b, nh+2*kvh, l, hd]
        # transpose; the flash kernel's q/k/v operands are head-offset views
        # (see ops.fused_qkv_attention), and q's rope rides the kernel's block
        # loads. Only k (rotated) and v must materialize — the cache needs
        # them — so the q-side relayout (28 of 36 heads at 7B) vanishes.
        if merged is None:
            merged = _merged_qkv_params(layer["attn"])  # trace-time concat probe
        qkvh = dense(merged, x).reshape(b, l, nh + 2 * kvh, hd)
        qkvh = qkvh.transpose(0, 2, 1, 3)
        out = fused_qkv_attention(
            qkvh, nh, kvh, causal=causal, kv_mask=kv_mask, kv_mask_contiguous=True,
            rope_cos=cos, rope_sin=sin,
        )
        k = apply_rope(qkvh[:, nh : nh + kvh], cos, sin)
        v = qkvh[:, nh + kvh :]
        out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
        return dense(layer["attn"]["o"], out), (k, v)

    q = dense(layer["attn"]["q"], x).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    k = dense(layer["attn"]["k"], x).reshape(b, l, kvh, hd).transpose(0, 2, 1, 3)
    v = dense(layer["attn"]["v"], x).reshape(b, l, kvh, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is None:
        # GQA K/V passed raw (neither path repeats heads); the prefill padding
        # mask is one contiguous run, so the kernel takes it as SMEM scalars.
        out = flash_attention(
            q, k, v, causal=causal, kv_mask=kv_mask, kv_mask_contiguous=True
        )
        new_kv = (k, v)
    else:
        cache_k, cache_v = cache
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k, cache_pos, axis=2)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v, cache_pos, axis=2)
        # GQA form: reads the cache once instead of materializing nh/kvh copies —
        # the cache read dominates decode-step HBM traffic after the weights.
        out = gqa_attention_reference(q, cache_k, cache_v, kv_mask=kv_mask)
        new_kv = (cache_k, cache_v)

    out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return dense(layer["attn"]["o"], out), new_kv


def _layer_params_at(layers: dict, leaf_selector) -> dict:
    return jax.tree_util.tree_map(leaf_selector, layers)


def _head_logits(params: dict, x: jax.Array) -> jax.Array:
    """LM-head projection in f32; handles tied embeddings and int8 lm_head.

    For an int8-quantized head (ops.quant), the per-output-channel scale is
    constant along the contraction axis, so ``(x @ q) * scale`` keeps the vocab
    matrix int8 in HBM — the head is the largest single decode-step read.
    """
    if "lm_head" in params:
        head = params["lm_head"]
        if "w_q4" in head:
            return dense(head, x.astype(jnp.bfloat16)).astype(jnp.float32)
        if "w_q8" in head:
            # bf16-multiply/f32-accumulate: an f32 dot here would run the MXU at
            # 1/8 rate AND widen the s8 vocab matrix read. The s8->bf16 convert
            # fuses into the matmul; the channel scale applies to the output.
            qp = head["w_q8"]
            logits = jnp.dot(
                x.astype(jnp.bfloat16),
                qp["q"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return logits * qp["scale"]
        w = head["w"]
    else:
        w = params["embed_tokens"].T
    # Multiply in the stored dtype, accumulate f32: a bf16 head is read at half
    # the HBM bytes of an f32 upcast — the vocab matrix is the largest single
    # decode-step read — while logits stay f32 for softmax/argmax.
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)


def _decoder_forward(params, input_embeds, position_ids, attention_mask, config):
    """Causal decoder over the full (padded) sequence -> (final hidden states, (ks, vs))."""
    cos, sin = mrope_cos_sin(position_ids, config)  # [B, L, hd/2]

    def layer_fn(x, layer):
        attn_out, (k, v) = _attention_block(
            layer, rms_norm(layer["input_ln"], x, config.rms_norm_eps), cos, sin, config,
            kv_mask=attention_mask, causal=True,
        )
        x = x + attn_out
        x = x + mlp_swiglu(layer["mlp"], rms_norm(layer["post_ln"], x, config.rms_norm_eps))
        return x, (k, v)

    x, (ks, vs) = jax.lax.scan(layer_fn, input_embeds, params["layers"])
    return rms_norm(params["final_norm"], x, config.rms_norm_eps), (ks, vs)


@functools.partial(jax.jit, static_argnames=("config",))
def score_continuation(
    params: dict,
    input_embeds: jax.Array,
    position_ids: jax.Array,
    attention_mask: jax.Array,
    target_ids: jax.Array,
    target_mask: jax.Array,
    config: Qwen2VLConfig,
) -> tuple[jax.Array, jax.Array]:
    """Loglikelihood scoring: mean cross-entropy over the continuation + greedy match.

    ``target_ids[b, t]`` is the token the model should predict AT position t (i.e.
    input shifted left by one); ``target_mask`` selects continuation positions.
    Returns (loss [B], is_greedy [B]) matching the reference loglikelihood contract
    (mean CE loss with context masked out; greedy == continuation), reference:
    src/models/_llava_hf.py:169-260.
    """
    x, _ = _decoder_forward(params, input_embeds, position_ids, attention_mask, config)
    logits = _head_logits(params, x)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    target_logprobs = jnp.take_along_axis(logprobs, target_ids[..., None], axis=-1)[..., 0]
    maskf = target_mask.astype(jnp.float32)
    loss = -jnp.sum(target_logprobs * maskf, axis=-1) / jnp.maximum(jnp.sum(maskf, axis=-1), 1)
    greedy = jnp.argmax(logits, axis=-1)
    is_greedy = jnp.all(
        jnp.where(target_mask.astype(bool), greedy == target_ids, True), axis=-1
    )
    return loss, is_greedy


@functools.partial(jax.jit, static_argnames=("config", "cache_len"))
def prefill(
    params: dict,
    input_embeds: jax.Array,
    position_ids: jax.Array,
    attention_mask: jax.Array,
    config: Qwen2VLConfig,
    cache_len: int,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Full forward over the (left-padded) prompt; returns last logits + KV cache.

    Args:
        input_embeds: [B, L, H] (text embeddings with vision embeds scattered in).
        position_ids: [3, B, L] M-RoPE positions.
        attention_mask: [B, L] 1 = real token.
        cache_len: total cache capacity (>= L + max_new_tokens).
    Returns: (logits [B, vocab] at the last position, (cache_k, cache_v)
        each [num_layers, B, Hkv, cache_len, D]).
    """
    b, l, _ = input_embeds.shape
    x, (ks, vs) = _decoder_forward(params, input_embeds, position_ids, attention_mask, config)

    last = x[:, -1, :]  # left-padded: last position is the newest token
    logits = _head_logits(params, last)

    pad = cache_len - l
    cache_k = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cache_v = jnp.pad(vs, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return logits, (cache_k, cache_v)


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(3,))
def decode_step(
    params: dict,
    token_ids: jax.Array,
    position_ids: jax.Array,
    cache: tuple[jax.Array, jax.Array],
    cache_pos: jax.Array,
    kv_mask: jax.Array,
    config: Qwen2VLConfig,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """One decode step: token_ids [B], position_ids [3, B, 1] -> logits [B, vocab].

    NOTE: the ``cache`` argument is DONATED — direct (non-inlined) callers must
    not reuse the passed-in cache buffers after the call; use the returned
    cache. (Inside :func:`greedy_generate` the call inlines and donation is
    inert.)

    Layers run under ``fori_loop`` with POINT-WRITES into the stacked cache
    ([num_layers, B, Hkv, S, D] carry), not ``lax.scan``: scan stacks fresh
    cache output buffers every step and the decode while-loop carry then
    copies them back — two full-cache copies (~1.9 ms each for 7B at B=48,
    measured) per generated token. The fori carry keeps ONE cache buffer
    alive and XLA updates it in place.
    """
    x = embedding(params["embed_tokens"], token_ids)[:, None, :]
    cos, sin = mrope_cos_sin(position_ids, config)

    # 2-tuple: bf16 cache. 4-tuple: int8 cache + [L, B, KVH, 8, S] dequant
    # scales (kv_cache_int8_enabled / quantize_kv_cache) — halves the
    # per-step cache read next to the weights.
    kv_int8 = len(cache) == 4
    cache_k, cache_v = cache[:2]
    layers = params["layers"]
    b = x.shape[0]
    nh, kvh, hd = config.num_heads, config.num_kv_heads, config.head_dim
    zero = jnp.zeros((), jnp.int32)

    def layer_fn(i, carry):
        x, ck_all, cv_all, *scales = carry
        layer = jax.tree_util.tree_map(
            lambda p: jax.lax.dynamic_index_in_dim(p, i, 0, keepdims=False), layers
        )
        h = rms_norm(layer["input_ln"], x, config.rms_norm_eps)
        if "qkv" in layer["attn"]:
            # Load-time merged projection (merge_decoder_qkv): ONE [D, 4608]
            # matmul instead of q + two lane-starved [D, 512] GEMVs; the role
            # split is a free head-axis slice at L=1.
            qkv = dense(layer["attn"]["qkv"], h).reshape(b, 1, nh + 2 * kvh, hd)
            qkv = qkv.transpose(0, 2, 1, 3)
            q, k, v = qkv[:, :nh], qkv[:, nh : nh + kvh], qkv[:, nh + kvh :]
        else:
            q = dense(layer["attn"]["q"], h).reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
            k = dense(layer["attn"]["k"], h).reshape(b, 1, kvh, hd).transpose(0, 2, 1, 3)
            v = dense(layer["attn"]["v"], h).reshape(b, 1, kvh, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # Write just the new token's K/V into the stacked cache (in place).
        if kv_int8:
            sk_all, sv_all = scales
            kq, k_sc = _quantize_kv(k)  # k [B, KVH, 1, D] -> scale [B, KVH, 1]
            vq, v_sc = _quantize_kv(v)
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, kq[None], (i, zero, zero, cache_pos, zero)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, vq[None], (i, zero, zero, cache_pos, zero)
            )
            k_sc8 = jnp.broadcast_to(k_sc[None, :, :, None, :], (1, b, kvh, 8, 1))
            v_sc8 = jnp.broadcast_to(v_sc[None, :, :, None, :], (1, b, kvh, 8, 1))
            sk_all = jax.lax.dynamic_update_slice(
                sk_all, k_sc8, (i, zero, zero, zero, cache_pos)
            )
            sv_all = jax.lax.dynamic_update_slice(
                sv_all, v_sc8, (i, zero, zero, zero, cache_pos)
            )
            out = gqa_decode_attention(
                q[:, :, 0, :], ck_all, cv_all, i, kv_mask, sk_all, sv_all
            )
            new_scales = (sk_all, sv_all)
        else:
            ck_all = jax.lax.dynamic_update_slice(
                ck_all, k[None].astype(ck_all.dtype), (i, zero, zero, cache_pos, zero)
            )
            cv_all = jax.lax.dynamic_update_slice(
                cv_all, v[None].astype(cv_all.dtype), (i, zero, zero, cache_pos, zero)
            )
            # Flash-decode kernel: attends against the layer's block of the STACKED
            # cache (scalar-prefetched layer index — no per-layer slice copy) with
            # scores+softmax+PV fused; falls back to dynamic_index_in_dim +
            # gqa_attention_reference off-TPU.
            out = gqa_decode_attention(q[:, :, 0, :], ck_all, cv_all, i, kv_mask)
            new_scales = ()
        out = out.reshape(b, 1, nh * hd)
        x = x + dense(layer["attn"]["o"], out)
        x = x + mlp_swiglu(layer["mlp"], rms_norm(layer["post_ln"], x, config.rms_norm_eps))
        return (x, ck_all, cv_all, *new_scales)

    carry0 = (x, *cache)
    if _os.environ.get("LMMS_OWC_DECODE_UNROLL", "0") == "1":
        # Unrolled layer loop: static weight/cache indexing. MEASURED SLOWER
        # than the fori form (interleaved A/B, 7B int8 B=48: 18.4/18.9 vs
        # 19.7-20.3 img/s/chip) — the rolled loop's double-buffered weight
        # prefetch schedules better than the unrolled program even though it
        # pays ~1.2 ms/step of dynamic-slice copies. Kept as an opt-in probe.
        carry = carry0
        for i in range(config.num_layers):
            carry = layer_fn(i, carry)
    else:
        carry = jax.lax.fori_loop(0, config.num_layers, layer_fn, carry0)
    x, *new_cache = carry
    x = rms_norm(params["final_norm"], x, config.rms_norm_eps)
    logits = _head_logits(params, x[:, 0])
    return logits, tuple(new_cache)


def _sample_token(logits, key, temperature, top_p, do_sample):
    greedy = jnp.argmax(logits, axis=-1)
    if not do_sample:
        return greedy

    scaled = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    cumprobs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    cutoff_idx = jnp.sum(cumprobs < top_p, axis=-1)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
    filtered = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    return jax.random.categorical(key, filtered, axis=-1)


def _decode_loop(
    params: dict,
    logits: jax.Array,
    cache: tuple,
    kv_mask: jax.Array,
    next_positions: jax.Array,
    config: Qwen2VLConfig,
    max_new_tokens: int,
    prompt_len: int,
    eos_ids: jax.Array,
    rng_key: jax.Array | None,
    do_sample: bool,
    temperature: float,
    top_p: float,
) -> jax.Array:
    """Decode-until-EOS while-loop shared by :func:`greedy_generate` (fused
    prefill+decode, the default path) and :func:`decode_pool` (decoupled decode
    over a pooled cache). ``prompt_len`` is the static cache position of the
    first generated token (every row's prompt ends at ``prompt_len - 1``).
    Returns ``(tokens, final_cache)`` — the cache flows out so callers that
    donate it (decode_pool) get input->output aliasing instead of a copy."""
    b = logits.shape[0]
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    # Sampling happens at the END of each iteration so the loop carry holds only
    # the sampled token [B] — carrying the f32 [B, vocab] logits instead costs
    # ~2x vocab*B*4 bytes of HBM traffic per decode step (measured 19 MB/step at
    # B=32 on the xplane trace).
    rng_key, sub0 = jax.random.split(rng_key)
    token0 = _sample_token(logits, sub0, temperature, top_p, do_sample)

    def cond(state):
        step, _, _, _, _, done, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(state):
        step, token, cache, kv_mask, key, done, tokens = state
        token = jnp.where(done, config.pad_token_id, token)
        tokens = tokens.at[:, step].set(token)
        done = done | jnp.any(token[:, None] == eos_ids[None, :], axis=-1)

        pos = jnp.broadcast_to(
            (next_positions + step)[None, :, None].astype(jnp.int32), (3, b, 1)
        )
        kv_mask = kv_mask.at[:, prompt_len + step].set(1)
        logits, cache = decode_step(
            params, token, pos, cache, jnp.array(prompt_len + step, jnp.int32),
            kv_mask, config,
        )
        key, subkey = jax.random.split(key)
        next_token = _sample_token(logits, subkey, temperature, top_p, do_sample)
        return step + 1, next_token, cache, kv_mask, key, done, tokens

    tokens0 = jnp.full((b, max_new_tokens), config.pad_token_id, jnp.int32)
    done0 = jnp.zeros((b,), jnp.bool_)
    state = (jnp.array(0, jnp.int32), token0, cache, kv_mask, rng_key, done0, tokens0)
    _, _, final_cache, *_, tokens = jax.lax.while_loop(cond, body, state)
    return tokens, final_cache


@functools.partial(
    jax.jit, static_argnames=("config", "max_new_tokens", "do_sample", "cache_len")
)
def greedy_generate(
    params: dict,
    input_embeds: jax.Array,
    position_ids: jax.Array,
    attention_mask: jax.Array,
    next_positions: jax.Array,
    config: Qwen2VLConfig,
    max_new_tokens: int,
    cache_len: int,
    eos_ids: jax.Array,
    rng_key: jax.Array | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
) -> jax.Array:
    """Prefill + decode-until-EOS. Returns generated tokens [B, max_new_tokens]
    (positions after a sequence's EOS are padded with pad_token_id).

    Args:
        next_positions: [B] first M-RoPE position for generated text per sequence.
        eos_ids: [num_eos] token ids that terminate a sequence.
    """
    b, l, _ = input_embeds.shape
    logits, cache = prefill(params, input_embeds, position_ids, attention_mask, config, cache_len)
    if kv_cache_int8_enabled():
        # int8 cache + per-token scales for the decode loop (the prefill
        # programs themselves keep bf16 K/V — they are MXU-bound and their
        # K/V die at the end of the program; only the decode-resident cache
        # pays HBM rent every step).
        cache = quantize_kv_cache(*cache)

    kv_mask0 = jnp.pad(attention_mask, ((0, 0), (0, cache_len - l)))
    tokens, _ = _decode_loop(
        params, logits, cache, kv_mask0, next_positions, config, max_new_tokens,
        l, eos_ids, rng_key, do_sample, temperature, top_p,
    )
    return tokens


@functools.partial(jax.jit, static_argnames=("config",))
def prefill_logits(
    params: dict,
    input_embeds: jax.Array,
    position_ids: jax.Array,
    attention_mask: jax.Array,
    config: Qwen2VLConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Standalone prefill for the decode-pool path: last-position logits plus the
    UNPADDED per-layer KV ([num_layers, B, Hkv, L, D]) — pool assembly pads and
    concatenates several chunks' caches before one batched decode
    (:func:`write_pool_chunk` / :func:`decode_pool`)."""
    x, (ks, vs) = _decoder_forward(params, input_embeds, position_ids, attention_mask, config)
    return _head_logits(params, x[:, -1, :]), ks, vs


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_pool_chunk(
    cache_k: jax.Array,
    cache_v: jax.Array,
    ks: jax.Array,
    vs: jax.Array,
    row_offset: jax.Array,
    front: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Write one chunk's prefill KV into the preallocated decode pool IN PLACE.

    ``ks``/``vs`` are [num_layers, B_i, Hkv, L_i, D] with LEFT-padded prompts;
    rows land at ``row_offset`` and the sequence axis is FRONT-padded by
    ``front`` to the pool's common prompt bucket (so every row's last prompt
    token shares one static decode position; both offsets are traced scalars,
    so one program serves every offset). The pool caches are DONATED, so
    peak memory during assembly is the pool plus ONE chunk — holding every
    chunk's cache and concatenating at the end OOM'd the 16 GB chip once
    row-target pooling let mixed-resolution pools extend past 2 chunks
    (RESOURCE_EXHAUSTED, ROUND_NOTES r4). Front padding is masked off by the
    caller-built kv_mask, exactly like ordinary left-padding.
    """
    zero = jnp.zeros((), jnp.int32)
    start = (zero, row_offset.astype(jnp.int32), zero, front.astype(jnp.int32), zero)
    return (
        jax.lax.dynamic_update_slice(cache_k, ks.astype(cache_k.dtype), start),
        jax.lax.dynamic_update_slice(cache_v, vs.astype(cache_v.dtype), start),
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_pool_scales(
    scale_k: jax.Array,
    scale_v: jax.Array,
    sk: jax.Array,
    sv: jax.Array,
    row_offset: jax.Array,
    front: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Scale-pool companion to :func:`write_pool_chunk` for int8 pool assembly.

    ``sk``/``sv`` are one chunk's [L, B_i, KVH, 8, S_i] dequant scales from
    :func:`quantize_kv_cache` — the token axis is LAST here (lane-aligned with
    the decode kernel's scale block), so the front offset applies to axis 4
    where :func:`write_pool_chunk`'s applies to axis 3. Donated like the q
    pools: peak = pool + one chunk.
    """
    zero = jnp.zeros((), jnp.int32)
    start = (zero, row_offset.astype(jnp.int32), zero, zero, front.astype(jnp.int32))
    return (
        jax.lax.dynamic_update_slice(scale_k, sk.astype(scale_k.dtype), start),
        jax.lax.dynamic_update_slice(scale_v, sv.astype(scale_v.dtype), start),
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "max_new_tokens", "prompt_len", "do_sample"),
    donate_argnums=(1,),
)
def decode_pool(
    params: dict,
    cache: tuple[jax.Array, jax.Array],
    logits0: jax.Array,
    kv_mask: jax.Array,
    next_positions: jax.Array,
    config: Qwen2VLConfig,
    max_new_tokens: int,
    prompt_len: int,
    eos_ids: jax.Array,
    rng_key: jax.Array | None = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
) -> tuple[jax.Array, tuple]:
    """Decode-until-EOS over a pooled cache (LMMS_OWC_DECODE_POOL serving mode).

    Decouples decode batch from prefill batch: prefill runs at its MXU-optimal
    bucket batch, while the per-step weight read (the decode roofline at int8
    7B: ~7.6 GB/step) is amortized over the POOLED rows. ``cache`` comes from
    :func:`write_pool_chunk` and is donated; ``prompt_len`` is the common
    post-assembly prompt bucket (== the assembly's l_max).

    Returns ``(tokens, final_cache)``. The final cache is returned ONLY so the
    donated input cache can alias an output — otherwise XLA keeps a second
    full-size copy of the pool cache live inside the program (~2 GB at pool=2,
    ~3 GB at pool=3 on the 7B) to initialize the while-loop carry. Callers
    drop it.
    """
    if kv_cache_int8_enabled() and len(cache) == 2:
        # Callers may assemble the pool already-quantized (4-tuple from
        # quantize_kv_cache + write_pool_chunk/write_pool_scales) so the bf16
        # pool never exists; a 2-tuple bf16 pool is quantized here.
        cache = quantize_kv_cache(*cache)
    return _decode_loop(
        params, logits0, cache, kv_mask, next_positions, config, max_new_tokens,
        prompt_len, eos_ids, rng_key, do_sample, temperature, top_p,
    )
