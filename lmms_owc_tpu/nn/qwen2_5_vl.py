"""Qwen2.5-VL vision tower in JAX (the decoder is shared with Qwen2-VL).

Differences from the Qwen2-VL tower (nn/qwen2_vl.py): RMSNorm block norms,
SiLU-gated MLP with biases, window attention (tokens reordered into
``window_size``-pixel windows at spatial-merge granularity; only
``fullatt_block_indexes`` layers attend globally), and an RMSNorm patch merger
projecting to ``out_hidden_size``.

Window attention is realized TPU-first: tokens are laid out as a uniformly
padded ``[num_windows, tokens_per_window]`` grid (every window the same static
shape, edge windows padded), so window layers run as a *batched* small
attention over [N*W, S] — O(P*S) instead of the O(P^2) dense pair-mask — and
the four ``fullatt_block_indexes`` layers simply reshape the same buffer to
[N, W*S] and attend globally with a validity mask. Images of the same grid
batch along N exactly like the Qwen2-VL tower.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import apply_rope, dense, gelu, rms_norm
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    fused_qkv_attention,
)
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "Qwen25VisionConfig",
    "convert_hf_vision25_weights",
    "get_window_layout",
    "get_window_order",
    "init_vision25_params",
    "vision25_encode",
    "vision25_rope_freqs",
]


@dataclass(frozen=True)
class Qwen25VisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    num_heads: int = 16
    intermediate_size: int = 3420
    out_hidden_size: int = 2048
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @classmethod
    def from_hf_dict(cls, vis: dict) -> "Qwen25VisionConfig":
        return cls(
            depth=vis.get("depth", 32),
            hidden_size=vis.get("hidden_size", 1280),
            num_heads=vis.get("num_heads", 16),
            intermediate_size=vis.get("intermediate_size", 3420),
            out_hidden_size=vis.get("out_hidden_size", 2048),
            in_channels=vis.get("in_channels", vis.get("in_chans", 3)),
            patch_size=vis.get("patch_size", 14),
            temporal_patch_size=vis.get("temporal_patch_size", 2),
            spatial_merge_size=vis.get("spatial_merge_size", 2),
            window_size=vis.get("window_size", 112),
            fullatt_block_indexes=tuple(vis.get("fullatt_block_indexes", (7, 15, 23, 31))),
        )


# ------------------------------------------------------------------- host prep


def get_window_order(grid: tuple[int, int, int], config: Qwen25VisionConfig):
    """Window reorder for one image (HF get_window_index semantics).

    Returns (window_index [P/mu] merge-unit permutation, window_ids [P] per-token
    window id after reordering) where mu = spatial_merge_size^2.
    """
    t, h, w = grid
    merge = config.spatial_merge_size
    mu = merge * merge
    llm_h, llm_w = h // merge, w // merge
    win = config.window_size // merge // config.patch_size

    index = np.arange(t * llm_h * llm_w).reshape(t, llm_h, llm_w)
    pad_h = (-llm_h) % win
    pad_w = (-llm_w) % win
    num_h, num_w = (llm_h + pad_h) // win, (llm_w + pad_w) // win
    padded = np.full((t, llm_h + pad_h, llm_w + pad_w), -100, np.int64)
    padded[:, :llm_h, :llm_w] = index
    padded = padded.reshape(t, num_h, win, num_w, win).transpose(0, 1, 3, 2, 4)
    padded = padded.reshape(t, num_h * num_w, win, win)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)  # merge units per window
    flat = padded.reshape(-1)
    window_index = flat[flat != -100]

    # Per-token (post-reorder) window ids.
    window_ids = np.repeat(np.arange(len(seqlens)), seqlens * mu)
    return window_index, window_ids


def get_window_layout(grid: tuple[int, int, int], config: Qwen25VisionConfig):
    """Uniform padded window layout for one grid (TPU-native form of get_window_index).

    Every window gets the same static token count; edge windows carry padding
    slots. Merge units stay contiguous (mu tokens each), matching the patchify
    order, so the device-side gather is ``slot_src*mu + arange(mu)``.

    Returns:
        slot_src: [num_windows * win^2] source merge-unit index per slot (-1 = pad).
        num_windows: windows in this grid (after padding to win multiples).
        tokens_per_window: win^2 * merge^2 (static).
    """
    t, h, w = grid
    merge = config.spatial_merge_size
    mu = merge * merge
    llm_h, llm_w = h // merge, w // merge
    win = config.window_size // merge // config.patch_size

    index = np.arange(t * llm_h * llm_w).reshape(t, llm_h, llm_w)
    pad_h = (-llm_h) % win
    pad_w = (-llm_w) % win
    num_h, num_w = (llm_h + pad_h) // win, (llm_w + pad_w) // win
    padded = np.full((t, llm_h + pad_h, llm_w + pad_w), -1, np.int64)
    padded[:, :llm_h, :llm_w] = index
    padded = padded.reshape(t, num_h, win, num_w, win).transpose(0, 1, 3, 2, 4)
    slot_src = padded.reshape(-1)
    return slot_src, t * num_h * num_w, win * win * mu


def vision25_rope_freqs(grid: tuple[int, int, int], config: Qwen25VisionConfig) -> np.ndarray:
    """2D rotary table per packed patch [P, head_dim/2] (pre-reorder order)."""
    from lmms_owc_tpu.nn.qwen2_vl import Qwen2VLVisionConfig, vision_rope_cos_sin

    proxy = Qwen2VLVisionConfig(
        embed_dim=config.hidden_size,
        num_heads=config.num_heads,
        patch_size=config.patch_size,
        temporal_patch_size=config.temporal_patch_size,
        spatial_merge_size=config.spatial_merge_size,
    )
    return vision_rope_cos_sin([grid], proxy)


# -------------------------------------------------------------------- forward


@functools.partial(jax.jit, static_argnames=("config",))
def vision25_encode(
    params: dict,
    patches: jax.Array,
    rope_freqs: jax.Array,
    valid_mask: jax.Array,
    config: Qwen25VisionConfig,
) -> jax.Array:
    """Qwen2.5 vision tower over a batch of same-grid images in window layout.

    Args:
        patches: [N, W, S, patch_dim] — N images, W windows, S tokens per window
            (uniform layout from :func:`get_window_layout`; padding slots zero).
        rope_freqs: [N, W, S, head_dim/2] (same layout, zero at padding).
        valid_mask: [N, W, S] 1 = real patch.
    Returns: [N, W*S/merge^2, out_hidden_size] merged embeddings in slot order
        (padding units garbage — drop via the layout's slot_src on the caller).

    Window layers attend within each [window] (batched N*W small attentions);
    the ``fullatt_block_indexes`` layers reshape the same token buffer to
    [N, W*S] and attend across the whole image. Fully-padded key rows are safe:
    masked scores are a finite -1e30, so softmax degrades to uniform, not NaN.
    """
    param_dtype = params["patch_embed"]["w"].dtype
    n, wn, s, _ = patches.shape
    tn = n * wn * s
    x = jnp.dot(
        patches.astype(param_dtype).reshape(tn, -1),
        params["patch_embed"]["w"],
        preferred_element_type=param_dtype,
    )

    cos = jnp.cos(rope_freqs).reshape(tn, -1)
    sin = jnp.sin(rope_freqs).reshape(tn, -1)
    nh, hd = config.num_heads, config.head_dim

    def make_block(layer, use_full: bool):
        b, l = (n, wn * s) if use_full else (n * wn, s)

        def block(x):
            normed = rms_norm(layer["norm1"], x, eps=1e-6)
            # Combined-heads form (see qwen2_vl vision / ops.fused_qkv_attention):
            # one [b, 3*nh, l, hd] transpose; the kernel's q/k/v operands are
            # head-offset views of it — no per-role slice materializations.
            # Fused-rope dispatch: full-attention layers (kv = wn*s >= 512) hit
            # the Pallas kernel with in-kernel rotation (gappy window-padding
            # mask -> tensor-mask path); window layers (small s) fall back to
            # pre-rotated reference attention — identical math.
            qkvh = dense(layer["qkv"], normed).reshape(b, l, 3 * nh, hd)
            qkvh = qkvh.transpose(0, 2, 1, 3)
            attn = fused_qkv_attention(
                qkvh, nh, nh, kv_mask=valid_mask.reshape(b, l),
                rope_cos=cos.reshape(b, l, -1), rope_sin=sin.reshape(b, l, -1),
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(tn, nh * hd)
            x = x + dense(layer["proj"], attn)
            normed2 = rms_norm(layer["norm2"], x, eps=1e-6)
            gated = jax.nn.silu(dense(layer["mlp_gate"], normed2)) * dense(layer["mlp_up"], normed2)
            return x + dense(layer["mlp_down"], gated)

        return block

    # Layers alternate window/full attention by index: unroll (params stored per-layer).
    for i in range(config.depth):
        layer = jax.tree_util.tree_map(lambda leaf: leaf[i], params["layers"])
        x = make_block(layer, i in config.fullatt_block_indexes)(x)

    merged_dim = config.hidden_size * config.spatial_merge_size**2
    x = rms_norm(params["merger"]["ln_q"], x, eps=1e-6).reshape(-1, merged_dim)
    x = dense(params["merger"]["fc2"], gelu(dense(params["merger"]["fc1"], x)))
    return x.reshape(n, (wn * s) // config.spatial_merge_size**2, -1)


# -------------------------------------------------------------------- weights


def init_vision25_params(key: jax.Array, config: Qwen25VisionConfig, dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, 10)

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    e, inter, L = config.hidden_size, config.intermediate_size, config.depth
    layers = {
        "norm1": {"scale": jnp.ones((L, e), dtype)},
        "norm2": {"scale": jnp.ones((L, e), dtype)},
        "qkv": {"w": w(keys[0], (L, e, 3 * e)), "b": jnp.zeros((L, 3 * e), dtype)},
        "proj": {"w": w(keys[1], (L, e, e)), "b": jnp.zeros((L, e), dtype)},
        "mlp_gate": {"w": w(keys[2], (L, e, inter)), "b": jnp.zeros((L, inter), dtype)},
        "mlp_up": {"w": w(keys[3], (L, e, inter)), "b": jnp.zeros((L, inter), dtype)},
        "mlp_down": {"w": w(keys[4], (L, inter, e)), "b": jnp.zeros((L, e), dtype)},
    }
    merged = e * config.spatial_merge_size**2
    return {
        "patch_embed": {"w": w(keys[5], (config.patch_dim, e))},
        "layers": layers,
        "merger": {
            "ln_q": {"scale": jnp.ones(e, dtype)},
            "fc1": {"w": w(keys[6], (merged, merged)), "b": jnp.zeros(merged, dtype)},
            "fc2": {"w": w(keys[7], (merged, config.out_hidden_size)), "b": jnp.zeros(config.out_hidden_size, dtype)},
        },
    }


def convert_hf_vision25_weights(state: dict, config: Qwen25VisionConfig, dtype=jnp.bfloat16) -> dict:
    def vfind(name):
        for prefix in ("visual.", "model.visual."):
            if prefix + name in state:
                return np.asarray(state[prefix + name])
        raise KeyError(f"vision tensor {name!r} not found")

    def t(name):
        arr = vfind(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(vfind(name), dtype)

    L = config.depth

    def stack_lin(fmt, bias=True):
        out = {"w": jnp.stack([t(fmt.format(i) + ".weight") for i in range(L)])}
        if bias:
            out["b"] = jnp.stack([raw(fmt.format(i) + ".bias") for i in range(L)])
        return out

    layers = {
        "norm1": {"scale": jnp.stack([raw(f"blocks.{i}.norm1.weight") for i in range(L)])},
        "norm2": {"scale": jnp.stack([raw(f"blocks.{i}.norm2.weight") for i in range(L)])},
        "qkv": stack_lin("blocks.{}.attn.qkv"),
        "proj": stack_lin("blocks.{}.attn.proj"),
        "mlp_gate": stack_lin("blocks.{}.mlp.gate_proj"),
        "mlp_up": stack_lin("blocks.{}.mlp.up_proj"),
        "mlp_down": stack_lin("blocks.{}.mlp.down_proj"),
    }
    patch_w = vfind("patch_embed.proj.weight")
    return {
        "patch_embed": {"w": jnp.asarray(patch_w.reshape(config.hidden_size, -1).T, dtype)},
        "layers": layers,
        "merger": {
            "ln_q": {"scale": raw("merger.ln_q.weight")},
            "fc1": {"w": t("merger.mlp.0.weight"), "b": raw("merger.mlp.0.bias")},
            "fc2": {"w": t("merger.mlp.2.weight"), "b": raw("merger.mlp.2.bias")},
        },
    }
