"""AnyRes (dynamic high-resolution) image helpers shared by the LLaVA-NeXT /
LLaVA-OneVision families.

Host-side: best-resolution selection from grid pinpoints, resize+pad, tile division,
and feature packing (grid reassembly, aspect unpadding, optional downscale, newline
tokens) matching HF's llava_next/llava_onevision semantics.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "select_best_resolution",
    "resize_and_pad",
    "divide_to_patches",
    "anyres_grid_shape",
    "unpad_feature",
    "pack_anyres_features",
    "default_grid_pinpoints",
]


def default_grid_pinpoints(tile_size: int, max_tiles: int = 6) -> list[list[int]]:
    return [
        [tile_size * i, tile_size * j]
        for i in range(1, max_tiles + 1)
        for j in range(1, max_tiles + 1)
        if i * j <= max_tiles * max_tiles
    ]


def select_best_resolution(orig_hw: tuple[int, int], pinpoints: list) -> tuple[int, int]:
    """HF select_best_resolution: maximize effective resolution, minimize waste."""
    orig_h, orig_w = orig_hw
    best_fit = None
    max_effective = 0
    min_waste = float("inf")
    for h, w in pinpoints:
        scale = min(w / orig_w, h / orig_h)
        down_w, down_h = int(orig_w * scale), int(orig_h * scale)
        effective = min(down_w * down_h, orig_w * orig_h)
        waste = (w * h) - effective
        if effective > max_effective or (effective == max_effective and waste < min_waste):
            max_effective = effective
            min_waste = waste
            best_fit = (h, w)
    return best_fit


def resize_and_pad(image, target_hw: tuple[int, int]):
    """Aspect-preserving resize then center-pad to the target resolution (PIL)."""
    from PIL import Image

    target_h, target_w = target_hw
    orig_w, orig_h = image.size
    scale_w, scale_h = target_w / orig_w, target_h / orig_h
    if scale_w < scale_h:
        new_w, new_h = target_w, min(math.ceil(orig_h * scale_w), target_h)
    else:
        new_w, new_h = min(math.ceil(orig_w * scale_h), target_w), target_h
    resized = image.resize((new_w, new_h), Image.BICUBIC)
    canvas = Image.new("RGB", (target_w, target_h), (0, 0, 0))
    canvas.paste(resized, ((target_w - new_w) // 2, (target_h - new_h) // 2))
    return canvas


def divide_to_patches(image, patch_size: int) -> list:
    """Split a padded canvas into patch_size x patch_size tiles (row-major)."""
    patches = []
    width, height = image.size
    for top in range(0, height, patch_size):
        for left in range(0, width, patch_size):
            patches.append(image.crop((left, top, left + patch_size, top + patch_size)))
    return patches


def anyres_grid_shape(orig_hw: tuple[int, int], pinpoints: list, tile_size: int) -> tuple[int, int]:
    h, w = select_best_resolution(orig_hw, pinpoints)
    return h // tile_size, w // tile_size


def unpad_feature(feature: np.ndarray, orig_hw: tuple[int, int]) -> np.ndarray:
    """Remove padding rows/cols from a [C, H, W] feature grid (HF unpad_image)."""
    orig_h, orig_w = orig_hw
    _, cur_h, cur_w = feature.shape
    original_ar = orig_w / orig_h
    current_ar = cur_w / cur_h
    if original_ar > current_ar:
        scale = cur_w / orig_w
        new_h = int(round(orig_h * scale, 7))
        pad = (cur_h - new_h) // 2
        return feature[:, pad : cur_h - pad, :]
    scale = cur_h / orig_h
    new_w = int(round(orig_w * scale, 7))
    pad = (cur_w - new_w) // 2
    return feature[:, :, pad : cur_w - pad]


def pack_anyres_features(
    tile_features: np.ndarray,
    orig_hw: tuple[int, int],
    pinpoints: list,
    tile_size: int,
    patch_size: int,
    image_newline: np.ndarray | None,
    max_patches: int | None = 9,
) -> np.ndarray:
    """HF pack_image_features for one image.

    Args:
        tile_features: [num_tiles, tokens_per_tile, D] — tile 0 is the base image.
        orig_hw: original image (H, W).
        image_newline: [D] newline embedding or None.
        max_patches: anyres_max_N downscale bound (None disables, llava-next mode).
    Returns packed [total_tokens, D].
    """
    side = tile_size // patch_size
    if tile_features.shape[0] == 1:
        feature = tile_features[0]
        if image_newline is not None:
            feature = np.concatenate([feature, image_newline[None]], axis=0)
        return feature

    base = tile_features[0]
    tiles = tile_features[1:]
    n_h, n_w = anyres_grid_shape(orig_hw, pinpoints, tile_size)
    d = tiles.shape[-1]
    grid = tiles.reshape(n_h, n_w, side, side, d)
    grid = grid.transpose(4, 0, 2, 1, 3).reshape(d, n_h * side, n_w * side)
    grid = unpad_feature(grid, orig_hw)

    if max_patches is not None:
        _, cur_h, cur_w = grid.shape
        ratio = math.sqrt(cur_h * cur_w / (max_patches * side**2))
        if ratio > 1.1:
            import jax

            new_h, new_w = int(cur_h // ratio), int(cur_w // ratio)
            grid = np.asarray(
                jax.image.resize(grid, (d, new_h, new_w), method="bilinear")
            )

    if image_newline is not None:
        newline_col = np.broadcast_to(image_newline[:, None, None], (d, grid.shape[1], 1))
        grid = np.concatenate([grid, newline_col], axis=-1)
    packed = grid.reshape(d, -1).T
    return np.concatenate([base, packed], axis=0)
