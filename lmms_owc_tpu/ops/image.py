"""Image preprocessing: smart-resize + normalize + patchify.

Replaces the reference's per-sample CPU PIL+AutoProcessor pipeline
(reference: src/models/_qwen2_vl.py:237-305) with a split design:
  - ``smart_resize`` reproduces the HF Qwen2-VL sizing rule exactly (dims divisible
    by patch*merge, pixel count clamped to [min_pixels, max_pixels]).
  - Resize runs host-side through PIL bicubic by default (bit parity with the HF
    processor, which round-trips through PIL) — or on device via jax.image.resize
    when ``device_resize`` is requested (faster, numerically different).
  - Rescale(1/255) + CLIP-normalize + patchify run on device as one jitted fused
    program: uint8 pixels go over PCIe/HBM once and come out as packed patches.

Patch layout matches the HF processor: [grid_t*grid_h*grid_w,
channel*temporal*patch*patch] with spatial-merge windows contiguous.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "OPENAI_CLIP_MEAN",
    "OPENAI_CLIP_STD",
    "normalize_and_patchify",
    "patchify_images_batch",
    "preprocess_image",
    "resize_host",
    "smart_resize",
]

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(
    height: int,
    width: int,
    factor: int = 28,
    min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> tuple[int, int]:
    """HF-exact sizing: dims divisible by factor, pixels within [min, max]."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError(
            f"absolute aspect ratio must be smaller than 200, got {max(height, width) / min(height, width)}"
        )
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


@functools.partial(
    jax.jit, static_argnames=("patch_size", "temporal_patch_size", "merge_size", "out_dtype")
)
def normalize_and_patchify(
    pixels_u8: jax.Array,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8 [T, C, H, W] -> packed normalized patches [grid_t*h*w, C*t*p*p].

    One fused XLA program: rescale + normalize + the 9D transpose. T must already be
    a multiple of temporal_patch_size (repeat the frame for still images).
    """
    t, c, h, w = pixels_u8.shape
    mean = jnp.asarray(OPENAI_CLIP_MEAN, jnp.float32).reshape(1, c, 1, 1)
    std = jnp.asarray(OPENAI_CLIP_STD, jnp.float32).reshape(1, c, 1, 1)
    x = (pixels_u8.astype(jnp.float32) / 255.0 - mean) / std

    grid_t = t // temporal_patch_size
    grid_h, grid_w = h // patch_size, w // patch_size
    x = x.reshape(
        grid_t, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(grid_t * grid_h * grid_w, c * temporal_patch_size * patch_size**2).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("patch_size", "temporal_patch_size", "merge_size", "out_dtype")
)
def patchify_images_batch(
    pixels_u8: jax.Array,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8 [N, C, H, W] still images -> packed patches [N, grid_h*grid_w, C*t*p*p].

    One fused device program for a whole same-size batch: the temporal repeat,
    rescale, normalize, and 9D transpose never touch the host.
    """
    n, c, h, w = pixels_u8.shape
    frames = jnp.broadcast_to(
        pixels_u8[:, None], (n, temporal_patch_size, c, h, w)
    )
    mean = jnp.asarray(OPENAI_CLIP_MEAN, jnp.float32).reshape(1, 1, c, 1, 1)
    std = jnp.asarray(OPENAI_CLIP_STD, jnp.float32).reshape(1, 1, c, 1, 1)
    x = (frames.astype(jnp.float32) / 255.0 - mean) / std

    grid_h, grid_w = h // patch_size, w // patch_size
    x = x.reshape(
        n, temporal_patch_size, c,
        grid_h // merge_size, merge_size, patch_size,
        grid_w // merge_size, merge_size, patch_size,
    )
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(n, grid_h * grid_w, c * temporal_patch_size * patch_size**2).astype(out_dtype)


_NATIVE_LOADER = None
_NATIVE_DISABLED = os.environ.get("LMMS_OWC_NATIVE_LOADER", "1") == "0"


def _get_native_loader():
    """Lazily build/load the C++ decode+resize library (None if unavailable)."""
    global _NATIVE_LOADER, _NATIVE_DISABLED
    if _NATIVE_DISABLED:
        return None
    if _NATIVE_LOADER is None:
        try:
            from lmms_owc_tpu.native import NativeImageLoader, native_loader_available

            if native_loader_available():
                _NATIVE_LOADER = NativeImageLoader()
            else:
                _NATIVE_DISABLED = True
        except Exception:
            _NATIVE_DISABLED = True
    return _NATIVE_LOADER


def resize_host(
    image,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 1024 * 28 * 28,
    factor: int = 28,
) -> tuple[np.ndarray, tuple[int, int]]:
    """Host-side bicubic smart-resize -> (uint8 [C, H, W], (H, W)).

    Uses the native C++ resizer when available (GIL-releasing, PIL-convention
    weights, within +-2 uint8 levels of PIL); set LMMS_OWC_NATIVE_LOADER=0 to force
    the exact PIL path.
    """
    from PIL import Image

    image = image.convert("RGB")
    width, height = image.size
    resized_h, resized_w = smart_resize(
        height, width, factor=factor, min_pixels=min_pixels, max_pixels=max_pixels
    )
    if (resized_h, resized_w) == (height, width):
        # Identity resize: PIL's Image.resize special-cases same-size to a
        # plain copy (no resample), so skipping the bicubic here is exact
        # PIL/HF parity — and it removes ~10 ms/image of single-core host work
        # whenever inputs already sit on the target grid (e.g. 448x448 inputs
        # under the default max_pixels budget).
        return np.asarray(image).transpose(2, 0, 1), (resized_h, resized_w)
    loader = _get_native_loader()
    if loader is not None:
        chw = loader.resize_u8(np.asarray(image), resized_h, resized_w)
        return chw, (resized_h, resized_w)
    resized = image.resize((resized_w, resized_h), Image.BICUBIC)
    return np.asarray(resized).transpose(2, 0, 1), (resized_h, resized_w)


_RESIZE_POOL = None


def resize_host_batch(
    images: list,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 1024 * 28 * 28,
    factor: int = 28,
) -> list:
    """Map :func:`resize_host` over a shared thread pool, preserving order.

    The resize is the dominant host cost of a macro-batch prepare (measured
    ~10 ms/image single-threaded, 93% of the prepare stage at the flagship
    config — ROUND_NOTES r4); the native resizer and PIL both release the GIL,
    so a small pool cuts the serving pipeline's fill latency (the first
    chunk's prepare is on the critical path) roughly by the worker count.
    ``LMMS_OWC_RESIZE_THREADS=1`` restores the serial path.
    """
    import os as _os

    n_workers = int(_os.environ.get("LMMS_OWC_RESIZE_THREADS", "0")) or min(
        8, _os.cpu_count() or 1
    )
    if n_workers <= 1 or len(images) <= 1:
        return [resize_host(img, min_pixels, max_pixels, factor) for img in images]
    global _RESIZE_POOL
    if _RESIZE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _RESIZE_POOL = ThreadPoolExecutor(max_workers=n_workers)
    return list(
        _RESIZE_POOL.map(
            lambda img: resize_host(img, min_pixels, max_pixels, factor), images
        )
    )


def preprocess_image(
    image,
    min_pixels: int = 4 * 28 * 28,
    max_pixels: int = 1024 * 28 * 28,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    device_resize: bool = False,
    out_dtype=jnp.bfloat16,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """PIL image -> (packed patches [P, patch_dim], grid (t, h, w)).

    Host PIL bicubic resize by default (HF parity); ``device_resize`` moves the
    resample onto the accelerator via jax.image.resize (faster, ~1e-2 pixel diff).
    """
    from PIL import Image

    image = image.convert("RGB")
    width, height = image.size
    factor = patch_size * merge_size
    resized_h, resized_w = smart_resize(
        height, width, factor=factor, min_pixels=min_pixels, max_pixels=max_pixels
    )

    if device_resize:
        arr = jnp.asarray(np.asarray(image), jnp.float32)  # [H, W, C]
        arr = jax.image.resize(arr, (resized_h, resized_w, 3), method="bicubic")
        arr = jnp.clip(jnp.round(arr), 0, 255).astype(jnp.uint8)
        chw = jnp.transpose(arr, (2, 0, 1))
    else:
        resized = image.resize((resized_w, resized_h), Image.BICUBIC)
        chw = jnp.asarray(np.asarray(resized).transpose(2, 0, 1))

    frames = jnp.broadcast_to(chw[None], (temporal_patch_size, *chw.shape))
    patches = normalize_and_patchify(
        frames, patch_size, temporal_patch_size, merge_size, out_dtype
    )
    grid = (1, resized_h // patch_size, resized_w // patch_size)
    return np.asarray(patches), grid
