"""Weight-only int8 quantization (TPU-native bitsandbytes replacement).

The reference loads 8/4-bit weights through CUDA bitsandbytes kernels
(reference: src/models/_base.py:116-121, ``BitsAndBytesConfig``). On TPU the
equivalent win is HBM bandwidth: store linear kernels as int8 with a per-output-
channel f32 scale, and let XLA fuse the int8->bf16 upcast into the MXU matmul.
The matmul computes ``(x @ q) * scale`` — mathematically identical to
``x @ (q * scale)`` because the scale is constant along the contraction axis —
so weights stay int8 in HBM (2x smaller than bf16, 4x smaller than f32) and are
widened on the fly.

Symmetric per-channel quantization: ``scale[o] = max|w[:, o]| / 127``,
``q = round(w / scale)``. No activation quantization (weight-only), so no
calibration pass is needed and accuracy loss is negligible for inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dense_out_dim",
    "dequantize_int8",
    "quantize_int8",
    "quantize_params_int8",
    "stream_quantize_to_device",
]

# Parent-key names whose "w" must stay full-precision: patch embeddings and the
# CLIP projection heads are consumed via raw jnp.dot at several call sites, and
# tied embedding tables double as the LM head.
DEFAULT_EXCLUDE = ("patch_embed", "embed_tokens", "visual_projection", "text_projection")


def quantize_int8(w: jax.Array) -> dict:
    """[..., in, out] weight -> {"q": int8 [..., in, out], "scale": f32 [..., out]}.

    The reduction runs over the contraction (``in``) axis so the scale can be
    applied to the matmul *output*; leading axes (e.g. stacked scan layers) keep
    independent scales.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_int8(qp: dict, dtype=jnp.float32) -> jax.Array:
    """Materialize the full-precision weight (debug/interop path)."""
    return (qp["q"].astype(jnp.float32) * qp["scale"][..., None, :]).astype(dtype)


def dense_out_dim(params: dict) -> int:
    """Output feature count of a dense param dict, quantized or not."""
    return int((params["w"] if "w" in params else params["w_q8"]["q"]).shape[-1])


def quantize_params_int8(tree: dict, exclude: tuple[str, ...] = DEFAULT_EXCLUDE) -> dict:
    """Recursively replace every dense ``{"w": ...}`` leaf-dict with int8 form.

    A node is quantized when it is a dict containing a >=2-D array under "w"
    and its key in the parent is not in ``exclude``. Biases, norms, and
    embedding tables pass through untouched. Works on stacked scan-layer
    weights ([num_layers, in, out]) — each layer gets its own channel scales.
    """

    def walk(node, key: str | None):
        if isinstance(node, dict):
            w = node.get("w")
            if (
                key not in exclude
                and w is not None
                and hasattr(w, "ndim")
                and w.ndim >= 2
            ):
                out = {k: v for k, v in node.items() if k != "w"}
                out["w_q8"] = quantize_int8(w)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(tree, None)


def stream_quantize_to_device(tree: dict, exclude: tuple[str, ...] = DEFAULT_EXCLUDE) -> dict:
    """HOST-resident param tree -> accelerator tree with eligible kernels int8.

    Init-then-quantize keeps the full-precision tree and the int8 tree alive
    simultaneously (~1.5x model bytes at peak), which OOMs a 16 GB v5e for 7B
    models. This streams instead: stacked kernels upload and quantize ONE layer
    slice at a time (the bf16 slice is donated into the quantize program and
    freed immediately), so peak accelerator footprint is approximately the
    final quantized bytes plus a single layer slice. Replaces bitsandbytes'
    load-time quantized checkpoint loading (reference src/models/_base.py:116-121)
    for checkpoints too large to round-trip through full precision on device.

    ``tree`` leaves must live on host (numpy or committed-CPU jax arrays):
    build them under ``jax.default_device(cpu)``.
    """
    device = jax.devices()[0]
    quantize = jax.jit(quantize_int8, donate_argnums=0)

    def to_device(leaf):
        return jax.device_put(leaf, device)

    def quantize_streamed(w) -> dict:
        if w.ndim == 3 and w.shape[0] > 1:
            qs, scales = [], []
            for i in range(w.shape[0]):
                out = quantize(to_device(w[i]))
                qs.append(out["q"])
                scales.append(out["scale"])
            return {"q": jnp.stack(qs), "scale": jnp.stack(scales)}
        return quantize(to_device(w))

    def walk(node, key: str | None):
        if isinstance(node, dict):
            w = node.get("w")
            if key not in exclude and w is not None and getattr(w, "ndim", 0) >= 2:
                out = {k: to_device(v) for k, v in node.items() if k != "w"}
                out["w_q8"] = quantize_streamed(w)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return to_device(node)

    return walk(tree, None)
