"""Shared pure-functional transformer layers.

Parameters are plain nested dicts of jax.Arrays; every function is
``(params, inputs, ...) -> outputs`` so models compose under jit/pjit without a
module framework. Weight layout convention: linear kernels are stored
``[in_features, out_features]`` (transposed from HF torch checkpoints at load time)
so the forward is a plain ``x @ w``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dense",
    "embedding",
    "gelu",
    "layer_norm",
    "rms_norm",
    "mlp_gelu",
    "mlp_swiglu",
    "apply_rope",
    "rope_frequencies",
    "multi_head_attention",
    "repeat_kv",
]


# W8A8 toggle (AQT-style): quantize activations per-token to int8 so w_q8
# matmuls run at the v5e int8 MXU rate. Process-wide; flipped by bench/serving
# config, never by tests (changes numerics).
_INT8_ACTIVATIONS = False


def set_int8_activations(value: bool) -> None:
    """Set the process-wide W8A8 mode.

    The flag is read at TRACE time inside ``dense``; programs jitted before a
    flip would silently keep the old path, so changing the value drops the jit
    caches (recompile on next use). Serving sets this once before the first
    forward, where it is free.
    """
    global _INT8_ACTIVATIONS
    value = bool(value)
    if value != _INT8_ACTIVATIONS:
        _INT8_ACTIVATIONS = value
        jax.clear_caches()


def dense(params: dict, x: jax.Array) -> jax.Array:
    """x @ w (+ b). params: {"w": [in, out], optional "b": [out]}.

    Also accepts weight-only quantized params (lmms_owc_tpu.ops.quant):
    - {"w_q8": {"q", "scale"}}: the int8 kernel stays int8 in HBM, XLA fuses the
      upcast into the matmul, and the per-output-channel scale applies after.
    - {"w_q4": {"q4", "scale"}}: 4-bit packed with per-(group, channel) scales;
      the contraction splits into groups so each group's scale applies to its
      partial product (scale varies along the contraction, unlike int8).
    """
    if "w_q8" in params:
        qp = params["w_q8"]
        if _INT8_ACTIVATIONS:
            # AQT-style W8A8: per-token dynamic activation quantization, s8 x s8
            # MXU dot with s32 accumulation (2x the bf16 OPS on v5e), scales
            # applied to the f32 output. Opt-in (set_int8_activations) — changes
            # numerics vs weight-only int8.
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
            acc = jnp.einsum(
                "...i,io->...o", xq, qp["q"], preferred_element_type=jnp.int32
            )
            out = (acc.astype(jnp.float32) * sx * qp["scale"]).astype(x.dtype)
        else:
            out = jnp.einsum(
                "...i,io->...o", x, qp["q"].astype(x.dtype), preferred_element_type=x.dtype
            )
            out = out * qp["scale"].astype(x.dtype)
    elif "w_q4" in params:
        from lmms_owc_tpu.ops.int4_matmul import int4_matmul, int4_matmul_supported
        from lmms_owc_tpu.ops.quant import unpack_int4

        qp = params["w_q4"]
        d_half, d_out = qp["q4"].shape[-2:]
        d_in = 2 * d_half
        n_groups = qp["scale"].shape[-2]
        m_rows = 1
        for dim in x.shape[:-1]:
            m_rows *= dim
        # The kernel wins in the decode/matvec regime (few rows: HBM-bound on
        # weight reads, and a single M block unpacks each weight block once).
        # At prefill/vision row counts the m-grid re-unpacks every weight block
        # per 128-row block and loses to XLA's dequant-then-dot (A/B'd:
        # kernel-everywhere 9.2 vs int8 14.1 img/s e2e).
        if (
            qp["q4"].ndim == 2
            and m_rows <= 256
            and int4_matmul_supported(d_in, d_out, n_groups)
        ):
            out = int4_matmul(x, qp["q4"], qp["scale"])
        else:
            # XLA fallback: dequantize into the dot operand (XLA cannot fuse
            # the nibble-unpack chain, so the dequantized weight materializes
            # as a one-tensor transient — correct, but not a bandwidth win).
            # Never a grouped einsum: that materializes a [tokens, groups, out]
            # partial, catastrophic at prefill shapes.
            w_int = unpack_int4(qp)  # [in, out] int8 in [-7, 7]
            w = (
                w_int.reshape(*w_int.shape[:-2], n_groups, d_in // n_groups, d_out)
                .astype(x.dtype)
                * qp["scale"][..., None, :].astype(x.dtype)
            ).reshape(*w_int.shape[:-2], d_in, d_out)
            out = jnp.einsum("...i,io->...o", x, w, preferred_element_type=x.dtype)
    else:
        out = jnp.einsum(
            "...i,io->...o", x, params["w"], preferred_element_type=x.dtype
        )
    if "b" in params and params["b"] is not None:
        out = out + params["b"]
    return out


def embedding(table: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(table, ids, axis=0)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Standard LayerNorm in f32, cast back to input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * params["scale"] + params["bias"]).astype(x.dtype)


def rms_norm(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in f32 (LLaMA/Qwen family)."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (normed * params["scale"]).astype(x.dtype)


def mlp_gelu(params: dict, x: jax.Array) -> jax.Array:
    """BERT/ViT-style MLP: dense -> gelu -> dense."""
    return dense(params["down"], gelu(dense(params["up"], x)))


def mlp_swiglu(params: dict, x: jax.Array) -> jax.Array:
    """LLaMA/Qwen-style gated MLP: (silu(x@gate) * x@up) @ down."""
    return dense(
        params["down"], jax.nn.silu(dense(params["gate"], x)) * dense(params["up"], x)
    )


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0) -> tuple[jax.Array, jax.Array]:
    """Precompute RoPE cos/sin tables of shape [max_len, head_dim/2] (f32)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate [B, H, L, D] by position tables [B?, L, D/2] (HF half-split convention)."""
    if cos.ndim == 2:
        cos = cos[None, None, :, :]
        sin = sin[None, None, :, :]
    elif cos.ndim == 3:  # [B, L, D/2]
        cos = cos[:, None, :, :]
        sin = sin[:, None, :, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """Repeat KV heads for grouped-query attention: [B, Hkv, L, D] -> [B, Hkv*n, L, D]."""
    if n_rep == 1:
        return x
    b, h, l, d = x.shape
    return jnp.broadcast_to(x[:, :, None, :, :], (b, h, n_rep, l, d)).reshape(b, h * n_rep, l, d)


def multi_head_attention(
    params: dict,
    x: jax.Array,
    *,
    num_heads: int,
    num_kv_heads: int | None = None,
    causal: bool = False,
    kv_mask: jax.Array | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    qk_norm_eps: float | None = None,
) -> jax.Array:
    """Self-attention block (no residual/norm). params: q/k/v/o dense params."""
    from lmms_owc_tpu.ops.attention import flash_attention

    b, l, _ = x.shape
    num_kv_heads = num_kv_heads or num_heads

    q = dense(params["q"], x).reshape(b, l, num_heads, -1).transpose(0, 2, 1, 3)
    k = dense(params["k"], x).reshape(b, l, num_kv_heads, -1).transpose(0, 2, 1, 3)
    v = dense(params["v"], x).reshape(b, l, num_kv_heads, -1).transpose(0, 2, 1, 3)

    if qk_norm_eps is not None:
        q = rms_norm(params["q_norm"], q, eps=qk_norm_eps)
        k = rms_norm(params["k_norm"], k, eps=qk_norm_eps)
    if rope_cos is not None:
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)

    k = repeat_kv(k, num_heads // num_kv_heads)
    v = repeat_kv(v, num_heads // num_kv_heads)

    out = flash_attention(q, k, v, causal=causal, kv_mask=kv_mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, -1)
    return dense(params["o"], out)


# ------------------------------------------------------------ feature-major

def dense_fm(params: dict, x: jax.Array) -> jax.Array:
    """Feature-major dense: x [N, C_in, P] -> [N, C_out, P].

    Weights are stored PRE-TRANSPOSED ([C_out, C_in], see
    nn.qwen2_vl.vision_params_to_fm) so the channel axis stays on sublanes and
    the token axis on lanes throughout the feature-major vision tower — the
    layout that lets the attention kernel view the qkv projection output
    in place (ops.fused_qkv_attention_fm) with no per-layer transpose.
    Supports the same bf16 / int8 / W8A8 forms as :func:`dense`.
    """
    if "w_q8" in params:
        qp = params["w_q8"]  # q [C_out, C_in] s8, scale [C_out]
        if _INT8_ACTIVATIONS:
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-6) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
            acc = jnp.einsum(
                "oc,ncp->nop", qp["q"], xq, preferred_element_type=jnp.int32
            )
            out = (acc.astype(jnp.float32) * sx * qp["scale"][:, None]).astype(x.dtype)
        else:
            out = jnp.einsum(
                "oc,ncp->nop", qp["q"].astype(x.dtype), x, preferred_element_type=x.dtype
            )
            out = out * qp["scale"][:, None].astype(x.dtype)
    else:
        out = jnp.einsum(
            "oc,ncp->nop", params["w"], x, preferred_element_type=x.dtype
        )
    if "b" in params and params["b"] is not None:
        out = out + params["b"][:, None]
    return out


def layer_norm_fm(params: dict, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """LayerNorm over the CHANNEL (sublane) axis of feature-major [N, C, P]."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * params["scale"][:, None] + params["bias"][:, None]).astype(x.dtype)
