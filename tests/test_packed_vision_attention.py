"""Packed-qkv vision attention: kernel numerics + full vision-tower parity.

The packed path consumes the qkv projection output in place (per-head columns
padded to 128 lanes) instead of materializing [B,L,3,NH,HD] -> 3x[B,NH,L,HD]
layout copies (ref motivation: the HF tower's standalone q/k/v reshape +
transpose, modeling_qwen2_vl VisionAttention.forward). Tests here pin:

- the Pallas kernel (interpret mode on CPU, compiled with LMMS_OWC_TEST_TPU=1)
  against the jnp packed reference, masked/unmasked x rope/no-rope;
- the packed-layout reference against the plain unpacked reference (layout
  bookkeeping is self-consistent);
- `vision_encode_batch` with LMMS_OWC_VISION_PACKED=force vs =0 — full-path
  parity including `_pad_vision_attn_params` weight re-layout, bf16 and int8.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmms_owc_tpu.nn.layers import apply_rope
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    packed_attention_reference,
    packed_vision_attention,
)

ON_TPU = bool(os.environ.get("LMMS_OWC_TEST_TPU")) and jax.default_backend() == "tpu"


def _pack(q, k, v, hp=128):
    """[B,NH,L,HD] x3 -> packed [B, L, 3*NH*HP] with zero padding lanes."""
    b, nh, l, hd = q.shape
    stack = np.stack([q, k, v], axis=2)  # [B, NH, 3, L, HD]
    stack = np.pad(stack, ((0, 0),) * 4 + ((0, hp - hd),))
    return stack.transpose(0, 3, 2, 1, 4).reshape(b, l, 3 * nh * hp)


def _setup(B=2, NH=2, L=256, HD=80, seed=0, prefix_valid=(256, 180)):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, NH, L, HD).astype(np.float32)
    k = rng.randn(B, NH, L, HD).astype(np.float32)
    v = rng.randn(B, NH, L, HD).astype(np.float32)
    freqs = rng.uniform(0, 6.28, (B, L, HD // 2)).astype(np.float32)
    mask = np.zeros((B, L), np.int32)
    for i, n in enumerate(prefix_valid):
        mask[i, :n] = 1
    packed = jnp.asarray(_pack(q, k, v), jnp.bfloat16)
    to_bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    return packed, to_bf(q), to_bf(k), to_bf(v), jnp.asarray(freqs), jnp.asarray(mask)


def test_packed_reference_matches_unpacked():
    packed, q, k, v, freqs, mask = _setup()
    nh, hd, hp = q.shape[1], q.shape[3], 128
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    expected = attention_reference(
        apply_rope(q, cos, sin), apply_rope(k, cos, sin), v, kv_mask=mask
    )
    out = packed_attention_reference(packed, nh, hd, kv_mask=mask, freqs=freqs)
    out = out.reshape(q.shape[0], q.shape[2], nh, hp).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(out[..., :hd], np.float32),
        np.asarray(expected, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # Padding lanes must be exact zeros (the row-padded proj consumes them).
    assert not np.any(np.asarray(out[..., hd:], np.float32))


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("with_rope", [True, False])
def test_packed_kernel_matches_reference(masked, with_rope):
    packed, q, *_rest = _setup()
    _q, _k, _v, freqs, mask = (q, *_rest)
    nh, hd = q.shape[1], q.shape[3]
    kw = dict(
        kv_mask=mask if masked else None,
        freqs=freqs if with_rope else None,
    )
    expected = packed_attention_reference(packed, nh, hd, **kw)
    out = packed_vision_attention(
        packed, nh, hd, use_pallas=True, interpret=not ON_TPU, **kw
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_packed_kernel_nondivisible_block_fallback():
    """L that no candidate block divides falls back to the jnp reference."""
    packed, q, *_ = _setup(L=250, prefix_valid=(250, 180))
    nh, hd = q.shape[1], q.shape[3]
    out = packed_vision_attention(packed, nh, hd, use_pallas=True)
    expected = packed_attention_reference(packed, nh, hd)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=2e-2, rtol=2e-2
    )


# ------------------------------------------------------------- full tower


def _tiny_vision_params(cfg, rng, quant=None):
    """Random stacked vision tower params (depth-leading), unquantized/int8."""
    D = cfg.depth
    e, mlp = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)

    def w(*shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape) * scale, jnp.float32)

    def linear(n_in, n_out):
        wt = rng.randn(D, n_in, n_out).astype(np.float32) * 0.05
        b = jnp.asarray(rng.randn(D, n_out).astype(np.float32) * 0.01)
        if quant == "int8":
            amax = np.abs(wt).max(axis=1, keepdims=True)  # per-out-column
            scale = (amax / 127.0).astype(np.float32)
            q = np.clip(np.round(wt / scale), -127, 127).astype(np.int8)
            return {
                "w_q8": {"q": jnp.asarray(q), "scale": jnp.asarray(scale[:, 0, :])},
                "b": b,
            }
        return {"w": jnp.asarray(wt), "b": b}

    layers = {
        "norm1": {"scale": w(D, e, scale=1.0) * 0 + 1.0, "bias": w(D, e, scale=0.01)},
        "norm2": {"scale": w(D, e, scale=1.0) * 0 + 1.0, "bias": w(D, e, scale=0.01)},
        "qkv": linear(e, 3 * e),
        "proj": linear(e, e),
        "fc1": linear(e, mlp),
        "fc2": linear(mlp, e),
    }
    merged = e * cfg.spatial_merge_size**2
    return {
        "patch_embed": {"w": w(cfg.patch_dim, e)},
        "layers": layers,
        "merger": {
            "ln_q": {"scale": w(e) * 0 + 1.0, "bias": w(e, scale=0.01)},
            "fc1": {"w": w(merged, merged), "b": w(merged, scale=0.01)},
            "fc2": {"w": w(merged, 64), "b": w(64, scale=0.01)},
        },
    }


@pytest.mark.parametrize("quant", [None, "int8"])
def test_vision_encode_batch_packed_matches_unpacked(quant, monkeypatch):
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cfg = qvl.Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0, in_channels=3,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    )
    rng = np.random.RandomState(5)
    params = _tiny_vision_params(cfg, rng, quant=quant)
    grid_thw = [(1, 4, 6)]
    P = 24
    N = 2
    patches = jnp.asarray(rng.randn(N, P, cfg.patch_dim).astype(np.float32) * 0.1)
    rope = jnp.asarray(
        np.broadcast_to(qvl.vision_rope_cos_sin(grid_thw, cfg), (N, P, cfg.head_dim // 2))
    )
    mask = np.ones((N, P), np.int32)
    mask[1, 20:] = 0
    mask = jnp.asarray(mask)

    def run(mode):
        monkeypatch.setenv("LMMS_OWC_VISION_PACKED", mode)
        jax.clear_caches()
        return np.asarray(
            qvl.vision_encode_batch(params, patches, rope, mask, cfg), np.float32
        )

    baseline = run("0")
    packed = run("force")
    # Identical math through a re-laid-out weight tree; bf16 accumulation
    # differences only. Padded rows (mask==0) are garbage in both paths and
    # never consumed downstream -> compare merged tokens of valid rows.
    valid_tokens = 20 // cfg.spatial_merge_size**2
    np.testing.assert_allclose(baseline[0], packed[0], atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(
        baseline[1, :valid_tokens], packed[1, :valid_tokens], atol=5e-2, rtol=5e-2
    )
