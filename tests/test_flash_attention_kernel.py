"""Flash-attention kernel vs reference — incl. the fused-rope path.

On the default CPU test platform the Pallas kernel cannot run, so these tests
pin the DISPATCH semantics (fused-rope fallback == apply_rope + reference,
GQA contraction == repeated-head reference). With ``LMMS_OWC_TEST_TPU=1`` the
same cases force ``use_pallas=True`` at vision shapes and pin the kernel's
numerics on real hardware (the tiny parity-suite shapes sit below the kv=512
dispatch threshold and would otherwise never touch the kernel).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmms_owc_tpu.nn.layers import apply_rope
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    gqa_decode_attention,
)

ON_TPU = bool(os.environ.get("LMMS_OWC_TEST_TPU")) and jax.default_backend() == "tpu"


def _setup(B=2, H=4, L=512, D=80, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.bfloat16)
    freqs = jnp.asarray(rng.uniform(0, 6.28, (B, L, D // 2)), jnp.float32)
    mask = jnp.asarray((rng.rand(B, L) > 0.15).astype(np.int32))
    return q, k, v, jnp.cos(freqs), jnp.sin(freqs), mask


@pytest.mark.parametrize("masked", [True, False])
def test_fused_rope_matches_rotate_then_attend(masked):
    q, k, v, cos, sin, mask = _setup()
    kv_mask = mask if masked else None
    expected = attention_reference(
        apply_rope(q, cos, sin), apply_rope(k, cos, sin), v, kv_mask=kv_mask
    )
    out = flash_attention(
        q, k, v, kv_mask=kv_mask, rope_cos=cos, rope_sin=sin, use_pallas=ON_TPU
    )
    tol = 3e-3 if ON_TPU else 2e-3
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=tol, rtol=tol
    )


def test_kernel_matches_reference_causal():
    q, k, v, _, _, _ = _setup(L=512, D=128)
    expected = attention_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, use_pallas=ON_TPU)
    # Early causal rows attend to very few keys, so the kernel's bf16 softmax
    # weights don't average out: ~0.03% of elements land ~2 bf16 ulps off on
    # TPU (measured max 0.016). Semantics, not precision, is the contract here.
    tol = 2e-2 if ON_TPU else 2e-3
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=tol, rtol=tol
    )


def test_fused_rope_rejects_cross_attention():
    q, k, v, cos, sin, _ = _setup()
    with pytest.raises(ValueError):
        flash_attention(q, k[:, :, :256], v[:, :, :256], rope_cos=cos, rope_sin=sin)


@pytest.mark.parametrize("masked", [True, False])
def test_gqa_prefill_kernel_matches_reference(masked):
    """Native-GQA Pallas path (kv head selected by the index map, no broadcast)
    at the decoder-prefill bucket shape: Lq == Lk == 288 tiles with block 144.
    """
    from lmms_owc_tpu.ops.attention import gqa_attention_reference

    rng = np.random.RandomState(7)
    b, h, kvh, L, d = 2, 8, 2, 288, 64
    q = jnp.asarray(rng.randn(b, h, L, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, kvh, L, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, kvh, L, d), jnp.bfloat16)
    # Left-padded masks, as the prefill path produces them. Rows inside the
    # padding have ZERO valid causal keys — both paths emit garbage there
    # (kernel: uniform over the causal range; reference: uniform over all keys)
    # and downstream consumers never read them, so compare valid rows only.
    starts = [37, 0]
    if masked:
        mask_np = np.ones((b, L), np.int32)
        for i, s in enumerate(starts):
            mask_np[i, :s] = 0
        mask = jnp.asarray(mask_np)
    else:
        mask = None
    expected = gqa_attention_reference(q, k, v, causal=True, kv_mask=mask)
    out = flash_attention(
        q, k, v, causal=True, kv_mask=mask, kv_mask_contiguous=True,
        use_pallas=True, interpret=not ON_TPU,
    )
    # Early causal rows attend to few keys, so the kernel's bf16 online-softmax
    # weights (cast before normalization) land ~2 ulps off the reference's
    # normalize-then-cast on ~0.6% of elements — same semantics-not-precision
    # contract as test_kernel_matches_reference_causal.
    tol = 2e-2
    for i, s in enumerate(starts if masked else [0] * b):
        np.testing.assert_allclose(
            np.asarray(out[i, :, s:], np.float32),
            np.asarray(expected[i, :, s:], np.float32),
            atol=tol, rtol=tol,
        )


def test_noncontiguous_mask_uses_tensor_path():
    """Arbitrary (gappy) masks must NOT take the scalar fast path: they ride the
    lane-axis mask tensor (128-multiple k blocks) and stay exact. Idefics2's 2-D
    grid padding flattens to exactly this shape (nn/idefics2.py:47-62).
    """
    from lmms_owc_tpu.ops.attention import attention_reference

    rng = np.random.RandomState(11)
    b, h, L, d = 2, 4, 512, 64
    q = jnp.asarray(rng.randn(b, h, L, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, L, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, L, d), jnp.bfloat16)
    mask_np = (rng.rand(b, L) > 0.3).astype(np.int32)  # gappy rows
    mask_np[:, 0] = 1  # every row keeps at least one valid key
    mask = jnp.asarray(mask_np)
    expected = attention_reference(q, k, v, kv_mask=mask)
    out = flash_attention(q, k, v, kv_mask=mask, use_pallas=True, interpret=not ON_TPU)
    tol = 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize(
    "b,h,kvh,d",
    [
        (4, 28, 4, 128),  # qwen2-vl-7b grouping
        (1, 24, 8, 128),  # llama-3.2 judge grouping, latency-mode batch 1
        (4, 8, 8, 96),    # MHA, non-128 head_dim (phi3-like)
    ],
)
def test_decode_kernel_matches_reference(b, h, kvh, d):
    """Flash-decode kernel vs the dynamic-slice + GQA-reference fallback.

    On CPU the kernel runs in Pallas interpret mode (real scalar-prefetch layer
    indexing, real block specs); with LMMS_OWC_TEST_TPU=1 it compiles for the
    chip. Layer indexing is exercised across all layers of the stacked cache.
    """
    rng = np.random.RandomState(3)
    num_layers, s = 3, 64
    q = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
    ck = jnp.asarray(rng.randn(num_layers, b, kvh, s, d), jnp.bfloat16)
    cv = jnp.asarray(rng.randn(num_layers, b, kvh, s, d), jnp.bfloat16)
    # Left-padded-style mask with ragged starts plus a fully-valid row.
    mask = (rng.rand(b, s) > 0.3).astype(np.int32)
    mask[0] = 1
    mask = jnp.asarray(mask)
    for layer in range(num_layers):
        lidx = jnp.asarray(layer, jnp.int32)
        expected = gqa_decode_attention(q, ck, cv, lidx, mask, use_pallas=False)
        out = gqa_decode_attention(
            q, ck, cv, lidx, mask, use_pallas=True, interpret=not ON_TPU
        )
        tol = 3e-3 if ON_TPU else 2e-3
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(expected, np.float32),
            atol=tol, rtol=tol,
        )


@pytest.mark.parametrize("b,h,kvh,d", [(4, 28, 4, 128), (1, 24, 8, 128)])
def test_decode_kernel_int8_cache_matches_dequant(b, h, kvh, d):
    """int8-cache decode (per-token scales applied to the score/softmax rows in
    the kernel) vs attending over the explicitly dequantized bf16 cache. Both
    kernel (interpret on CPU / compiled on TPU) and the non-pallas fallback."""
    from lmms_owc_tpu.nn.qwen2_vl import quantize_kv_cache

    rng = np.random.RandomState(5)
    num_layers, s = 2, 64
    q = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
    ck = jnp.asarray(rng.randn(num_layers, b, kvh, s, d), jnp.bfloat16)
    cv = jnp.asarray(rng.randn(num_layers, b, kvh, s, d), jnp.bfloat16)
    mask = (rng.rand(b, s) > 0.3).astype(np.int32)
    mask[0] = 1
    mask = jnp.asarray(mask)

    kq, vq, sk, sv = quantize_kv_cache(ck, cv)
    assert kq.dtype == jnp.int8 and sk.shape == (num_layers, b, kvh, 8, s)
    # Dequantized bf16 caches as ground truth for the SAME quantized values.
    ck_dq = (kq.astype(jnp.float32) * sk[:, :, :, 0, :, None]).astype(jnp.bfloat16)
    cv_dq = (vq.astype(jnp.float32) * sv[:, :, :, 0, :, None]).astype(jnp.bfloat16)

    for layer in range(num_layers):
        lidx = jnp.asarray(layer, jnp.int32)
        expected = gqa_decode_attention(q, ck_dq, cv_dq, lidx, mask, use_pallas=False)
        fallback = gqa_decode_attention(q, kq, vq, lidx, mask, sk, sv, use_pallas=False)
        kernel = gqa_decode_attention(
            q, kq, vq, lidx, mask, sk, sv, use_pallas=True, interpret=not ON_TPU
        )
        np.testing.assert_allclose(
            np.asarray(fallback, np.float32), np.asarray(expected, np.float32),
            atol=2e-2, rtol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(kernel, np.float32), np.asarray(expected, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_kv_int8_generate_matches_bf16(monkeypatch):
    """greedy_generate with LMMS_OWC_KV_INT8=force: identical tokens to the
    bf16 cache on a seeded tiny decoder (pins prefill-cache quantization,
    the decode-step requantizing writes, and the scale plumbing end-to-end)."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cfg = qvl.Qwen2VLConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=128, rope_theta=10000.0,
        mrope_section=(2, 3, 3),
    )
    rng = np.random.RandomState(17)
    params = qvl.init_decoder_params(jax.random.PRNGKey(3), cfg)
    B, L = 2, 16
    embeds = jnp.asarray(rng.randn(B, L, cfg.hidden_size).astype(np.float32) * 0.1, jnp.bfloat16)
    position_ids = jnp.asarray(np.broadcast_to(np.arange(L, dtype=np.int64), (3, B, L)))
    mask = np.ones((B, L), np.int32)
    mask[1, :5] = 0
    mask = jnp.asarray(mask)
    next_pos = jnp.asarray(np.array([L, L - 5], np.int64))
    eos = jnp.asarray([127], jnp.int32)

    def gen():
        return np.asarray(qvl.greedy_generate(
            params, embeds, position_ids, mask, next_pos, cfg,
            max_new_tokens=8, cache_len=32, eos_ids=eos,
        ))

    monkeypatch.delenv("LMMS_OWC_KV_INT8", raising=False)
    jax.clear_caches()
    base = gen()
    monkeypatch.setenv("LMMS_OWC_KV_INT8", "force")
    jax.clear_caches()
    int8 = gen()
    assert not np.all(base == base[0, 0])  # non-trivial generation
    np.testing.assert_array_equal(base, int8)
