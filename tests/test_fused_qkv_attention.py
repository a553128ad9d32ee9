"""Combined-heads qkv attention (`fused_qkv_attention`) vs the sliced reference.

The fused form feeds ONE [B, H+2*KVH, L, D] array to the flash kernel with
head-offset q/k/v index maps — eliminating the per-role slice+transpose copies
XLA materializes for three separate operands (ref motivation: the HF tower's
q/k/v unbind in modeling_qwen2_vl VisionAttention.forward; r3d xplane showed
~4.5 ms/layer of such copies at the 7B bench shapes). The kernel BODY is the
proven `_flash_kernel`; what needs pinning is the VIEW bookkeeping:

- kernel (interpret on CPU, compiled with LMMS_OWC_TEST_TPU=1) vs slicing the
  roles apart + `apply_rope` + reference, for MHA/GQA x mask/rope/causal;
- the XLA fallback path (`use_pallas=False`) — same slicing semantics;
- `vision_encode_batch` with LMMS_OWC_VISION_FUSED_QKV=force vs =0 — full
  tower parity including the scan-carried layer tree, bf16 and int8.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmms_owc_tpu.nn.layers import apply_rope
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    fused_qkv_attention,
    gqa_attention_reference,
)

ON_TPU = bool(os.environ.get("LMMS_OWC_TEST_TPU")) and jax.default_backend() == "tpu"


def _setup(B=2, H=4, KVH=4, L=256, D=80, seed=0, prefix_valid=(256, 180)):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, KVH, L, D).astype(np.float32)
    v = rng.randn(B, KVH, L, D).astype(np.float32)
    qkvh = jnp.asarray(np.concatenate([q, k, v], axis=1), jnp.bfloat16)
    freqs = rng.uniform(0, 6.28, (B, L, D // 2)).astype(np.float32)
    mask = np.zeros((B, L), np.int32)
    for i, n in enumerate(prefix_valid):
        mask[i, :n] = 1
    to_bf = lambda a: jnp.asarray(a, jnp.bfloat16)
    return (
        qkvh, to_bf(q), to_bf(k), to_bf(v),
        jnp.cos(jnp.asarray(freqs)), jnp.sin(jnp.asarray(freqs)), jnp.asarray(mask),
    )


def _expected(q, k, v, cos=None, sin=None, kv_mask=None, causal=False):
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if k.shape[1] != q.shape[1]:
        return gqa_attention_reference(q, k, v, causal=causal, kv_mask=kv_mask)
    return attention_reference(q, k, v, causal=causal, kv_mask=kv_mask)


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("with_rope", [True, False])
def test_fused_kernel_matches_sliced_reference(masked, with_rope):
    qkvh, q, k, v, cos, sin, mask = _setup()
    expected = _expected(
        q, k, v,
        cos=cos if with_rope else None, sin=sin if with_rope else None,
        kv_mask=mask if masked else None,
    )
    out = fused_qkv_attention(
        qkvh, 4, 4,
        kv_mask=mask if masked else None, kv_mask_contiguous=masked,
        rope_cos=cos if with_rope else None, rope_sin=sin if with_rope else None,
        use_pallas=True, interpret=not ON_TPU,
    )
    tol = 3e-2 if with_rope else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=tol, rtol=tol
    )


def test_fused_kernel_gqa_grouping():
    """q heads [0, H) must pair with kv head floor(h/g) — GQA view bookkeeping."""
    qkvh, q, k, v, _, _, _ = _setup(H=8, KVH=2)
    expected = _expected(q, k, v)
    out = fused_qkv_attention(qkvh, 8, 2, use_pallas=True, interpret=not ON_TPU)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=2e-2, rtol=2e-2
    )


def test_fused_kernel_causal():
    qkvh, q, k, v, _, _, _ = _setup()
    expected = _expected(q, k, v, causal=True)
    out = fused_qkv_attention(qkvh, 4, 4, causal=True, use_pallas=True, interpret=not ON_TPU)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=2e-2, rtol=2e-2
    )


def test_fused_kernel_decoder_prefill_shape():
    """The decoder-prefill combination in one case: GQA + causal + fused rope +
    contiguous left-padding mask (the exact program the 7B prefill runs)."""
    qkvh, q, k, v, cos, sin, _ = _setup(H=8, KVH=2, L=288, prefix_valid=(288, 200))
    # Left padding (decoder style): valid run at the END of the row.
    mask = np.zeros((2, 288), np.int32)
    mask[0, :] = 1
    mask[1, 88:] = 1
    mask = jnp.asarray(mask)
    expected = _expected(q, k, v, cos=cos, sin=sin, kv_mask=mask, causal=True)
    out = fused_qkv_attention(
        qkvh, 8, 2, causal=True, kv_mask=mask, kv_mask_contiguous=True,
        rope_cos=cos, rope_sin=sin, use_pallas=True, interpret=not ON_TPU,
    )
    # Fully-masked rows (none here) aside, compare only valid queries: padded
    # query rows see no valid keys in the reference too, so both emit ~uniform
    # garbage — restrict to rows the decoder actually consumes.
    o = np.asarray(out, np.float32)
    e = np.asarray(expected, np.float32)
    np.testing.assert_allclose(o[0], e[0], atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(o[1, :, 88:], e[1, :, 88:], atol=3e-2, rtol=3e-2)


def test_fused_fallback_path():
    """use_pallas=False slices the roles apart: bit-equivalent to the reference."""
    qkvh, q, k, v, cos, sin, mask = _setup()
    expected = _expected(q, k, v, cos=cos, sin=sin, kv_mask=mask)
    out = fused_qkv_attention(
        qkvh, 4, 4, kv_mask=mask, rope_cos=cos, rope_sin=sin, use_pallas=False
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(expected, np.float32), atol=2e-3, rtol=2e-3
    )


def test_fused_head_count_validation():
    qkvh, *_ = _setup()
    with pytest.raises(ValueError):
        fused_qkv_attention(qkvh, 5, 4, use_pallas=False)


# ------------------------------------------------------------- full tower


@pytest.mark.parametrize("attn_bias,quant", [(True, None), (False, None), (True, "int8")])
def test_decoder_prefill_fused_matches_split(attn_bias, quant, monkeypatch):
    """Combined-qkv decoder prefill (weight concat + head-offset views + fused
    rope) vs the split q/k/v path: logits AND the KV cache must match (the
    cache feeds every decode step). attn_bias=False covers the Llama tree;
    int8 covers the w_q8 q/scale concat (the flagship serving mode)."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cfg = qvl.Qwen2VLConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=128, rope_theta=10000.0,
        mrope_section=(2, 3, 3),
    )
    rng = np.random.RandomState(11)
    params = qvl.init_decoder_params(
        jax.random.PRNGKey(0), cfg, attn_bias=attn_bias
    )
    if quant == "int8":
        from lmms_owc_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)
    B, L = 2, 16
    embeds = jnp.asarray(rng.randn(B, L, cfg.hidden_size).astype(np.float32) * 0.1, jnp.bfloat16)
    position_ids = jnp.asarray(
        np.broadcast_to(np.arange(L, dtype=np.int64), (3, B, L))
    )
    mask = np.ones((B, L), np.int32)
    mask[1, :5] = 0  # left padding
    mask = jnp.asarray(mask)

    def run(mode):
        monkeypatch.setenv("LMMS_OWC_DECODER_FUSED_QKV", mode)
        jax.clear_caches()
        logits, (ck, cv) = qvl.prefill(params, embeds, position_ids, mask, cfg, cache_len=24)
        return np.asarray(logits, np.float32), np.asarray(ck, np.float32), np.asarray(cv, np.float32)

    base_logits, base_k, base_v = run("0")
    fused_logits, fused_k, fused_v = run("force")
    np.testing.assert_allclose(base_logits, fused_logits, atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(base_k, fused_k, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(base_v, fused_v, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("attn_bias,quant", [(True, None), (False, None), (True, "int8")])
def test_decoder_qkv_merge_matches_split(attn_bias, quant, monkeypatch):
    """LOAD-TIME qkv merge (merge_decoder_qkv): prefill logits, KV cache, AND
    the full greedy generation (decode_step's merged one-matmul branch) must
    match the split tree. int8 covers the stacked w_q8 q/scale concat."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cfg = qvl.Qwen2VLConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=128, rope_theta=10000.0,
        mrope_section=(2, 3, 3),
    )
    rng = np.random.RandomState(13)
    params = qvl.init_decoder_params(jax.random.PRNGKey(1), cfg, attn_bias=attn_bias)
    if quant == "int8":
        from lmms_owc_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)
    merged = qvl.merge_decoder_qkv(params)
    assert "qkv" in merged["layers"]["attn"] and "q" not in merged["layers"]["attn"]

    B, L = 2, 16
    embeds = jnp.asarray(rng.randn(B, L, cfg.hidden_size).astype(np.float32) * 0.1, jnp.bfloat16)
    position_ids = jnp.asarray(np.broadcast_to(np.arange(L, dtype=np.int64), (3, B, L)))
    mask = np.ones((B, L), np.int32)
    mask[1, :5] = 0
    mask = jnp.asarray(mask)
    next_pos = jnp.asarray(np.array([L, L - 5], np.int64))
    eos = jnp.asarray([127], jnp.int32)

    monkeypatch.setenv("LMMS_OWC_DECODER_FUSED_QKV", "0")
    jax.clear_caches()
    base_logits, (base_k, base_v) = qvl.prefill(params, embeds, position_ids, mask, cfg, cache_len=24)
    base_tokens = qvl.greedy_generate(
        params, embeds, position_ids, mask, next_pos, cfg,
        max_new_tokens=6, cache_len=24, eos_ids=eos,
    )
    m_logits, (m_k, m_v) = qvl.prefill(merged, embeds, position_ids, mask, cfg, cache_len=24)
    m_tokens = qvl.greedy_generate(
        merged, embeds, position_ids, mask, next_pos, cfg,
        max_new_tokens=6, cache_len=24, eos_ids=eos,
    )
    np.testing.assert_allclose(
        np.asarray(base_logits, np.float32), np.asarray(m_logits, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    np.testing.assert_allclose(np.asarray(base_k, np.float32), np.asarray(m_k, np.float32), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(base_v, np.float32), np.asarray(m_v, np.float32), atol=2e-2, rtol=2e-2)
    np.testing.assert_array_equal(np.asarray(base_tokens), np.asarray(m_tokens))


def test_decoder_qkv_merge_skips_int4():
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cfg = qvl.Qwen2VLConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, vocab_size=128, rope_theta=10000.0,
        mrope_section=(2, 3, 3),
    )
    params = qvl.init_decoder_params(jax.random.PRNGKey(2), cfg)
    from lmms_owc_tpu.ops.quant import quantize_params_int4

    p4 = quantize_params_int4(params)
    assert qvl.merge_decoder_qkv(p4) is p4 or "q" in qvl.merge_decoder_qkv(p4)["layers"]["attn"]


@pytest.mark.parametrize("quant", [None, "int8"])
def test_vision_encode_batch_fused_matches_unfused(quant, monkeypatch):
    from lmms_owc_tpu.nn import qwen2_vl as qvl
    from tests.test_packed_vision_attention import _tiny_vision_params

    cfg = qvl.Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0, in_channels=3,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    )
    rng = np.random.RandomState(7)
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
        monkeypatch.setenv("LMMS_OWC_VISION_FUSED_QKV", mode)
        jax.clear_caches()
        return np.asarray(
            qvl.vision_encode_batch(params, patches, rope, mask, cfg), np.float32
        )

    baseline = run("0")
    fused = run("force")
    # Same math through a transposed view; padded rows (mask==0) are garbage in
    # both paths and never consumed -> compare merged tokens of valid rows.
    valid_tokens = 20 // cfg.spatial_merge_size**2
    np.testing.assert_allclose(baseline[0], fused[0], atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(
        baseline[1, :valid_tokens], fused[1, :valid_tokens], atol=5e-2, rtol=5e-2
    )
