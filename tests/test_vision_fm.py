"""Feature-major vision tower: parity vs the token-major path.

The fm tower keeps activations [N, C, P] (channels on sublanes, tokens on
lanes) with load-time-transposed weights, so the qkv projection output feeds
ops.fused_qkv_attention_fm in place — no per-layer transpose. These tests pin
the kernel, the tower, and the int8/W8A8 forms against the token-major path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmms_owc_tpu.nn.layers import apply_rope
from lmms_owc_tpu.ops.attention import (
    attention_reference,
    fused_qkv_attention_fm,
)

ON_TPU = False  # conftest pins CPU; LMMS_OWC_TEST_TPU handled like other suites
import os

if os.environ.get("LMMS_OWC_TEST_TPU") == "1":
    ON_TPU = True


@pytest.mark.parametrize("masked,with_rope", [(False, False), (True, True), (True, False)])
def test_fm_kernel_matches_token_major(masked, with_rope):
    rng = np.random.RandomState(0)
    B, H, D, L = 2, 4, 80, 256
    qkv_fm = jnp.asarray(rng.randn(B, 3 * H * D, L), jnp.bfloat16)
    mask = None
    if masked:
        m = np.ones((B, L), np.int32)
        m[1, 200:] = 0
        mask = jnp.asarray(m)
    cos = sin = None
    if with_rope:
        freqs = jnp.asarray(rng.randn(B, D // 2, L).astype(np.float32) * 0.1)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    qkv = qkv_fm.reshape(B, 3 * H, D, L).transpose(0, 1, 3, 2)
    q, k, v = qkv[:, :H], qkv[:, H : 2 * H], qkv[:, 2 * H :]
    if with_rope:
        cos_tm, sin_tm = jnp.swapaxes(cos, -1, -2), jnp.swapaxes(sin, -1, -2)
        q = apply_rope(q, cos_tm, sin_tm)
        k = apply_rope(k, cos_tm, sin_tm)
    ref = attention_reference(q, k, v, kv_mask=mask)
    ref_fm = np.asarray(ref.transpose(0, 1, 3, 2).reshape(B, H * D, L), np.float32)

    out = fused_qkv_attention_fm(
        qkv_fm, H, D, kv_mask=mask, rope_cos=cos, rope_sin=sin,
        use_pallas=True, interpret=not ON_TPU,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_fm, atol=2e-2, rtol=2e-2)
    fb = fused_qkv_attention_fm(
        qkv_fm, H, D, kv_mask=mask, rope_cos=cos, rope_sin=sin, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(fb, np.float32), ref_fm, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("quant", [None, "int8", "w8a8"])
def test_vision_tower_fm_matches_token_major(quant, monkeypatch):
    """Full tower: fm (forced) vs default path on the same weights; int8 covers
    the transposed w_q8 tree, w8a8 the feature-major activation quantization."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl
    from tests.test_packed_vision_attention import _tiny_vision_params

    cfg = qvl.Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0, in_channels=3,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    )
    rng = np.random.RandomState(7)
    params = _tiny_vision_params(cfg, rng, quant="int8" if quant else None)
    grid_thw = [(1, 4, 6)]
    P = 24
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    patches = jnp.asarray(rng.randn(1, P, patch_dim).astype(np.float32) * 0.05, jnp.bfloat16)
    freqs = jnp.asarray(qvl.vision_rope_cos_sin(grid_thw, cfg)[None])
    mask = jnp.ones((1, P), jnp.int32)

    if quant == "w8a8":
        from lmms_owc_tpu.nn.layers import set_int8_activations

        set_int8_activations(True)
    try:
        monkeypatch.delenv("LMMS_OWC_VISION_FM", raising=False)
        jax.clear_caches()
        base = np.asarray(
            qvl.vision_encode_batch(params, patches, freqs, mask, cfg), np.float32
        )
        monkeypatch.setenv("LMMS_OWC_VISION_FM", "force")
        jax.clear_caches()
        fm_tree = qvl.vision_params_to_fm(params)
        out = np.asarray(
            qvl.vision_encode_batch(fm_tree, patches, freqs, mask, cfg), np.float32
        )
    finally:
        if quant == "w8a8":
            from lmms_owc_tpu.nn.layers import set_int8_activations

            set_int8_activations(False)
        monkeypatch.delenv("LMMS_OWC_VISION_FM", raising=False)
        jax.clear_caches()

    np.testing.assert_allclose(out, base, atol=3e-2, rtol=3e-2)


def test_vision_fm_padded_batch(monkeypatch):
    """Padded patch rows (bucket > num_patches) with the contiguous-prefix mask."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl
    from tests.test_packed_vision_attention import _tiny_vision_params

    cfg = qvl.Qwen2VLVisionConfig(
        depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0, in_channels=3,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    )
    rng = np.random.RandomState(9)
    params = _tiny_vision_params(cfg, rng, quant=None)
    P_real, P_bucket = 24, 32
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    patches = np.zeros((1, P_bucket, patch_dim), np.float32)
    patches[:, :P_real] = rng.randn(1, P_real, patch_dim) * 0.05
    freqs = np.zeros((1, P_bucket, cfg.head_dim // 2), np.float32)
    freqs[:, :P_real] = qvl.vision_rope_cos_sin([(1, 4, 6)], cfg)
    mask = np.zeros((1, P_bucket), np.int32)
    mask[:, :P_real] = 1

    monkeypatch.delenv("LMMS_OWC_VISION_FM", raising=False)
    jax.clear_caches()
    base = np.asarray(
        qvl.vision_encode_batch(
            params, jnp.asarray(patches, jnp.bfloat16), jnp.asarray(freqs),
            jnp.asarray(mask), cfg,
        ),
        np.float32,
    )
    monkeypatch.setenv("LMMS_OWC_VISION_FM", "force")
    jax.clear_caches()
    out = np.asarray(
        qvl.vision_encode_batch(
            qvl.vision_params_to_fm(params), jnp.asarray(patches, jnp.bfloat16),
            jnp.asarray(freqs), jnp.asarray(mask), cfg,
        ),
        np.float32,
    )
    merge_rows = P_real // cfg.spatial_merge_size**2
    np.testing.assert_allclose(
        out[:, :merge_rows], base[:, :merge_rows], atol=3e-2, rtol=3e-2
    )


def test_adapter_fm_int4_falls_back_token_major(monkeypatch, tmp_path):
    """load_in_4bit + the FM default: the int4 vision tree has w_q4 leaves
    dense_fm cannot consume, so the adapter must keep the tower token-major.

    Regression: the r3 FM default flip transposed the tree anyway and the fm
    trace crashed with KeyError 'w' on every TPU int4 run (BENCH_INT4 capacity
    mode, load_in_4bit adapters)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_checkpoint_matrix import _build_qwen2_vl, _drive

    from lmms_owc_tpu.models import get_model

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    _build_qwen2_vl(ckpt)

    monkeypatch.delenv("LMMS_OWC_VISION_FM", raising=False)
    jax.clear_caches()
    base = _drive(
        get_model("qwen2-vl-tiny", pretrained=str(ckpt), batch_size=2, load_in_4bit=True)
    )
    monkeypatch.setenv("LMMS_OWC_VISION_FM", "force")
    jax.clear_caches()
    model = get_model(
        "qwen2-vl-tiny", pretrained=str(ckpt), batch_size=2, load_in_4bit=True
    )
    vision = model.params["vision"]
    assert "w_q4" in vision["layers"]["qkv"]  # int4 tree really was built
    # token-major patch_embed retained (the fm transpose must NOT have run)
    assert vision["patch_embed"]["w"].shape[-1] == model.config.vision.embed_dim
    out = _drive(model)
    assert out == base


def test_adapter_fm_generate_matches(monkeypatch, tmp_path):
    """qwen2-vl-tiny from disk through generate_until: fm vision (forced) vs
    the default tower, float32 — outputs must match."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_checkpoint_matrix import _build_qwen2_vl, _drive

    from lmms_owc_tpu.models import get_model

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    _build_qwen2_vl(ckpt)

    monkeypatch.delenv("LMMS_OWC_VISION_FM", raising=False)
    jax.clear_caches()
    base = _drive(get_model("qwen2-vl-tiny", pretrained=str(ckpt), batch_size=2, dtype="float32"))
    monkeypatch.setenv("LMMS_OWC_VISION_FM", "force")
    jax.clear_caches()
    model = get_model("qwen2-vl-tiny", pretrained=str(ckpt), batch_size=2, dtype="float32")
    assert model.params["vision"]["patch_embed"]["w"].shape[0] == model.config.vision.embed_dim
    out = _drive(model)
    assert out == base
