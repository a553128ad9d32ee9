"""Numerical parity: JAX Qwen2-VL vs the HF torch implementation (random weights).

Builds a tiny Qwen2-VL in torch, exports its state dict, loads it through our
converter, and compares vision-tower outputs, prefill logits, and greedy decode
token-for-token. This pins HF-exactness without needing real checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lmms_owc_tpu.nn import qwen2_vl as qvl

TINY_CFG = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
)
TINY_VISION = dict(
    depth=2,
    embed_dim=32,
    num_heads=4,
    mlp_ratio=2.0,
    in_channels=3,
    patch_size=14,
    temporal_patch_size=2,
    spatial_merge_size=2,
    hidden_size=64,  # out dim of merger == text hidden
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    config = Qwen2VLConfig(
        text_config=dict(TINY_CFG),
        vision_config=dict(TINY_VISION),
        image_token_id=500,
        video_token_id=501,
        vision_start_token_id=502,
        eos_token_id=2,
        pad_token_id=0,
        tie_word_embeddings=False,
    )
    model = Qwen2VLForConditionalGeneration(config).eval().float()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    cfg_dict = hf_model.config.to_dict()
    config = qvl.Qwen2VLConfig.from_hf_dict(cfg_dict)
    params = qvl.convert_hf_weights(state, config, dtype=jnp.float32)
    return config, params


def test_config_mapping(jax_setup):
    config, _ = jax_setup
    assert config.hidden_size == 64
    assert config.num_kv_heads == 2
    assert config.mrope_section == (2, 3, 3)
    assert config.vision.embed_dim == 32
    assert not config.tie_word_embeddings


def test_text_prefill_logits_match(hf_model, jax_setup):
    config, params = jax_setup
    rng = np.random.RandomState(0)
    B, L = 2, 16
    input_ids = rng.randint(3, 400, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    # Left-pad the second sequence.
    attention_mask[1, :5] = 0
    input_ids[1, :5] = 0

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        )
    hf_logits_last = out.logits[:, -1, :].numpy()

    position_ids, next_pos = qvl.get_rope_index(input_ids, attention_mask, [], config)
    embeds = np.asarray(
        jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
    )
    logits, _ = qvl.prefill(
        params,
        jnp.asarray(embeds),
        jnp.asarray(position_ids),
        jnp.asarray(attention_mask.astype(np.int32)),
        config,
        cache_len=L + 8,
    )
    np.testing.assert_allclose(np.asarray(logits), hf_logits_last, rtol=5e-3, atol=5e-3)


def test_greedy_decode_matches_hf_generate(hf_model, jax_setup):
    config, params = jax_setup
    rng = np.random.RandomState(1)
    B, L, NEW = 2, 12, 8
    input_ids = rng.randint(3, 400, size=(B, L))
    attention_mask = np.ones((B, L), dtype=np.int64)
    attention_mask[1, :3] = 0

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            max_new_tokens=NEW,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=0,
        )
    hf_new = hf_out[:, L:].numpy()

    position_ids, next_pos = qvl.get_rope_index(input_ids, attention_mask, [], config)
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
    tokens = qvl.greedy_generate(
        params,
        embeds,
        jnp.asarray(position_ids),
        jnp.asarray(attention_mask.astype(np.int32)),
        jnp.asarray(next_pos.astype(np.int32)),
        config,
        max_new_tokens=NEW,
        cache_len=L + NEW,
        eos_ids=jnp.asarray([-1]),  # never triggers: compare full rollouts
    )
    np.testing.assert_array_equal(np.asarray(tokens), hf_new)


def test_vision_tower_matches(hf_model, jax_setup):
    config, params = jax_setup
    v = config.vision
    rng = np.random.RandomState(2)
    grid_thw = [(1, 4, 6)]  # 24 patches -> 6 merged tokens
    num_patches = 1 * 4 * 6
    patches = rng.randn(num_patches, v.patch_dim).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model.model.visual(
            torch.tensor(patches), grid_thw=torch.tensor(grid_thw, dtype=torch.long)
        ).numpy()

    rope_freqs = qvl.vision_rope_cos_sin(grid_thw, v)
    out = qvl.vision_encode(
        params["vision"],
        jnp.asarray(patches),
        jnp.asarray(rope_freqs),
        jnp.ones(num_patches, jnp.int32),
        v,
    )
    np.testing.assert_allclose(np.asarray(out), hf_out, rtol=5e-3, atol=5e-3)


def test_multimodal_prefill_matches(hf_model, jax_setup):
    """Full path: vision embeds scattered into image-pad positions + M-RoPE indices."""
    config, params = jax_setup
    v = config.vision
    rng = np.random.RandomState(3)
    grid_thw = [(1, 4, 6)]
    num_patches = 24
    num_merged = num_patches // v.spatial_merge_size**2  # 6
    patches = rng.randn(num_patches, v.patch_dim).astype(np.float32)

    # prompt: [text x3] [vision_start] [image_pad x6] [text x4]
    ids = [10, 11, 12, 502] + [500] * num_merged + [20, 21, 22, 23]
    input_ids = np.array([ids])
    attention_mask = np.ones_like(input_ids)

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grid_thw, dtype=torch.long),
        )
    hf_last = out.logits[:, -1, :].numpy()

    rope_freqs = qvl.vision_rope_cos_sin(grid_thw, v)
    vision_embeds = qvl.vision_encode(
        params["vision"], jnp.asarray(patches), jnp.asarray(rope_freqs),
        jnp.ones(num_patches, jnp.int32), v,
    )
    embeds = jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
    image_positions = np.where(input_ids[0] == config.image_token_id)[0]
    embeds = embeds.at[0, jnp.asarray(image_positions)].set(vision_embeds)

    position_ids, next_pos = qvl.get_rope_index(input_ids, attention_mask, grid_thw, config)
    # Text resumes at max(vision positions) + 1 (t=0..0, h<2, w<3 after merge).
    assert next_pos[0] == position_ids[:, 0, :].max() + 1

    logits, _ = qvl.prefill(
        params, embeds, jnp.asarray(position_ids),
        jnp.asarray(attention_mask.astype(np.int32)), config, cache_len=32,
    )
    np.testing.assert_allclose(np.asarray(logits), hf_last, rtol=5e-3, atol=5e-3)
