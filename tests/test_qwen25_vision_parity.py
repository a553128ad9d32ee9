"""Qwen2.5-VL vision tower parity vs HF torch (random weights, windows exercised)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

    torch.manual_seed(0)
    hf_vis = Qwen2_5_VLVisionConfig(
        depth=3,
        hidden_size=32,
        num_heads=4,
        intermediate_size=64,
        out_hidden_size=48,
        patch_size=14,
        temporal_patch_size=2,
        spatial_merge_size=2,
        window_size=56,  # -> 2x2 merge-unit windows
        fullatt_block_indexes=[1],
    )
    tower = Qwen2_5_VisionTransformerPretrainedModel(hf_vis).eval().float()
    state = {f"visual.{k}": v.numpy() for k, v in tower.state_dict().items()}
    config = qvl25.Qwen25VisionConfig.from_hf_dict(hf_vis.to_dict())
    params = qvl25.convert_hf_vision25_weights(state, config, jnp.float32)
    return tower, config, params


class TestQwen25Vision:
    def test_window_order(self, setup):
        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

        _, config, _ = setup
        grid = (1, 8, 8)  # 4x4 merge units -> 4 windows of 2x2
        window_index, window_ids = qvl25.get_window_order(grid, config)
        assert len(window_index) == 16
        assert sorted(window_index.tolist()) == list(range(16))
        assert len(window_ids) == 64
        assert window_ids.max() == 3

    def test_tower_matches_hf(self, setup):
        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

        tower, config, params = setup
        rng = np.random.RandomState(0)
        grid = (1, 8, 8)
        num_patches = 64
        patches = rng.randn(num_patches, config.patch_dim).astype(np.float32)

        with torch.no_grad():
            hf_out = tower(
                torch.tensor(patches), grid_thw=torch.tensor([grid], dtype=torch.long)
            ).numpy()

        merge_sq = config.spatial_merge_size ** 2
        window_index, window_ids = qvl25.get_window_order(grid, config)
        reordered = patches.reshape(num_patches // merge_sq, merge_sq, -1)[window_index].reshape(
            num_patches, -1
        )
        freqs = qvl25.vision25_rope_freqs(grid, config)
        freqs = freqs.reshape(num_patches // merge_sq, merge_sq, -1)[window_index].reshape(
            num_patches, -1
        )
        valid = np.ones(num_patches, np.int32)
        pair_mask = window_ids[:, None] == window_ids[None, :]
        out = qvl25.vision25_encode(
            params, jnp.asarray(reordered), jnp.asarray(freqs),
            jnp.asarray(pair_mask), jnp.asarray(valid), config,
        )
        restored = np.asarray(out)[np.argsort(window_index)]
        np.testing.assert_allclose(restored, hf_out, rtol=5e-3, atol=5e-3)


class TestTinyV25Adapter:
    def test_registered(self):
        from lmms_owc_tpu.models import MODELS

        assert "qwen2.5-vl-7b" in MODELS and "qwen2.5-vl-3b" in MODELS
