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

    @staticmethod
    def _run_tower(params, config, patches, grid):
        """Window-layout encode of one image + restore to original unit order."""
        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

        mu = config.spatial_merge_size ** 2
        slot_src, num_windows, s_tokens = qvl25.get_window_layout(grid, config)
        valid_units = slot_src >= 0
        safe_src = np.where(valid_units, slot_src, 0)
        tok_idx = (safe_src[:, None] * mu + np.arange(mu)[None, :]).reshape(-1)
        valid = np.repeat(valid_units, mu).astype(np.int32)
        gathered = patches[tok_idx] * valid[:, None]
        freqs = qvl25.vision25_rope_freqs(grid, config)[tok_idx] * valid[:, None]
        out = qvl25.vision25_encode(
            params,
            jnp.asarray(gathered).reshape(1, num_windows, s_tokens, -1),
            jnp.asarray(freqs, jnp.float32).reshape(1, num_windows, s_tokens, -1),
            jnp.asarray(valid).reshape(1, num_windows, s_tokens),
            config,
        )
        n_units = patches.shape[0] // mu
        pos_of = np.zeros(n_units, np.int64)
        pos_of[slot_src[valid_units]] = np.where(valid_units)[0]
        return np.asarray(out)[0][pos_of]

    def test_tower_matches_hf(self, setup):
        tower, config, params = setup
        rng = np.random.RandomState(0)
        grid = (1, 8, 8)  # divides evenly: no padded window slots
        patches = rng.randn(64, config.patch_dim).astype(np.float32)

        with torch.no_grad():
            hf_out = tower(
                torch.tensor(patches), grid_thw=torch.tensor([grid], dtype=torch.long)
            ).numpy()

        restored = self._run_tower(params, config, patches, grid)
        np.testing.assert_allclose(restored, hf_out, rtol=5e-3, atol=5e-3)

    def test_tower_matches_hf_padded_windows(self, setup):
        """Non-divisible grid: edge windows carry padding slots (5x5 units, win=2)."""
        tower, config, params = setup
        rng = np.random.RandomState(1)
        grid = (1, 10, 10)
        patches = rng.randn(100, config.patch_dim).astype(np.float32)

        with torch.no_grad():
            hf_out = tower(
                torch.tensor(patches), grid_thw=torch.tensor([grid], dtype=torch.long)
            ).numpy()

        restored = self._run_tower(params, config, patches, grid)
        np.testing.assert_allclose(restored, hf_out, rtol=5e-3, atol=5e-3)


class TestTinyV25Adapter:
    def test_registered(self):
        from lmms_owc_tpu.models import MODELS

        assert "qwen2.5-vl-7b" in MODELS and "qwen2.5-vl-3b" in MODELS

    def test_end_to_end_eval(self, toy_task_path, toy_dataset):
        """Full evaluate() through the v2.5 window-layout vision path."""
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("qwen2.5-vl-tiny", batch_size=2, random_init=True, dtype="float32")
        assert model.is_v25

        tm = TaskManager(include_path=toy_task_path, model_name="qwen2.5-vl-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task

        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True,
        )
        assert "toy" in results["results"]
        assert isinstance(results["samples"]["toy"][0]["filtered_resps"][0], str)


class TestV25RowBucketing:
    def test_padded_rows_preserve_outputs(self):
        """5 same-grid images snap to row bucket 6 (replicated last row); the
        padded row is never referenced by spans and real outputs match a
        per-image encode."""
        from PIL import Image

        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

        model = get_model(
            "qwen2.5-vl-tiny", batch_size=2, random_init=True, dtype="float32"
        )
        rng = np.random.RandomState(5)
        images = [
            Image.fromarray(rng.randint(0, 255, (56, 56, 3), dtype=np.uint8))
            for _ in range(5)
        ]
        flat, spans, _ = model._encode_images_flat(images)
        assert len(spans) == 5
        single_flat, single_spans, _ = model._encode_images_flat([images[3]])
        off, count = spans[3]
        s_off, s_count = single_spans[0]
        assert count == s_count
        np.testing.assert_allclose(
            np.asarray(flat[off : off + count]),
            np.asarray(single_flat[s_off : s_off + s_count]),
            rtol=2e-5,
            atol=2e-5,
        )
