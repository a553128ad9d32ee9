"""LLaVA-OneVision: anyres helpers vs HF semantics + tiny adapter smoke test."""

import numpy as np
import pytest


class TestAnyresHelpers:
    def test_select_best_resolution_matches_hf(self):
        hf = pytest.importorskip("transformers.image_processing_utils")
        from lmms_owc_tpu.nn import anyres

        pinpoints = anyres.default_grid_pinpoints(384, 4)
        for hw in [(500, 800), (384, 384), (1200, 300), (700, 700)]:
            ours = anyres.select_best_resolution(hw, pinpoints)
            theirs = tuple(hf.select_best_resolution(list(hw), [list(p) for p in pinpoints]))
            assert ours == theirs, hw

    def test_unpad_matches_hf(self):
        from transformers.models.llava_next.modeling_llava_next import unpad_image
        import torch

        from lmms_owc_tpu.nn import anyres

        rng = np.random.RandomState(0)
        feat = rng.randn(8, 24, 24).astype(np.float32)
        for orig in [(100, 200), (200, 100), (240, 240)]:
            ours = anyres.unpad_feature(feat, orig)
            theirs = unpad_image(torch.tensor(feat), orig).numpy()
            np.testing.assert_array_equal(ours, theirs)

    def test_pack_single_tile(self):
        from lmms_owc_tpu.nn import anyres

        feats = np.ones((1, 4, 8), np.float32)
        newline = np.full(8, 2.0, np.float32)
        packed = anyres.pack_anyres_features(
            feats, (28, 28), [[28, 28]], 28, 14, newline, max_patches=9
        )
        assert packed.shape == (5, 8)
        np.testing.assert_array_equal(packed[-1], newline)

    def test_pack_grid(self):
        from lmms_owc_tpu.nn import anyres

        # base + 2x1 vertical grid of 2x2-token tiles, square original -> no unpad.
        pinpoints = [[28, 28], [56, 28], [28, 56]]
        tiles = np.arange(3 * 4 * 8, dtype=np.float32).reshape(3, 4, 8)
        newline = np.zeros(8, np.float32)
        packed = anyres.pack_anyres_features(
            tiles, (56, 28), pinpoints, 28, 14, newline, max_patches=9
        )
        # base 4 tokens + grid: unpad keeps all (aspect matches): 4 rows x (2+1 newline)
        assert packed.shape == (4 + 4 * 3, 8)


class TestTinyOVAdapter:
    def test_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("llava-onevision-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="llava-onevision-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]

    def test_loglikelihood(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
        from lmms_owc_tpu.tasks._base import TaskInstance

        model = get_model("llava-onevision-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="llava-onevision-tiny")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        model.task_dict["toy"] = task
        reqs = [
            TaskInstance(
                request_type="loglikelihood",
                arguments=("What?", task.doc_to_target, task.doc_to_visual, i, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": i, "repeats": 1},
            )
            for i in range(2)
        ]
        out = model.loglikelihood(reqs)
        assert len(out) == 2 and all(l > 0 for l, _ in out)
