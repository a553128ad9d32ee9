"""Adapter-level tests: tiny random Qwen2-VL through the full eval pipeline."""

import numpy as np
import pytest

from lmms_owc_tpu.ops.image import normalize_and_patchify, preprocess_image, smart_resize


class TestImagePreprocessing:
    def test_smart_resize_bounds(self):
        # Upscale small images to the min pixel budget...
        h, w = smart_resize(32, 32, factor=28, min_pixels=4 * 28 * 28, max_pixels=1024 * 28 * 28)
        assert h % 28 == 0 and w % 28 == 0
        assert h * w >= 4 * 28 * 28
        # ...and downscale huge ones under the max budget.
        h, w = smart_resize(4000, 3000, factor=28, min_pixels=4 * 28 * 28, max_pixels=256 * 28 * 28)
        assert h * w <= 256 * 28 * 28
        assert abs((h / w) - (4000 / 3000)) < 0.15

    def test_smart_resize_matches_hf(self):
        hf = pytest.importorskip("transformers.models.qwen2_vl.image_processing_qwen2_vl")
        for dims in [(32, 32), (480, 640), (1080, 1920), (300, 500), (28, 4000)]:
            ours = smart_resize(*dims, factor=28, min_pixels=4 * 28 * 28, max_pixels=1024 * 28 * 28)
            theirs = hf.smart_resize(*dims, factor=28, min_pixels=4 * 28 * 28, max_pixels=1024 * 28 * 28)
            assert ours == tuple(theirs)

    def test_patchify_matches_hf_processor(self):
        """Fused normalize+patchify output equals the HF image processor's patches."""
        pytest.importorskip("transformers")
        from PIL import Image
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )

        rng = np.random.RandomState(0)
        img = Image.fromarray(rng.randint(0, 255, (112, 140, 3), dtype=np.uint8))

        processor = Qwen2VLImageProcessor(
            min_pixels=4 * 28 * 28, max_pixels=1024 * 28 * 28
        )
        hf_out = processor(images=[img], return_tensors="np")
        hf_patches = hf_out["pixel_values"]
        hf_grid = tuple(hf_out["image_grid_thw"][0].tolist())

        import jax.numpy as jnp

        patches, grid = preprocess_image(
            img, min_pixels=4 * 28 * 28, max_pixels=1024 * 28 * 28, out_dtype=jnp.float32
        )
        assert grid == hf_grid
        np.testing.assert_allclose(patches, hf_patches, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_model():
    from lmms_owc_tpu.models import get_model

    return get_model("qwen2-vl-tiny", batch_size=4, random_init=True, dtype="float32")


class TestTinyAdapter:
    def test_model_loads(self, tiny_model):
        assert tiny_model.config.hidden_size == 64
        assert tiny_model.config.mrope_section == (2, 3, 3)

    def test_prompt_building(self, tiny_model):
        prompt = tiny_model._build_prompt("What is this?", num_images=1)
        assert prompt.startswith("<|im_start|>system\n")
        assert "<|vision_start|><|image_pad|><|vision_end|>What is this?" in prompt
        assert prompt.endswith("<|im_start|>assistant\n")
        ids = tiny_model._tokenize_with_images(prompt, [4])
        from lmms_owc_tpu.models.qwen2_vl import SPECIAL_IDS

        assert ids.count(SPECIAL_IDS["<|image_pad|>"]) == 4

    def test_end_to_end_eval(self, tiny_model, toy_task_path, toy_dataset):
        """Full evaluate() pass: images -> vision tower -> decode -> metrics."""
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        tiny_model.task_dict["toy"] = task

        results = evaluate(
            model=tiny_model,
            task_dict=task_dict,
            limit=2,
            bootstrap_iters=0,
            log_samples=True,
        )
        assert "toy" in results["results"]
        # Random weights give garbage text; metric values just need to exist.
        assert "exact_match,none" in results["results"]["toy"]
        samples = results["samples"]["toy"]
        assert len(samples) == 2
        assert isinstance(samples[0]["filtered_resps"][0], str)


class TestQwen2VLLoglikelihood:
    def test_loglikelihood_path(self, tiny_model, toy_task_path, toy_dataset):
        """Capability superset: the reference raises NotImplementedError here."""
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
        from lmms_owc_tpu.tasks._base import TaskInstance

        tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        tiny_model.task_dict["toy"] = task

        reqs = [
            TaskInstance(
                request_type="loglikelihood",
                arguments=("What is this?", task.doc_to_target, task.doc_to_visual, i, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": i, "repeats": 1},
            )
            for i in range(3)
        ]
        out = tiny_model.loglikelihood(reqs)
        assert len(out) == 3
        for loss, is_greedy in out:
            assert loss > 0 and isinstance(is_greedy, bool)

    def test_likelier_continuation_scores_lower(self, tiny_model, toy_task_path, toy_dataset):
        """Sanity: the same continuation must score identically across calls."""
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
        from lmms_owc_tpu.tasks._base import TaskInstance

        tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        tiny_model.task_dict["toy"] = task

        def req():
            return TaskInstance(
                request_type="loglikelihood",
                arguments=("What is this?", "a cat", task.doc_to_visual, 0, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": 0, "repeats": 1},
            )

        (a, _), = tiny_model.loglikelihood([req()])
        (b, _), = tiny_model.loglikelihood([req()])
        assert a == pytest.approx(b, rel=1e-6)
