"""Registry inventory, request caching, and mesh-sharded evaluation tests."""

import pytest


class TestModelRegistry:
    def test_reference_id_inventory(self):
        """Every model ID the reference registers must resolve here too
        (reference: grep @register_model over src/models/)."""
        from lmms_owc_tpu.models import MODELS

        reference_ids = [
            "qwen2-vl-7b", "qwen2-vl-2b", "qwen2.5-vl-7b", "qwen2.5-vl-3b",
            "llava-onevision-qwen2-7b-ov", "llava-onevision-qwen2-0.5b-ov",
            "llava-onevision-qwen2-7b-si", "llava-onevision-qwen2-0.5b-si",
            "internvl2-1b", "internvl2-2b", "internvl2-4b", "internvl2-8b",
            "internvl2-26b", "internvl2-40b",
            "internvl2.5-1b", "internvl2.5-2b", "internvl2.5-4b", "internvl2.5-8b",
            "internvl2.5-26b", "internvl2.5-38b",
            "llava-1.5-7b", "llava-1.5-13b",
            "llava-next-mistral-7b", "llava-next-vicuna-7b",
            "instructblip-vicuna-7b", "instructblip-vicuna-13b",
            "phi3v", "idefics2-8b", "custom-model",
        ]
        missing = [rid for rid in reference_ids if rid not in MODELS]
        assert not missing, f"missing reference model ids: {missing}"

    def test_registry_metadata(self):
        from lmms_owc_tpu.models import get_model_info

        info = get_model_info("qwen2-vl-2b")
        assert info.name == "qwen2-vl-2b"
        assert callable(info.model_cls)

    def test_custom_model_dispatch_error(self):
        from lmms_owc_tpu.models import get_model

        with pytest.raises(ValueError, match="not found"):
            get_model("custom-model", model_type="nonexistent", model_name_or_path="/x")


class TestRequestCache:
    def test_cache_roundtrip(self, toy_task_path, toy_dataset, tmp_path, monkeypatch):
        monkeypatch.setenv("LMMS_OWC_TPU_DATASET_CACHE", str(tmp_path))
        import importlib

        from lmms_owc_tpu.utils import _caching

        importlib.reload(_caching)
        monkeypatch.setattr("lmms_owc_tpu.utils._caching._OVERRIDE_PATH", str(tmp_path))

        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        tm = TaskManager(include_path=toy_task_path, model_name="fake")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        task.build_all_requests(limit=4, rank=0, world_size=1, cache_requests=True)
        first = [(i.doc_id, i.arguments[0]) for i in task.instances]
        assert list(tmp_path.glob("*.pickle")), "cache file not written"

        # Second build loads from cache and restores doc_to_visual.
        task2 = get_tasks_as_dict(["toy"], tm)["toy"]
        task2.set_fewshot_seed(1234)
        task2.set_config(key="num_fewshot", value=0)
        task2.build_all_requests(limit=4, rank=0, world_size=1, cache_requests=True)
        second = [(i.doc_id, i.arguments[0]) for i in task2.instances]
        assert first == second
        assert all(callable(i.arguments[2]) for i in task2.instances)


class TestShardedEvaluation:
    def test_tiny_model_on_cpu_mesh(self, toy_task_path, toy_dataset):
        """End-to-end eval with tensor-parallel sharded weights on the 8-device mesh."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple (virtual) devices")

        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model(
            "qwen2-vl-tiny", batch_size=4, random_init=True, dtype="float32",
            model_parallel=2,
        )
        assert model.mesh is not None
        tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]


class TestResponseCache:
    def test_use_cache_serves_responses(self, tmp_path, toy_task_path, toy_dataset):
        """--use_cache: first run writes responses.jsonl; reruns are served from it."""
        import json

        from lmms_owc_tpu.engine import simple_evaluate
        from lmms_owc_tpu.tasks import TaskManager

        tm = TaskManager(include_path=toy_task_path, model_name="fake")
        cache_dir = str(tmp_path / "resp_cache")

        def run():
            return simple_evaluate(
                model_name="fake",
                model_args=f"response_mode=const,response_text=cat,use_cache={cache_dir}",
                tasks=["toy"],
                limit=2,
                bootstrap_iters=0,
                task_manager=tm,
                log_samples=True,
            )

        first = run()
        path = tmp_path / "resp_cache" / "responses.jsonl"
        assert path.exists()
        records = [json.loads(line) for line in path.read_text().splitlines()]
        assert len(records) == 2 and all(r["value"] == "cat" for r in records)

        # Poison the cache; a reread run must surface the cached value, proving
        # the model was not re-invoked for hits.
        path.write_text(
            "\n".join(json.dumps({"key": r["key"], "value": "POISONED"}) for r in records)
        )
        second = run()
        assert second["samples"]["toy"][0]["filtered_resps"][0] == "POISONED"
        assert first["samples"]["toy"][0]["filtered_resps"][0] == "cat"
