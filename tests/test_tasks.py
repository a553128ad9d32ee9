"""Integration tests: task loading, request construction, end-to-end evaluation
with the deterministic fake model (no accelerator required)."""

import json

import pytest

from lmms_owc_tpu.engine import simple_evaluate
from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict


@pytest.fixture(scope="module")
def task_manager(toy_task_path, toy_dataset):
    return TaskManager(include_path=toy_task_path, model_name="fake")


class TestTaskManager:
    def test_index(self, task_manager):
        assert "toy" in task_manager.all_subtasks
        assert "toy_semantic" in task_manager.all_subtasks
        assert "toy_suite" in task_manager.all_tags

    def test_match_tasks(self, task_manager):
        assert task_manager.match_tasks(["toy*"]) == [
            "toy", "toy_mc", "toy_multiround", "toy_semantic", "toy_suite",
        ]

    def test_listing(self, task_manager):
        listing = task_manager.list_all_tasks()
        assert "toy" in listing
        assert "generate_until" in listing


class TestConfigurableTask:
    def test_load_and_probe(self, task_manager):
        task_dict = get_tasks_as_dict(["toy"], task_manager)
        task = task_dict["toy"]
        assert task.OUTPUT_TYPE == "generate_until"
        assert task.has_test_docs()
        assert len(task.eval_docs) == 12
        doc = task.dataset["test"][0]
        assert task.doc_to_text(doc) == "What type of object is in this photo?"
        assert task.doc_to_target(doc) == "red panda"
        visuals = task.doc_to_visual(doc)
        assert len(visuals) == 1 and visuals[0].size == (32, 32)

    def test_tag_loading(self, task_manager):
        task_dict = get_tasks_as_dict(["toy_suite"], task_manager)
        assert set(task_dict) == {"toy", "toy_mc", "toy_semantic"}

    def test_build_requests_sharded(self, task_manager):
        task = get_tasks_as_dict(["toy"], task_manager)["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        task.build_all_requests(limit=None, rank=0, world_size=2)
        rank0_docs = [inst.doc_id for inst in task.instances]
        assert rank0_docs == [0, 2, 4, 6, 8, 10]
        args = task.instances[0].args
        assert args[0] == "What type of object is in this photo?"
        assert args[1]["max_new_tokens"] == 16
        assert callable(args[2])


class TestEndToEnd:
    def test_simple_evaluate_fake_target(self, task_manager, tmp_path):
        """Fake model echoes the target -> exact_match and textual_inclusion are 1.0."""
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy"],
            limit=8,
            bootstrap_iters=1000,
            task_manager=task_manager,
            log_samples=True,
        )
        res = results["results"]["toy"]
        assert res["exact_match,none"] == 1.0
        assert res["textual_inclusion,none"] == 1.0
        assert res["exact_match_stderr,none"] == 0.0
        assert results["n-samples"]["toy"] == {"original": 12, "effective": 8}
        samples = results["samples"]["toy"]
        assert len(samples) == 8
        first = samples[0]
        assert {"doc_id", "doc", "target", "arguments", "resps", "filtered_resps",
                "doc_hash", "prompt_hash", "target_hash"} <= set(first)
        assert first["target"] == "red panda"
        assert first["filtered_resps"] == ["red panda"]

    def test_simple_evaluate_fake_const(self, task_manager):
        """Constant wrong answer -> exact_match 0."""
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=const,response_text=a violin",
            tasks=["toy"],
            limit=4,
            bootstrap_iters=0,
            task_manager=task_manager,
            log_samples=False,
        )
        assert results["results"]["toy"]["exact_match,none"] == 0.0
        assert results["results"]["toy"]["exact_match_stderr,none"] == "N/A"

    def test_predict_only_bypass(self, task_manager):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy"],
            limit=4,
            task_manager=task_manager,
            predict_only=True,
            log_samples=True,
        )
        assert results["results"]["toy"]["bypass,none"] == 999

    def test_semantic_task_with_fallback_encoder(self, task_manager):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy_semantic"],
            limit=4,
            bootstrap_iters=0,
            task_manager=task_manager,
            log_samples=False,
        )
        res = results["results"]["toy_semantic"]
        # Echoing the target gives similarity 1.0 even on the fallback encoder.
        assert res["semantic_similarity,none"] == pytest.approx(1.0, abs=1e-5)
        assert res["exact_match,none"] == 1.0
        assert 0.0 <= res["concept_semantic_similarity,none"] <= 1.0 + 1e-6

    def test_results_config_block(self, task_manager):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy"],
            limit=2,
            bootstrap_iters=0,
            task_manager=task_manager,
        )
        assert results["config"]["model"] == "fake"
        assert results["config"]["limit"] == 2
        assert "date" in results


class TestTrackerIO:
    def test_results_and_samples_files(self, task_manager, tmp_path):
        from lmms_owc_tpu.engine import EngineTracker
        from lmms_owc_tpu import utils as u

        tracker = EngineTracker(output_path=str(tmp_path))
        tracker.general_config_tracker.log_experiment_args(
            model_source="fake", model_args="pretrained=fake-model,x=1",
            system_instruction=None, chat_template=None, fewshot_as_multiturn=False,
        )
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy"],
            limit=3,
            bootstrap_iters=0,
            task_manager=task_manager,
            log_samples=True,
        )
        samples = results.pop("samples")
        datetime_str = u.get_datetime_str()
        tracker.save_results_aggregated(results=results, samples=samples, datetime_str=datetime_str)
        tracker.save_results_samples(task_name="toy", samples=samples["toy"])

        model_dir = tmp_path / "fake-model"
        results_files = list(model_dir.glob("*_results.json"))
        samples_files = list(model_dir.glob("*_samples_toy.jsonl"))
        assert len(results_files) == 1 and len(samples_files) == 1

        saved = json.loads(results_files[0].read_text())
        assert saved["results"]["toy"]["exact_match,none"] == 1.0
        assert "task_hashes" in saved and "toy" in saved["task_hashes"]
        assert saved["model_name"] == "fake-model"

        lines = [json.loads(l) for l in samples_files[0].read_text().splitlines()]
        assert len(lines) == 3
        assert lines[0]["target"] == "red panda"
        assert lines[0]["input"] == "What type of object is in this photo?"


class TestMakeTable:
    def test_table_renders(self, task_manager):
        from lmms_owc_tpu.utils import make_table

        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=target",
            tasks=["toy"],
            limit=2,
            bootstrap_iters=0,
            task_manager=task_manager,
        )
        table = make_table(results)
        assert "exact_match" in table
        assert "toy" in table
