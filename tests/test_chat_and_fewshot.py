"""Engine paths: --apply_chat_template and few-shot context construction."""

import pytest

from lmms_owc_tpu.engine import simple_evaluate
from lmms_owc_tpu.tasks import TaskManager


@pytest.fixture(scope="module")
def tm(toy_task_path, toy_dataset):
    return TaskManager(include_path=toy_task_path, model_name="fake")


class TestChatTemplate:
    def test_apply_chat_template(self, tm):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=const,response_text=x",
            tasks=["toy"],
            limit=2,
            bootstrap_iters=0,
            task_manager=tm,
            apply_chat_template=True,
            system_instruction="You are a classifier.",
            log_samples=True,
        )
        prompt = results["samples"]["toy"][0]["arguments"][0]
        # Base-model template: role-prefixed concatenation ending in assistant turn.
        assert "system: You are a classifier." in prompt
        assert "What type of object is in this photo?" in prompt
        assert prompt.endswith("assistant:")


class TestFewshot:
    def test_num_fewshot_context(self, tm):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=const,response_text=x",
            tasks=["toy"],
            num_fewshot=2,
            limit=2,
            bootstrap_iters=0,
            task_manager=tm,
            log_samples=True,
        )
        prompt = results["samples"]["toy"][0]["arguments"][0]
        # Two labeled examples precede the eval question (prompt + target pairs).
        assert prompt.count("What type of object is in this photo?") == 3
        assert results["n-shot"]["toy"] == 2

    def test_fewshot_deterministic_across_runs(self, tm):
        def run():
            out = simple_evaluate(
                model_name="fake",
                model_args="response_mode=const,response_text=x",
                tasks=["toy"],
                num_fewshot=2,
                limit=2,
                bootstrap_iters=0,
                task_manager=tm,
                fewshot_random_seed=1234,
                log_samples=True,
            )
            return [s["arguments"][0] for s in out["samples"]["toy"]]

        assert run() == run()


class TestPhaseTimings:
    def test_results_include_phase_timings(self, tm):
        results = simple_evaluate(
            model_name="fake",
            model_args="response_mode=const,response_text=x",
            tasks=["toy"],
            limit=2,
            bootstrap_iters=0,
            task_manager=tm,
        )
        timings = results["timings"]
        assert set(timings) == {"build_requests", "inference", "scoring"}
        assert timings["build_requests"] >= 0.0
        assert "generate_until" in timings["inference"]
