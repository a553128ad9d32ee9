"""eval_model.py subprocess regression: pinned metric values through the real CLI.

Mirrors the reference test strategy (tests/models/models_test.py: launch the CLI,
load the produced results JSON, assert pinned values) with the deterministic fake
backend instead of GPU checkpoints.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# Pinned end-to-end values: fake target-echo model scores perfectly; const model zero.
PINNED = {
    "target": {"exact_match,none": 1.0, "textual_inclusion,none": 1.0},
    "const": {"exact_match,none": 0.0, "textual_inclusion,none": 0.0},
}


def _run_cli(tmp_path: Path, model_args: str) -> dict:
    result = subprocess.run(
        [
            sys.executable, str(REPO / "eval_model.py"),
            "--model", "fake",
            "--model_args", model_args,
            "--tasks", "toy",
            "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
            "--limit", "6",
            "--log_samples",
            "--output_path", str(tmp_path),
            "--seed", "0,1234,1234,1234",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
             "LMMS_OWC_TPU_LOG_LEVEL": "WARNING"},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    results_files = list(tmp_path.rglob("*_results.json"))
    assert len(results_files) == 1
    return json.loads(results_files[0].read_text())


@pytest.mark.parametrize("mode", ["target", "const"])
def test_pinned_cli_values(tmp_path, toy_dataset, mode):
    model_args = f"pretrained=fake-{mode},response_mode={mode}"
    results = _run_cli(tmp_path / mode, model_args)
    task_results = results["results"]["toy"]
    for metric, value in PINNED[mode].items():
        assert task_results[metric] == value, (metric, task_results)
    assert results["n-samples"]["toy"] == {"original": 12, "effective": 6}
    # Samples jsonl written alongside with per-sample hashes.
    samples_files = list((tmp_path / mode).rglob("*_samples_toy.jsonl"))
    assert len(samples_files) == 1
    first = json.loads(samples_files[0].read_text().splitlines()[0])
    assert {"doc_hash", "prompt_hash", "target_hash"} <= set(first)


def test_tag_expands_to_group_run(tmp_path, toy_dataset):
    """Running the toy_suite tag evaluates all member tasks in one run."""
    result = subprocess.run(
        [
            sys.executable, str(REPO / "eval_model.py"),
            "--model", "fake",
            "--model_args", "pretrained=fake-tag,response_mode=target",
            "--tasks", "toy_suite",
            "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
            "--limit", "3",
            "--output_path", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
             "LMMS_OWC_TPU_LOG_LEVEL": "WARNING"},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    results_files = list(tmp_path.rglob("*_results.json"))
    saved = json.loads(results_files[0].read_text())
    assert {"toy", "toy_semantic"} <= set(saved["results"])


def test_multi_config_yaml_runs(tmp_path, toy_dataset):
    """--config with a LIST of runs executes each sequentially (eval_model.py:309-324)."""
    config_path = tmp_path / "runs.yaml"
    config_path.write_text(
        "\n".join(
            [
                "- model: fake",
                "  model_args: response_mode=target",
                f"  output_path: {tmp_path / 'run_a'}",
                "- model: fake",
                "  model_args: response_mode=const,response_text=zzz",
                f"  output_path: {tmp_path / 'run_b'}",
            ]
        )
    )
    result = subprocess.run(
        [
            sys.executable, str(REPO / "eval_model.py"),
            "--config", str(config_path),
            "--tasks", "toy",
            "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
            "--limit", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
             "LMMS_OWC_TPU_LOG_LEVEL": "WARNING"},
    )
    assert result.returncode == 0, result.stderr[-3000:]
    res_a = json.loads(next((tmp_path / "run_a").rglob("*_results.json")).read_text())
    res_b = json.loads(next((tmp_path / "run_b").rglob("*_results.json")).read_text())
    assert res_a["results"]["toy"]["exact_match,none"] == 1.0
    assert res_b["results"]["toy"]["exact_match,none"] == 0.0


def test_wandb_logger_degrades_to_noop():
    """Without the wandb package, the logger must swallow every call."""
    from lmms_owc_tpu.loggers import WandbLogger

    logger = WandbLogger(project="x")
    logger.post_init({"results": {"toy": {"exact_match,none": 1.0}}, "configs": {}})
    logger.log_eval_result()
    logger.log_eval_samples({"toy": [{"doc_id": 0, "resps": [["a"]]}]})
    logger.finish()


def test_wandb_logger_tables_and_group_samples(monkeypatch):
    """With a stub wandb module: result/group tables, per-task + per-group sample
    tables (grouped tasks concatenate with group/task columns), JSON artifacts —
    mirroring reference src/data/loggers/_wandb.py:123-364."""
    import sys
    import types

    logged: list[dict] = []
    artifacts: list[str] = []

    class _Table:
        def __init__(self, columns):
            self.columns = columns
            self.rows = []

        def add_data(self, *row):
            self.rows.append(row)

    class _File:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def write(self, _):
            pass

    class _Artifact:
        def __init__(self, name, type):
            artifacts.append(name)

        def new_file(self, *a, **k):
            return _File()

    class _Summary(dict):
        def update(self, d):
            dict.update(self, d)

    class _Run:
        config = types.SimpleNamespace(update=lambda *a, **k: None)
        summary = _Summary()

        def log(self, payload):
            logged.append(payload)

        def log_artifact(self, a):
            pass

        def finish(self):
            pass

    stub = types.SimpleNamespace(
        init=lambda **k: _Run(), Table=_Table, Artifact=_Artifact
    )
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from lmms_owc_tpu.loggers import WandbLogger

    logger = WandbLogger(project="x")
    results = {
        "results": {
            "grp": {"acc,none": 0.5},
            "t1": {"exact_match,none": 1.0, "exact_match_stderr,none": 0.1},
            "t2": {"exact_match,none": 0.0},
        },
        "groups": {"grp": {"acc,none": 0.5}},
        "versions": {"t1": "Yaml", "t2": "Yaml", "grp": "N/A"},
        "n-shot": {"t1": 0, "t2": 0},
        "configs": {
            "t1": {"output_type": "generate_until", "group": "grp",
                   "metric_list": [{"metric": "exact_match"}]},
            "t2": {"output_type": "generate_until", "group": "grp",
                   "metric_list": [{"metric": "exact_match"}]},
        },
        "config": {},
    }
    logger.post_init(results)
    logger.log_eval_result()

    eval_tables = [p for p in logged if "evaluation/eval_results" in p]
    group_tables = [p for p in logged if "evaluation/group_eval_results" in p]
    assert eval_tables and group_tables
    table = eval_tables[0]["evaluation/eval_results"]
    # group rows are excluded from the per-task table; stderr filled when present
    tasks_col = [r[0] for r in table.rows]
    assert set(tasks_col) == {"t1", "t2"}
    t1_row = next(r for r in table.rows if r[0] == "t1")
    assert t1_row[-1] == "0.1000"

    # "arguments" is the engine's FLAT serializable-args list (evaluator.py).
    sample = {
        "doc_id": 0,
        "target": "cat",
        "arguments": ["What?", {"max_new_tokens": 4}, 0, "t1", "test"],
        "resps": [["a cat"]],
        "filtered_resps": ["a cat"],
        "exact_match": 1.0,
    }
    logger.log_eval_samples({"t1": [sample], "t2": [sample]})
    group_sample_tables = [p for p in logged if "grp_eval_results" in p]
    assert group_sample_tables, "grouped tasks must log one concatenated group table"
    frame = group_sample_tables[0]["grp_eval_results"]
    assert set(frame["task"]) == {"t1", "t2"}
    assert (frame["group"] == "grp").all()
    assert "exact_match" in frame.columns
    assert artifacts.count("t1") == 1 and artifacts.count("t2") == 1
