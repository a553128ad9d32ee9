"""Subprocess CLI golden on a REAL tiny NN checkpoint (not the fake backend).

Mirrors the reference's quality bar of launching the CLI against real model
weights and pinning outputs (reference tests/models/models_test.py:130-143):
qwen2-vl-tiny loads a miniature HF checkpoint + real BPE tokenizer from disk,
runs through ``eval_model.py`` as a subprocess, and the per-sample generated
strings must byte-match an in-process ``evaluate()`` over the same checkpoint —
closing the gap between fake-model CLI goldens and in-process family parity.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def qwen_tiny_checkpoint(tmp_path_factory):
    from test_checkpoint_matrix import _build_qwen2_vl

    path = tmp_path_factory.mktemp("cli_qwen_ckpt")
    _build_qwen2_vl(path)
    return path


def _run_cli(out_dir: Path, ckpt: Path) -> tuple[dict, list[dict]]:
    result = subprocess.run(
        [
            sys.executable, str(REPO / "eval_model.py"),
            "--model", "qwen2-vl-tiny",
            "--model_args", f"pretrained={ckpt},dtype=float32",
            "--tasks", "toy",
            "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
            "--limit", "4",
            "--batch_size", "2",
            "--log_samples",
            "--output_path", str(out_dir),
            "--seed", "0,1234,1234,1234",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
             "LMMS_OWC_TPU_LOG_LEVEL": "WARNING",
             "JAX_DEFAULT_MATMUL_PRECISION": "highest"},
    )
    assert result.returncode == 0, result.stderr[-4000:]
    results = json.loads(next(out_dir.rglob("*_results.json")).read_text())
    samples = [
        json.loads(line)
        for line in next(out_dir.rglob("*_samples_toy.jsonl")).read_text().splitlines()
    ]
    return results, sorted(samples, key=lambda s: s["doc_id"])


def test_cli_matches_in_process(tmp_path, qwen_tiny_checkpoint, toy_task_path, toy_dataset):
    results, samples = _run_cli(tmp_path, qwen_tiny_checkpoint)
    assert len(samples) == 4
    metrics = results["results"]["toy"]
    assert set(metrics) >= {"exact_match,none", "textual_inclusion,none"}

    # In-process run over the same checkpoint/task — responses must byte-match.
    from lmms_owc_tpu.engine import evaluate
    from lmms_owc_tpu.models import get_model
    from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

    model = get_model(
        "qwen2-vl-tiny", pretrained=str(qwen_tiny_checkpoint), batch_size=2, dtype="float32"
    )
    tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
    task_dict = get_tasks_as_dict(["toy"], tm)
    task_dict["toy"].set_fewshot_seed(1234)
    model.task_dict = task_dict
    in_proc = evaluate(model=model, task_dict=task_dict, limit=4, bootstrap_iters=0,
                       log_samples=True)
    in_samples = sorted(in_proc["samples"]["toy"], key=lambda s: s["doc_id"])

    assert [s["filtered_resps"] for s in samples] == [s["filtered_resps"] for s in in_samples]
    assert [s["doc_hash"] for s in samples] == [s["doc_hash"] for s in in_samples]
    for metric in ("exact_match,none", "textual_inclusion,none"):
        assert metrics[metric] == in_proc["results"]["toy"][metric]


def test_cli_run_is_deterministic(tmp_path, qwen_tiny_checkpoint, toy_dataset):
    """Two CLI launches produce identical generated strings and metrics."""
    r1, s1 = _run_cli(tmp_path / "a", qwen_tiny_checkpoint)
    r2, s2 = _run_cli(tmp_path / "b", qwen_tiny_checkpoint)
    assert [s["resps"] for s in s1] == [s["resps"] for s in s2]
    assert r1["results"] == r2["results"]
