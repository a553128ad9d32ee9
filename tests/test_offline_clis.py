"""Offline CLI tests: eval_metrics.py and eval_ranking.py over synthetic sample runs."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _write_samples(root: Path, task: str, model: str, rows: list[dict]) -> Path:
    run_dir = root / task / model
    run_dir.mkdir(parents=True, exist_ok=True)
    path = run_dir / "20260101_000000_samples_task.jsonl"
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return path


@pytest.fixture()
def sample_runs(tmp_path):
    rows_good = [
        {"doc_id": i, "target": t, "filtered_resps": [t]}
        for i, t in enumerate(["red panda", "blue jay", "sea turtle", "golden retriever"])
    ]
    rows_bad = [
        {"doc_id": i, "target": t, "filtered_resps": ["a violin"]}
        for i, t in enumerate(["red panda", "blue jay", "sea turtle", "golden retriever"])
    ]
    _write_samples(tmp_path, "toytask", "model-good", rows_good)
    _write_samples(tmp_path, "toytask", "model-bad", rows_bad)
    return tmp_path


def _run(script: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(REPO / script), *args],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAX_PLATFORMS": "cpu",
             "LMMS_OWC_TPU_LOG_LEVEL": "WARNING"},
    )


class TestEvalMetricsCli:
    def test_textual_inclusion_and_writeback(self, sample_runs):
        result = _run(
            "eval_metrics.py", "-i", str(sample_runs), "-m",
            "textual_inclusion,semantic_similarity",
        )
        assert result.returncode == 0, result.stderr[-2000:]
        assert "Textual inclusion on toytask:" in result.stdout
        assert "model-good" in result.stdout and "model-bad" in result.stdout
        # good model gets 1.000 inclusion, bad model 0.000
        lines = result.stdout.splitlines()
        good = [l for l in lines if l.startswith("model-good")]
        assert any("1.000" in l for l in good)
        # per-sample semantic_similarity written back into the jsonl
        jsonl = next((sample_runs / "toytask" / "model-good").glob("*_samples_*.jsonl"))
        first = json.loads(jsonl.read_text().splitlines()[0])
        assert "semantic_similarity" in first


class TestEvalRankingCli:
    def test_elo_leaderboards(self, sample_runs):
        result = _run(
            "eval_ranking.py", "-i", str(sample_runs), "-c", "semantic_similarity",
            "-n", "200", "-b", "10",
        )
        assert result.returncode == 0, result.stderr[-2000:]
        assert "Online Elo ratings on toytask:" in result.stdout
        assert "Final Elo ratings on toytask:" in result.stdout
        # The model echoing targets must rank first.
        online_block = result.stdout.split("Online Elo ratings on toytask:")[1].splitlines()
        first_row = online_block[1]
        assert "model-good" in first_row
