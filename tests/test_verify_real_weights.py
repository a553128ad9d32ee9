"""CI coverage for scripts/verify_real_weights.py command assembly.

The harness itself needs real checkpoints (absent in this environment); what CI
can and must pin is that a weights-enabled machine gets correct commands,
correct metric extraction, and correct pinned-value comparison — so the first
real run never dies on an assembly bug.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import verify_real_weights as vrw  # noqa: E402


def test_pinned_table_matches_baseline_md():
    """The vendored table must cover the 7 reference families and the pinned
    values from BASELINE.md (reference tests/models/models_test.py:14-57)."""
    assert set(vrw.PINNED) == {
        "llava-1.5-7b", "llava-onevision-qwen2-0.5b-ov", "idefics2-8b",
        "instructblip-vicuna-7b", "internvl2-2b", "phi3v", "qwen2-vl-2b",
    }
    assert vrw.PINNED["internvl2-2b"]["ai2d"] == 1.0
    assert vrw.PINNED["llava-onevision-qwen2-0.5b-ov"]["mmmu_val"] == (0.250, 0.375)
    # idefics2 muirbench and phi3v muirbench are deliberately unpinned
    # (reference OOM / unknown, models_test.py:31,48).
    assert "muirbench" not in vrw.PINNED["idefics2-8b"]
    assert "muirbench" not in vrw.PINNED["phi3v"]


def test_build_commands_assembles_cli_invocations(tmp_path):
    plans = vrw.build_commands(tmp_path / "ckpts", tmp_path / "out")
    assert len(plans) == 7
    by_model = {p["model"]: p for p in plans}

    qwen = by_model["qwen2-vl-2b"]
    cmd = qwen["cmd"]
    assert cmd[1].endswith("eval_model.py")
    assert cmd[cmd.index("--model") + 1] == "qwen2-vl-2b"
    model_args = cmd[cmd.index("--model_args") + 1]
    assert f"pretrained={tmp_path / 'ckpts' / 'Qwen2-VL-2B-Instruct'}" in model_args
    assert "dtype=bfloat16" in model_args  # fidelity mode, not int8 serving
    assert cmd[cmd.index("--tasks") + 1] == "ai2d,mmmu_val,muirbench,ocr_bench"
    assert cmd[cmd.index("--limit") + 1] == "8"
    assert cmd[cmd.index("--num_fewshot") + 1] == "0"
    assert cmd[cmd.index("--seed") + 1] == "0,1234,1234,1234"
    assert "--log_samples" in cmd

    # Per-model task lists honor the unpinned omissions.
    assert by_model["idefics2-8b"]["cmd"][
        by_model["idefics2-8b"]["cmd"].index("--tasks") + 1
    ] == "ai2d,mmmu_val,ocr_bench"

    # Model subset and limit plumb through.
    subset = vrw.build_commands(
        tmp_path / "ckpts", tmp_path / "out", models=["phi3v"], limit=4
    )
    assert [p["model"] for p in subset] == ["phi3v"]
    assert subset[0]["cmd"][subset[0]["cmd"].index("--limit") + 1] == "4"


def test_extract_metric_values_takes_first_metric_after_alias():
    """Mirrors reference models_test.py:143-145: list(values())[1] semantics,
    made robust to stderr keys."""
    results = {
        "results": {
            "ai2d": {
                "alias": "ai2d",
                "exact_match,none": 0.625,
                "exact_match_stderr,none": 0.17,
            },
            "ocr_bench": {"alias": "ocr_bench", "ocr_bench_accuracy,none": 0.007},
        }
    }
    out = vrw.extract_metric_values(results, ["ai2d", "ocr_bench"])
    assert out == {"ai2d": 0.625, "ocr_bench": 0.007}


def test_compare_tolerance_and_tuple_pins():
    pinned = {"ai2d": 0.625, "mmmu_val": (0.250, 0.375)}
    assert vrw.compare({"ai2d": 0.6251, "mmmu_val": 0.375}, pinned, 1e-3) == []
    failures = vrw.compare({"ai2d": 0.630, "mmmu_val": 0.5}, pinned, 1e-3)
    assert len(failures) == 2
    assert vrw.compare({"ai2d": 0.625}, pinned, 1e-3) == ["mmmu_val: no measured value"]


def test_dry_run_exits_zero(tmp_path, capsys):
    rc = vrw.main(
        ["--checkpoint_root", str(tmp_path), "--dry_run", "--models", "qwen2-vl-2b"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval_model.py" in out and "qwen2-vl-2b" in out


@pytest.mark.skipif(
    not (Path("/checkpoints").exists() or Path.home().joinpath("checkpoints").exists()),
    reason="real checkpoints absent in this environment",
)
def test_real_weights_matrix():  # pragma: no cover - weights-enabled machines only
    root = Path("/checkpoints") if Path("/checkpoints").exists() else Path.home() / "checkpoints"
    rc = vrw.main(["--checkpoint_root", str(root), "--scoring"])
    assert rc == 0


def test_classification_commands_cover_the_10_benchmarks(tmp_path):
    """The paper workload (reference src/data/tasks/_classification/): 10 base
    tasks per model at limit=8, same CLI shape as the example-task matrix."""
    plans = vrw.build_classification_commands(tmp_path / "ckpts", tmp_path / "out")
    assert len(plans) == 7
    for plan in plans:
        cmd = plan["cmd"]
        assert cmd[cmd.index("--tasks") + 1] == (
            "caltech101,dtd,eurosat,fgvc_aircraft,flowers102,"
            "food101,oxford_pets,stanford_cars,sun397,ucf101"
        )
        assert cmd[cmd.index("--limit") + 1] == "8"
        assert cmd[cmd.index("--num_fewshot") + 1] == "0"
        assert "classification" in str(plan["output_path"])


def test_extract_all_metric_values_keeps_every_metric():
    results = {
        "results": {
            "dtd": {
                "alias": "dtd",
                "concept_semantic_similarity,none": 0.41,
                "concept_semantic_similarity_stderr,none": 0.02,
                "exact_match,none": 0.125,
                "semantic_similarity,none": 0.55,
                "textual_inclusion,none": 0.25,
            }
        }
    }
    out = vrw.extract_all_metric_values(results, ["dtd", "eurosat"])
    assert out["dtd"] == {
        "concept_semantic_similarity,none": 0.41,
        "exact_match,none": 0.125,
        "semantic_similarity,none": 0.55,
        "textual_inclusion,none": 0.25,
    }
    assert out["eurosat"] == {}  # absent task -> empty, reported downstream


def test_compare_classification_diffs_per_metric():
    pinned = {"dtd": {"exact_match,none": 0.125, "semantic_similarity,none": 0.55}}
    measured = {"dtd": {"exact_match,none": 0.125, "semantic_similarity,none": 0.60}}
    failures = vrw.compare_classification(measured, pinned, 1e-3)
    assert failures == [
        "dtd/semantic_similarity,none: got 0.6, pinned 0.55 (tol 0.001)"
    ]
    assert vrw.compare_classification({}, pinned, 1e-3) == ["dtd: no measured values"]


def test_classification_dry_run_exits_zero(tmp_path, capsys):
    rc = vrw.main(
        [
            "--checkpoint_root", str(tmp_path), "--dry_run", "--classification",
            "--models", "qwen2-vl-2b",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "qwen2-vl-2b classification" in out
    assert "stanford_cars" in out


def test_spacy_branch_skips_cleanly_without_spacy():
    """In this environment spacy is absent: the branch must report skip, not fail."""
    try:
        import spacy  # noqa: F401

        pytest.skip("spacy present here; branch exercised on weights machines")
    except ImportError:
        pass
    assert vrw.verify_spacy_concepts(None) == []
