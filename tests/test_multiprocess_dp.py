"""Multi-process data parallelism through the real CLI.

Launches 2- and 4-process ``jax.distributed`` runs of eval_model.py (gloo CPU
collectives) on the toy task and asserts the rank-0 results are identical to the
single-process run. Mirrors the reference's launcher-parametrized test
(reference tests/models/models_test.py:95-106: num_processes=1..N through
accelerate) and exercises the branches that are dead code in single-process runs:
the variable-length object allgather (engine/evaluator.py:_multihost_gather_objects),
per-rank request-count padding, and the empty-rank / request-type-union sync
(world_size > doc count).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

BASE_ENV = {
    "PATH": "/usr/bin:/bin",
    "HOME": "/root",
    "JAX_PLATFORMS": "cpu",
    "LMMS_OWC_TPU_LOG_LEVEL": "WARNING",
    # One CPU device per process: the DP axis under test is the PROCESS grid.
    "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cli_cmd(out_dir: Path, limit: int) -> list[str]:
    return [
        sys.executable, str(REPO / "eval_model.py"),
        "--model", "fake",
        "--model_args", "pretrained=fake-dp,response_mode=target",
        "--tasks", "toy",
        "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
        "--limit", str(limit),
        "--log_samples",
        "--output_path", str(out_dir),
        "--seed", "0,1234,1234,1234",
    ]


def _run_world(out_dir: Path, limit: int, world_size: int) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    if world_size == 1:
        procs = [subprocess.Popen(
            _cli_cmd(out_dir, limit), cwd=REPO, env=BASE_ENV,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )]
    else:
        port = _free_port()
        procs = [
            subprocess.Popen(
                _cli_cmd(out_dir, limit), cwd=REPO,
                env={
                    **BASE_ENV,
                    "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                    "JAX_NUM_PROCESSES": str(world_size),
                    "JAX_PROCESS_ID": str(rank),
                },
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for rank in range(world_size)
        ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outputs.append(out.decode())
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, out[-4000:]

    results_files = list(out_dir.rglob("*_results.json"))
    assert len(results_files) == 1, "exactly one rank (0) must write results"
    results = json.loads(results_files[0].read_text())
    samples_files = list(out_dir.rglob("*_samples_toy.jsonl"))
    assert len(samples_files) == 1
    results["_samples"] = sorted(
        (json.loads(line) for line in samples_files[0].read_text().splitlines()),
        key=lambda s: s["doc_id"],
    )
    return results


# Excluded from cross-world comparison:
#   date/start_time/end_time/timings/total_evaluation_time_seconds — wall clock;
#   configs — contains repr'd function pointers (address differs per process),
#     matching the reference's handle_non_serializable dump;
#   task_hashes — joins sample hashes in GATHER order (rank-interleaved), so the
#     value is world-size-dependent by construction, as in the reference tracker
#     (reference src/engine/_tracker.py:237-247 hashes post-gather sample order).
VOLATILE = {
    "date", "total_evaluation_time_seconds", "phase_timings", "config",
    "configs", "start_time", "end_time", "timings", "task_hashes",
}


def _comparable(results: dict) -> dict:
    return {k: v for k, v in results.items() if k not in VOLATILE}


@pytest.fixture(scope="module")
def baseline_limit6(tmp_path_factory, toy_dataset):
    return _run_world(tmp_path_factory.mktemp("dp_w1_l6"), limit=6, world_size=1)


@pytest.mark.parametrize("world_size", [2, 4])
def test_dp_matches_single_process(tmp_path, baseline_limit6, world_size):
    """N-process DP run produces identical results + samples to the 1-process run.

    limit=6 over 4 ranks shards 2/2/1/1 — the per-rank request-count padding
    branch runs on ranks 2-3.
    """
    multi = _run_world(tmp_path, limit=6, world_size=world_size)
    assert _comparable(multi) == _comparable(baseline_limit6)
    assert multi["results"]["toy"]["exact_match,none"] == 1.0
    assert len(multi["_samples"]) == 6


def test_dp_world_larger_than_doc_count(tmp_path_factory, toy_dataset):
    """world_size (4) > docs (2): empty ranks take the zero-request path and the
    metric-key/request-type union sync, and the gather still collects all docs."""
    single = _run_world(tmp_path_factory.mktemp("dp_w1_l2"), limit=2, world_size=1)
    multi = _run_world(tmp_path_factory.mktemp("dp_w4_l2"), limit=2, world_size=4)
    assert _comparable(multi) == _comparable(single)
    assert len(multi["_samples"]) == 2
