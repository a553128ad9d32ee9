"""Combined data-parallel x tensor-parallel run through the real CLI.

The flagship multi-host topology (SURVEY §2.8 TPU-equivalents): N processes,
each owning a ("data", "model") mesh over its LOCAL chips, with benchmark
samples sharded per process (reference DP semantics, create_iterator) and
weights Megatron-sharded inside each process. Until round 4 the two halves were
tested separately — DP multi-process with 1 device/process
(tests/test_multiprocess_dp.py) and TP single-process over 8 virtual devices
(tests/test_parallel.py). This launches 2 jax.distributed processes x 2 virtual
CPU devices each, `model_parallel=2`, on a real tiny NN checkpoint, and asserts
results + per-sample strings identical to the single-process unsharded run.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent

VOLATILE = {
    "date", "total_evaluation_time_seconds", "phase_timings", "config",
    "configs", "start_time", "end_time", "timings", "task_hashes",
}


@pytest.fixture(scope="module")
def qwen_tiny_checkpoint(tmp_path_factory):
    from test_checkpoint_matrix import _build_qwen2_vl

    path = tmp_path_factory.mktemp("dptp_qwen_ckpt")
    _build_qwen2_vl(path)
    return path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cli_cmd(out_dir: Path, ckpt: Path, model_parallel: int) -> list[str]:
    model_args = f"pretrained={ckpt},dtype=float32"
    if model_parallel > 1:
        model_args += f",model_parallel={model_parallel}"
    return [
        sys.executable, str(REPO / "eval_model.py"),
        "--model", "qwen2-vl-tiny",
        "--model_args", model_args,
        "--tasks", "toy",
        "--include_path", str(REPO / "tests" / "fixtures" / "tasks"),
        "--limit", "6",
        "--batch_size", "2",
        "--log_samples",
        "--output_path", str(out_dir),
        "--seed", "0,1234,1234,1234",
    ]


def _run_topology(out_dir: Path, ckpt: Path, *, processes: int, devices_per_proc: int,
                  model_parallel: int) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    base_env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        "JAX_PLATFORMS": "cpu",
        "LMMS_OWC_TPU_LOG_LEVEL": "WARNING",
        "JAX_DEFAULT_MATMUL_PRECISION": "highest",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_proc}",
    }
    if processes == 1:
        envs = [base_env]
    else:
        port = _free_port()
        envs = [
            {
                **base_env,
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": str(processes),
                "JAX_PROCESS_ID": str(rank),
            }
            for rank in range(processes)
        ]
    procs = [
        subprocess.Popen(
            _cli_cmd(out_dir, ckpt, model_parallel), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for env in envs
    ]
    outputs = [proc.communicate(timeout=600)[0].decode() for proc in procs]
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, out[-4000:]

    results_files = list(out_dir.rglob("*_results.json"))
    assert len(results_files) == 1, "exactly one rank (0) must write results"
    results = json.loads(results_files[0].read_text())
    samples_file = next(out_dir.rglob("*_samples_toy.jsonl"))
    results["_samples"] = sorted(
        (json.loads(line) for line in samples_file.read_text().splitlines()),
        key=lambda s: s["doc_id"],
    )
    return results


def _comparable(results: dict) -> dict:
    return {k: v for k, v in results.items() if k not in VOLATILE}


def test_dp_tp_matches_single_process(tmp_path, qwen_tiny_checkpoint, toy_dataset):
    """2 processes x 2 local devices each, model_parallel=2 — the ("data","model")
    per-host mesh composed with cross-process request sharding — must produce
    results, metrics, and per-sample generations identical to one unsharded
    process. Executes the full flagship collective pattern on CPU: gloo
    allgather for request padding + sample gather, GSPMD all-reduce inside each
    process's TP mesh."""
    single = _run_topology(
        tmp_path / "w1", qwen_tiny_checkpoint,
        processes=1, devices_per_proc=1, model_parallel=1,
    )
    combined = _run_topology(
        tmp_path / "w2tp2", qwen_tiny_checkpoint,
        processes=2, devices_per_proc=2, model_parallel=2,
    )
    assert _comparable(combined) == _comparable(single)
    assert [s["resps"] for s in combined["_samples"]] == [
        s["resps"] for s in single["_samples"]
    ]
    assert len(combined["_samples"]) == 6
