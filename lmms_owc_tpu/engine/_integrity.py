"""--check_integrity support: run the regression test subset for selected tasks.

Functional replacement for reference src/utils/_engine_utils.py:34-58 (which pointed
at a nonexistent test file); here it targets the real tests/test_tasks.py.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["run_task_tests"]


def run_task_tests(task_list: list[str]) -> None:
    import pytest

    repo_root = Path(__file__).resolve().parent.parent.parent
    test_file = repo_root / "tests" / "test_tasks.py"
    if not test_file.exists():
        raise RuntimeError(f"integrity test file not found: {test_file}")
    rc = pytest.main(["-q", str(test_file), "-k", " or ".join(task_list)])
    if rc != pytest.ExitCode.OK:
        raise RuntimeError(f"integrity tests failed for tasks {task_list} (exit code {rc})")
