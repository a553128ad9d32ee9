"""Test configuration: force CPU JAX with 8 virtual devices for sharding tests.

Must set env vars before jax is imported anywhere.
"""

import os
import sys
from pathlib import Path

# XLA-CPU's oneDNN matmuls are low-precision by default; parity tests need exact f32.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# Unit tests run on CPU with 8 virtual devices (set LMMS_OWC_TEST_TPU=1 to run the
# suite against real TPU hardware instead). The env var alone is not enough in this
# image — a sitecustomize hook force-registers the TPU backend — so also override
# through jax.config before any backend is initialized.
if not os.environ.get("LMMS_OWC_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from lmms_owc_tpu.ops.attention import set_use_pallas
    from lmms_owc_tpu.ops.int4_matmul import set_use_pallas as set_int4_pallas

    set_use_pallas(False)
    set_int4_pallas(False)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False, help="run slow tests"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow (needs --run-slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --run-slow option")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session", autouse=True)
def _repo_root_cwd():
    """Task YAMLs use repo-root-relative dataset paths (mirroring the reference)."""
    os.chdir(REPO_ROOT)


@pytest.fixture(scope="session")
def toy_dataset():
    """Generate the toy classification dataset once per session."""
    sys.path.insert(0, str(REPO_ROOT / "tests" / "fixtures" / "tasks" / "toy" / "assets"))
    import _toy_utils

    _toy_utils.download()
    return _toy_utils.data_dir()


@pytest.fixture(scope="session")
def toy_task_path():
    return str(REPO_ROOT / "tests" / "fixtures" / "tasks")
