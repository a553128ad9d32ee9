"""Schema registry records and --check_integrity / native-loader fallbacks."""

import numpy as np
import pytest


class TestSchema:
    def test_model_registry_records(self):
        from lmms_owc_tpu.models import MODELS
        from lmms_owc_tpu.schema import ModelInfo

        info = MODELS["qwen2-vl-2b"]
        assert isinstance(info, ModelInfo)
        assert info.name == "qwen2-vl-2b"
        assert callable(info.model_cls)

    def test_metric_registry_records(self):
        from lmms_owc_tpu.metrics import METRICS
        from lmms_owc_tpu.schema import MetricInfo

        info = METRICS["exact_match"]
        assert isinstance(info, MetricInfo)
        assert info.higher_is_better is True
        assert "generate_until" in info.output_types
        assert callable(info.builder_fn)


class TestIntegrity:
    def test_run_task_tests_passes_for_toy(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import run_task_tests

        # Selects tests matching "config" in tests/test_tasks.py — a real subset.
        run_task_tests(["config"])

    def test_run_task_tests_raises_on_no_match(self):
        from lmms_owc_tpu.engine import run_task_tests

        with pytest.raises(RuntimeError):
            run_task_tests(["no_such_task_zzz"])


class TestNativeLoaderFallback:
    def test_pil_path_matches_native(self, tmp_path):
        """LMMS_OWC_NATIVE_LOADER=0 must produce the same resized pixels."""
        import os

        from PIL import Image

        from lmms_owc_tpu.ops import image as img_ops

        rng = np.random.RandomState(0)
        pil = Image.fromarray(rng.randint(0, 255, (96, 130, 3), dtype=np.uint8))

        old = os.environ.get("LMMS_OWC_NATIVE_LOADER")
        try:
            os.environ["LMMS_OWC_NATIVE_LOADER"] = "0"
            chw_pil, dims_pil = img_ops.resize_host(pil, 4 * 28 * 28, 256 * 28 * 28, 28)
        finally:
            if old is None:
                os.environ.pop("LMMS_OWC_NATIVE_LOADER", None)
            else:
                os.environ["LMMS_OWC_NATIVE_LOADER"] = old
        chw_nat, dims_nat = img_ops.resize_host(pil, 4 * 28 * 28, 256 * 28 * 28, 28)
        assert dims_pil == dims_nat
        assert chw_pil.shape == chw_nat.shape
        # The C++ loader replicates PIL's antialiased bicubic; allow 1-bit noise.
        assert np.abs(chw_pil.astype(np.int32) - chw_nat.astype(np.int32)).max() <= 1

    def test_identity_resize_is_exact_passthrough(self):
        """An input already on the target grid must come back pixel-identical.

        PIL's Image.resize special-cases same-size to a copy (no resample), so
        the fast path (skip the resampler entirely) is exact parity — and it is
        what the uniform-448 serving workload hits on every image.
        """
        from PIL import Image

        from lmms_owc_tpu.ops import image as img_ops

        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (448, 448, 3), dtype=np.uint8)
        chw, dims = img_ops.resize_host(
            Image.fromarray(arr), 4 * 28 * 28, 1024 * 28 * 28, 28
        )
        assert dims == (448, 448)
        assert np.array_equal(chw, arr.transpose(2, 0, 1))
