"""Golden cross-check: run the REFERENCE's scoring code on identical inputs and
assert numeric identity with ours (VERDICT round-1 item 10).

The reference's string metrics and Elo math are pure-Python/numpy-runnable on CPU
(/root/reference/eval_metrics.py:74-128, eval_ranking.py:246-283). These tests
import them directly from the read-only checkout and compare against our
implementations on shared synthetic corpora — embedding metrics are excluded
(no weights in this environment). Skipped entirely when the reference checkout
is absent (downstream users).
"""

import random
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    import importlib
    import importlib.util

    # The reference's import chain touches a few packages absent from this
    # environment, none of which matter for the metric/Elo math under test
    # (pkg_resources: availability probe; pytz: log timestamps; gdown:
    # downloads; pytablewriter: result tables; colorlog: log colors). Shim them.
    import logging
    import types
    import zoneinfo

    def shim(name, **attrs):
        if name in sys.modules:
            return
        module = types.ModuleType(name)
        module.__version__ = "0.0.0"  # version probes (e.g. pandas) expect one
        for attr, value in attrs.items():
            setattr(module, attr, value)
        sys.modules[name] = module

    dnf = type("DistributionNotFound", (Exception,), {})
    shim(
        "pkg_resources",
        DistributionNotFound=dnf,
        require=lambda name: (_ for _ in ()).throw(dnf()),
    )
    shim("pytz", timezone=lambda name: zoneinfo.ZoneInfo(name))
    shim("gdown", download=lambda *a, **k: None)
    shim("dotenv", load_dotenv=lambda *a, **k: None)

    class _PlainFormatter(logging.Formatter):
        def __init__(self, fmt=None, *args, **kwargs):
            if isinstance(fmt, str):
                fmt = fmt.replace("%(log_color)s", "").replace("%(reset)s", "")
            super().__init__(fmt)

    shim("colorlog", ColoredFormatter=_PlainFormatter, StreamHandler=logging.StreamHandler)

    class _NullWriter:
        def __init__(self, *a, **k):
            self.__dict__.update(k)

        def dumps(self):
            return ""

    shim("pytablewriter", LatexTableWriter=_NullWriter, MarkdownTableWriter=_NullWriter)

    sys.path.insert(0, str(REFERENCE))
    try:
        ref_instance = importlib.import_module("src.data.metrics._instance")
        # Load the reference CLI under a DISTINCT module name so it never
        # shadows our own repo-root eval_ranking module.
        spec = importlib.util.spec_from_file_location(
            "_reference_eval_ranking", REFERENCE / "eval_ranking.py"
        )
        ref_ranking = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_ranking)
    finally:
        # Remove the path BEFORE the tests run so `import eval_ranking` inside a
        # test resolves to OUR repo-root module, never the reference's.
        sys.path.remove(str(REFERENCE))
    try:
        yield ref_instance, ref_ranking
    finally:
        # Drop the reference's src package so it cannot shadow anything later.
        for name in [m for m in sys.modules if m == "src" or m.startswith("src.")]:
            del sys.modules[name]
        sys.modules.pop("_reference_eval_ranking", None)


def _corpus(n=120):
    rng = random.Random(7)
    words = ["Dog", "cat!", "a 300zx", "Sun-flower", "FOOD, 101", "téxt", "", "$12.50"]
    preds = [" ".join(rng.choices(words, k=rng.randint(1, 4))) for _ in range(n)]
    refs = [
        preds[i] if rng.random() < 0.4 else " ".join(rng.choices(words, k=rng.randint(1, 4)))
        for i in range(n)
    ]
    return preds, refs


class TestStringMetricGoldens:
    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"ignore_case": True},
            {"ignore_case": True, "ignore_punctuation": True},
            {"ignore_numbers": True},
            {"ignore_case": True, "regexes_to_ignore": [",", r"\$"]},
        ],
    )
    def test_exact_match(self, ref_modules, kwargs):
        ref_instance, _ = ref_modules
        from lmms_owc_tpu.metrics._instance import exact_match as ours

        preds, refs = _corpus()
        theirs = ref_instance.exact_match(predictions=preds, references=refs, **kwargs)
        mine = ours(predictions=preds, references=refs, **kwargs)
        mine_val = mine["exact_match"] if isinstance(mine, dict) else mine
        assert float(mine_val) == float(theirs["exact_match"])

    def test_textual_inclusion(self, ref_modules):
        ref_instance, _ = ref_modules
        from lmms_owc_tpu.metrics._instance import textual_inclusion as ours

        preds, refs = _corpus()
        theirs = ref_instance.textual_inclusion(predictions=preds, references=refs)
        mine = ours(predictions=preds, references=refs)
        mine_val = mine["textual_inclusion"] if isinstance(mine, dict) else mine
        assert float(mine_val) == float(theirs["textual_inclusion"])

    def test_anls(self, ref_modules):
        ref_instance, _ = ref_modules
        from lmms_owc_tpu.metrics._instance import anls as ours

        rng = random.Random(3)
        for _ in range(50):
            refs = [
                "".join(rng.choices("abcdef ", k=rng.randint(0, 12)))
                for _ in range(rng.randint(1, 3))
            ]
            preds = ["".join(rng.choices("abcdef ", k=rng.randint(0, 12)))]
            theirs = ref_instance.anls(references=refs, predictions=preds)
            mine = ours(references=refs, predictions=preds)
            mine_val = mine["anls"] if isinstance(mine, dict) else mine
            assert float(mine_val) == float(theirs["anls"])


class TestEloGolden:
    @pytest.mark.parametrize("zero_sum", [False, True])
    def test_elo_sequence_identical(self, ref_modules, zero_sum):
        _, ref_ranking = ref_modules
        from eval_ranking import _elo_rating as ours  # our repo-root CLI module

        # Make sure "ours" is OUR module, not the reference's (fixture path games).
        import eval_ranking as our_mod

        assert Path(our_mod.__file__).resolve().is_relative_to(Path.cwd().resolve())

        rng = random.Random(11)
        ratings_ref = {m: 1000.0 for m in "ABCD"}
        ratings_ours = dict(ratings_ref)
        for _ in range(500):
            a, b = rng.sample("ABCD", 2)
            score = rng.choice([0.0, 0.5, 1.0])
            ra, rb = ref_ranking._elo_rating(
                ratings_ref[a], ratings_ref[b], score, k_factor=16, zero_sum=zero_sum
            )
            ratings_ref[a], ratings_ref[b] = ra, rb
            oa, ob = ours(
                ratings_ours[a], ratings_ours[b], score, k_factor=16, zero_sum=zero_sum
            )
            ratings_ours[a], ratings_ours[b] = oa, ob
        for m in "ABCD":
            assert ratings_ours[m] == pytest.approx(ratings_ref[m], abs=1e-9)


class TestEvalMetricsCLIGolden:
    """Run the REFERENCE's eval_metrics.py and OURS as subprocesses on identical
    samples and assert identical printed metric values (VERDICT item 10)."""

    @pytest.fixture()
    def samples_tree(self, tmp_path):
        import json

        rng = random.Random(5)
        words = ["dog", "cat", "a red car", "sunflower", "FOOD", "jet plane"]
        docs = []
        for i in range(40):
            target = rng.choice(words)
            resp = (
                f"this is {target}" if rng.random() < 0.5 else rng.choice(words)
            )
            docs.append(
                {"doc_id": i, "target": target, "filtered_resps": [resp]}
            )
        d = tmp_path / "logs" / "schedule" / "toytask" / "modelA"
        d.mkdir(parents=True)
        with open(d / "2026-01-01T00-00-00.0_samples_toytask.jsonl", "w") as f:
            for doc in docs:
                f.write(json.dumps(doc) + "\n")
        return tmp_path

    def _metric_lines(self, stdout: str) -> dict:
        out = {}
        for line in stdout.splitlines():
            if ":" in line and not line.endswith(":") and "on " not in line:
                name, _, value = line.rpartition(":")
                try:
                    out[name.strip()] = float(value)
                except ValueError:
                    continue
        return out

    def test_textual_inclusion_identical(self, samples_tree):
        import os
        import subprocess
        import sys

        # Relative glob: the reference resolves patterns against its cwd and
        # rejects absolute ones (Path().glob).
        glob_arg = "logs/schedule/**/*"
        shims = str(Path(__file__).parent / "fixtures" / "ref_shims")

        env_ref = dict(os.environ)
        env_ref["PYTHONPATH"] = f"{shims}:{REFERENCE}"
        ref = subprocess.run(
            [sys.executable, str(REFERENCE / "eval_metrics.py"),
             "-i", glob_arg, "-m", "textual_inclusion"],
            capture_output=True, text=True, env=env_ref, cwd=str(samples_tree),
            timeout=300,
        )
        assert ref.returncode == 0, ref.stderr[-2000:]

        ours = subprocess.run(
            [sys.executable, str(Path(__file__).parent.parent / "eval_metrics.py"),
             "-i", glob_arg, "-m", "textual_inclusion"],
            capture_output=True, text=True, cwd=str(samples_tree), timeout=300,
        )
        assert ours.returncode == 0, ours.stderr[-2000:]

        ref_vals = self._metric_lines(ref.stdout)
        our_vals = self._metric_lines(ours.stdout)
        assert ref_vals, f"no metric lines parsed from reference stdout:\n{ref.stdout}"
        assert our_vals == ref_vals
