"""Classification asset pipeline tests: split resolution + dataset conversion."""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

CONFIGS = Path(__file__).resolve().parent.parent / "lmms_owc_tpu" / "tasks" / "configs"


@pytest.fixture(scope="module")
def common():
    spec = importlib.util.spec_from_file_location(
        "clf_common_test", CONFIGS / "classification" / "_assets_common.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _make_images(root: Path, classes: dict[str, int]) -> list[str]:
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for cls, count in classes.items():
        (root / "images" / cls).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            p = root / "images" / cls / f"{cls}_{i}.jpg"
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
            paths.append(str(p.relative_to(root)))
    return paths


class TestSplitResolution:
    def test_coop_json_splits(self, common, tmp_path, monkeypatch):
        root = tmp_path / ".cache" / "data" / "toybench"
        rels = _make_images(root, {"cat": 3, "dog": 3})
        split = {
            "train": [[rels[0], 0, "cat"], [rels[3], 1, "dog"]],
            "val": [[rels[1], 0, "cat"]],
            "test": [[rels[2], 0, "cat"], [rels[4], 1, "dog"], [rels[5], 1, "dog"]],
        }
        (root / "split_zhou_ToyBench.json").write_text(json.dumps(split))

        path_to_class, split_rows = common._load_coop_json_splits("toybench", root)
        assert len(split_rows) == 6
        assert path_to_class[rels[2]] == "cat"
        assert sum(1 for _, s in split_rows if s == "test") == 3

    def test_coop_random_split_deterministic(self, common):
        files = [f"images/c/{i}.jpg" for i in range(20)]
        a = common._coop_random_split(files, seed=1234)
        b = common._coop_random_split(files, seed=1234)
        assert a == b
        counts = {}
        for _, split in a:
            counts[split] = counts.get(split, 0) + 1
        assert counts == {"train": 10, "val": 4, "test": 6}

    def test_official_split_parsers_dtd(self, common, tmp_path):
        root = tmp_path
        labels = root / "dtd" / "labels"
        labels.mkdir(parents=True)
        (labels / "train1.txt").write_text("banded/banded_0001.jpg\n")
        (labels / "val1.txt").write_text("banded/banded_0002.jpg\n")
        (labels / "test1.txt").write_text("dotted/dotted_0001.jpg\n")
        rows = common._official_splits("dtd", root)
        assert ("dtd/images/banded/banded_0001.jpg", "train") in rows
        assert ("dtd/images/dotted/dotted_0001.jpg", "test") in rows

    def test_class_from_path_conventions(self, common):
        assert common._class_from_path("oxford_pets", "images/Abyssinian_12.jpg") == "abyssinian"
        assert common._class_from_path("food101", "food-101/images/apple_pie/1.jpg") == "apple_pie"
        assert (
            common._class_from_path("fgvc_aircraft", "data/images/0034309.jpg|707-320")
            == "707-320"
        )


class TestDownloadConversion:
    def test_download_benchmark_with_coop_json(self, common, tmp_path, monkeypatch):
        """Full convert flow against a local synthetic archive layout."""
        cache = tmp_path / ".cache"
        root = cache / "data" / "caltech101"
        rels = _make_images(root, {"accordion": 2, "anchor": 2})
        split = {
            "train": [[rels[0], 0, "accordion"]],
            "val": [[rels[2], 1, "anchor"]],
            "test": [[rels[1], 0, "accordion"], [rels[3], 1, "anchor"]],
        }
        (root / "split_zhou_Caltech101.json").write_text(json.dumps(split))
        monkeypatch.chdir(tmp_path)

        common.download_benchmark("caltech101", output_dir="data", cache_dir=str(cache))

        import datasets

        ds = datasets.load_from_disk(str(tmp_path / "data" / "caltech101"))
        assert set(ds.keys()) == {"train", "val", "test"}
        assert len(ds["test"]) == 2
        assert sorted(set(ds["test"]["target"])) == ["accordion", "anchor"]
        assert all(Path(v).exists() for v in ds["test"]["visual"])
