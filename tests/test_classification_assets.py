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
        # The vendored reference tables outrank split_zhou JSONs by default;
        # disable them here to exercise the JSON path in isolation.
        monkeypatch.setattr(common, "_load_packaged_splits", lambda name: None)

        common.download_benchmark("caltech101", output_dir="data", cache_dir=str(cache))

        import datasets

        ds = datasets.load_from_disk(str(tmp_path / "data" / "caltech101"))
        assert set(ds.keys()) == {"train", "val", "test"}
        assert len(ds["test"]) == 2
        assert sorted(set(ds["test"]["target"])) == ["accordion", "anchor"]
        assert all(Path(v).exists() for v in ds["test"]["visual"])


# sha256[:16] of the vendored split tables ("split,filename" per row, file order)
# plus per-split counts — the published CoOp split sizes. Any drift in the vendored
# CSVs (reference: src/data/tasks/_classification/*/assets/split_coop.csv) fails here.
VENDORED_SPLIT_PINS = {
    "caltech101": ("2522459a8f76c3fa", {"train": 4128, "val": 1649, "test": 2465}),
    "dtd": ("d2c9831614936543", {"train": 2820, "val": 1128, "test": 1692}),
    "eurosat": ("d333775bb64aeff0", {"train": 13500, "val": 5400, "test": 8100}),
    "flowers102": ("32ca24990277827f", {"train": 4093, "val": 1633, "test": 2463}),
    "food101": ("83c15caf88f14348", {"train": 50500, "val": 20200, "test": 30300}),
    "oxford_pets": ("e8e175d8ea55377c", {"train": 2944, "val": 736, "test": 3669}),
    "stanford_cars": ("feb781ce05c4c27e", {"train": 6509, "val": 1635, "test": 8041}),
    "sun397": ("1990e8ef85a4fb94", {"train": 15880, "val": 3970, "test": 19850}),
    "ucf101": ("2966f38f6efa6727", {"train": 7639, "val": 1898, "test": 3783}),
}


class TestVendoredCoopSplits:
    """The reference's packaged CoOp split tables are vendored in-tree and load by
    default — a fresh offline checkout reproduces the paper's exact splits."""

    @pytest.mark.parametrize("name", sorted(VENDORED_SPLIT_PINS))
    def test_vendored_tables_load_by_default(self, common, name, monkeypatch):
        import hashlib

        monkeypatch.delenv("LMMS_OWC_ASSETS_DIR", raising=False)
        packaged = common._load_packaged_splits(name)
        assert packaged is not None, f"{name}: vendored split tables not found"
        rows = packaged["rows"]
        digest = hashlib.sha256(
            "\n".join(f"{s},{f}" for f, s in rows).encode()
        ).hexdigest()[:16]
        counts: dict = {}
        for _, s in rows:
            counts[s] = counts.get(s, 0) + 1
        pin_digest, pin_counts = VENDORED_SPLIT_PINS[name]
        assert digest == pin_digest
        assert counts == pin_counts

    @pytest.mark.parametrize("name", sorted(VENDORED_SPLIT_PINS))
    def test_every_row_resolves_to_a_metadata_class(self, common, name, monkeypatch):
        monkeypatch.delenv("LMMS_OWC_ASSETS_DIR", raising=False)
        packaged = common._load_packaged_splits(name)
        classes = set(packaged["idx_to_class"].values())
        f2c, labels_map, i2c = (
            packaged["folder_to_class"],
            packaged["labels_map"],
            packaged["idx_to_class"],
        )
        for rel, _split in packaged["rows"]:
            if labels_map is not None:
                cls = i2c[labels_map[rel]]
            else:
                parent = Path(rel).parent
                cls = f2c.get(parent.as_posix(), f2c.get(parent.name))
            assert cls in classes, f"{name}: {rel} resolves to {cls!r}"

    def test_packaged_rel_to_path_conventions(self, common):
        root = Path("/data/x")
        assert common._packaged_rel_to_path("caltech101", root, "Faces/image_0274.jpg") == (
            root / "caltech-101/101_ObjectCategories/Faces/image_0274.jpg"
        )
        assert common._packaged_rel_to_path("oxford_pets", root, "Abyssinian/Abyssinian_122.jpg") == (
            root / "images/Abyssinian_122.jpg"
        )
        assert common._packaged_rel_to_path("stanford_cars", root, "train/05266.jpg") == (
            root / "cars_train/05266.jpg"
        )
        assert common._packaged_rel_to_path("sun397", root, "a/abbey/sun_x.jpg") == (
            root / "SUN397/a/abbey/sun_x.jpg"
        )

    def test_fgvc_aircraft_has_no_tables_like_reference(self, common):
        # The reference ships no CSVs for fgvc_aircraft; official variant splits apply.
        assert common._load_packaged_splits("fgvc_aircraft") is None
