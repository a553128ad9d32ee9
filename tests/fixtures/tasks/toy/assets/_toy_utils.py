"""Asset utils for the toy classification task used by the test suite.

Mirrors the structure of the reference's benchmark asset utils
(e.g. /root/reference/src/data/tasks/_classification/caltech101/assets/
_caltech101_utils.py: doc_to_text / doc_to_visual / doc_to_target / download),
but generates a tiny deterministic dataset locally instead of fetching archives.
"""

from __future__ import annotations

import os
from pathlib import Path

CLASS_NAMES = ["red_panda", "blue_jay", "green_sea_turtle", "golden_retriever"]
NUM_SAMPLES = 12

_DATA_DIR = Path(__file__).resolve().parent / "data" / "toy"


def data_dir() -> str:
    return str(_DATA_DIR)


def download() -> None:
    """Generate the toy dataset on disk if missing (deterministic)."""
    if (_DATA_DIR / "dataset_dict.json").exists():
        return
    import datasets
    import numpy as np
    from PIL import Image as PILImage

    rng = np.random.RandomState(0)
    images, labels = [], []
    for i in range(NUM_SAMPLES):
        color = tuple(int(c) for c in rng.randint(0, 255, size=3))
        images.append(PILImage.new("RGB", (32, 32), color))
        labels.append(CLASS_NAMES[i % len(CLASS_NAMES)])

    ds = datasets.Dataset.from_dict({"image": images, "class_name": labels})
    ds = ds.cast_column("image", datasets.Image())
    dsd = datasets.DatasetDict({"test": ds})
    os.makedirs(_DATA_DIR.parent, exist_ok=True)
    dsd.save_to_disk(str(_DATA_DIR))


def doc_to_text(doc: dict, model_specific_kwargs: dict | None = None) -> str:
    kwargs = model_specific_kwargs or {}
    pre = kwargs.get("pre_prompt", "")
    prompt = kwargs.get("prompt", "What type of object is in this photo?")
    post = kwargs.get("post_prompt", "")
    return f"{pre}{prompt}{post}"


def doc_to_text_multi_round(
    doc: dict,
    model_specific_kwargs: dict | None = None,
    round_idx: int | None = None,
    previous_round_results: list | None = None,
    last_round_info: dict | None = None,
):
    """Staged multi-round prompting with the reference 5-tuple protocol."""
    kwargs = model_specific_kwargs or {}
    pre = kwargs.get("pre_prompt", "")
    post = kwargs.get("post_prompt", "")
    prompts = kwargs.get(
        "prompts",
        ["Describe the photo.", "What type of object is in this photo?"],
    )
    previous_round_results = previous_round_results or []
    if round_idx is None:
        return pre + prompts[0] + post
    if round_idx < len(prompts):
        return None, pre + prompts[round_idx] + post, False, previous_round_results, last_round_info
    return None, None, True, previous_round_results, last_round_info


def doc_to_visual(doc: dict) -> list:
    return [doc["image"].convert("RGB")]


def doc_to_target(doc: dict, model_specific_kwargs: dict | None = None) -> str:
    return doc["class_name"].replace("_", " ")


def doc_to_choices(doc: dict) -> list:
    """All class names as multiple-choice options (target included)."""
    return [name.replace("_", " ") for name in CLASS_NAMES]
