"""Generate the 10 open-world classification benchmark task configs.

Emits, for each benchmark, the prompt-variant YAMLs (base/caption/describe/list/
more_generic/more_specific/zero_shot_cot/llava_cot/llamav_o1 [+fine_grained]) and an
``assets/_<name>_utils.py`` with doc_to_* hooks and a ``download()`` that fetches the
raw archive and converts it to an HF dataset on disk. Mirrors the content contract of
reference src/data/tasks/_classification/ (same task names, prompts, metrics,
generation budgets, dataset layout: columns visual/target).

Run: python tools/generate_classification_tasks.py
"""

from __future__ import annotations

from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "lmms_owc_tpu" / "tasks" / "configs" / "classification"

# (name, fine_grained_subject or None, archive spec comment)
BENCHMARKS = {
    "caltech101": dict(fine_grained=None),
    "dtd": dict(fine_grained="texture"),
    "eurosat": dict(fine_grained=None),
    "fgvc_aircraft": dict(fine_grained="aircraft"),
    "flowers102": dict(fine_grained="flower"),
    "food101": dict(fine_grained="food"),
    "oxford_pets": dict(fine_grained="pet"),
    "stanford_cars": dict(fine_grained="car"),
    "sun397": dict(fine_grained=None),
    "ucf101": dict(fine_grained=None),
}

VARIANTS = {
    "base": ("What type of object is in this photo?", 64),
    "caption": ("Caption the image.", 64),
    "describe": ("Describe the content of the image.", 64),
    "list": ("List the objects in the image.", 64),
    "more_generic": ("What type of object is in this photo? Be generic.", 64),
    "more_specific": ("What type of object is in this photo? Be specific.", 64),
    "zero_shot_cot": ("What type of object is in this photo? Think step by step.", 256),
}

LLAVA_COT_PRE = (
    "I have an image and a question that I want you to answer. I need you to strictly follow the"
    " format with four specific sections: SUMMARY, CAPTION, REASONING, and CONCLUSION. It is"
    " crucial that you adhere to this structure exactly as outlined and that the final answer in"
    " the CONCLUSION matches the standard correct answer precisely. To explain further: In"
    " SUMMARY, briefly explain what steps you'll take to solve the problem. In CAPTION, describe"
    " the contents of the image, specifically focusing on details relevant to the question. In"
    " REASONING, outline a step-by-step thought process you would use to solve the problem based"
    " on the image. In CONCLUSION, give the final answer in a direct format, and it must match"
    " the correct answer exactly. Here's how the format should look: <SUMMARY> [Summarize how you"
    " will approach the problem and explain the steps you will take to reach the answer.]"
    " </SUMMARY> <CAPTION> [Provide a detailed description of the image, particularly emphasizing"
    " the aspects related to the question.] </CAPTION> <REASONING> [Provide a chain-of-thought,"
    " logical explanation of the problem. This should outline step-by-step reasoning.]"
    " </REASONING> <CONCLUSION> [State the final answer in a clear and direct format. It must"
    " match the correct answer exactly.] </CONCLUSION> (Do not forget </CONCLUSION>!) Please"
    " apply this format meticulously to analyze the given image and answer the related question,"
    " ensuring that the answer matches the standard one perfectly.\\nQuestion: "
)

LLAMAV_O1_PROMPTS = [
    "What type of object in this photo? Generate a summary of the picture.",
    "Generate a detailed caption for the image.",
    "Generate a detailed reasoning to answer the question given the caption.",
    "Generate the final answer based on reasoning steps.",
]


def template_yaml(name: str) -> str:
    return f"""dataset_path: data/{name}
dataset_kwargs:
  custom_download: !function _{name}_utils.download
  load_from_disk: true
  token: true
doc_to_visual: !function _{name}_utils.doc_to_visual
doc_to_text: !function _{name}_utils.doc_to_text
doc_to_target: !function _{name}_utils.doc_to_target
output_type: generate_until
test_split: test

metric_list:
  - metric: concept_semantic_similarity
    aggregation: concept_semantic_similarity
    higher_is_better: true
  - metric: exact_match
    aggregation: mean
    higher_is_better: true
    ignore_case: true
    ignore_punctuation: false
    regexes_to_ignore:
      - ","
      - "\\\\$"
  - metric: semantic_similarity
    aggregation: semantic_similarity
    higher_is_better: true
  - metric: textual_inclusion
    aggregation: mean
    higher_is_better: true
  # textual_inclusion_llama32 is evaluated offline via eval_metrics.py
  # - metric: textual_inclusion_llama32
  #   aggregation: textual_inclusion_llama32
  #   higher_is_better: true

metadata:
  - version: 0.0
"""


def variant_yaml(name: str, task_suffix: str, prompt: str, max_new: int) -> str:
    task_name = name if task_suffix == "base" else f"{name}_{task_suffix}"
    return f"""task: "{task_name}"
tag: "classification"

model_specific_kwargs:
  default:
    pre_prompt: ""
    prompt: "{prompt}"
    post_prompt: ""

generation_kwargs:
  max_new_tokens: {max_new}
  do_sample: False

include: assets/_default_template.yaml
"""


def llava_cot_yaml(name: str) -> str:
    return f"""task: "{name}_llava_cot"
tag: "classification"

model_specific_kwargs:
  default:
    pre_prompt: "{LLAVA_COT_PRE}"
    prompts: "What type of object is in the image?"
    post_prompt: ""

generation_kwargs:
  max_new_tokens: 256
  do_sample: False

include: assets/_default_template.yaml
"""


def llamav_o1_yaml(name: str) -> str:
    prompts = "\n".join(f'      - "{p}"' for p in LLAMAV_O1_PROMPTS)
    return f"""task: "{name}_llamav_o1"
tag: "classification"

doc_to_text: !function assets/_{name}_utils.doc_to_text_multi_round
output_type: generate_until_multi_round

model_specific_kwargs:
  default:
    pre_prompt: ""
    prompts:
{prompts}
    post_prompt: ""

generation_kwargs:
  max_new_tokens: 256
  do_sample: False

include: assets/_default_template.yaml
"""


UTILS_TEMPLATE = '''"""Asset utils for the {name} open-world classification benchmark.

Content parity with reference src/data/tasks/_classification/{name}/assets/: same
doc hooks (columns ``visual`` = image path, ``target`` = class name) and the same
download -> HF-dataset-on-disk flow. Split/metadata resolution order:
  1. ``$LMMS_OWC_ASSETS_DIR/{name}/metadata.csv`` + ``split_coop.csv`` (the
     reference's packaged CoOp splits; exact parity when provided),
  2. the dataset's official split files inside the archive (when it ships any),
  3. a seeded CoOp-style random split (documented divergence).
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

_COMMON = Path(__file__).resolve().parents[2] / "_assets_common.py"
_spec = importlib.util.spec_from_file_location("lmms_owc_tpu_classification_common", _COMMON)
_common = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_common)

__all__ = ["doc_to_text", "doc_to_text_multi_round", "doc_to_visual", "doc_to_target", "download"]

doc_to_text = _common.doc_to_text
doc_to_text_multi_round = _common.doc_to_text_multi_round
doc_to_visual = _common.doc_to_visual
doc_to_target = _common.doc_to_target


def download(output_dir: str = "data", cache_dir: str = ".cache") -> None:
    _common.download_benchmark("{name}", output_dir=output_dir, cache_dir=cache_dir)
'''


def main() -> None:
    for name, info in BENCHMARKS.items():
        bench_dir = ROOT / name
        assets_dir = bench_dir / "assets"
        assets_dir.mkdir(parents=True, exist_ok=True)

        (assets_dir / "_default_template.yaml").write_text(template_yaml(name))
        (assets_dir / f"_{name}_utils.py").write_text(UTILS_TEMPLATE.format(name=name))

        for suffix, (prompt, max_new) in VARIANTS.items():
            (bench_dir / f"{suffix}.yaml").write_text(variant_yaml(name, suffix, prompt, max_new))
        (bench_dir / "llava_cot.yaml").write_text(llava_cot_yaml(name))
        (bench_dir / "llamav_o1.yaml").write_text(llamav_o1_yaml(name))

        if info["fine_grained"]:
            subject = info["fine_grained"]
            (bench_dir / "fine_grained.yaml").write_text(
                variant_yaml(name, "fine_grained", f"What type of {subject} is in this photo?", 64)
            )
    print(f"generated task configs under {ROOT}")


if __name__ == "__main__":
    main()
