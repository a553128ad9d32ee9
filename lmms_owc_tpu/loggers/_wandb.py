"""Weights & Biases logger.

Contract parity with reference src/data/loggers/_wandb.py:16-364: run init from CLI
arg string, results -> W&B summary/tables/artifacts, per-sample tables per task and
group. Degrades to a warning when wandb is not installed.
"""

from __future__ import annotations

import copy
import json
from typing import Any

from lmms_owc_tpu import utils

log = utils.get_logger(__name__)

__all__ = ["WandbLogger"]


def _flatten_results(results: dict, parent_key: str = "", sep: str = "/") -> dict:
    items: dict = {}
    for key, value in results.items():
        new_key = f"{parent_key}{sep}{key}" if parent_key else str(key)
        if isinstance(value, dict):
            items.update(_flatten_results(value, new_key, sep))
        elif isinstance(value, (int, float)):
            items[new_key] = value
    return items


class WandbLogger:
    """Log evaluation results and samples to Weights & Biases."""

    def __init__(self, **kwargs: Any) -> None:
        self.wandb_args = kwargs
        self.run = None
        self.results: dict = {}
        try:
            import wandb

            self._wandb = wandb
            self.run = wandb.init(**kwargs)
        except ImportError:
            self._wandb = None
            log.warning("wandb is not installed; WandbLogger is a no-op")
        except Exception as err:  # noqa: BLE001
            self._wandb = None
            log.warning("wandb.init failed (%s); WandbLogger is a no-op", err)

    def post_init(self, results: dict) -> None:
        self.results = copy.deepcopy(results)
        self.task_names = list(results.get("results", {}).keys())
        self.group_names = list(results.get("groups", {}).keys())

    def log_eval_result(self) -> None:
        if self._wandb is None or self.run is None:
            return
        config = self.results.get("config", {})
        self.run.config.update(config, allow_val_change=True)
        wandb_summary = _flatten_results(
            {
                "results": self.results.get("results", {}),
                "groups": self.results.get("groups", {}),
            }
        )
        self.run.summary.update(wandb_summary)
        self.run.log(wandb_summary)
        # Dump the full results blob as an artifact for post-hoc analysis.
        artifact = self._wandb.Artifact("results", type="eval_results")
        with artifact.new_file("results.json", mode="w", encoding="utf-8") as f:
            f.write(json.dumps(self.results, indent=2, default=utils.convert_non_serializable))
        self.run.log_artifact(artifact)

    def log_eval_samples(self, samples: dict) -> None:
        if self._wandb is None or self.run is None:
            return
        for task_name, task_samples in samples.items():
            if not task_samples:
                continue
            columns = ["doc_id", "target", "filtered_resps"]
            metric_cols = [
                k
                for k in task_samples[0]
                if k not in ("doc_id", "doc", "target", "arguments", "resps", "filtered_resps",
                             "doc_hash", "prompt_hash", "target_hash", "input")
            ]
            table = self._wandb.Table(columns=columns + metric_cols)
            for sample in task_samples:
                table.add_data(
                    sample["doc_id"],
                    str(sample["target"]),
                    str(sample["filtered_resps"]),
                    *[sample.get(m) for m in metric_cols],
                )
            self.run.log({f"{task_name}_eval_results": table})

    def finish(self) -> None:
        if self._wandb is not None and self.run is not None:
            self.run.finish()
