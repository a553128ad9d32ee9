"""Pydantic info records backing every registry (parity: reference src/schema/_base.py:8-166)."""

from __future__ import annotations

from typing import Any, Callable

from pydantic import BaseModel, ConfigDict, Field

__all__ = [
    "ModelInfo",
    "MetricInfo",
    "AggregationInfo",
    "FilterInfo",
    "SamplerInfo",
    "DatasetInfo",
]


class _Info(BaseModel):
    model_config = ConfigDict(arbitrary_types_allowed=True, protected_namespaces=())


class ModelInfo(_Info):
    """Registry record for a model adapter."""

    name: str
    model_cls: Any = Field(repr=False)
    description: str = ""


class MetricInfo(_Info):
    """Registry record for an instance metric.

    Attributes:
        builder_fn: the per-instance metric callable.
        group_fn_name: name of the registered aggregation used to reduce samples.
        higher_is_better: direction for leaderboard arrows/comparisons.
        output_types: which task output types this metric applies to.
        can_bootstrap: whether bootstrap stderr is meaningful for this metric.
    """

    name: str
    builder_fn: Callable | None = Field(default=None, repr=False)
    group_fn_name: str = "mean"
    higher_is_better: bool = True
    output_types: list[str] = Field(default_factory=lambda: ["generate_until"])
    can_bootstrap: bool = False

    @property
    def group_fn(self) -> Callable:
        from lmms_owc_tpu.metrics._api import get_aggregation_info

        return get_aggregation_info(self.group_fn_name).builder_fn


class AggregationInfo(_Info):
    """Registry record for a group aggregation function."""

    name: str
    builder_fn: Callable = Field(repr=False)
    can_bootstrap: bool = False


class FilterInfo(_Info):
    name: str
    filter_cls: Any = Field(repr=False)
    description: str = ""


class SamplerInfo(_Info):
    name: str
    sampler_cls: Any = Field(repr=False)


class DatasetInfo(_Info):
    """Record describing a benchmark dataset and its local availability."""

    name: str
    path: str
    description: str = ""

    @property
    def is_available(self) -> bool:
        import os

        return os.path.isdir(self.path)
