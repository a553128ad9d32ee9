"""Model adapters (parity surface: reference src/models/).

Adapters are registered lazily: importing this package registers the fake backend and
adapter modules; heavyweight JAX model builds happen only on ``get_model``.
"""

from lmms_owc_tpu.models._api import (
    MODELS,
    get_model,
    get_model_info,
    get_models_info,
    register_model,
)
from lmms_owc_tpu.models._base import CacheHook, Model
from lmms_owc_tpu.models import fake  # noqa: F401  (register fake backend)

# Model-family adapter modules register themselves on import; keep imports lazy-tolerant
# so a broken optional dependency doesn't take down the registry.
for _mod in (
    "qwen2_vl", "llava_hf", "llava_onevision", "internvl2", "instructblip", "idefics2", "phi3v",
):
    try:
        __import__(f"lmms_owc_tpu.models.{_mod}")
    except ImportError as _err:  # pragma: no cover
        from lmms_owc_tpu.utils import get_logger

        get_logger(__name__).warning("model adapter %s unavailable: %s", _mod, _err)


def _model_types() -> dict:
    """Family name -> adapter class (reference MODEL_TYPES, src/models/__init__.py:38-46)."""
    from lmms_owc_tpu.models.idefics2 import Idefics2
    from lmms_owc_tpu.models.instructblip import InstructBlip
    from lmms_owc_tpu.models.internvl2 import InternVL2
    from lmms_owc_tpu.models.llava_hf import LlavaHf
    from lmms_owc_tpu.models.qwen2_vl import Qwen2VL

    return {
        "idefics2": Idefics2,
        "instructblip": InstructBlip,
        "internvl2": InternVL2,
        "llava": LlavaHf,
        "qwen2-vl": Qwen2VL,
    }


@register_model("custom-model")
def custom_model(model_type: str, model_name_or_path: str | None = None, **model_kwargs):
    """Dispatch an arbitrary checkpoint to a model-family adapter by ``model_type``
    (reference: src/models/__init__.py:49-56)."""
    model_cls = _model_types().get(model_type)
    if model_cls is None:
        raise ValueError(
            f"Model type {model_type!r} not found. Available: {sorted(_model_types())}"
        )
    return model_cls(pretrained=model_name_or_path, **model_kwargs)

__all__ = [
    "CacheHook",
    "MODELS",
    "Model",
    "get_model",
    "get_model_info",
    "get_models_info",
    "register_model",
]
