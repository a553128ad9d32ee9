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
for _mod in ("qwen2_vl", "llava_hf", "internvl2", "instructblip", "idefics2"):
    try:
        __import__(f"lmms_owc_tpu.models.{_mod}")
    except ImportError as _err:  # pragma: no cover
        from lmms_owc_tpu.utils import get_logger

        get_logger(__name__).warning("model adapter %s unavailable: %s", _mod, _err)

__all__ = [
    "CacheHook",
    "MODELS",
    "Model",
    "get_model",
    "get_model_info",
    "get_models_info",
    "register_model",
]
