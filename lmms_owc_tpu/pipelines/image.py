"""Image scoring pipeline: CLIP image-text logits.

Contract parity with reference src/data/pipelines/image/_image.py:4-67 (``encode_clip``:
CLIP ViT-L/14 image-text logits; unused by the main eval path). Here it is backed by
the JAX CLIP implementation when weights are resolvable.
"""

from __future__ import annotations

import numpy as np

from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["encode_clip"]

_clip = None

CLIP_MODEL_ID = "openai/clip-vit-large-patch14"


def encode_clip(images: list, texts: list[str]) -> np.ndarray:
    """Return image-text logits of shape ``(n_images, n_texts)``."""
    global _clip
    if _clip is None:
        from lmms_owc_tpu.nn.clip import ClipScorer, resolve_clip_weights

        weights_path = resolve_clip_weights()
        if weights_path is None:
            raise RuntimeError(
                "CLIP weights not found; set LMMS_OWC_CLIP_PATH or populate the HF cache"
            )
        _clip = ClipScorer.from_pretrained(weights_path)
    return _clip.score(images, texts)
