"""Scoring-model pipelines (parity surface: reference src/data/pipelines/).

Text: sentence embedding (MiniLM on TPU), concept extraction (spaCy host-side with a
pure-python fallback), Llama-3.2 judge (JAX decoder). Image: CLIP encode.
All scoring models are lazy module-level singletons, loaded on first use.
"""

from lmms_owc_tpu.pipelines import image, text

__all__ = ["image", "text"]
