"""Llama-family causal LM in JAX (Llama 3.x / Vicuna / Qwen2-text).

Reuses the stacked-layer decoder machinery from :mod:`lmms_owc_tpu.nn.qwen2_vl`:
a Llama decoder is the same RMSNorm/GQA/SwiGLU block with standard 1D RoPE — which
equals M-RoPE when all three position streams are identical — and no attention
biases. Used by the Llama-3.2 judge pipeline and the LLaVA text backbone.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.qwen2_vl import (
    Qwen2VLConfig,
    convert_hf_decoder_weights,
    decode_step,
    greedy_generate,
    init_decoder_params,
    prefill,
    score_continuation,
)

__all__ = [
    "LlamaConfig",
    "llama_config_from_hf",
    "init_llama_params",
    "convert_hf_llama_weights",
    "llama_positions",
    "prefill",
    "decode_step",
    "greedy_generate",
    "score_continuation",
]


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 3072
    num_layers: int = 28
    num_heads: int = 24
    num_kv_heads: int = 8
    intermediate_size: int = 8192
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # Frozen (key, value) pairs so the config stays hashable for jit static args.
    rope_scaling: tuple | None = None
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int | None = None
    tie_word_embeddings: bool = True
    eos_token_id: int = 128009
    pad_token_id: int = 128004
    attn_bias: bool = False

    def to_decoder_config(self) -> Qwen2VLConfig:
        """View as a Qwen2VLConfig with uniform mrope sections (== standard RoPE)."""
        hd2 = (self.hidden_size // self.num_heads) // 2
        third = hd2 // 3
        rope_llama3 = None
        rope_longrope = None
        if self.rope_scaling:
            scaling = dict(self.rope_scaling)
            rope_type = scaling.get("rope_type", scaling.get("type"))
            if rope_type == "llama3":
                rope_llama3 = (
                    scaling["factor"],
                    scaling["low_freq_factor"],
                    scaling["high_freq_factor"],
                    scaling["original_max_position_embeddings"],
                )
            elif rope_type == "longrope":
                # Phi-3: short factors for eval-scale contexts; attention factor is
                # sqrt(1 + log(scale)/log(original_max)) per HF _compute_longrope_parameters.
                import math as _math

                original_max = scaling.get(
                    "original_max_position_embeddings",
                    self.original_max_position_embeddings or self.max_position_embeddings,
                )
                factor = self.max_position_embeddings / original_max
                attention_factor = (
                    1.0 if factor <= 1.0 else _math.sqrt(1 + _math.log(factor) / _math.log(original_max))
                )
                rope_longrope = (attention_factor, tuple(scaling["short_factor"]))
        return Qwen2VLConfig(
            rope_llama3=rope_llama3,
            rope_longrope=rope_longrope,
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            intermediate_size=self.intermediate_size,
            rms_norm_eps=self.rms_norm_eps,
            rope_theta=self.rope_theta,
            max_position_embeddings=self.max_position_embeddings,
            tie_word_embeddings=self.tie_word_embeddings,
            mrope_section=(third, third, hd2 - 2 * third),
            eos_token_id=self.eos_token_id,
            pad_token_id=self.pad_token_id,
        )


def _freeze_dict(d: dict | None) -> tuple | None:
    """Dict -> hashable (key, value) tuple with list values frozen to tuples."""
    if not d:
        return None
    return tuple(
        (k, tuple(v) if isinstance(v, list) else v) for k, v in sorted(d.items())
    )


def llama_config_from_hf(cfg: dict) -> LlamaConfig:
    eos = cfg.get("eos_token_id", 128009)
    return LlamaConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        intermediate_size=cfg["intermediate_size"],
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        rope_theta=cfg.get("rope_theta", 500000.0),
        rope_scaling=_freeze_dict(cfg.get("rope_scaling")),
        max_position_embeddings=cfg.get("max_position_embeddings", 131072),
        original_max_position_embeddings=cfg.get("original_max_position_embeddings"),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        eos_token_id=eos[0] if isinstance(eos, list) else eos,
        pad_token_id=cfg.get("pad_token_id") or 0,
        attn_bias=cfg.get("attention_bias", False),
    )


def init_llama_params(key: jax.Array, config: LlamaConfig, dtype=jnp.bfloat16) -> dict:
    return init_decoder_params(key, config.to_decoder_config(), dtype, attn_bias=config.attn_bias)


def convert_hf_llama_weights(state: dict, config: LlamaConfig, dtype=jnp.bfloat16) -> dict:
    return convert_hf_decoder_weights(
        state, config.to_decoder_config(), dtype, attn_bias=config.attn_bias
    )


def llama_positions(attention_mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """1D positions broadcast to the [3, B, L] M-RoPE layout, plus next positions."""
    positions_1d = np.maximum(attention_mask.cumsum(axis=-1) - 1, 0)
    position_ids = np.broadcast_to(positions_1d[None], (3, *positions_1d.shape)).copy()
    next_pos = attention_mask.sum(axis=-1)
    return position_ids, next_pos
