"""JAX sentence encoder: all-MiniLM-L6-v2 (BERT-6L-384) on TPU.

Replaces the reference's torch SBERT pipeline (src/data/pipelines/text/_text.py:143-208):
tokenize host-side, pad to shape buckets, run the BERT encoder as batched TPU matmuls,
mean-pool over the attention mask, L2-normalize. One XLA program per (batch-bucket,
length-bucket) pair; subsequent batches hit the jit cache.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import dense, embedding, layer_norm, mlp_gelu, multi_head_attention
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "SbertConfig",
    "SentenceEncoder",
    "init_sbert_params",
    "resolve_sbert_weights",
    "sbert_config_from_hf",
    "sbert_encode",
]


@dataclass(frozen=True)
class SbertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def sbert_config_from_hf(cfg: dict) -> SbertConfig:
    """Build an SbertConfig from an HF BERT config.json dict (defaults: MiniLM-L6)."""
    return SbertConfig(
        vocab_size=cfg.get("vocab_size", 30522),
        hidden_size=cfg.get("hidden_size", 384),
        num_layers=cfg.get("num_hidden_layers", 6),
        num_heads=cfg.get("num_attention_heads", 12),
        intermediate_size=cfg.get("intermediate_size", 1536),
        max_position_embeddings=cfg.get("max_position_embeddings", 512),
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
    )


def init_sbert_params(key: jax.Array, config: SbertConfig, dtype=jnp.float32) -> dict:
    """Random-init parameters (tests / benchmarking without weights)."""
    keys = iter(jax.random.split(key, 200))

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    def ln():
        return {"scale": jnp.ones(config.hidden_size, dtype), "bias": jnp.zeros(config.hidden_size, dtype)}

    def lin(din, dout):
        return {"w": w((din, dout)), "b": jnp.zeros(dout, dtype)}

    h, inter = config.hidden_size, config.intermediate_size
    layers = []
    for _ in range(config.num_layers):
        layers.append(
            {
                "attn": {"q": lin(h, h), "k": lin(h, h), "v": lin(h, h), "o": lin(h, h)},
                "attn_ln": ln(),
                "mlp": {"up": lin(h, inter), "down": lin(inter, h)},
                "mlp_ln": ln(),
            }
        )
    return {
        "embeddings": {
            "word": w((config.vocab_size, h)),
            "position": w((config.max_position_embeddings, h)),
            "token_type": w((config.type_vocab_size, h)),
            "ln": ln(),
        },
        "layers": layers,
    }


@functools.partial(jax.jit, static_argnames=("config",))
def sbert_encode(
    params: dict, input_ids: jax.Array, attention_mask: jax.Array, config: SbertConfig
) -> jax.Array:
    """BERT forward + masked mean-pool + L2-normalize. Returns [B, hidden] f32."""
    b, l = input_ids.shape
    positions = jnp.arange(l)[None, :]
    x = (
        embedding(params["embeddings"]["word"], input_ids)
        + embedding(params["embeddings"]["position"], positions)
        + params["embeddings"]["token_type"][0][None, None, :]
    )
    x = layer_norm(params["embeddings"]["ln"], x, eps=config.layer_norm_eps)

    for layer in params["layers"]:
        attn_out = multi_head_attention(
            layer["attn"], x, num_heads=config.num_heads, kv_mask=attention_mask
        )
        x = layer_norm(layer["attn_ln"], x + attn_out, eps=config.layer_norm_eps)
        mlp_out = mlp_gelu(layer["mlp"], x)
        x = layer_norm(layer["mlp_ln"], x + mlp_out, eps=config.layer_norm_eps)

    # Mean pooling over valid tokens (reference _text.py:176-189), then L2 norm.
    mask = attention_mask[:, :, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    pooled = jnp.sum(xf * mask, axis=1) / jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


def _convert_hf_bert_weights(state: dict, config: SbertConfig, dtype=jnp.float32) -> dict:
    """Map HF bert-style safetensors names to our param tree (kernels transposed)."""

    def t(name):
        arr = np.asarray(state[name])
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(np.asarray(state[name]), dtype)

    def lin(prefix):
        return {"w": t(f"{prefix}.weight"), "b": raw(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": raw(f"{prefix}.weight"), "bias": raw(f"{prefix}.bias")}

    layers = []
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "attn": {
                    "q": lin(f"{p}.attention.self.query"),
                    "k": lin(f"{p}.attention.self.key"),
                    "v": lin(f"{p}.attention.self.value"),
                    "o": lin(f"{p}.attention.output.dense"),
                },
                "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
                "mlp": {
                    "up": lin(f"{p}.intermediate.dense"),
                    "down": lin(f"{p}.output.dense"),
                },
                "mlp_ln": ln(f"{p}.output.LayerNorm"),
            }
        )
    return {
        "embeddings": {
            "word": raw("embeddings.word_embeddings.weight"),
            "position": raw("embeddings.position_embeddings.weight"),
            "token_type": raw("embeddings.token_type_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": layers,
    }


def resolve_sbert_weights() -> str | None:
    """Locate a local all-MiniLM-L6-v2 checkpoint directory, or None."""
    env_path = os.environ.get("LMMS_OWC_SBERT_PATH")
    if env_path and Path(env_path).exists():
        return env_path
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(
            "sentence-transformers/all-MiniLM-L6-v2", local_files_only=True
        )
    except Exception:
        return None


_LENGTH_BUCKETS = (16, 32, 64, 128, 256)


class SentenceEncoder:
    """Tokenize + bucket + batched TPU encode."""

    def __init__(self, params: dict, tokenizer, config: SbertConfig | None = None) -> None:
        self.config = config or SbertConfig()
        self.params = params
        self.tokenizer = tokenizer

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32) -> "SentenceEncoder":
        from transformers import AutoTokenizer

        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        state = load_safetensors_state(path)
        # sentence-transformers checkpoints may carry a "bert." or module prefix.
        state = {k.removeprefix("bert."): v for k, v in state.items()}
        try:
            config = sbert_config_from_hf(load_config_json(path))
        except FileNotFoundError:
            config = SbertConfig()
        params = _convert_hf_bert_weights(state, config, dtype)
        tokenizer = AutoTokenizer.from_pretrained(path)
        log.info("loaded MiniLM sentence encoder from %s", path)
        return cls(params, tokenizer, config)

    @classmethod
    def random_init(cls, seed: int = 0) -> "SentenceEncoder":
        config = SbertConfig()
        params = init_sbert_params(jax.random.PRNGKey(seed), config)
        return cls(params, _WhitespaceTokenizer(config.vocab_size), config)

    def _bucket_len(self, length: int) -> int:
        for b in _LENGTH_BUCKETS:
            if length <= b:
                return b
        return self.config.max_position_embeddings

    def encode(self, sentences: list[str], batch_size: int = 1024) -> np.ndarray:
        out = np.zeros((len(sentences), self.config.hidden_size), dtype=np.float32)
        # Lagged fetches: dispatch up to ``depth`` batches before fetching the
        # oldest — host tokenization overlaps the device encodes, and on
        # deferred-execution links each fetch costs a round trip, so a deeper
        # window amortizes RTT. Device memory stays bounded at
        # depth x batch x hidden f32 (~12 MB at the defaults), a fraction of
        # the output array the caller asked for anyway.
        from collections import deque

        depth = 8
        pending: deque = deque()

        def drain_one() -> None:
            p_start, p_n, p_embeds = pending.popleft()
            out[p_start : p_start + p_n] = np.asarray(p_embeds)[:p_n]

        for start in range(0, len(sentences), batch_size):
            chunk = sentences[start : start + batch_size]
            enc = self.tokenizer(
                chunk, padding=True, truncation=True,
                max_length=self.config.max_position_embeddings, return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            # Pad to (batch, length) buckets to bound XLA program count.
            blen = self._bucket_len(ids.shape[1])
            bbatch = max(8, 1 << (len(chunk) - 1).bit_length())
            ids = np.pad(ids, ((0, bbatch - ids.shape[0]), (0, blen - ids.shape[1])))
            mask = np.pad(mask, ((0, bbatch - mask.shape[0]), (0, blen - mask.shape[1])))
            embeds = sbert_encode(self.params, jnp.asarray(ids), jnp.asarray(mask), self.config)
            pending.append((start, len(chunk), embeds))
            if len(pending) > depth:
                drain_one()
        while pending:
            drain_one()
        return out


class _WhitespaceTokenizer:
    """Hash-based tokenizer for random-init benchmarking (not linguistic)."""

    def __init__(self, vocab_size: int) -> None:
        self.vocab_size = vocab_size
        self._word_ids: dict[str, int] = {}

    def _word_id(self, token: str) -> int:
        cached = self._word_ids.get(token)
        if cached is None:
            import hashlib

            cached = 2000 + int.from_bytes(
                hashlib.md5(token.encode()).digest()[:3], "little"
            ) % (self.vocab_size - 3000)
            self._word_ids[token] = cached
        return cached

    def __call__(self, texts, padding=True, truncation=True, max_length=512, return_tensors="np"):
        all_ids = []
        for text in texts:
            toks = text.lower().split()[: max_length - 2]
            ids = [101] + [self._word_id(t) for t in toks] + [102]
            all_ids.append(ids)
        max_len = max(len(i) for i in all_ids)
        input_ids = np.zeros((len(all_ids), max_len), dtype=np.int32)
        mask = np.zeros((len(all_ids), max_len), dtype=np.int32)
        for row, ids in enumerate(all_ids):
            input_ids[row, : len(ids)] = ids
            mask[row, : len(ids)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}
