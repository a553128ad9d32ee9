"""InstructBLIP in JAX: BLIP ViT tower + instruction-aware Q-Former + Llama decoder.

Replaces the reference's torch InstructBLIP adapter compute
(src/models/_instructblip.py): 32 learned query tokens plus the tokenized
instruction run through a BERT-style Q-Former with cross-attention into the frozen
vision features; the query outputs are projected and prepended to the language
embeddings.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from lmms_owc_tpu.nn.layers import dense, gelu, layer_norm
from lmms_owc_tpu.nn.llama import LlamaConfig, llama_config_from_hf
from lmms_owc_tpu.nn.qwen2_vl import convert_hf_decoder_weights, init_decoder_params
from lmms_owc_tpu.ops.attention import attention_reference, flash_attention
from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = [
    "InstructBlipConfig",
    "convert_hf_instructblip_weights",
    "encode_image_queries",
    "init_instructblip_params",
    "instructblip_config_from_hf",
]


@dataclass(frozen=True)
class BlipVisionConfig:
    hidden_size: int = 1408
    num_layers: int = 39
    num_heads: int = 16
    intermediate_size: int = 6144
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6


@dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408
    layer_norm_eps: float = 1e-12


@dataclass(frozen=True)
class InstructBlipConfig:
    text: LlamaConfig = field(default_factory=LlamaConfig)
    vision: BlipVisionConfig = field(default_factory=BlipVisionConfig)
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    num_query_tokens: int = 32


def instructblip_config_from_hf(cfg: dict) -> InstructBlipConfig:
    vis = cfg.get("vision_config", {})
    qf = cfg.get("qformer_config", {})
    return InstructBlipConfig(
        text=llama_config_from_hf(cfg["text_config"]),
        vision=BlipVisionConfig(
            hidden_size=vis.get("hidden_size", 1408),
            num_layers=vis.get("num_hidden_layers", 39),
            num_heads=vis.get("num_attention_heads", 16),
            intermediate_size=vis.get("intermediate_size", 6144),
            image_size=vis.get("image_size", 224),
            patch_size=vis.get("patch_size", 14),
            layer_norm_eps=vis.get("layer_norm_eps", 1e-6),
        ),
        qformer=QFormerConfig(
            vocab_size=qf.get("vocab_size", 30523),
            hidden_size=qf.get("hidden_size", 768),
            num_layers=qf.get("num_hidden_layers", 12),
            num_heads=qf.get("num_attention_heads", 12),
            intermediate_size=qf.get("intermediate_size", 3072),
            max_position_embeddings=qf.get("max_position_embeddings", 512),
            cross_attention_frequency=qf.get("cross_attention_frequency", 2),
            encoder_hidden_size=qf.get("encoder_hidden_size", 1408),
            layer_norm_eps=qf.get("layer_norm_eps", 1e-12),
        ),
        num_query_tokens=cfg.get("num_query_tokens", 32),
    )


# ======================================================================= vision


@functools.partial(jax.jit, static_argnames=("config",))
def blip_vision_forward(params: dict, pixel_values: jax.Array, config: BlipVisionConfig) -> jax.Array:
    """BLIP ViT -> post-LN hidden states [B, 1+P, E]."""
    b = pixel_values.shape[0]
    p, e = config.patch_size, config.hidden_size
    nh, hd = config.num_heads, config.hidden_size // config.num_heads
    eps = config.layer_norm_eps

    x = pixel_values.reshape(b, 3, pixel_values.shape[2] // p, p, pixel_values.shape[3] // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, 3 * p * p)
    x = jnp.dot(x, params["patch_embed"]["w"], preferred_element_type=x.dtype) + params["patch_embed"]["b"]

    cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (b, 1, e)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1], :].astype(x.dtype)

    def block(x, layer):
        L = x.shape[1]
        normed = layer_norm(layer["ln1"], x, eps=eps)
        qkv = dense(layer["qkv"], normed).reshape(b, L, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        attn = flash_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, L, e)
        x = x + dense(layer["proj"], attn)
        normed2 = layer_norm(layer["ln2"], x, eps=eps)
        x = x + dense(layer["fc2"], gelu(dense(layer["fc1"], normed2)))
        return x, None

    x, _ = jax.lax.scan(block, x, params["layers"])
    return layer_norm(params["post_ln"], x, eps=eps)


# ====================================================================== qformer


def _bert_attention(attn_params, hidden, kv_source, num_heads, mask=None):
    """BERT-style attention block returning the post-LN residual output."""
    b, lq, h = hidden.shape
    from lmms_owc_tpu.ops.quant import dense_out_dim

    hd = dense_out_dim(attn_params["q"]) // num_heads
    q = dense(attn_params["q"], hidden).reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(attn_params["k"], kv_source).reshape(b, kv_source.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    v = dense(attn_params["v"], kv_source).reshape(b, kv_source.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    out = attention_reference(q, k, v, kv_mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
    return dense(attn_params["o"], out)


@functools.partial(jax.jit, static_argnames=("config", "num_query_tokens"))
def qformer_forward(
    params: dict,
    instr_ids: jax.Array,
    instr_mask: jax.Array,
    vision_states: jax.Array,
    config: QFormerConfig,
    num_query_tokens: int = 32,
) -> jax.Array:
    """Q-Former over [queries; instruction] with cross-attention into vision states.

    Returns the query-position outputs [B, num_query_tokens, hidden].
    """
    b = instr_ids.shape[0]
    eps = config.layer_norm_eps
    nq = num_query_tokens

    word = jnp.take(params["word_embeddings"], instr_ids, axis=0)
    positions = jnp.arange(instr_ids.shape[1])
    word = word + jnp.take(params["position_embeddings"], positions, axis=0)[None]
    queries = jnp.broadcast_to(params["query_tokens"][None], (b, nq, word.shape[-1])).astype(word.dtype)
    x = jnp.concatenate([queries, word], axis=1)
    x = layer_norm(params["embeddings_ln"], x, eps=eps)

    # Self-attention mask: queries always valid, instruction padded.
    self_mask = jnp.concatenate([jnp.ones((b, nq), instr_mask.dtype), instr_mask], axis=1)

    # Python loop over layers: layers alternate cross-attention presence, so the
    # stacked-scan trick doesn't apply cleanly (parity over cleverness here).
    for i, layer in enumerate(params["layers"]):
        attn_out = _bert_attention(layer["self_attn"], x, x, config.num_heads, mask=self_mask)
        x = layer_norm(layer["self_ln"], x + attn_out, eps=eps)

        query_part, text_part = x[:, :nq], x[:, nq:]
        if "cross_attn" in layer:
            cross = _bert_attention(
                layer["cross_attn"], query_part, vision_states, config.num_heads
            )
            query_part = layer_norm(layer["cross_ln"], query_part + cross, eps=eps)

        q_ffn = dense(layer["output_query"], gelu(dense(layer["intermediate_query"], query_part)))
        query_part = layer_norm(layer["output_query_ln"], query_part + q_ffn, eps=eps)
        t_ffn = dense(layer["output"], gelu(dense(layer["intermediate"], text_part)))
        text_part = layer_norm(layer["output_ln"], text_part + t_ffn, eps=eps)
        x = jnp.concatenate([query_part, text_part], axis=1)

    return x[:, :nq]


@functools.partial(jax.jit, static_argnames=("config",))
def encode_image_queries(
    params: dict,
    pixel_values: jax.Array,
    instr_ids: jax.Array,
    instr_mask: jax.Array,
    config: InstructBlipConfig,
) -> jax.Array:
    """Pixels + instruction -> projected language-space query embeddings [B, nq, H]."""
    vision = blip_vision_forward(params["vision"], pixel_values, config.vision)
    queries = qformer_forward(
        params["qformer"], instr_ids, instr_mask, vision, config.qformer,
        num_query_tokens=config.num_query_tokens,
    )
    return dense(params["language_projection"], queries)


# ====================================================================== weights


def init_instructblip_params(key: jax.Array, config: InstructBlipConfig, dtype=jnp.bfloat16) -> dict:
    kv, kq, kt, kp = jax.random.split(key, 4)
    v, qf = config.vision, config.qformer

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def lin(k, din, dout):
        return {"w": w(k, (din, dout)), "b": jnp.zeros(dout, dtype)}

    def ln(dim):
        return {"scale": jnp.ones(dim, dtype), "bias": jnp.zeros(dim, dtype)}

    e, L = v.hidden_size, v.num_layers
    vk = jax.random.split(kv, 4)
    vision_layers = {
        "ln1": {"scale": jnp.ones((L, e), dtype), "bias": jnp.zeros((L, e), dtype)},
        "ln2": {"scale": jnp.ones((L, e), dtype), "bias": jnp.zeros((L, e), dtype)},
        "qkv": {"w": w(vk[0], (L, e, 3 * e)), "b": jnp.zeros((L, 3 * e), dtype)},
        "proj": {"w": w(vk[1], (L, e, e)), "b": jnp.zeros((L, e), dtype)},
        "fc1": {"w": w(vk[2], (L, e, v.intermediate_size)), "b": jnp.zeros((L, v.intermediate_size), dtype)},
        "fc2": {"w": w(vk[3], (L, v.intermediate_size, e)), "b": jnp.zeros((L, e), dtype)},
    }

    h = qf.hidden_size
    qlayers = []
    qkeys = jax.random.split(kq, qf.num_layers)
    for i in range(qf.num_layers):
        lk = jax.random.split(qkeys[i], 10)
        layer = {
            "self_attn": {"q": lin(lk[0], h, h), "k": lin(lk[1], h, h), "v": lin(lk[2], h, h), "o": lin(lk[3], h, h)},
            "self_ln": ln(h),
            "intermediate": lin(lk[4], h, qf.intermediate_size),
            "output": lin(lk[5], qf.intermediate_size, h),
            "output_ln": ln(h),
            "intermediate_query": lin(lk[6], h, qf.intermediate_size),
            "output_query": lin(lk[7], qf.intermediate_size, h),
            "output_query_ln": ln(h),
        }
        if i % qf.cross_attention_frequency == 0:
            layer["cross_attn"] = {
                "q": lin(lk[8], h, h),
                "k": lin(jax.random.fold_in(lk[8], 1), qf.encoder_hidden_size, h),
                "v": lin(jax.random.fold_in(lk[8], 2), qf.encoder_hidden_size, h),
                "o": lin(lk[9], h, h),
            }
            layer["cross_ln"] = ln(h)
        qlayers.append(layer)

    return {
        "text": init_decoder_params(kt, config.text.to_decoder_config(), dtype, attn_bias=False),
        "vision": {
            "patch_embed": {"w": w(jax.random.fold_in(kv, 9), (3 * v.patch_size**2, e)), "b": jnp.zeros(e, dtype)},
            "class_embedding": w(jax.random.fold_in(kv, 10), (e,)),
            "position_embedding": w(jax.random.fold_in(kv, 11), ((v.image_size // v.patch_size) ** 2 + 1, e)),
            "layers": vision_layers,
            "post_ln": ln(e),
        },
        "qformer": {
            "word_embeddings": w(jax.random.fold_in(kq, 7), (qf.vocab_size, h)),
            "position_embeddings": w(jax.random.fold_in(kq, 8), (qf.max_position_embeddings, h)),
            "embeddings_ln": ln(h),
            "query_tokens": w(jax.random.fold_in(kq, 9), (config.num_query_tokens, h)),
            "layers": qlayers,
        },
        "language_projection": lin(kp, h, config.text.hidden_size),
    }


def convert_hf_instructblip_weights(state: dict, config: InstructBlipConfig, dtype=jnp.bfloat16) -> dict:
    def find(name):
        if name in state:
            return np.asarray(state[name])
        raise KeyError(f"tensor {name!r} not found")

    def t(name):
        arr = find(name)
        return jnp.asarray(arr.T if arr.ndim == 2 else arr, dtype)

    def raw(name):
        return jnp.asarray(find(name), dtype)

    def lin(name):
        return {"w": t(name + ".weight"), "b": raw(name + ".bias")}

    def ln(name):
        return {"scale": raw(name + ".weight"), "bias": raw(name + ".bias")}

    v = config.vision
    L = v.num_layers

    def vstack_lin(sub):
        return {
            "w": jnp.stack([t(f"vision_model.encoder.layers.{i}.{sub}.weight") for i in range(L)]),
            "b": jnp.stack([raw(f"vision_model.encoder.layers.{i}.{sub}.bias") for i in range(L)]),
        }

    def vstack_ln(sub):
        return {
            "scale": jnp.stack([raw(f"vision_model.encoder.layers.{i}.{sub}.weight") for i in range(L)]),
            "bias": jnp.stack([raw(f"vision_model.encoder.layers.{i}.{sub}.bias") for i in range(L)]),
        }

    patch_w = find("vision_model.embeddings.patch_embedding.weight")
    vision = {
        "patch_embed": {
            "w": jnp.asarray(patch_w.reshape(patch_w.shape[0], -1).T, dtype),
            "b": raw("vision_model.embeddings.patch_embedding.bias"),
        },
        "class_embedding": raw("vision_model.embeddings.class_embedding").reshape(-1),
        "position_embedding": raw("vision_model.embeddings.position_embedding").reshape(
            -1, v.hidden_size
        ),
        "layers": {
            "ln1": vstack_ln("layer_norm1"),
            "ln2": vstack_ln("layer_norm2"),
            "qkv": vstack_lin("self_attn.qkv"),
            "proj": vstack_lin("self_attn.projection"),
            "fc1": vstack_lin("mlp.fc1"),
            "fc2": vstack_lin("mlp.fc2"),
        },
        "post_ln": ln("vision_model.post_layernorm"),
    }

    qf = config.qformer
    qlayers = []
    for i in range(qf.num_layers):
        base = f"qformer.encoder.layer.{i}"
        layer = {
            "self_attn": {
                "q": lin(f"{base}.attention.attention.query"),
                "k": lin(f"{base}.attention.attention.key"),
                "v": lin(f"{base}.attention.attention.value"),
                "o": lin(f"{base}.attention.output.dense"),
            },
            "self_ln": ln(f"{base}.attention.output.LayerNorm"),
            "intermediate": lin(f"{base}.intermediate.dense"),
            "output": lin(f"{base}.output.dense"),
            "output_ln": ln(f"{base}.output.LayerNorm"),
            "intermediate_query": lin(f"{base}.intermediate_query.dense"),
            "output_query": lin(f"{base}.output_query.dense"),
            "output_query_ln": ln(f"{base}.output_query.LayerNorm"),
        }
        if i % qf.cross_attention_frequency == 0:
            layer["cross_attn"] = {
                "q": lin(f"{base}.crossattention.attention.query"),
                "k": lin(f"{base}.crossattention.attention.key"),
                "v": lin(f"{base}.crossattention.attention.value"),
                "o": lin(f"{base}.crossattention.output.dense"),
            }
            layer["cross_ln"] = ln(f"{base}.crossattention.output.LayerNorm")
        qlayers.append(layer)

    return {
        "text": convert_hf_decoder_weights(
            state, config.text.to_decoder_config(), dtype, attn_bias=False
        ),
        "vision": vision,
        "qformer": {
            "word_embeddings": raw("qformer.embeddings.word_embeddings.weight"),
            "position_embeddings": raw("qformer.embeddings.position_embeddings.weight"),
            "embeddings_ln": ln("qformer.embeddings.layernorm"),
            "query_tokens": raw("query_tokens").reshape(config.num_query_tokens, -1),
            "layers": qlayers,
        },
        "language_projection": lin("language_projection"),
    }
