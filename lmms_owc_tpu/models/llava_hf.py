"""LLaVA (HF-style) model adapter: llava-1.5 family with generate_until + loglikelihood.

Functional parity with reference src/models/_llava_hf.py (registered IDs :586-613,
generate flow, Vicuna chat format constant :23, loglikelihood via context/continuation
masking :169-260), on the JAX stack: CLIP-ViT tower + projector + Llama decoder,
batched left-padded generation, fused loglikelihood scoring (one jitted forward per
length bucket instead of per-sample HF forwards).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["LlavaHf"]

DEFAULT_MAX_NEW_TOKENS = 128

# Vicuna v1 conversation format used by llava-1.5 (reference src/models/_llava_hf.py:23).
VICUNA_SYSTEM = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's questions."
)

PRESET_CONFIGS = {
    "llava-1.5-7b": dict(
        text_config=dict(
            model_type="llama", vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14,
        ),
        image_token_index=32000,
    ),
    "llava-1.5-13b": dict(
        text_config=dict(
            model_type="llama", vocab_size=32064, hidden_size=5120, intermediate_size=13824,
            num_hidden_layers=40, num_attention_heads=40, num_key_value_heads=40,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14,
        ),
        image_token_index=32000,
    ),
    "llava-next-vicuna-7b": dict(
        model_type="llava_next",
        text_config=dict(
            model_type="llama", vocab_size=32064, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14,
        ),
        image_token_index=32000,
        image_grid_pinpoints=[[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]],
    ),
    "llava-next-mistral-7b": dict(
        model_type="llava_next",
        text_config=dict(
            model_type="mistral", vocab_size=32064, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            rope_theta=1000000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14,
        ),
        image_token_index=32000,
        image_grid_pinpoints=[[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]],
    ),
    "llava-tiny": dict(
        text_config=dict(
            model_type="llama", vocab_size=32064, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        image_token_index=32000,
    ),
}


class _FallbackLlavaTokenizer:
    """Hash tokenizer for random-init benchmarking; handles <image> and </s>."""

    eos_token_id = 2
    pad_token_id = 0

    def __init__(self, image_token_id: int, vocab_size: int = 32000) -> None:
        self.image_token_id = image_token_id
        self.vocab_size = vocab_size

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib

        ids = [1] if add_special_tokens else []
        for piece in text.replace("<image>", " <image> ").split():
            if piece == "<image>":
                ids.append(self.image_token_id)
            else:
                ids.append(
                    100 + int.from_bytes(hashlib.md5(piece.encode()).digest()[:3], "little")
                    % (self.vocab_size - 200)
                )
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids if int(i) > 2)


class LlavaHf(Model):
    """LLaVA-1.5 on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "llava-1.5-7b",
        random_init: bool = False,
        model_parallel: int = 1,
        use_mesh: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.random_init = random_init or pretrained is None
        self.model_parallel = int(model_parallel)
        self.use_mesh = use_mesh or self.model_parallel > 1
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    # ------------------------------------------------------------------- load

    def load_model(self) -> None:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import llava as lv
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            hf_cfg = load_config_json(self.pretrained)
            self.is_next = hf_cfg.get("model_type") == "llava_next"
            self.grid_pinpoints = hf_cfg.get("image_grid_pinpoints")
            self.config = lv.llava_config_from_hf(hf_cfg)
            state = load_safetensors_state(self.pretrained)
            self.params = lv.convert_hf_llava_weights(state, self.config, dtype)
            if self.is_next and "model.image_newline" in state:
                import numpy as _np

                self.params["image_newline"] = jnp.asarray(
                    _np.asarray(state["model.image_newline"]), dtype
                )
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = dict(PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["llava-1.5-7b"]))
            self.is_next = preset.get("model_type") == "llava_next"
            self.grid_pinpoints = preset.get("image_grid_pinpoints")
            self.config = lv.llava_config_from_hf(preset)
            self.params = lv.init_llava_params(
                jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
            )
            if self.is_next:
                self.params["image_newline"] = jnp.zeros(self.config.text.hidden_size, dtype)
            self.tokenizer = _FallbackLlavaTokenizer(self.config.image_token_id)
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        import dataclasses

        # The decoder view routes pad ids from the llava config.
        self.decoder_config = dataclasses.replace(
            self.config.text.to_decoder_config(), pad_token_id=self.config.pad_token_id
        )

        self.mesh = None
        if self.use_mesh:
            from lmms_owc_tpu.parallel import local_mesh
            from lmms_owc_tpu.parallel.sharding import shard_params

            # LOCAL devices only — per-process TP composes with per-process DP
            # request sharding (see qwen2_vl.py).
            self.mesh = local_mesh(self.model_parallel)
            self.params["text"] = shard_params(self.params["text"], self.mesh)

        self._rng = jax.random.PRNGKey(self.jax_random_seed)

    @property
    def eos_token_ids(self) -> list[int]:
        eos = getattr(self.tokenizer, "eos_token_id", 2)
        return [int(eos)] if eos is not None else [2]

    @property
    def chat_template(self) -> str:
        return "vicuna_v1"

    @property
    def tokenizer_name(self) -> str:
        return f"llava_{self.preset}"

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = [VICUNA_SYSTEM, " "]
        for msg in messages:
            role = "USER" if msg["role"] == "user" else "ASSISTANT"
            parts.append(f"{role}: {msg['content']} ")
        parts.append("ASSISTANT:")
        return "".join(parts)

    def _build_prompt(self, context: str, num_images: int) -> str:
        image_tokens = "<image>\n" * num_images
        if "mistral" in self.preset:
            return f"[INST] {image_tokens}{context} [/INST]"
        return f"USER: {image_tokens}{context} ASSISTANT:"

    # ------------------------------------------------------------ preprocessing

    def _preprocess_images(self, visuals: list) -> np.ndarray | None:
        """CLIP preprocessing: resize shortest side + center crop + normalize."""
        if not visuals:
            return None
        from PIL import Image

        from lmms_owc_tpu.ops.image import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

        size = self.config.vision.image_size
        arrays = []
        for image in visuals:
            image = image.convert("RGB")
            w, h = image.size
            scale = size / min(w, h)
            image = image.resize((max(size, round(w * scale)), max(size, round(h * scale))), Image.BICUBIC)
            w, h = image.size
            left, top = (w - size) // 2, (h - size) // 2
            image = image.crop((left, top, left + size, top + size))
            arr = np.asarray(image).astype(np.float32) / 255.0
            arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
            arrays.append(arr.transpose(2, 0, 1))
        return np.stack(arrays)

    def _embed_sequence(self, input_ids: np.ndarray, payloads: list):
        """Token embeddings with vision features scattered into <image> slots.

        ``payloads[row]`` is either a pixel array [N, 3, S, S] (llava-1.5: fixed
        image_seq_length per image), a ("features", [tokens, H]) tuple (llava-next
        anyres packing), or None.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import llava as lv

        feature_rows: list[np.ndarray] = []
        bsz, bucket = input_ids.shape
        index_map = np.full((bsz, bucket), -1, np.int32)
        cursor = 0
        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        for row, payload in enumerate(payloads):
            if payload is None:
                continue
            if isinstance(payload, tuple) and payload[0] == "features":
                feats = payload[1]
            else:
                vision = lv.encode_images(
                    self.params, jnp.asarray(payload, param_dtype), self.config
                )
                feats = np.asarray(vision.reshape(-1, vision.shape[-1]), np.float32)
            if feats is None:
                continue
            positions = np.where(input_ids[row] == self.config.image_token_id)[0]
            index_map[row, positions] = cursor + np.arange(len(positions))
            cursor += feats.shape[0]
            feature_rows.append(feats)

        vision_flat = (
            jnp.asarray(np.concatenate(feature_rows), param_dtype) if feature_rows else None
        )
        return _assemble_embeds(
            self.params["text"]["embed_tokens"],
            jnp.asarray(input_ids),
            vision_flat,
            jnp.asarray(index_map) if vision_flat is not None else None,
        )

    def _encode_anyres_image(self, image) -> np.ndarray:
        """LLaVA-NeXT path: anyres tiles -> CLIP -> projector -> packed [tokens, H]."""
        import jax.numpy as jnp
        from PIL import Image

        from lmms_owc_tpu.nn import anyres
        from lmms_owc_tpu.nn import llava as lv
        from lmms_owc_tpu.ops.image import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

        image = image.convert("RGB")
        size = self.config.vision.image_size
        orig_w, orig_h = image.size
        pinpoints = self.grid_pinpoints or anyres.default_grid_pinpoints(size, 3)
        best = anyres.select_best_resolution((orig_h, orig_w), pinpoints)
        padded = anyres.resize_and_pad(image, best)
        tiles = [image.resize((size, size), Image.BICUBIC)] + anyres.divide_to_patches(padded, size)
        arrays = []
        for tile in tiles:
            arr = np.asarray(tile).astype(np.float32) / 255.0
            arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
            arrays.append(arr.transpose(2, 0, 1))
        pixels = np.stack(arrays)
        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        feats = lv.encode_images(self.params, jnp.asarray(pixels, param_dtype), self.config)
        return anyres.pack_anyres_features(
            np.asarray(feats, np.float32),
            (orig_h, orig_w),
            pinpoints,
            size,
            self.config.vision.patch_size,
            np.asarray(self.params["image_newline"], np.float32),
            max_patches=None,  # llava-next does not downscale
        )

    def _prepare_request(self, ctx, doc_to_visual, doc_id, task_name, split):
        task = self.task_dict.get(task_name)
        if isinstance(task, tuple):
            task = task[1]
        visuals = []
        if task is not None and doc_to_visual is not None:
            doc = task.dataset[split][doc_id]
            visuals = doc_to_visual(doc) or []
        prompt = self._build_prompt(ctx, len(visuals))
        ids = self.tokenizer.encode(prompt)

        if getattr(self, "is_next", False) and visuals:
            features = [self._encode_anyres_image(img) for img in visuals]
            expanded: list[int] = []
            img_idx = 0
            for tok in ids:
                if tok == self.config.image_token_id:
                    expanded.extend([tok] * features[img_idx].shape[0])
                    img_idx += 1
                else:
                    expanded.append(tok)
            return expanded, ("features", np.concatenate(features) if features else None)

        # Expand each single <image> token to image_seq_length positions.
        expanded = []
        for tok in ids:
            if tok == self.config.image_token_id:
                expanded.extend([tok] * self.config.image_seq_length)
            else:
                expanded.append(tok)
        return expanded, self._preprocess_images(visuals)

    # ------------------------------------------------------------- generation

    def generate_until(self, requests) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import llama as L

        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        chunks = list(collator.get_batched(n=self.batch_size))

        def _prepare_chunk(chunk):
            return [
                self._prepare_request(args[0], args[2], args[3], args[4], args[5])
                for args in chunk
            ]

        def _run_chunk(chunk, prepared):
            gen_kwargs = dict(chunk[0][1] or {})
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            max_new = int(gen_kwargs.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS))
            bsz = len(prepared)
            bucket = pad_to_bucket(max(len(ids) for ids, _ in prepared))
            pad_id = self.config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            payloads = []
            for row, (ids, payload) in enumerate(prepared):
                input_ids[row, bucket - len(ids) :] = ids
                mask[row, bucket - len(ids) :] = 1
                payloads.append(payload)

            embeds = self._embed_sequence(input_ids, payloads)
            position_ids, next_pos = L.llama_positions(mask)
            self._rng, subkey = jax.random.split(self._rng)
            tokens = L.greedy_generate(
                self.params["text"],
                embeds,
                jnp.asarray(position_ids),
                jnp.asarray(mask.astype(np.int32)),
                jnp.asarray(next_pos.astype(np.int32)),
                self.decoder_config,
                max_new_tokens=max_new,
                cache_len=bucket + pad_to_bucket(max_new, (64, 128, 256, 512)),
                eos_ids=jnp.asarray(self.eos_token_ids, jnp.int32),
                rng_key=subkey,
                do_sample=bool(gen_kwargs.get("do_sample", False)),
                temperature=float(gen_kwargs.get("temperature") or 1.0),
                top_p=float(gen_kwargs.get("top_p") or 1.0),
            )
            tokens = np.asarray(tokens)
            stop = set(self.eos_token_ids) | {pad_id}
            out = []
            for row in range(bsz):
                ids = []
                for tok in tokens[row]:
                    if int(tok) in stop:
                        break
                    ids.append(int(tok))
                text = self.tokenizer.decode(ids, skip_special_tokens=True)
                for stop_str in until:
                    if stop_str and stop_str in text:
                        text = text.split(stop_str)[0]
                out.append(text.strip())
            return out

        results = self._foreach_chunk_pipelined(chunks, _prepare_chunk, _run_chunk)
        return collator.get_original(results)

    def loglikelihood(self, requests) -> list[tuple[float, bool]]:
        """(ctx, doc_to_target, doc_to_visual, doc_id, task, split) -> (loss, is_greedy).

        Contract parity with reference src/models/_llava_hf.py:169-260: labels are the
        full ids with the context masked; returns mean CE over the continuation and
        whether greedy decoding reproduces it.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import llama as L

        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            rows = []
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                doc_to_visual = req.args[2] if len(req.args) >= 6 else None
                doc_id = req.args[3] if len(req.args) >= 6 else 0
                task_name = req.args[4] if len(req.args) >= 6 else ""
                split = req.args[5] if len(req.args) >= 6 else ""

                expanded_ctx, payload = self._prepare_request(
                    ctx, doc_to_visual, doc_id, task_name, split
                )
                cont_ids = self._encode_continuation(continuation)
                rows.append((expanded_ctx + cont_ids, len(cont_ids), payload))

            bucket = pad_to_bucket(max(len(ids) for ids, _, _ in rows))
            pad_id = self.config.pad_token_id
            bsz = len(rows)
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            payloads = []
            for row, (ids, n_cont, payload) in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                # Position t predicts token t+1: continuation targets live at the
                # last n_cont prediction slots.
                target_ids[row, offset : bucket - 1] = ids[1:]
                target_mask[row, bucket - 1 - n_cont : bucket - 1] = 1
                payloads.append(payload)

            embeds = self._embed_sequence(input_ids, payloads)
            position_ids, _ = L.llama_positions(mask)
            loss, is_greedy = L.score_continuation(
                self.params["text"],
                embeds,
                jnp.asarray(position_ids),
                jnp.asarray(mask.astype(np.int32)),
                jnp.asarray(target_ids),
                jnp.asarray(target_mask.astype(np.int32)),
                self.decoder_config,
            )
            results.extend(
                (float(l), bool(g)) for l, g in zip(np.asarray(loss), np.asarray(is_greedy))
            )
        return results


@register_model("llava-1.5-7b")
def llava_15_7b(**kwargs) -> LlavaHf:
    """llava-hf/llava-1.5-7b-hf (reference registration: src/models/_llava_hf.py:586-595)."""
    kwargs.setdefault("preset", "llava-1.5-7b")
    return LlavaHf(**kwargs)


@register_model("llava-1.5-13b")
def llava_15_13b(**kwargs) -> LlavaHf:
    """llava-hf/llava-1.5-13b-hf."""
    kwargs.setdefault("preset", "llava-1.5-13b")
    return LlavaHf(**kwargs)


@register_model("llava-next-vicuna-7b")
def llava_next_vicuna_7b(**kwargs) -> LlavaHf:
    """llava-hf/llava-v1.6-vicuna-7b-hf (anyres tiling)."""
    kwargs.setdefault("preset", "llava-next-vicuna-7b")
    return LlavaHf(**kwargs)


@register_model("llava-next-mistral-7b")
def llava_next_mistral_7b(**kwargs) -> LlavaHf:
    """llava-hf/llava-v1.6-mistral-7b-hf (anyres tiling, [INST] prompt format)."""
    kwargs.setdefault("preset", "llava-next-mistral-7b")
    return LlavaHf(**kwargs)


@register_model("llava-tiny")
def llava_tiny(**kwargs) -> LlavaHf:
    """Miniature LLaVA for CPU tests."""
    kwargs.setdefault("preset", "llava-tiny")
    return LlavaHf(**kwargs)
