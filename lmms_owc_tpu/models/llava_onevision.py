"""LLaVA-OneVision model adapter (llava-onevision-qwen2-{7b,0.5b}-{ov,si}).

Functional parity with reference src/models/_llava_onevision.py (registered IDs
:805-838, anyres image handling :241-261, loglikelihood :219-345): SigLIP-SO400M
tower over anyres tiles, grid reassembly + unpad + newline packing, Qwen2 decoding,
and fused batched loglikelihood on the shared JAX stack.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["LlavaOnevision"]

DEFAULT_MAX_NEW_TOKENS = 128
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)

_IM_START = "<|im_start|>"
_IM_END = "<|im_end|>"
_IMAGE = "<image>"

PRESET_CONFIGS = {
    "llava-onevision-qwen2-7b-ov": dict(
        vision_config=dict(
            hidden_size=1152, num_hidden_layers=26, num_attention_heads=16,
            intermediate_size=4304, image_size=384, patch_size=14,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=152128, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
            rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        ),
        image_token_index=151646,
        vision_aspect_ratio="anyres_max_9",
    ),
    "llava-onevision-qwen2-0.5b-ov": dict(
        vision_config=dict(
            hidden_size=1152, num_hidden_layers=26, num_attention_heads=16,
            intermediate_size=4304, image_size=384, patch_size=14,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=151936, hidden_size=896, intermediate_size=4864,
            num_hidden_layers=24, num_attention_heads=14, num_key_value_heads=2,
            rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        ),
        image_token_index=151646,
        vision_aspect_ratio="anyres_max_9",
    ),
    "llava-onevision-tiny": dict(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=152128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        ),
        image_token_index=151646,
        vision_aspect_ratio="anyres_max_9",
    ),
}


class _FallbackOVTokenizer:
    eos_token_id = 151645
    pad_token_id = 151643

    def __init__(self, image_token_id: int) -> None:
        self._special = {_IM_START: 151644, _IM_END: 151645, _IMAGE: image_token_id}

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib
        import re

        ids: list[int] = []
        pattern = "|".join(re.escape(s) for s in self._special)
        pos = 0
        for match in re.finditer(pattern, text):
            for word in text[pos : match.start()].split():
                ids.append(1000 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 150000)
            ids.append(self._special[match.group()])
            pos = match.end()
        for word in text[pos:].split():
            ids.append(1000 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 150000)
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids)


class LlavaOnevision(Model):
    """LLaVA-OneVision on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "llava-onevision-qwen2-7b-ov",
        max_anyres_tiles: int = 6,
        random_init: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.max_anyres_tiles = max_anyres_tiles
        self.random_init = random_init or pretrained is None
        self.jax_random_seed = jax_random_seed
        # Random-init + int8/int4: generate and quantize every tensor ON
        # DEVICE (the flagship's strategy) — the bf16 7B tree (~16 GB) never
        # exists anywhere and nothing crosses the ~20 MB/s tunneled host link.
        # Checkpoint loads keep the base class's host-stream-quantize path.
        self._handles_quantized_load = self.random_init
        super().__init__(model_id=preset, **kwargs)

    def load_model(self) -> None:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import anyres
        from lmms_owc_tpu.nn import idefics2 as idf
        from lmms_owc_tpu.nn.llama import llama_config_from_hf
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state
        from lmms_owc_tpu.nn.qwen2_vl import convert_hf_decoder_weights, init_decoder_params

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            cfg = load_config_json(self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            cfg = dict(PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["llava-onevision-qwen2-7b-ov"]))

        vis = cfg.get("vision_config", {})
        self.vision_config = idf.SiglipVisionConfig(
            hidden_size=vis.get("hidden_size", 1152),
            num_layers=vis.get("num_hidden_layers", 26),
            num_heads=vis.get("num_attention_heads", 16),
            intermediate_size=vis.get("intermediate_size", 4304),
            image_size=vis.get("image_size", 384),
            patch_size=vis.get("patch_size", 14),
        )
        self.text_config = llama_config_from_hf(cfg["text_config"])
        self.text_attn_bias = cfg["text_config"].get("model_type", "qwen2") == "qwen2"
        self.image_token_id = cfg.get("image_token_index", 151646)
        aspect = cfg.get("vision_aspect_ratio", "anyres_max_9")
        self.max_patches = int(aspect.replace("anyres_max_", "")) if "anyres_max" in aspect else None
        self.grid_pinpoints = cfg.get(
            "image_grid_pinpoints",
            anyres.default_grid_pinpoints(self.vision_config.image_size, self.max_anyres_tiles),
        )
        self.decoder_config = dataclasses.replace(
            self.text_config.to_decoder_config(), image_token_id=self.image_token_id
        )

        if self.pretrained is not None and Path(self.pretrained).exists():
            state = load_safetensors_state(self.pretrained)

            def find(name):
                # "model."-prefixed (new transformers) or bare (older exports).
                return np.asarray(state[name] if name in state else state["model." + name])

            self.params = {
                "text": convert_hf_decoder_weights(
                    state, self.decoder_config, dtype, attn_bias=self.text_attn_bias
                ),
                "vision": self._convert_siglip(state, dtype),
                "projector": {
                    "fc1": {
                        "w": jnp.asarray(find("multi_modal_projector.linear_1.weight").T, dtype),
                        "b": jnp.asarray(find("multi_modal_projector.linear_1.bias"), dtype),
                    },
                    "fc2": {
                        "w": jnp.asarray(find("multi_modal_projector.linear_2.weight").T, dtype),
                        "b": jnp.asarray(find("multi_modal_projector.linear_2.bias"), dtype),
                    },
                },
                "image_newline": jnp.asarray(find("image_newline"), dtype),
            }
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            e, h = self.vision_config.hidden_size, self.text_config.hidden_size

            def build_tree():
                keys = jax.random.split(jax.random.PRNGKey(self.jax_random_seed), 4)
                idefics_like = idf.init_idefics2_params(
                    keys[0],
                    idf.Idefics2Config(text=self.text_config, vision=self.vision_config),
                    dtype,
                )
                return {
                    "text": init_decoder_params(
                        keys[1], self.decoder_config, dtype, attn_bias=self.text_attn_bias
                    ),
                    "vision": idefics_like["vision"],
                    "projector": {
                        "fc1": {"w": (jax.random.normal(keys[2], (e, h)) * 0.02).astype(dtype), "b": jnp.zeros(h, dtype)},
                        "fc2": {"w": (jax.random.normal(keys[3], (h, h)) * 0.02).astype(dtype), "b": jnp.zeros(h, dtype)},
                    },
                    "image_newline": jnp.zeros(h, dtype),
                }

            if self.load_in_8bit or self.load_in_4bit:
                from lmms_owc_tpu.ops.quant import init_quantized_on_device

                self.params = init_quantized_on_device(
                    jax.eval_shape(build_tree),
                    self.jax_random_seed,
                    dtype=dtype,
                    bits=4 if self.load_in_4bit else 8,
                    host_rng=jax.default_backend() != "tpu",
                )
                self._int8_applied = True
                log.info(
                    "random-init int%d weights generated on device",
                    4 if self.load_in_4bit else 8,
                )
            else:
                self.params = build_tree()
            self.tokenizer = _FallbackOVTokenizer(self.image_token_id)
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        self._rng = jax.random.PRNGKey(self.jax_random_seed)

    def _convert_siglip(self, state: dict, dtype):
        """Reuse the Idefics2 SigLIP converter with the llava vision-tower prefix."""
        from lmms_owc_tpu.nn import idefics2 as idf

        # "model.vision_tower." (new transformers) or bare "vision_tower." (older).
        remapped = {
            k.removeprefix("model.").replace("vision_tower.vision_model.", "model.vision_model."): v
            for k, v in state.items()
            if "vision_tower" in k
        }
        tree = idf.convert_hf_idefics2_weights(
            remapped,
            idf.Idefics2Config(text=self.text_config, vision=self.vision_config),
            dtype,
            vision_only=True,
        )
        return tree["vision"]

    @property
    def eos_token_ids(self) -> list[int]:
        eos = getattr(self.tokenizer, "eos_token_id", 151645)
        return sorted({int(eos), 151645})

    @property
    def tokenizer_name(self) -> str:
        return f"llava_onevision_{self.preset}"

    @property
    def chat_template(self) -> str:
        return "qwen_ov"

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = [f"{_IM_START}{m['role']}\n{m['content']}{_IM_END}\n" for m in messages]
        parts.append(f"{_IM_START}assistant\n")
        return "".join(parts)

    def _build_prompt(self, context: str, num_images: int) -> str:
        images = (_IMAGE + "\n") * num_images
        return (
            f"{_IM_START}user\n{images}{context}{_IM_END}\n{_IM_START}assistant\n"
        )

    # ------------------------------------------------------------ vision

    def _encode_one_image(self, image) -> np.ndarray:
        """Anyres tiles -> SigLIP -> projector -> packed feature [tokens, H]."""
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import anyres
        from lmms_owc_tpu.nn import idefics2 as idf
        from lmms_owc_tpu.nn.layers import dense, gelu

        from PIL import Image

        image = image.convert("RGB")
        size = self.vision_config.image_size
        orig_w, orig_h = image.size

        best = anyres.select_best_resolution((orig_h, orig_w), self.grid_pinpoints)
        padded = anyres.resize_and_pad(image, best)
        tiles = [image.resize((size, size), Image.BICUBIC)] + anyres.divide_to_patches(padded, size)

        arrays = []
        for tile in tiles:
            arr = np.asarray(tile).astype(np.float32) / 255.0
            arr = (arr - np.asarray(SIGLIP_MEAN)) / np.asarray(SIGLIP_STD)
            arrays.append(arr.transpose(2, 0, 1))
        pixels = np.stack(arrays)

        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        feats = idf.siglip_vision_forward(
            self.params["vision"], jnp.asarray(pixels, param_dtype), self.vision_config,
            bucket_positions=False,
        )
        proj = dense(self.params["projector"]["fc2"], gelu(dense(self.params["projector"]["fc1"], feats)))
        packed = anyres.pack_anyres_features(
            np.asarray(proj, np.float32),
            (orig_h, orig_w),
            self.grid_pinpoints,
            size,
            self.vision_config.patch_size,
            np.asarray(self.params["image_newline"], np.float32),
            max_patches=self.max_patches,
        )
        return packed

    def _prepare(self, args: tuple):
        ctx, _gk, doc_to_visual, doc_id, task_name, split = args[:6]
        task = self.task_dict.get(task_name)
        if isinstance(task, tuple):
            task = task[1]
        visuals = (
            doc_to_visual(task.dataset[split][doc_id])
            if (task is not None and doc_to_visual is not None)
            else []
        ) or []
        features = [self._encode_one_image(img) for img in visuals]
        prompt = self._build_prompt(ctx, len(visuals))
        ids = self.tokenizer.encode(prompt)
        expanded: list[int] = []
        img_idx = 0
        for tok in ids:
            if tok == self.image_token_id:
                expanded.extend([tok] * features[img_idx].shape[0])
                img_idx += 1
            else:
                expanded.append(tok)
        return expanded, features

    def _run(self, prepared: list[tuple], gen_kwargs: dict) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import llama as L

        max_new = int(gen_kwargs.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS))
        until = gen_kwargs.get("until") or []
        if isinstance(until, str):
            until = [until]

        bsz = len(prepared)
        bucket = pad_to_bucket(max(len(ids) for ids, _ in prepared))
        pad_id = self.decoder_config.pad_token_id
        input_ids = np.full((bsz, bucket), pad_id, np.int64)
        mask = np.zeros((bsz, bucket), np.int64)
        index_map = np.full((bsz, bucket), -1, np.int32)
        all_features = []
        cursor = 0
        for row, (ids, features) in enumerate(prepared):
            offset = bucket - len(ids)
            input_ids[row, offset:] = ids
            mask[row, offset:] = 1
            positions = np.where(np.asarray(ids) == self.image_token_id)[0]
            n_tok = len(positions)
            if n_tok:
                index_map[row, offset + positions] = cursor + np.arange(n_tok)
                cursor += n_tok
                all_features.extend(features)

        vision_flat = None
        if all_features:
            param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
            vision_flat = jnp.asarray(np.concatenate(all_features), param_dtype)

        embeds = _assemble_embeds(
            self.params["text"]["embed_tokens"],
            jnp.asarray(input_ids),
            vision_flat,
            jnp.asarray(index_map) if vision_flat is not None else None,
        )
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
            out_ids = []
            for tok in tokens[row]:
                if int(tok) in stop:
                    break
                out_ids.append(int(tok))
            text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
            for stop_str in until:
                if stop_str and stop_str in text:
                    text = text.split(stop_str)[0]
            out.append(text.strip())
        return out

    def generate_until(self, requests) -> list[str]:
        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        chunks = list(collator.get_batched(n=self.batch_size))
        results = self._foreach_chunk_pipelined(
            chunks,
            prepare=lambda chunk: [self._prepare(args) for args in chunk],
            run=lambda chunk, prepared: self._run(prepared, dict(chunk[0][1] or {})),
        )
        return collator.get_original(results)

    def loglikelihood(self, requests) -> list[tuple[float, bool]]:
        """Mean continuation CE + greedy match (reference: src/models/_llava_onevision.py:219-345)."""
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import llama as L

        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            rows = []
            for req in batch:
                ctx, continuation, _visuals = self._resolve_loglikelihood_request(req)
                doc_to_visual = req.args[2] if len(req.args) >= 6 else None
                doc_id = req.args[3] if len(req.args) >= 6 else 0
                task_name = req.args[4] if len(req.args) >= 6 else ""
                split = req.args[5] if len(req.args) >= 6 else ""
                expanded_ctx, features = self._prepare(
                    (ctx, None, doc_to_visual, doc_id, task_name, split)
                )
                cont_ids = self._encode_continuation(continuation)
                rows.append((expanded_ctx + cont_ids, len(cont_ids), features))

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids, _, _ in rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            all_features = []
            cursor = 0
            for row, (ids, n_cont, features) in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                target_ids[row, offset : bucket - 1] = ids[1:]
                target_mask[row, bucket - 1 - n_cont : bucket - 1] = 1
                positions = np.where(np.asarray(ids) == self.image_token_id)[0]
                if len(positions):
                    index_map[row, offset + positions] = cursor + np.arange(len(positions))
                    cursor += len(positions)
                    all_features.extend(features)

            vision_flat = None
            if all_features:
                param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
                vision_flat = jnp.asarray(np.concatenate(all_features), param_dtype)
            embeds = _assemble_embeds(
                self.params["text"]["embed_tokens"],
                jnp.asarray(input_ids),
                vision_flat,
                jnp.asarray(index_map) if vision_flat is not None else None,
            )
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


@register_model(
    "llava-onevision-qwen2-7b-ov", "llava-onevision-qwen2-7b-si",
)
def llava_onevision_7b(**kwargs) -> LlavaOnevision:
    """lmms-lab/llava-onevision-qwen2-7b-{ov,si} (reference: src/models/_llava_onevision.py:805-838)."""
    kwargs.setdefault("preset", "llava-onevision-qwen2-7b-ov")
    return LlavaOnevision(**kwargs)


@register_model(
    "llava-onevision-qwen2-0.5b-ov", "llava-onevision-qwen2-0.5b-si",
)
def llava_onevision_05b(**kwargs) -> LlavaOnevision:
    """lmms-lab/llava-onevision-qwen2-0.5b-{ov,si}."""
    kwargs.setdefault("preset", "llava-onevision-qwen2-0.5b-ov")
    return LlavaOnevision(**kwargs)


@register_model("llava-onevision-tiny")
def llava_onevision_tiny(**kwargs) -> LlavaOnevision:
    """Miniature LLaVA-OneVision for CPU tests."""
    kwargs.setdefault("preset", "llava-onevision-tiny")
    return LlavaOnevision(**kwargs)
