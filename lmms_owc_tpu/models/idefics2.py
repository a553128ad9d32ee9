"""Idefics2 model adapter (idefics2-8b).

Functional parity with reference src/models/_idefics2.py (registered at :407,
messages-format prompting): SigLIP tower + perceiver resampler + Mistral decoding on
the shared JAX generation loop. Images are resized to a fixed square (the HF
processor's variable-aspect + 4-crop splitting is disabled by default, matching
``do_image_splitting=False``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["Idefics2"]

DEFAULT_MAX_NEW_TOKENS = 128
IDEFICS_MEAN = (0.5, 0.5, 0.5)
IDEFICS_STD = (0.5, 0.5, 0.5)

_FAKE = "<fake_token_around_image>"
_IMAGE = "<image>"
_EOU = "<end_of_utterance>"

PRESET_CONFIGS = {
    "idefics2-8b": dict(
        vision_config=dict(
            hidden_size=1152, num_hidden_layers=27, num_attention_heads=16,
            intermediate_size=4304, image_size=980, patch_size=14,
        ),
        perceiver_config=dict(
            resampler_n_latents=64, resampler_depth=3, resampler_n_heads=16,
            resampler_head_dim=96, num_key_value_heads=4,
        ),
        text_config=dict(
            model_type="mistral", vocab_size=32003, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        image_token_id=32001,
    ),
    "idefics2-tiny": dict(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=4,
            resampler_head_dim=8, num_key_value_heads=2,
        ),
        text_config=dict(
            model_type="mistral", vocab_size=32003, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
        ),
        image_token_id=32001,
    ),
}


class _FallbackIdeficsTokenizer:
    eos_token_id = 2
    pad_token_id = 0

    def __init__(self, image_token_id: int) -> None:
        self._special = {_FAKE: 32000, _IMAGE: image_token_id, _EOU: 32002}

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib
        import re

        ids = [1] if add_special_tokens else []
        pattern = "|".join(re.escape(s) for s in self._special)
        pos = 0
        for match in re.finditer(pattern, text):
            for word in text[pos : match.start()].split():
                ids.append(100 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 31000)
            ids.append(self._special[match.group()])
            pos = match.end()
        for word in text[pos:].split():
            ids.append(100 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 31000)
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids if int(i) > 2)


class Idefics2(Model):
    """Idefics2 on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "idefics2-8b",
        image_size: int | None = None,
        do_image_splitting: bool = False,
        hf_preprocess: bool = True,
        random_init: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.image_size_override = image_size
        self.do_image_splitting = do_image_splitting
        # HF-exact variable-aspect preprocessing (resize to shortest/longest edge
        # budget, pad bottom/right, patch mask + bucketized position ids). Passing
        # image_size=N forces the fixed-square throughput path instead.
        self.hf_preprocess = bool(hf_preprocess) and image_size is None
        self.random_init = random_init or pretrained is None
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    def load_model(self) -> None:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import idefics2 as idf
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            self.config = idf.idefics2_config_from_hf(load_config_json(self.pretrained))
            state = load_safetensors_state(self.pretrained)
            self.params = idf.convert_hf_idefics2_weights(state, self.config, dtype)
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["idefics2-8b"])
            self.config = idf.idefics2_config_from_hf(dict(preset))
            self.params = idf.init_idefics2_params(
                jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
            )
            self.tokenizer = _FallbackIdeficsTokenizer(self.config.image_token_id)
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        self.decoder_config = self.config.text.to_decoder_config()
        # 980px SigLIP is expensive; allow a smaller square for throughput runs.
        self.image_size = self.image_size_override or min(self.config.vision.image_size, 448)
        self._rng = jax.random.PRNGKey(self.jax_random_seed)

    @property
    def eos_token_ids(self) -> list[int]:
        ids = {2, 32002}  # </s> and <end_of_utterance>
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            ids.add(int(eos))
        return sorted(ids)

    @property
    def tokenizer_name(self) -> str:
        return f"idefics2_{self.preset}"

    @property
    def chat_template(self) -> str:
        return "idefics2"

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = []
        for msg in messages:
            role = "User" if msg["role"] == "user" else "Assistant"
            parts.append(f"{role}: {msg['content']}{_EOU}\n")
        parts.append("Assistant:")
        return "".join(parts)

    def _build_prompt(self, context: str, num_images: int) -> str:
        n_latents = self.config.perceiver.n_latents
        image_block = (_FAKE + _IMAGE * n_latents) * num_images + (_FAKE if num_images else "")
        return f"User:{image_block}{context}{_EOU}\nAssistant:"

    def _expand_visuals(self, visuals: list) -> list:
        """Optional HF-style image splitting: 4 quadrant crops + the full image."""
        if not self.do_image_splitting:
            return list(visuals)
        out = []
        for image in visuals:
            image = image.convert("RGB")
            w, h = image.size
            mid_w, mid_h = w // 2, h // 2
            out.extend(
                [
                    image.crop((0, 0, mid_w, mid_h)),
                    image.crop((mid_w, 0, w, mid_h)),
                    image.crop((0, mid_h, mid_w, h)),
                    image.crop((mid_w, mid_h, w, h)),
                    image,
                ]
            )
        return out

    def _preprocess(self, visuals: list) -> np.ndarray | None:
        if not visuals:
            return None
        from PIL import Image

        size = self.image_size
        arrays = []
        for image in visuals:
            img = image.convert("RGB").resize((size, size), Image.BICUBIC)
            arr = np.asarray(img).astype(np.float32) / 255.0
            arr = (arr - np.asarray(IDEFICS_MEAN)) / np.asarray(IDEFICS_STD)
            arrays.append(arr.transpose(2, 0, 1))
        return np.stack(arrays)

    @staticmethod
    def _hf_resize_dims(width: int, height: int, shortest: int, longest: int) -> tuple[int, int]:
        """HF Idefics2ImageProcessor.get_resize_output_image_size, exactly
        (image_processing_idefics2.py:49-78): cap the longest edge, int-truncate
        the other, then clamp both to the shortest-edge minimum."""
        aspect_ratio = width / height
        if width >= height and width > longest:
            width = longest
            height = int(width / aspect_ratio)
        elif height > width and height > longest:
            height = longest
            width = int(height * aspect_ratio)
        height = max(height, shortest)
        width = max(width, shortest)
        return width, height

    def _preprocess_hf(self, visuals: list):
        """HF-exact variable-aspect preprocessing for a list of images.

        Returns (pixels [N, 3, Hmax, Wmax] normalized + zero-padded bottom/right,
        position_ids [N, P], patch_mask [N, P]) with Hmax/Wmax bucketed to
        8-patch multiples to bound recompiles (extra slots are masked out).
        """
        from PIL import Image

        p = self.config.vision.patch_size
        longest = self.config.vision.image_size
        shortest = max(p, round(longest * 378 / 980))
        num_side = longest // p

        resized, dims = [], []
        for image in visuals:
            img = image.convert("RGB")
            w, h = self._hf_resize_dims(*img.size, shortest, longest)
            img = img.resize((w, h), Image.BILINEAR)  # HF default resample
            arr = np.asarray(img).astype(np.float32) / 255.0
            arr = (arr - np.asarray(IDEFICS_MEAN)) / np.asarray(IDEFICS_STD)
            resized.append(arr.transpose(2, 0, 1))
            dims.append((h, w))

        from lmms_owc_tpu.nn.idefics2 import variable_patch_layout

        step = 8 * p
        max_h = min(-(-max(h for h, _ in dims) // step) * step, longest)
        max_w = min(-(-max(w for _, w in dims) // step) * step, longest)
        max_h = max(max_h, max(h for h, _ in dims))
        max_w = max(max_w, max(w for _, w in dims))
        gh, gw = max_h // p, max_w // p

        n = len(visuals)
        pixels = np.zeros((n, 3, max_h, max_w), np.float32)
        for i, ((h, w), arr) in enumerate(zip(dims, resized)):
            pixels[i, :, :h, :w] = arr
        position_ids, patch_mask = variable_patch_layout(dims, (gh, gw), num_side, p)
        return pixels, position_ids, patch_mask

    def generate_until(self, requests) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import idefics2 as idf
        from lmms_owc_tpu.nn import llama as L

        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        n_latents = self.config.perceiver.n_latents

        def prepare(chunk):
            """Host preprocessing + SigLIP/perceiver encode; overlapped with decode."""
            rows, all_images, image_counts = [], [], []
            for args in chunk:
                ctx, _gk, doc_to_visual, doc_id, task_name, split = args[:6]
                task = self.task_dict.get(task_name)
                if isinstance(task, tuple):
                    task = task[1]
                visuals = (
                    doc_to_visual(task.dataset[split][doc_id])
                    if (task is not None and doc_to_visual is not None)
                    else []
                ) or []
                visuals = self._expand_visuals(visuals)
                all_images.extend(visuals)
                image_counts.append(len(visuals))
                rows.append(self.tokenizer.encode(self._build_prompt(ctx, len(visuals))))

            vision_flat = None
            if all_images:
                param_dtype = self.params["perceiver"]["latents"].dtype
                if self.hf_preprocess:
                    pixels, pos_ids, patch_mask = self._preprocess_hf(all_images)
                    vision = idf.encode_images(
                        self.params, jnp.asarray(pixels, param_dtype), self.config,
                        jnp.asarray(pos_ids), jnp.asarray(patch_mask),
                    )
                else:
                    stacked = self._preprocess(all_images)
                    vision = idf.encode_images(
                        self.params, jnp.asarray(stacked, param_dtype), self.config
                    )
                vision_flat = vision.reshape(-1, vision.shape[-1])

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids in rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            image_cursor = 0
            for row, ids in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
                index_map[row, offset + positions] = image_cursor * n_latents + np.arange(
                    len(positions)
                )
                image_cursor += image_counts[row]

            embeds = _assemble_embeds(
                self.params["text"]["embed_tokens"],
                jnp.asarray(input_ids),
                vision_flat,
                jnp.asarray(index_map) if vision_flat is not None else None,
            )
            position_ids, next_pos = L.llama_positions(mask)
            return embeds, position_ids, mask, next_pos, bucket, pad_id

        def run(chunk, prepared):
            embeds, position_ids, mask, next_pos, bucket, pad_id = prepared
            bsz = len(chunk)
            gen_kwargs = dict(chunk[0][1] or {})
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            max_new = int(gen_kwargs.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS))
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
            outputs = []
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
                outputs.append(text.strip())
            return outputs

        chunks = list(collator.get_batched(n=self.batch_size))
        results = self._foreach_chunk_pipelined(chunks, prepare, run)
        return collator.get_original(results)

    def loglikelihood(self, requests) -> list[tuple[float, bool]]:
        """(ctx, doc_to_target, doc_to_visual, doc_id, task, split) -> (loss, is_greedy).

        Capability superset — the reference's Idefics2 adapter has no
        loglikelihood; contract matches src/models/_llava_hf.py:169-260.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import idefics2 as idf
        from lmms_owc_tpu.nn import llama as L

        n_latents = self.config.perceiver.n_latents
        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            rows, all_images, image_counts, cont_lens = [], [], [], []
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                visuals = self._expand_visuals(visuals)
                all_images.extend(visuals)
                image_counts.append(len(visuals))
                prompt = self._build_prompt(ctx, len(visuals))
                ctx_ids = self.tokenizer.encode(prompt)
                cont_ids = self._encode_continuation(continuation)
                rows.append(ctx_ids + cont_ids)
                cont_lens.append(len(cont_ids))

            vision_flat = None
            if all_images:
                param_dtype = self.params["perceiver"]["latents"].dtype
                if self.hf_preprocess:
                    pixels, pos_ids, patch_mask = self._preprocess_hf(all_images)
                    vision = idf.encode_images(
                        self.params, jnp.asarray(pixels, param_dtype), self.config,
                        jnp.asarray(pos_ids), jnp.asarray(patch_mask),
                    )
                else:
                    vision = idf.encode_images(
                        self.params, jnp.asarray(self._preprocess(all_images), param_dtype),
                        self.config,
                    )
                vision_flat = vision.reshape(-1, vision.shape[-1])

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids in rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            image_cursor = 0
            for row, ids in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                target_ids[row, offset : bucket - 1] = ids[1:]
                target_mask[row, bucket - 1 - cont_lens[row] : bucket - 1] = 1
                positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
                index_map[row, offset + positions] = image_cursor * n_latents + np.arange(
                    len(positions)
                )
                image_cursor += image_counts[row]

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


@register_model("idefics2-8b")
def idefics2_8b(**kwargs) -> Idefics2:
    """HuggingFaceM4/idefics2-8b (reference: src/models/_idefics2.py:407)."""
    kwargs.setdefault("preset", "idefics2-8b")
    return Idefics2(**kwargs)


@register_model("idefics2-tiny")
def idefics2_tiny(**kwargs) -> Idefics2:
    """Miniature Idefics2 for CPU tests."""
    kwargs.setdefault("preset", "idefics2-tiny")
    return Idefics2(**kwargs)
