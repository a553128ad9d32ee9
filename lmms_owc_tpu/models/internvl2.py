"""InternVL2/2.5/3 model adapter: dynamic tiling + InternViT + Qwen2/Llama decoder.

Functional parity with reference src/models/_internvl2.py: dynamic aspect-ratio
preprocessing into <=max_num 448px tiles plus a thumbnail (:115-181), ImageNet
normalization (:46-74), and chat-style generation — re-architected so tiles across a
whole macro batch run through one batched vision-tower program, and the decoder runs
the shared batched KV-cache generation loop. Checkpoints: the HF "-hf" ports
(e.g. OpenGVLab/InternVL2_5-2B-hf) with native transformers configs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["InternVL2"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
DEFAULT_MAX_NEW_TOKENS = 128

PRESET_CONFIGS = {
    # Qwen2-1.5B backbone (InternVL2-2B-class).
    "internvl2-2b": dict(
        text_config=dict(
            model_type="qwen2", vocab_size=151674, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
            rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=448, patch_size=14,
        ),
        image_token_id=151667,
    ),
    "internvl2-tiny": dict(
        text_config=dict(
            model_type="qwen2", vocab_size=151674, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        image_token_id=151667,
    ),
}

_IM_START = "<|im_start|>"
_IM_END = "<|im_end|>"
_IMG_START = "<img>"
_IMG_END = "</img>"
_IMG_CONTEXT = "<IMG_CONTEXT>"


def find_closest_aspect_ratio(aspect_ratio, target_ratios, width, height, image_size):
    """Pick the tiling grid whose aspect ratio best matches the image (ties broken by area)."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff and area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
            best = ratio
    return best


def dynamic_preprocess(image, min_num=1, max_num=6, image_size=448, use_thumbnail=True):
    """Split an image into <=max_num equally-sized square tiles (+ optional thumbnail)."""
    width, height = image.size
    aspect_ratio = width / height
    target_ratios = sorted(
        {
            (i, j)
            for n in range(min_num, max_num + 1)
            for i in range(1, n + 1)
            for j in range(1, n + 1)
            if min_num <= i * j <= max_num
        },
        key=lambda x: x[0] * x[1],
    )
    ratio = find_closest_aspect_ratio(aspect_ratio, target_ratios, width, height, image_size)
    target_w, target_h = image_size * ratio[0], image_size * ratio[1]
    blocks = ratio[0] * ratio[1]
    resized = image.resize((target_w, target_h))
    cols = target_w // image_size
    tiles = []
    for i in range(blocks):
        box = (
            (i % cols) * image_size,
            (i // cols) * image_size,
            ((i % cols) + 1) * image_size,
            ((i // cols) + 1) * image_size,
        )
        tiles.append(resized.crop(box))
    if use_thumbnail and len(tiles) != 1:
        tiles.append(image.resize((image_size, image_size)))
    return tiles


class _FallbackInternVLTokenizer:
    eos_token_id = 151645
    pad_token_id = 151643

    def __init__(self, image_token_id: int) -> None:
        self.image_token_id = image_token_id
        self._special = {
            _IM_START: 151644, _IM_END: 151645, _IMG_START: 151665,
            _IMG_END: 151666, _IMG_CONTEXT: image_token_id,
        }

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


class InternVL2(Model):
    """InternVL2 family on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "internvl2-2b",
        max_tiles: int = 6,
        random_init: bool = False,
        model_parallel: int = 1,
        use_mesh: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.max_tiles = int(max_tiles)
        self.random_init = random_init or pretrained is None
        self.model_parallel = int(model_parallel)
        self.use_mesh = use_mesh or self.model_parallel > 1
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    def load_model(self) -> None:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import internvl as iv
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            self.config = iv.internvl_config_from_hf(load_config_json(self.pretrained))
            state = load_safetensors_state(self.pretrained)
            self.params = iv.convert_hf_internvl_weights(state, self.config, dtype)
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["internvl2-2b"])
            self.config = iv.internvl_config_from_hf(dict(preset))
            self.params = iv.init_internvl_params(
                jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
            )
            self.tokenizer = _FallbackInternVLTokenizer(self.config.image_token_id)
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        self.decoder_config = dataclasses.replace(
            self.config.text.to_decoder_config(),
            image_token_id=self.config.image_token_id,
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
        eos = getattr(self.tokenizer, "eos_token_id", 151645)
        return sorted({int(eos), 151645})

    @property
    def tokenizer_name(self) -> str:
        return f"internvl_{self.preset}"

    @property
    def chat_template(self) -> str:
        return "internvl2"

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = [f"{_IM_START}system\n你是书生·万象, 一个多模态大模型。{_IM_END}\n"]
        for msg in messages:
            parts.append(f"{_IM_START}{msg['role']}\n{msg['content']}{_IM_END}\n")
        parts.append(f"{_IM_START}assistant\n")
        return "".join(parts)

    def _build_prompt(self, context: str, tile_counts: list[int]) -> str:
        tokens_per_tile = self.config.tokens_per_tile
        image_blocks = "".join(
            f"{_IMG_START}{_IMG_CONTEXT * (tokens_per_tile * n)}{_IMG_END}\n"
            for n in tile_counts
        )
        return (
            f"{_IM_START}system\nYou are a helpful assistant.{_IM_END}\n"
            f"{_IM_START}user\n{image_blocks}{context}{_IM_END}\n"
            f"{_IM_START}assistant\n"
        )

    # ------------------------------------------------------------ preprocessing

    def _tile_images(self, visuals: list) -> tuple[np.ndarray | None, list[int]]:
        """All images -> stacked normalized tiles [N_tiles, 3, S, S] + tiles-per-image."""
        if not visuals:
            return None, []
        size = self.config.vision.image_size
        tile_counts = []
        arrays = []
        for image in visuals:
            tiles = dynamic_preprocess(
                image.convert("RGB"), max_num=self.max_tiles, image_size=size, use_thumbnail=True
            )
            tile_counts.append(len(tiles))
            for tile in tiles:
                arr = np.asarray(tile.resize((size, size))).astype(np.float32) / 255.0
                arr = (arr - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
                arrays.append(arr.transpose(2, 0, 1))
        return np.stack(arrays), tile_counts

    # ------------------------------------------------------------- generation

    def generate_until(self, requests) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import internvl as iv
        from lmms_owc_tpu.nn import llama as L
        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds

        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        def prepare(chunk):
            """Host preprocessing + batched vision encode for one chunk.

            Runs on a helper thread so chunk k+1's tiling/tokenizing/ViT dispatch
            overlaps chunk k's decode loop (pipelined like the flagship adapter).
            """
            # Collect all tiles across the chunk, encode in one program.
            rows = []
            all_tiles = []
            tile_cursor = 0
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
                tiles, tile_counts = self._tile_images(visuals)
                ids = self.tokenizer.encode(self._build_prompt(ctx, tile_counts))
                n_tiles = sum(tile_counts)
                rows.append((ids, tile_cursor, n_tiles))
                tile_cursor += n_tiles
                if tiles is not None:
                    all_tiles.append(tiles)

            vision_flat = None
            if all_tiles:
                stacked = np.concatenate(all_tiles)
                param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
                vision = iv.encode_tiles(
                    self.params, jnp.asarray(stacked, param_dtype), self.config
                )  # [N_tiles, tokens_per_tile, H]
                vision_flat = vision.reshape(-1, vision.shape[-1])

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids, _, _ in rows))
            pad_id = self.decoder_config.pad_token_id
            tokens_per_tile = self.config.tokens_per_tile
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            for row, (ids, tile_off, n_tiles) in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
                index_map[row, offset + positions] = tile_off * tokens_per_tile + np.arange(
                    len(positions)
                )

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

        Capability superset — the reference's InternVL2 adapter has no
        loglikelihood (src/models/_internvl2.py); contract matches
        src/models/_llava_hf.py:169-260 (continuation mean CE + greedy match).
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import internvl as iv
        from lmms_owc_tpu.nn import llama as L

        results: list[tuple[float, bool]] = []
        tokens_per_tile = self.config.tokens_per_tile
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            rows, all_tiles, tile_cursor = [], [], 0
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                tiles, tile_counts = self._tile_images(visuals)
                prompt = self._build_prompt(ctx, tile_counts)
                ctx_ids = self.tokenizer.encode(prompt)
                cont_ids = self._encode_continuation(continuation)
                n_tiles = sum(tile_counts)
                rows.append((ctx_ids + cont_ids, len(cont_ids), tile_cursor))
                tile_cursor += n_tiles
                if tiles is not None:
                    all_tiles.append(tiles)

            vision_flat = None
            if all_tiles:
                stacked = np.concatenate(all_tiles)
                param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
                vision = iv.encode_tiles(self.params, jnp.asarray(stacked, param_dtype), self.config)
                vision_flat = vision.reshape(-1, vision.shape[-1])

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids, _, _ in rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            for row, (ids, n_cont, tile_off) in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                target_ids[row, offset : bucket - 1] = ids[1:]
                target_mask[row, bucket - 1 - n_cont : bucket - 1] = 1
                positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
                index_map[row, offset + positions] = tile_off * tokens_per_tile + np.arange(
                    len(positions)
                )

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


@register_model("internvl2-1b")
def internvl2_1b(**kwargs) -> InternVL2:
    """InternVL2-1B (Qwen2-0.5B backbone). Reference: src/models/_internvl2.py:579-674."""
    kwargs.setdefault("preset", "internvl2-2b")
    return InternVL2(**kwargs)


@register_model("internvl2-2b")
def internvl2_2b(**kwargs) -> InternVL2:
    """InternVL2-2B (Qwen2-1.5B backbone)."""
    kwargs.setdefault("preset", "internvl2-2b")
    return InternVL2(**kwargs)


@register_model("internvl2-4b", "internvl2-8b", "internvl2-26b", "internvl2-40b")
def internvl2_large(**kwargs) -> InternVL2:
    """Larger InternVL2 variants; architecture resolved from the checkpoint config."""
    kwargs.setdefault("preset", "internvl2-2b")
    return InternVL2(**kwargs)


@register_model(
    "internvl2.5-1b", "internvl2.5-2b", "internvl2.5-4b", "internvl2.5-8b",
    "internvl2.5-26b", "internvl2.5-38b",
)
def internvl25(**kwargs) -> InternVL2:
    """InternVL2.5 variants (HF "-hf" ports); architecture from the checkpoint config."""
    kwargs.setdefault("preset", "internvl2-2b")
    return InternVL2(**kwargs)


@register_model("internvl2-tiny")
def internvl2_tiny(**kwargs) -> InternVL2:
    """Miniature InternVL2 for CPU tests."""
    kwargs.setdefault("preset", "internvl2-tiny")
    return InternVL2(**kwargs)
