"""Phi-3-Vision model adapter (phi3v).

Functional parity with reference src/models/_phi3v.py (registered at :470,
``<|image_1|>`` placeholder chat format :85-107): CLIP ViT-L/14-336 tower, 2x2
feature concat + GELU projection with row separators, Phi-3-mini decoder (fused
qkv/gate_up weights split at load, longrope scaling).

HD multi-crop transform: the published Phi-3-vision preprocessing (transpose-if-
portrait, scale to the largest hd_num-bounded 336 multiple, white-pad height to a
336 multiple, tile into 336px crops + a global 336 view; features assembled as
[sub rows + sub_GN per row, glb_GN, global rows + sub_GN per row]). The reference
loads this via trust_remote_code so there is no local torch implementation to
diff against; the layout here follows the released processing_phi3_v.py algorithm
and is validated structurally (token-count formula (h*w+1)*144 + 12*(h+1) + 1).
``num_crops=0`` selects the simpler global-crop-only mode.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["Phi3v"]

DEFAULT_MAX_NEW_TOKENS = 128
IMAGE_TOKEN_ID = 32044  # <|image_1|> placeholder id space starts at 32044 in phi3v

PRESET_CONFIGS = {
    "phi3v": dict(
        text_config=dict(
            model_type="phi3", vocab_size=32064, hidden_size=3072, intermediate_size=8192,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
            max_position_embeddings=131072, original_max_position_embeddings=4096,
        ),
        vision_config=dict(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, image_size=336, patch_size=14,
        ),
    ),
    "phi3v-tiny": dict(
        text_config=dict(
            model_type="phi3", vocab_size=32064, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=True,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
    ),
}


def split_phi3_fused_weights(state: dict) -> dict:
    """Split Phi-3's fused qkv_proj / gate_up_proj tensors into q/k/v and gate/up."""
    out = dict(state)
    for name in list(state):
        if name.endswith("self_attn.qkv_proj.weight"):
            w = np.asarray(state[name])
            n = w.shape[0] // 3
            base = name.replace("qkv_proj", "{}")
            out[base.format("q_proj")] = w[:n]
            out[base.format("k_proj")] = w[n : 2 * n]
            out[base.format("v_proj")] = w[2 * n :]
            del out[name]
        elif name.endswith("mlp.gate_up_proj.weight"):
            w = np.asarray(state[name])
            n = w.shape[0] // 2
            base = name.replace("gate_up_proj", "{}")
            out[base.format("gate_proj")] = w[:n]
            out[base.format("up_proj")] = w[n:]
            del out[name]
    return out


class _FallbackPhi3Tokenizer:
    eos_token_id = 32000  # <|end|>
    pad_token_id = 32000

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib
        import re

        ids = [1] if add_special_tokens else []
        pos = 0
        for match in re.finditer(r"<\|image_\d+\|>|<\|user\|>|<\|assistant\|>|<\|end\|>", text):
            for word in text[pos : match.start()].split():
                ids.append(100 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 31000)
            tok = match.group()
            if tok.startswith("<|image_"):
                ids.append(IMAGE_TOKEN_ID)
            elif tok == "<|user|>":
                ids.append(32010)
            elif tok == "<|assistant|>":
                ids.append(32001)
            else:
                ids.append(32000)
            pos = match.end()
        for word in text[pos:].split():
            ids.append(100 + int.from_bytes(hashlib.md5(word.encode()).digest()[:3], "little") % 31000)
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids if int(i) < 32000)


class Phi3v(Model):
    """Phi-3-Vision on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "phi3v",
        num_crops: int = 16,
        random_init: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.num_crops = int(num_crops)
        self.random_init = random_init or pretrained is None
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    def load_model(self) -> None:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn.clip import (
            ClipVisionConfig,
            convert_hf_clip_weights,
            init_clip_vision_params,
        )
        from lmms_owc_tpu.nn.llama import llama_config_from_hf
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state
        from lmms_owc_tpu.nn.qwen2_vl import convert_hf_decoder_weights, init_decoder_params

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            cfg = load_config_json(self.pretrained)
            text_cfg = cfg if "hidden_size" in cfg else cfg.get("text_config", cfg)
            self.text_config = llama_config_from_hf(text_cfg)
            # Released Phi-3-vision checkpoints keep the CLIP tower config in
            # remote code, not config.json — default to CLIP-L/336. A checkpoint
            # that does carry a vision_config (e.g. miniature test fixtures)
            # overrides it.
            vis = cfg.get("vision_config") or dict(
                hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
                intermediate_size=4096, image_size=336, patch_size=14)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = dict(PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["phi3v"]))
            self.text_config = llama_config_from_hf(preset["text_config"])
            vis = preset["vision_config"]

        self.vision_config = ClipVisionConfig(
            hidden_size=vis["hidden_size"],
            num_layers=vis["num_hidden_layers"],
            num_heads=vis["num_attention_heads"],
            intermediate_size=vis["intermediate_size"],
            image_size=vis["image_size"],
            patch_size=vis["patch_size"],
        )
        self.decoder_config = self.text_config.to_decoder_config()
        h = self.text_config.hidden_size
        merge_dim = self.vision_config.hidden_size * 4  # 2x2 feature concat

        if self.pretrained is not None and Path(self.pretrained).exists():
            state = split_phi3_fused_weights(load_safetensors_state(self.pretrained))
            clip_tree = convert_hf_clip_weights(
                state, self.vision_config, None, dtype,
                prefix="model.vision_embed_tokens.img_processor.",
            )
            def t(name):
                return jnp.asarray(np.asarray(state[name]).T, dtype)

            def raw(name):
                return jnp.asarray(np.asarray(state[name]), dtype)

            self.params = {
                "text": convert_hf_decoder_weights(state, self.decoder_config, dtype, attn_bias=False),
                "vision": clip_tree["vision"],
                "projector": {
                    "fc1": {"w": t("model.vision_embed_tokens.img_projection.0.weight"),
                            "b": raw("model.vision_embed_tokens.img_projection.0.bias")},
                    "fc2": {"w": t("model.vision_embed_tokens.img_projection.2.weight"),
                            "b": raw("model.vision_embed_tokens.img_projection.2.bias")},
                },
                "sub_gn": raw("model.vision_embed_tokens.sub_GN").reshape(-1),
                "glb_gn": raw("model.vision_embed_tokens.glb_GN").reshape(-1),
            }
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            keys = jax.random.split(jax.random.PRNGKey(self.jax_random_seed), 4)
            self.params = {
                "text": init_decoder_params(keys[0], self.decoder_config, dtype, attn_bias=False),
                "vision": init_clip_vision_params(keys[1], self.vision_config, dtype),
                "projector": {
                    "fc1": {"w": (jax.random.normal(keys[2], (merge_dim, h)) * 0.02).astype(dtype),
                            "b": jnp.zeros(h, dtype)},
                    "fc2": {"w": (jax.random.normal(keys[3], (h, h)) * 0.02).astype(dtype),
                            "b": jnp.zeros(h, dtype)},
                },
                "sub_gn": jnp.zeros(merge_dim, dtype),
                "glb_gn": jnp.zeros(merge_dim, dtype),
            }
            self.tokenizer = _FallbackPhi3Tokenizer()
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        self._rng = jax.random.PRNGKey(self.jax_random_seed)

    @property
    def eos_token_ids(self) -> list[int]:
        ids = {32000, 32007}  # <|end|>, <|endoftext|>-adjacent specials
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            ids.add(int(eos))
        return sorted(ids)

    @property
    def tokenizer_name(self) -> str:
        return f"phi3v_{self.preset}"

    @property
    def chat_template(self) -> str:
        return "phi3"

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = [f"<|{m['role']}|>\n{m['content']}<|end|>\n" for m in messages]
        parts.append("<|assistant|>\n")
        return "".join(parts)

    def _build_prompt(self, context: str, num_images: int) -> str:
        images = "".join(f"<|image_{i + 1}|>\n" for i in range(num_images))
        return f"<|user|>\n{images}{context}<|end|>\n<|assistant|>\n"

    def _image_token_id(self) -> int:
        return IMAGE_TOKEN_ID

    @staticmethod
    def _to_chw_normalized(img) -> np.ndarray:
        from lmms_owc_tpu.ops.image import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

        arr = np.asarray(img).astype(np.float32) / 255.0
        arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
        return arr.transpose(2, 0, 1)

    @staticmethod
    def _bicubic_resize_tensor(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """torch ``F.interpolate(mode="bicubic", align_corners=False)`` on [C, H, W].

        The published Phi-3-vision processor builds the global view by bicubic-
        interpolating the NORMALIZED TENSOR of the padded HD image (torch
        semantics: cubic convolution a=-0.75, half-pixel centers, border
        replication, no antialias) — not by PIL-resizing the image. Pixel-parity
        with torch is pinned in tests/test_phi3_parity.py.
        """
        a = -0.75

        def axis_weights(in_size: int, out_size: int):
            scale = in_size / out_size
            x = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
            x0 = np.floor(x).astype(np.int64)
            offsets = np.arange(-1, 3)
            idx = x0[None, :] + offsets[:, None]  # [4, out]
            d = np.abs(idx - x[None, :])
            w = np.where(
                d <= 1,
                ((a + 2) * d - (a + 3)) * d * d + 1,
                np.where(d < 2, (((d - 5) * d + 8) * d - 4) * a, 0.0),
            )
            return np.clip(idx, 0, in_size - 1), w.astype(np.float32)

        c, h, w = arr.shape
        idx_h, w_h = axis_weights(h, out_h)
        idx_w, w_w = axis_weights(w, out_w)
        # rows: [C, H, W] -> [C, out_h, W]; then cols -> [C, out_h, out_w].
        rows = np.einsum("kchw,kh->chw", arr[:, idx_h, :].transpose(1, 0, 2, 3), w_h)
        out = np.einsum("kchw,kw->chw", rows[:, :, idx_w].transpose(2, 0, 1, 3), w_w)
        return out.astype(np.float32)

    def _hd_transform(self, image, hd_num: int):
        """Published Phi-3-vision HD transform (processing_phi3_v.py algorithm):
        transpose portrait images, scale width to the largest hd_num-bounded
        multiple of the crop size, white-pad height (centered) to a multiple,
        transpose back."""
        from PIL import Image

        size = self.vision_config.image_size
        img = image.convert("RGB")
        w, h = img.size
        trans = False
        if w < h:
            img = img.transpose(Image.TRANSPOSE)
            trans = True
            w, h = img.size
        ratio = w / h
        scale = 1
        while scale * np.ceil(scale / ratio) <= hd_num:
            scale += 1
        scale -= 1
        new_w = max(int(scale * size), size)
        new_h = max(int(new_w / ratio), 1)
        img = img.resize((new_w, new_h), Image.BICUBIC)
        target_h = int(np.ceil(new_h / size) * size)
        top = (target_h - new_h) // 2
        canvas = Image.new("RGB", (new_w, target_h), (255, 255, 255))
        canvas.paste(img, (0, top))
        if trans:
            canvas = canvas.transpose(Image.TRANSPOSE)
        return canvas

    def _units_2x2(self, feats: np.ndarray) -> np.ndarray:
        """[N, side^2, D] CLIP features -> [N, side/2, side/2, 4D] merged units."""
        side = self.vision_config.image_size // self.vision_config.patch_size
        half = side // 2
        d = feats.shape[-1]
        f = feats.reshape(-1, half, 2, half, 2, d).transpose(0, 1, 3, 2, 4, 5)
        return f.reshape(-1, half, half, 4 * d)

    def _encode_one_image(self, image) -> np.ndarray:
        """HD crops + global view -> CLIP(-2) -> 2x2 concat -> separator layout.

        Sequence layout (reference remote-code semantics): sub-image unit rows with
        a sub_GN at each row end, then glb_GN, then global unit rows with sub_GN
        per row. Token count = (h_crop*w_crop)*half^2 + h_crop*half + 1 + half*(half+1).
        ``num_crops=0``: global view only ([global rows + sub_GN, glb_GN]).
        """
        import jax.numpy as jnp
        from PIL import Image

        from lmms_owc_tpu.nn.clip import clip_vision_forward
        from lmms_owc_tpu.nn.layers import dense, gelu

        size = self.vision_config.image_size
        half = (size // self.vision_config.patch_size) // 2
        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        sub_gn = np.asarray(self.params["sub_gn"], np.float32)
        glb_gn = np.asarray(self.params["glb_gn"], np.float32)

        if self.num_crops <= 0:
            pixels = self._to_chw_normalized(image.convert("RGB").resize((size, size), Image.BICUBIC))[None]
            h_crop = w_crop = 0
        else:
            hd = self._hd_transform(image, self.num_crops)
            w_px, h_px = hd.size
            w_crop, h_crop = w_px // size, h_px // size
            hd_arr = self._to_chw_normalized(hd)
            crops = (
                hd_arr.reshape(3, h_crop, size, w_crop, size)
                .transpose(1, 3, 0, 2, 4)
                .reshape(h_crop * w_crop, 3, size, size)
            )
            # Global view: torch-convention bicubic of the normalized tensor
            # (published processing_phi3_v.py order), NOT a PIL resize of the image.
            glb = self._bicubic_resize_tensor(hd_arr, size, size)
            pixels = np.concatenate([glb[None], crops])

        feats = clip_vision_forward(
            self.params["vision"], jnp.asarray(pixels, param_dtype), self.vision_config,
            feature_layer=-2,
        )[:, 1:, :]  # drop CLS
        units = self._units_2x2(np.asarray(feats, np.float32))
        d4 = units.shape[-1]

        def with_row_separators(grid):  # [R, C, 4D] -> [(R*(C+1)), 4D]
            rows = np.concatenate(
                [grid, np.broadcast_to(sub_gn, (grid.shape[0], 1, d4))], axis=1
            )
            return rows.reshape(-1, d4)

        glb_flat = with_row_separators(units[0])
        if self.num_crops <= 0:
            flat = np.concatenate([glb_flat, glb_gn[None]], axis=0)
        else:
            sub_grid = (
                units[1:]
                .reshape(h_crop, w_crop, half, half, d4)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h_crop * half, w_crop * half, d4)
            )
            flat = np.concatenate([with_row_separators(sub_grid), glb_gn[None], glb_flat], axis=0)

        proj = dense(self.params["projector"]["fc2"],
                     gelu(dense(self.params["projector"]["fc1"], jnp.asarray(flat, param_dtype))))
        return np.asarray(proj, np.float32)

    def generate_until(self, requests) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import llama as L

        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        def prepare(chunk):
            """Host preprocessing + per-image CLIP encode; overlapped with decode."""
            rows = []
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
                features = [self._encode_one_image(img) for img in visuals]
                ids = self.tokenizer.encode(self._build_prompt(ctx, len(visuals)))
                expanded: list[int] = []
                img_idx = 0
                for tok in ids:
                    if tok == self._image_token_id() and img_idx < len(features):
                        expanded.extend([tok] * features[img_idx].shape[0])
                        img_idx += 1
                    else:
                        expanded.append(tok)
                rows.append((expanded, features))

            bsz = len(rows)
            bucket = pad_to_bucket(max(len(ids) for ids, _ in rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            all_features = []
            cursor = 0
            for row, (ids, features) in enumerate(rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                positions = np.where(np.asarray(ids) == self._image_token_id())[0]
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

        Capability superset — the reference's Phi3v adapter has no loglikelihood;
        contract matches src/models/_llava_hf.py:169-260.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import llama as L

        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            rows = []
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                features = [self._encode_one_image(img) for img in visuals]
                prompt = self._build_prompt(ctx, len(visuals))
                ctx_ids = self.tokenizer.encode(prompt)
                cont_ids = self._encode_continuation(continuation)
                expanded: list[int] = []
                img_idx = 0
                for tok in ctx_ids:
                    if tok == self._image_token_id() and img_idx < len(features):
                        expanded.extend([tok] * features[img_idx].shape[0])
                        img_idx += 1
                    else:
                        expanded.append(tok)
                rows.append((expanded + cont_ids, len(cont_ids), features))

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
                positions = np.where(np.asarray(ids) == self._image_token_id())[0]
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


@register_model("phi3v")
def phi3v(**kwargs) -> Phi3v:
    """microsoft/Phi-3-vision-128k-instruct (reference: src/models/_phi3v.py:470)."""
    kwargs.setdefault("preset", "phi3v")
    return Phi3v(**kwargs)


@register_model("phi3v-tiny")
def phi3v_tiny(**kwargs) -> Phi3v:
    """Miniature Phi3v for CPU tests."""
    kwargs.setdefault("preset", "phi3v-tiny")
    return Phi3v(**kwargs)
