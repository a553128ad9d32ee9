"""InstructBLIP model adapter (instructblip-vicuna-7b/13b).

Functional parity with reference src/models/_instructblip.py (registered IDs
:608-622, multi-image handling by drawing order labels and concatenating images into
one canvas :33-110): BLIP 224x224 preprocessing, instruction-aware Q-Former, and
Vicuna decoding on the shared JAX generation loop.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["InstructBlip"]

DEFAULT_MAX_NEW_TOKENS = 128

PRESET_CONFIGS = {
    "instructblip-vicuna-7b": dict(
        vision_config=dict(
            hidden_size=1408, num_hidden_layers=39, num_attention_heads=16,
            intermediate_size=6144, image_size=224, patch_size=14,
        ),
        qformer_config=dict(
            vocab_size=30523, hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, cross_attention_frequency=2, encoder_hidden_size=1408,
        ),
        text_config=dict(
            model_type="llama", vocab_size=32001, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        ),
        num_query_tokens=32,
    ),
    "instructblip-tiny": dict(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        qformer_config=dict(
            vocab_size=64, hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, cross_attention_frequency=1, encoder_hidden_size=32,
        ),
        text_config=dict(
            model_type="llama", vocab_size=32001, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        ),
        num_query_tokens=4,
    ),
}


def concatenate_images_with_labels(images: list, gap: int = 8):
    """Combine multiple images into one labeled canvas (reference multi-image trick)."""
    from PIL import Image, ImageDraw

    images = [img.convert("RGB") for img in images]
    height = max(img.height for img in images)
    total_w = sum(img.width for img in images) + gap * (len(images) - 1)
    canvas = Image.new("RGB", (total_w, height), (255, 255, 255))
    x = 0
    draw = ImageDraw.Draw(canvas)
    for i, img in enumerate(images):
        canvas.paste(img, (x, 0))
        draw.text((x + 4, 4), f"({i + 1})", fill=(255, 0, 0))
        x += img.width + gap
    return canvas


class _FallbackBlipTokenizer:
    eos_token_id = 2
    pad_token_id = 0

    def __init__(self, vocab_size: int = 32000) -> None:
        self.vocab_size = vocab_size

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib

        ids = [1] if add_special_tokens else []
        ids += [
            100 + int.from_bytes(hashlib.md5(w.encode()).digest()[:3], "little")
            % (self.vocab_size - 200)
            for w in text.split()
        ]
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids if int(i) > 2)


class InstructBlip(Model):
    """InstructBLIP on the JAX/TPU stack."""

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "instructblip-vicuna-7b",
        random_init: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.random_init = random_init or pretrained is None
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    def load_model(self) -> None:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import instructblip as ib
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]
        if self.pretrained is not None and Path(self.pretrained).exists():
            self.config = ib.instructblip_config_from_hf(load_config_json(self.pretrained))
            state = load_safetensors_state(self.pretrained)
            self.params = ib.convert_hf_instructblip_weights(state, self.config, dtype)
            del state
            from transformers import AutoTokenizer, BertTokenizerFast

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            try:
                self.qformer_tokenizer = BertTokenizerFast.from_pretrained(
                    str(Path(self.pretrained) / "qformer_tokenizer")
                )
            except Exception:
                self.qformer_tokenizer = None
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["instructblip-vicuna-7b"])
            self.config = ib.instructblip_config_from_hf(dict(preset))
            self.params = ib.init_instructblip_params(
                jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
            )
            self.tokenizer = _FallbackBlipTokenizer()
            self.qformer_tokenizer = None
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

        self.decoder_config = self.config.text.to_decoder_config()
        self._rng = jax.random.PRNGKey(self.jax_random_seed)

    @property
    def eos_token_ids(self) -> list[int]:
        eos = getattr(self.tokenizer, "eos_token_id", 2)
        return [int(eos)] if eos is not None else [2]

    @property
    def tokenizer_name(self) -> str:
        return f"instructblip_{self.preset}"

    def apply_chat_template(self, messages: list[dict]) -> str:
        return " ".join(msg["content"] for msg in messages)

    def _qformer_encode(self, text: str) -> list[int]:
        if self.qformer_tokenizer is not None:
            return self.qformer_tokenizer.encode(text, truncation=True, max_length=512)
        import hashlib

        # Vocab-safe fallback: tiny presets have small qformer vocabularies, and
        # an out-of-range id turns into a NaN embedding (JAX gather fill mode).
        vocab = self.config.qformer.vocab_size
        lo = 1000 if vocab > 1200 else 4
        span = max(1, vocab - lo - 2)
        cls_id, sep_id = min(101, vocab - 2), min(102, vocab - 1)
        return [cls_id] + [
            lo + int.from_bytes(hashlib.md5(w.encode()).digest()[:3], "little") % span
            for w in text.split()
        ] + [sep_id]

    def _preprocess(self, visuals: list) -> np.ndarray | None:
        """BLIP preprocessing: plain resize to (S, S) + CLIP normalization."""
        if not visuals:
            return None
        from PIL import Image

        from lmms_owc_tpu.ops.image import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

        if len(visuals) > 1:
            visuals = [concatenate_images_with_labels(visuals)]
        size = self.config.vision.image_size
        img = visuals[0].convert("RGB").resize((size, size), Image.BICUBIC)
        arr = np.asarray(img).astype(np.float32) / 255.0
        arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
        return arr.transpose(2, 0, 1)[None]

    def generate_until(self, requests) -> list[str]:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import instructblip as ib
        from lmms_owc_tpu.nn import llama as L

        collator = Collator(
            [req.args for req in requests],
            sort_fn=lambda args: -len(args[0]),
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        nq = self.config.num_query_tokens

        def prepare(chunk):
            """Host preprocessing + ViT/Q-Former encode; overlapped with decode."""
            pixel_rows, qf_rows, text_rows = [], [], []
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
                pixels = self._preprocess(visuals)
                pixel_rows.append(pixels)
                qf_rows.append(self._qformer_encode(ctx))
                text_rows.append(self.tokenizer.encode(ctx))

            bsz = len(chunk)
            # Q-Former pass (only for rows that have an image).
            size = self.config.vision.image_size
            pixels = np.concatenate(
                [p if p is not None else np.zeros((1, 3, size, size), np.float32) for p in pixel_rows]
            )
            qf_len = pad_to_bucket(max(len(q) for q in qf_rows), (16, 32, 64, 128, 256))
            qf_ids = np.zeros((bsz, qf_len), np.int64)
            qf_mask = np.zeros((bsz, qf_len), np.int64)
            for row, ids in enumerate(qf_rows):
                qf_ids[row, : len(ids)] = ids
                qf_mask[row, : len(ids)] = 1
            query_embeds = ib.encode_image_queries(
                self.params,
                jnp.asarray(pixels, param_dtype),
                jnp.asarray(qf_ids),
                jnp.asarray(qf_mask),
                self.config,
            )  # [B, nq, H]

            bucket = pad_to_bucket(nq + max(len(t) for t in text_rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            query_pos = np.zeros((bsz,), np.int64)
            for row, ids in enumerate(text_rows):
                total = nq + len(ids)
                offset = bucket - total
                query_pos[row] = offset
                # query embeddings occupy [offset, offset+nq); text follows.
                input_ids[row, offset + nq :] = ids
                mask[row, offset:] = 1

            embeds = jnp.take(self.params["text"]["embed_tokens"], jnp.asarray(input_ids), axis=0)
            # Scatter query embeddings: one dynamic_update per row is fine at this
            # scale (nq rows), but do it with a single gather-based select instead.
            index_map = np.full((bsz, bucket), -1, np.int32)
            for row in range(bsz):
                if pixel_rows[row] is not None:
                    index_map[row, query_pos[row] : query_pos[row] + nq] = row * nq + np.arange(nq)
                else:
                    mask[row, query_pos[row] : query_pos[row] + nq] = 0
            from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds

            embeds = _assemble_embeds(
                self.params["text"]["embed_tokens"],
                jnp.asarray(input_ids),
                query_embeds.reshape(-1, query_embeds.shape[-1]),
                jnp.asarray(index_map),
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

        Capability superset — the reference's InstructBLIP adapter has no
        loglikelihood; contract matches src/models/_llava_hf.py:169-260.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds
        from lmms_owc_tpu.nn import instructblip as ib
        from lmms_owc_tpu.nn import llama as L

        param_dtype = self.params["vision"]["patch_embed"]["w"].dtype
        nq = self.config.num_query_tokens
        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            pixel_rows, qf_rows, text_rows, cont_lens = [], [], [], []
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                pixel_rows.append(self._preprocess(visuals))
                qf_rows.append(self._qformer_encode(ctx))
                ctx_ids = self.tokenizer.encode(ctx)
                cont_ids = self._encode_continuation(continuation)
                text_rows.append(ctx_ids + cont_ids)
                cont_lens.append(len(cont_ids))

            bsz = len(batch)
            size = self.config.vision.image_size
            pixels = np.concatenate(
                [p if p is not None else np.zeros((1, 3, size, size), np.float32) for p in pixel_rows]
            )
            qf_len = pad_to_bucket(max(len(q) for q in qf_rows), (16, 32, 64, 128, 256))
            qf_ids = np.zeros((bsz, qf_len), np.int64)
            qf_mask = np.zeros((bsz, qf_len), np.int64)
            for row, ids in enumerate(qf_rows):
                qf_ids[row, : len(ids)] = ids
                qf_mask[row, : len(ids)] = 1
            query_embeds = ib.encode_image_queries(
                self.params, jnp.asarray(pixels, param_dtype),
                jnp.asarray(qf_ids), jnp.asarray(qf_mask), self.config,
            )

            bucket = pad_to_bucket(nq + max(len(t) for t in text_rows))
            pad_id = self.decoder_config.pad_token_id
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            for row, ids in enumerate(text_rows):
                total = nq + len(ids)
                offset = bucket - total
                input_ids[row, offset + nq :] = ids
                mask[row, offset:] = 1
                # Position t predicts token t+1; the last query slot predicts the
                # first text token, so targets start at offset + nq - 1.
                target_ids[row, offset + nq - 1 : bucket - 1] = ids
                target_mask[row, bucket - 1 - cont_lens[row] : bucket - 1] = 1
                if pixel_rows[row] is not None:
                    index_map[row, offset : offset + nq] = row * nq + np.arange(nq)
                else:
                    mask[row, offset : offset + nq] = 0

            embeds = _assemble_embeds(
                self.params["text"]["embed_tokens"],
                jnp.asarray(input_ids),
                query_embeds.reshape(-1, query_embeds.shape[-1]),
                jnp.asarray(index_map),
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


@register_model("instructblip-vicuna-7b")
def instructblip_vicuna_7b(**kwargs) -> InstructBlip:
    """Salesforce/instructblip-vicuna-7b (reference: src/models/_instructblip.py:608-622)."""
    kwargs.setdefault("preset", "instructblip-vicuna-7b")
    return InstructBlip(**kwargs)


@register_model("instructblip-vicuna-13b")
def instructblip_vicuna_13b(**kwargs) -> InstructBlip:
    """Salesforce/instructblip-vicuna-13b."""
    kwargs.setdefault("preset", "instructblip-vicuna-7b")
    return InstructBlip(**kwargs)


@register_model("instructblip-tiny")
def instructblip_tiny(**kwargs) -> InstructBlip:
    """Miniature InstructBLIP for CPU tests."""
    kwargs.setdefault("preset", "instructblip-tiny")
    return InstructBlip(**kwargs)
