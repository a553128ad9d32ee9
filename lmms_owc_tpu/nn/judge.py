"""Llama-3.2 judge model on the JAX decoder stack.

Replaces the reference's torch text-generation pipeline judge
(src/data/pipelines/text/_text.py:211-332): greedy decoding, 16 new tokens, chat
template applied per prompt. Prompts are batched and LEFT-padded to length buckets so
one compiled program serves each bucket.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from lmms_owc_tpu.utils import get_logger, pad_to_bucket

log = get_logger(__name__)

__all__ = ["JudgeModel", "resolve_judge_weights"]

JUDGE_MODEL_ID = "meta-llama/Llama-3.2-3B-Instruct"
MAX_NEW_TOKENS = 16


def resolve_judge_weights() -> str | None:
    env_path = os.environ.get("LMMS_OWC_JUDGE_PATH")
    if env_path and Path(env_path).exists():
        return env_path
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(JUDGE_MODEL_ID, local_files_only=True)
    except Exception:
        return None


class JudgeModel:
    """Batched greedy scorer over (prompt -> short verdict) pairs."""

    def __init__(self, params, config, tokenizer, batch_size: int = 64) -> None:
        self.params = params
        self.config = config  # decoder-view Qwen2VLConfig
        self.tokenizer = tokenizer
        self.batch_size = batch_size

    @classmethod
    def from_pretrained(cls, path: str, dtype=None) -> "JudgeModel":
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from lmms_owc_tpu.nn.llama import convert_hf_llama_weights, llama_config_from_hf
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        llama_config = llama_config_from_hf(load_config_json(path))
        state = load_safetensors_state(path)
        params = convert_hf_llama_weights(state, llama_config, dtype or jnp.bfloat16)
        del state
        tokenizer = AutoTokenizer.from_pretrained(path)
        log.info("loaded judge model from %s", path)
        return cls(params, llama_config.to_decoder_config(), tokenizer)

    def _generate(self, prompts: list[str]) -> list[str]:
        import jax.numpy as jnp

        from lmms_owc_tpu.nn.llama import greedy_generate, llama_positions

        outputs: list[str] = []
        eos_ids = [self.tokenizer.eos_token_id]
        for tok in ("<|eot_id|>",):
            tok_id = self.tokenizer.convert_tokens_to_ids(tok)
            if tok_id is not None and tok_id >= 0:
                eos_ids.append(tok_id)
        eos_ids = sorted(set(int(e) for e in eos_ids if e is not None))

        for start in range(0, len(prompts), self.batch_size):
            chunk = prompts[start : start + self.batch_size]
            rendered = [
                self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": prompt}],
                    tokenize=False,
                    add_generation_prompt=True,
                )
                for prompt in chunk
            ]
            encoded = [self.tokenizer.encode(text, add_special_tokens=False) for text in rendered]
            max_len = max(len(ids) for ids in encoded)
            bucket = pad_to_bucket(max_len)
            pad_id = self.config.pad_token_id

            input_ids = np.full((len(chunk), bucket), pad_id, np.int64)
            mask = np.zeros((len(chunk), bucket), np.int64)
            for row, ids in enumerate(encoded):
                input_ids[row, bucket - len(ids) :] = ids
                mask[row, bucket - len(ids) :] = 1

            position_ids, next_pos = llama_positions(mask)
            embeds = jnp.take(self.params["embed_tokens"], jnp.asarray(input_ids), axis=0)
            tokens = greedy_generate(
                self.params,
                embeds,
                jnp.asarray(position_ids),
                jnp.asarray(mask.astype(np.int32)),
                jnp.asarray(next_pos.astype(np.int32)),
                self.config,
                max_new_tokens=MAX_NEW_TOKENS,
                cache_len=bucket + 64,
                eos_ids=jnp.asarray(eos_ids, jnp.int32),
            )
            tokens = np.asarray(tokens)
            stop = set(eos_ids) | {pad_id}
            for row in range(len(chunk)):
                ids = []
                for tok in tokens[row]:
                    if int(tok) in stop:
                        break
                    ids.append(int(tok))
                outputs.append(self.tokenizer.decode(ids, skip_special_tokens=True).strip())
        return outputs

    def score_pairs(self, prompts: list[str], predictions, references) -> list[str]:
        return self._generate(prompts)

    def score_triplets(self, prompts: list[str], a, b, references) -> list[str]:
        return self._generate(prompts)
