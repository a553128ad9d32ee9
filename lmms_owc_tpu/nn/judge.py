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

# Architecture of the released judge checkpoint (config.json of Llama-3.2-3B).
LLAMA32_3B_CONFIG = dict(
    vocab_size=128256, hidden_size=3072, num_hidden_layers=28, num_attention_heads=24,
    num_key_value_heads=8, intermediate_size=8192, rope_theta=500000.0,
    rms_norm_eps=1e-5, max_position_embeddings=131072, tie_word_embeddings=True,
    eos_token_id=128009, pad_token_id=128004,
    rope_scaling={"rope_type": "llama3", "factor": 32.0, "low_freq_factor": 1.0,
                  "high_freq_factor": 4.0, "original_max_position_embeddings": 8192},
)


class _FallbackJudgeTokenizer:
    """Hash tokenizer + trivial chat template for random-init benchmarking."""

    eos_token_id = 128009
    pad_token_id = 128004

    def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=True):
        text = "".join(f"<|{m['role']}|>\n{m['content']}\n" for m in messages)
        return text + ("<|assistant|>\n" if add_generation_prompt else "")

    def convert_tokens_to_ids(self, token):
        return None

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        import hashlib

        return [
            100 + int.from_bytes(hashlib.md5(w.encode()).digest()[:3], "little") % 128000
            for w in text.split()
        ]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return " ".join(f"tok{int(i)}" for i in ids)


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
    """Batched greedy scorer over (prompt -> short verdict) pairs.

    With more than one local device, scoring is data-parallel over a ``("data",)``
    mesh: params are replicated, each padded batch is sharded along rows, and the
    jitted generate partitions automatically. TPU-native equivalent of the
    reference's per-GPU judge replicas (reference eval_ranking.py:173-190,
    ``datasets.map(..., with_rank=True)`` one judge per CUDA device).
    """

    def __init__(
        self, params, config, tokenizer, batch_size: int = 64, data_parallel: bool = True
    ) -> None:
        from lmms_owc_tpu.nn.qwen2_vl import maybe_merge_decoder_qkv

        # Judge scoring is decode-dominated (16 new tokens per pair), so the
        # load-time qkv merge applies here too when enabled (replicates fine
        # under the data mesh — the merge changes leaf shapes, not sharding).
        self.params = maybe_merge_decoder_qkv(params)
        self.config = config  # decoder-view Qwen2VLConfig
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.mesh = None
        if data_parallel:
            import jax

            n = jax.local_device_count()
            if n > 1:
                from jax.sharding import Mesh, NamedSharding, PartitionSpec

                self.mesh = Mesh(np.array(jax.local_devices()), ("data",))
                replicated = NamedSharding(self.mesh, PartitionSpec())
                self.params = jax.device_put(self.params, replicated)
                log.info("judge: data-parallel over %d local devices", n)

    def _place_rows(self, arr, batch_axis: int = 0):
        """Shard a host array over the data mesh along its batch axis (no-op on
        one device). position_ids are mrope-shaped [3, B, L] -> batch_axis=1."""
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec(*([None] * batch_axis + ["data"]))
        return jax.device_put(jnp.asarray(arr), NamedSharding(self.mesh, spec))

    @classmethod
    def from_pretrained(
        cls, path: str, dtype=None, data_parallel: bool = True, load_in_8bit: bool = False
    ) -> "JudgeModel":
        """Load a judge checkpoint; ``load_in_8bit`` streams the host-side tree
        to the device with linear weights quantized (judge scoring is
        decode-dominated, so the per-step weight read is the roofline — int8
        halves it; the reference likewise serves its judge quantized via
        bitsandbytes)."""
        import jax
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from lmms_owc_tpu.nn.llama import convert_hf_llama_weights, llama_config_from_hf
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        llama_config = llama_config_from_hf(load_config_json(path))
        state = load_safetensors_state(path)
        if load_in_8bit:
            from lmms_owc_tpu.ops.quant import stream_quantize_to_device

            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                params = convert_hf_llama_weights(state, llama_config, dtype or jnp.bfloat16)
            params = stream_quantize_to_device(params, bits=8)
        else:
            params = convert_hf_llama_weights(state, llama_config, dtype or jnp.bfloat16)
        del state
        tokenizer = AutoTokenizer.from_pretrained(path)
        log.info("loaded judge model from %s%s", path, " (int8)" if load_in_8bit else "")
        return cls(params, llama_config.to_decoder_config(), tokenizer, data_parallel=data_parallel)

    @classmethod
    def random_init(
        cls, seed: int = 0, dtype=None, data_parallel: bool = True, load_in_8bit: bool = False
    ) -> "JudgeModel":
        """Judge-architecture model with random weights (benchmarking without
        checkpoints — identical FLOPs/memory traffic to the real judge)."""
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn.llama import init_llama_params, llama_config_from_hf

        config = llama_config_from_hf(dict(LLAMA32_3B_CONFIG))
        if load_in_8bit:
            # Generate + quantize every tensor directly on device: the bf16
            # 3B tree (~6.4 GB) and the int8 tree never coexist. init-then-
            # quantize OOM'd a 16 GB v5e here (bf16 tree + int8 tree + the
            # f32 init transients), same lesson as the 7B flagship.
            from lmms_owc_tpu.ops.quant import init_quantized_on_device

            spec = jax.eval_shape(
                lambda: init_llama_params(
                    jax.random.PRNGKey(0), config, dtype or jnp.bfloat16
                )
            )
            params = init_quantized_on_device(spec, seed, dtype=dtype or jnp.bfloat16)
        else:
            params = init_llama_params(
                jax.random.PRNGKey(seed), config, dtype or jnp.bfloat16
            )
        return cls(params, config.to_decoder_config(), _FallbackJudgeTokenizer(),
                   data_parallel=data_parallel)

    def _prepare_chunk_np(self, chunk: list[str]) -> tuple:
        """Host side of one scoring chunk as numpy: chat-template render,
        tokenize, left-pad to a length bucket."""
        from lmms_owc_tpu.nn.llama import llama_positions

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

        # Pad the row count to a multiple of the data mesh (duplicate rows are
        # sliced off after generation).
        n_rows = len(chunk)
        if self.mesh is not None:
            per = self.mesh.devices.size
            n_rows = -(-n_rows // per) * per
        input_ids = np.full((n_rows, bucket), pad_id, np.int64)
        mask = np.zeros((n_rows, bucket), np.int64)
        for row in range(n_rows):
            ids = encoded[min(row, len(chunk) - 1)]
            input_ids[row, bucket - len(ids) :] = ids
            mask[row, bucket - len(ids) :] = 1

        position_ids, next_pos = llama_positions(mask)
        return bucket, input_ids, position_ids, mask, next_pos

    def _prepare_chunk(self, chunk: list[str]) -> tuple:
        """Host prep + device uploads for the unpooled path."""
        bucket, input_ids, position_ids, mask, next_pos = self._prepare_chunk_np(chunk)
        # device_put dispatches are async: the NEXT chunk's uploads ride the
        # link while the current chunk decodes (foreach_chunk_pipelined).
        return (
            bucket,
            self._place_rows(input_ids),
            self._place_rows(position_ids, batch_axis=position_ids.ndim - 2),
            self._place_rows(mask.astype(np.int32)),
            self._place_rows(next_pos.astype(np.int32)),
        )

    def _eos_and_stop(self) -> tuple[list[int], set[int]]:
        eos_ids = [self.tokenizer.eos_token_id]
        for tok in ("<|eot_id|>",):
            tok_id = self.tokenizer.convert_tokens_to_ids(tok)
            if tok_id is not None and tok_id >= 0:
                eos_ids.append(tok_id)
        eos_ids = sorted(set(int(e) for e in eos_ids if e is not None))
        return eos_ids, set(eos_ids) | {self.config.pad_token_id}

    def _decode_rows(self, tokens: np.ndarray, n_rows: int, stop: set[int]) -> list[str]:
        outputs = []
        for row in range(n_rows):
            ids = []
            for tok in tokens[row]:
                if int(tok) in stop:
                    break
                ids.append(int(tok))
            outputs.append(self.tokenizer.decode(ids, skip_special_tokens=True).strip())
        return outputs

    def _generate_pooled(self, prompts: list[str], pool_n: int) -> list[str]:
        """Decode-pool judge serving: prefill each chunk at its own (batch,
        bucket) shape, then decode ``pool_n`` chunks' rows as ONE batch.

        Same decoupling as the flagship's LMMS_OWC_DECODE_POOL serving
        (models/qwen2_vl.py _run_pooled): judge decode is 16 short steps whose
        roofline is the per-step weight read (~3.2 GB at int8 3B), so pooling
        rows amortizes it. Pool caches are preallocated and each chunk's
        prefill KV is written in place (donated), peak = pool + one chunk.
        Single-device path only — the data-parallel mesh shards rows per
        chunk already and keeps the unpooled path.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.utils import foreach_chunk_pipelined

        eos_ids, stop = self._eos_and_stop()
        eos_arr = jnp.asarray(eos_ids, jnp.int32)

        chunks = [
            prompts[start : start + self.batch_size]
            for start in range(0, len(prompts), self.batch_size)
        ]
        pools = [chunks[i : i + pool_n] for i in range(0, len(chunks), pool_n)]

        def prepare(pool: list[list[str]]) -> list[tuple]:
            return [self._prepare_chunk_np(c) for c in pool]

        def run(pool: list[list[str]], prepared: list[tuple]) -> list[str]:
            l_max = max(p[0] for p in prepared)
            # Tight decode headroom: 16 new tokens need 16 cache slots, not
            # pad_to_bucket(16)=128 — at batch 256 x pool 2 the slack alone was
            # ~4 GB of pooled bf16 KV (the r5 pool-A/B RESOURCE_EXHAUSTED).
            # 32-aligned keeps the token (sublane) axis tile-friendly; decode
            # attention at these lengths takes the XLA path regardless.
            cache_len = l_max + MAX_NEW_TOKENS
            cache_len += (-cache_len) % 32
            kv_int8 = qvl.kv_cache_int8_enabled()
            total_rows = sum(p[1].shape[0] for p in prepared)
            kv_mask_np = np.zeros((total_rows, cache_len), np.int32)
            cache_k = cache_v = scale_k = scale_v = None
            logits_all, next_all = [], []
            row_offset = 0
            for bucket, input_ids, position_ids, mask, next_pos in prepared:
                embeds = jnp.take(
                    self.params["embed_tokens"], jnp.asarray(input_ids), axis=0
                )
                logits, ks, vs = qvl.prefill_logits(
                    self.params,
                    embeds,
                    jnp.asarray(position_ids),
                    jnp.asarray(mask.astype(np.int32)),
                    self.config,
                )
                if cache_k is None:
                    shape = (ks.shape[0], total_rows, ks.shape[2], cache_len, ks.shape[4])
                    if kv_int8:
                        cache_k = jnp.zeros(shape, jnp.int8)
                        cache_v = jnp.zeros(shape, jnp.int8)
                        sshape = (shape[0], shape[1], shape[2], 8, cache_len)
                        scale_k = jnp.zeros(sshape, jnp.float32)
                        scale_v = jnp.zeros(sshape, jnp.float32)
                    else:
                        cache_k = jnp.zeros(shape, ks.dtype)
                        cache_v = jnp.zeros(shape, vs.dtype)
                front = l_max - bucket
                row_off = jnp.asarray(row_offset, jnp.int32)
                front_off = jnp.asarray(front, jnp.int32)
                if kv_int8:
                    # Quantize BEFORE the pool write: the bf16 pool never
                    # exists (peak = int8 pool + one bf16 chunk).
                    kq, vq, sk, sv = qvl.quantize_kv_cache(ks, vs)
                    del ks, vs
                    cache_k, cache_v = qvl.write_pool_chunk(
                        cache_k, cache_v, kq, vq, row_off, front_off
                    )
                    scale_k, scale_v = qvl.write_pool_scales(
                        scale_k, scale_v, sk, sv, row_off, front_off
                    )
                else:
                    cache_k, cache_v = qvl.write_pool_chunk(
                        cache_k, cache_v, ks, vs, row_off, front_off
                    )
                n_rows = mask.shape[0]
                kv_mask_np[row_offset : row_offset + n_rows, front : front + bucket] = mask
                logits_all.append(logits)
                next_all.append(next_pos.astype(np.int32))
                row_offset += n_rows

            tokens, _ = qvl.decode_pool(
                self.params,
                (cache_k, cache_v, scale_k, scale_v) if kv_int8 else (cache_k, cache_v),
                jnp.concatenate(logits_all, axis=0),
                jnp.asarray(kv_mask_np),
                jnp.asarray(np.concatenate(next_all), jnp.int32),
                self.config,
                max_new_tokens=MAX_NEW_TOKENS,
                prompt_len=l_max,
                eos_ids=eos_arr,
            )
            tokens_np = np.asarray(tokens)
            outputs: list[str] = []
            row_offset = 0
            for chunk in pool:
                outputs.extend(
                    self._decode_rows(tokens_np[row_offset:], len(chunk), stop)
                )
                row_offset += len(chunk)
            return outputs

        return foreach_chunk_pipelined(pools, prepare, run)

    def _generate(self, prompts: list[str]) -> list[str]:
        import jax.numpy as jnp

        from lmms_owc_tpu.nn.llama import greedy_generate
        from lmms_owc_tpu.utils import foreach_chunk_pipelined

        pool_n = int(os.environ.get("LMMS_OWC_JUDGE_DECODE_POOL", "0") or 0)
        if pool_n > 1 and self.mesh is None:
            return self._generate_pooled(prompts, pool_n)

        eos_ids, stop = self._eos_and_stop()

        def run(chunk: list[str], prepared: tuple) -> list[str]:
            bucket, input_ids, position_ids, mask, next_pos = prepared
            embeds = jnp.take(self.params["embed_tokens"], input_ids, axis=0)
            tokens = greedy_generate(
                self.params,
                embeds,
                position_ids,
                mask,
                next_pos,
                self.config,
                max_new_tokens=MAX_NEW_TOKENS,
                cache_len=bucket + 64,
                eos_ids=jnp.asarray(eos_ids, jnp.int32),
            )
            return self._decode_rows(np.asarray(tokens), len(chunk), stop)

        chunks = [
            prompts[start : start + self.batch_size]
            for start in range(0, len(prompts), self.batch_size)
        ]
        return foreach_chunk_pipelined(chunks, self._prepare_chunk, run)

    def score_pairs(self, prompts: list[str], predictions, references) -> list[str]:
        return self._generate(prompts)

    def score_triplets(self, prompts: list[str], a, b, references) -> list[str]:
        return self._generate(prompts)
