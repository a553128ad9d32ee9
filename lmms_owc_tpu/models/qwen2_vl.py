"""Qwen2-VL model adapter: engine requests -> batched TPU generation.

Functional parity with reference src/models/_qwen2_vl.py (generate_until flow at
:181-337, multi-round at :350-616, registered IDs at :619-648), re-architected:

  - The reference runs ``batch_size=1`` HF ``model.generate`` per sample. Here
    requests are grouped by generation kwargs, sorted by prompt length (Collator,
    same insight as the reference's sort-by-length), packed into macro batches,
    LEFT-padded to length buckets, and decoded together under one jitted
    prefill+while-loop program per (batch, length) bucket.
  - Image preprocessing: host PIL decode + bicubic resize (HF-exact), then fused
    rescale/normalize/patchify on device (lmms_owc_tpu.ops.image).
  - Weights load from safetensors into a stacked-layer pytree, optionally sharded
    over a ("data", "model") mesh (lmms_owc_tpu.parallel).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

from lmms_owc_tpu.models._api import register_model
from lmms_owc_tpu.models._base import Model
from lmms_owc_tpu.utils import Collator, get_logger, pad_to_bucket
from lmms_owc_tpu.utils._hostprof import hostprof, hostprof_dump, hostprof_reset

log = get_logger(__name__)

__all__ = ["Qwen2VL"]

DEFAULT_MAX_PIXELS = 1024 * 28 * 28
DEFAULT_MIN_PIXELS = 4 * 28 * 28
DEFAULT_MAX_NEW_TOKENS = 128

# Architecture presets so random-init benchmarking works without a checkpoint.
PRESET_CONFIGS = {
    "qwen2-vl-2b": dict(
        vocab_size=151936, hidden_size=1536, num_hidden_layers=28, num_attention_heads=12,
        num_key_value_heads=2, intermediate_size=8960, tie_word_embeddings=True,
    ),
    "qwen2-vl-7b": dict(
        vocab_size=152064, hidden_size=3584, num_hidden_layers=28, num_attention_heads=28,
        num_key_value_heads=4, intermediate_size=18944, tie_word_embeddings=False,
    ),
    "qwen2.5-vl-3b": dict(
        model_type="qwen2_5_vl",
        vocab_size=151936, hidden_size=2048, num_hidden_layers=36, num_attention_heads=16,
        num_key_value_heads=2, intermediate_size=11008, tie_word_embeddings=True,
        vision_config=dict(
            depth=32, hidden_size=1280, num_heads=16, intermediate_size=3420,
            out_hidden_size=2048, window_size=112, fullatt_block_indexes=[7, 15, 23, 31],
        ),
    ),
    "qwen2.5-vl-7b": dict(
        model_type="qwen2_5_vl",
        vocab_size=152064, hidden_size=3584, num_hidden_layers=28, num_attention_heads=28,
        num_key_value_heads=4, intermediate_size=18944, tie_word_embeddings=False,
        vision_config=dict(
            depth=32, hidden_size=1280, num_heads=16, intermediate_size=3420,
            out_hidden_size=3584, window_size=112, fullatt_block_indexes=[7, 15, 23, 31],
        ),
    ),
    # Flagship-SHAPED dryrun config: every sharding-relevant dim equals the 7B
    # (hidden 3584, 28/4 heads, 18944 intermediate, 152064 vocab, 1280 vision)
    # with only the layer counts cut, so the driver's multichip dryrun compiles
    # and runs the REAL partitioning (incl. int8 leaves) on a virtual CPU mesh
    # in bounded time. Not a serving preset.
    "qwen2-vl-flagship-dryrun": dict(
        vocab_size=19456, hidden_size=3584, num_hidden_layers=2, num_attention_heads=28,
        num_key_value_heads=4, intermediate_size=18944, tie_word_embeddings=False,
        image_token_id=5, video_token_id=6, vision_start_token_id=3,
        eos_token_id=2, pad_token_id=0,
        vision_config=dict(depth=2, embed_dim=1280, num_heads=16, mlp_ratio=4.0,
                           hidden_size=3584),
    ),
    # CPU-testable miniature (same special-token space, tiny everything else).
    "qwen2-vl-tiny": dict(
        vocab_size=152064, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0, hidden_size=64),
    ),
    # CPU-testable miniature for the 2.5 tower (window + global attention layers).
    "qwen2.5-vl-tiny": dict(
        model_type="qwen2_5_vl",
        vocab_size=152064, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, intermediate_size=64,
            out_hidden_size=64, window_size=56, fullatt_block_indexes=[1],
        ),
    ),
}

_IM_START = "<|im_start|>"
_IM_END = "<|im_end|>"
_VISION_START = "<|vision_start|>"
_VISION_END = "<|vision_end|>"
_IMAGE_PAD = "<|image_pad|>"

# Qwen2-VL special token ids (tokenizer_config.json of the released checkpoints).
SPECIAL_IDS = {
    "<|endoftext|>": 151643,
    _IM_START: 151644,
    _IM_END: 151645,
    _VISION_START: 151652,
    _VISION_END: 151653,
    _IMAGE_PAD: 151655,
    "<|video_pad|>": 151656,
}

PATCH_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
# Vision-tower batch (row) buckets: real-world size distributions otherwise
# compile one tower program per distinct row count (~12.5% granularity keeps
# the replicated-row waste under ~1/8 of tower FLOPs; 48 stays exact so the
# uniform-448 flagship chunk shape is untouched).
VISION_ROW_BUCKETS = (
    1, 2, 3, 4, 6, 8, 10, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 160, 192, 224, 256, 320, 384,
)


GEN_LEN_BUCKETS = (64, 128, 256, 512)


def plan_decode_pools(
    chunks: list, pool_n: int, batch_size: int, bucket_fn=None
) -> list[list]:
    """Group consecutive same-gen-kwargs chunks into decode pools.

    The baseline rule pools up to ``pool_n`` chunks (the user's explicit
    envelope — always honored verbatim). A pool then EXTENDS past ``pool_n``
    while its row count is still below the uniform pool's rows
    (``pool_n x batch_size``): mixed-resolution token-budget chunks run fewer
    rows per chunk (a 512-bucket chunk carries 30 rows at the flagship
    config), so a fixed chunk count would decode at 60 rows where uniform
    decodes at 96 and under-amortize the per-step weight read. Extension is
    capped by an estimated KV footprint of 1.5x the uniform pool's
    (rows x (prompt bucket + gen bucket)) — the pool=3 footprint measured to
    fit the 16 GB chip (ROUND_NOTES r4).

    ``bucket_fn(chunk) -> estimated prompt bucket`` comes from the vision-sort
    estimator when active; without it extension assumes the uniform 320
    bucket. Rows and buckets are planning estimates only — actual shapes are
    set downstream by the real tokenization.

    ``LMMS_OWC_POOL_KV_CAP_X`` overrides the 1.5x footprint multiplier: the
    1.5x was calibrated BEFORE incremental pool assembly (write_pool_chunk
    donation) cut assembly peak from all-chunks-held to pool+one-chunk, so a
    higher cap may now fit — it is the binding constraint that leaves mixed-res
    pools at ~60 of 96 rows (VERDICT r4 weak #2). Tune on hardware; OOM risk
    is the tuner's.
    """
    import os

    pools: list[list] = []
    cur_key = None
    rows = 0
    bucket = 0
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    cap_x = float(os.environ.get("LMMS_OWC_POOL_KV_CAP_X", "1.5"))
    kv_cap = int(cap_x * pool_n * batch_size * (320 + 64))
    if qvl.kv_cache_int8_enabled():
        # int8 pool assembly (quantize-before-write): per-token pool bytes are
        # 128 B values + 32 B replicated f32 scales vs 256 B bf16 = 0.625x, so
        # the same byte budget admits 1.6x the row-tokens. This is the cap
        # that left mixed-res pools at ~60 of 96 rows (VERDICT r4 weak #2).
        kv_cap = int(kv_cap * 1.6)
    for chunk in chunks:
        key = repr(chunk[0][1])
        n_rows = len(chunk)
        c_bucket = bucket_fn(chunk) if bucket_fn is not None else 320
        gk = dict(chunk[0][1] or {})
        gen_bucket = pad_to_bucket(
            int(gk.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS)), GEN_LEN_BUCKETS
        )
        if (
            pools
            and key == cur_key
            and (
                len(pools[-1]) < pool_n
                or (
                    rows < pool_n * batch_size
                    and (rows + n_rows) * (max(bucket, c_bucket) + gen_bucket)
                    <= kv_cap
                )
            )
        ):
            pools[-1].append(chunk)
            rows += n_rows
            bucket = max(bucket, c_bucket)
        else:
            pools.append([chunk])
            cur_key = key
            rows = n_rows
            bucket = c_bucket
    return pools


def _fused_assemble(table, ids, flat, imap):
    import jax.numpy as jnp

    tok = jnp.take(table, ids, axis=0)
    gathered = jnp.take(flat, jnp.maximum(imap, 0), axis=0)
    return jnp.where((imap >= 0)[..., None], gathered.astype(tok.dtype), tok)


_fused_assemble_jit = None


def _assemble_embeds(embed_table, input_ids, vision_flat, index_map):
    """Token embeddings with vision tokens gathered in (single fused program)."""
    import jax
    import jax.numpy as jnp

    global _fused_assemble_jit
    if vision_flat is None:
        return jnp.take(embed_table, input_ids, axis=0)
    if _fused_assemble_jit is None:
        _fused_assemble_jit = jax.jit(_fused_assemble)
    return _fused_assemble_jit(embed_table, input_ids, vision_flat, index_map)


class _FallbackTokenizer:
    """Deterministic hash tokenizer for random-init benchmarking (no checkpoint).

    Handles the Qwen special tokens exactly; plain text maps to stable pseudo ids.
    A config (the source of truth for special ids + vocab size) keeps the ids
    in-range for presets with non-released vocab sizes; with no config the
    released-checkpoint SPECIAL_IDS apply.
    """

    def __init__(self, config=None) -> None:
        self.special_ids = dict(SPECIAL_IDS)
        vocab = 152064
        if config is not None:
            vocab = config.vocab_size
            self.special_ids.update({
                _IM_END: config.eos_token_id,
                "<|endoftext|>": config.pad_token_id,
                _VISION_START: config.vision_start_token_id,
                _IMAGE_PAD: config.image_token_id,
                "<|video_pad|>": config.video_token_id,
                # Not in the config; released checkpoints place them adjacent
                # (151644 = eos-1, 151653 = vision_start+1) — keep that layout.
                _IM_START: max(config.eos_token_id - 1, 1),
                _VISION_END: config.vision_start_token_id + 1,
            })
        self.eos_token_id = self.special_ids[_IM_END]
        self.pad_token_id = self.special_ids["<|endoftext|>"]
        # Plain words hash into [1000, first-special), staying in-vocab and off
        # the special ids.
        self._plain_span = max(1000, min(vocab, min(self.special_ids.values())) - 1001)

    def encode(self, text: str) -> list[int]:
        import re

        ids: list[int] = []
        pattern = "|".join(re.escape(s) for s in self.special_ids)
        pos = 0
        for match in re.finditer(pattern, text):
            ids.extend(self._encode_plain(text[pos : match.start()]))
            ids.append(self.special_ids[match.group()])
            pos = match.end()
        ids.extend(self._encode_plain(text[pos:]))
        return ids

    def _encode_plain(self, text: str) -> list[int]:
        return [
            1000 + int.from_bytes(hashlib.md5(w.encode()).digest()[:3], "little") % self._plain_span
            for w in text.split()
        ]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        inv = {v: k for k, v in self.special_ids.items()}
        words = []
        for i in ids:
            i = int(i)
            if i in inv:
                if not skip_special_tokens:
                    words.append(inv[i])
            else:
                words.append(f"tok{i}")
        return " ".join(words)


class Qwen2VL(Model):
    """Qwen2-VL on the JAX/TPU stack."""

    # Quantized loading is handled inside load_model (on-device quantized init
    # for random-init; host build + stream for checkpoints) — the base class
    # must not wrap load_model in a CPU default-device context.
    _handles_quantized_load = True

    def __init__(
        self,
        pretrained: str | None = None,
        preset: str = "qwen2-vl-2b",
        max_pixels: int = DEFAULT_MAX_PIXELS,
        min_pixels: int = DEFAULT_MIN_PIXELS,
        model_parallel: int = 1,
        use_mesh: bool = False,
        random_init: bool = False,
        system_prompt: str = "You are a helpful assistant.",
        device_resize: bool = False,
        host_rng_init: bool = False,
        int8_activations: bool = False,
        load_in_8bit: bool = False,
        jax_random_seed: int = 1234,
        **kwargs,
    ) -> None:
        self.pretrained = pretrained
        self.preset = preset
        self.max_pixels = int(max_pixels)
        self.min_pixels = int(min_pixels)
        self.model_parallel = int(model_parallel)
        self.use_mesh = use_mesh or self.model_parallel > 1
        self.random_init = random_init or pretrained is None
        self.system_prompt = system_prompt
        self.device_resize = device_resize
        self.host_rng_init = host_rng_init
        if int8_activations:
            # W8A8 serving mode (process-wide: one served model per process).
            from lmms_owc_tpu.nn.layers import set_int8_activations

            set_int8_activations(True)
        self.load_in_8bit = bool(load_in_8bit)
        self.jax_random_seed = jax_random_seed
        super().__init__(model_id=preset, **kwargs)

    # ------------------------------------------------------------------- load

    def load_model(self) -> None:
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
            self.dtype
        ]

        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25

        # int8 serving (bitsandbytes load_in_8bit equivalent, reference
        # src/models/_base.py:116-121): linear kernels + lm_head stored int8 in
        # HBM, upcast fused into the MXU matmul; precedes mesh sharding.
        # Init-then-quantize would keep bf16 + int8 alive together and OOM a
        # 16 GB v5e for the 7B flagship, so the bf16 tree is never fully
        # device-resident: checkpoints build on HOST and stream layer-by-layer;
        # random-init generates + quantizes directly on device (_build_params).
        import contextlib

        checkpoint_exists = self.pretrained is not None and Path(self.pretrained).exists()
        quant_bits = 4 if self.load_in_4bit else (8 if self.load_in_8bit else None)
        build_ctx = contextlib.nullcontext()
        if quant_bits is not None and checkpoint_exists:
            build_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])

        with build_ctx:
            self._build_params(dtype, qvl, qvl25)

        if quant_bits is not None and not getattr(self, "_int8_applied", False):
            from lmms_owc_tpu.ops.quant import stream_quantize_to_device

            self.params = stream_quantize_to_device(self.params, bits=quant_bits)
            self._int8_applied = True
            log.info("stream-quantized linear weights to int%d (weight-only)", quant_bits)

        if (
            qvl._vision_fm_enabled()
            and not self.is_v25
            and not self.use_mesh
            and not self.load_in_4bit  # dense_fm has no w_q4 form; keep token-major
            and "vision" in self.params
        ):
            # Feature-major vision tower (LMMS_OWC_VISION_FM): weights
            # pre-transposed once so activations stay [N, C, P] end to end
            # (nn.qwen2_vl.vision_params_to_fm). 2.5-VL keeps token-major
            # (its window-attention layers use pair masks the fm kernel
            # doesn't take); skipped under TP (sharding rules are per-layout).
            self.params["vision"] = qvl.vision_params_to_fm(self.params["vision"])
            log.info("vision tower weights transposed to feature-major")

        # Load-time q/k/v merge (LMMS_OWC_DECODER_QKV_MERGE) applies in
        # Model.__init__ after this returns — skipped under the TP mesh below.
        self.mesh = None
        if self.use_mesh:
            from lmms_owc_tpu.parallel import local_mesh
            from lmms_owc_tpu.parallel.sharding import shard_params

            # LOCAL devices only: multi-process runs shard requests per process
            # (reference DP semantics, docs/deployment.md "world_size counts
            # hosts"), so each process runs its own TP mesh over its own chips —
            # a global mesh would require lockstep identical programs across
            # ranks that hold rank-distinct data.
            self.mesh = local_mesh(self.model_parallel)
            self.params = shard_params(self.params, self.mesh)

        self._rng = jax.random.PRNGKey(self.jax_random_seed)
        self.batch_sizes = {}

    def _build_params(self, dtype, qvl, qvl25) -> None:
        """Build config/params/tokenizer (on the ambient default device)."""
        import jax

        from lmms_owc_tpu.nn.loader import load_config_json, load_safetensors_state

        if self.pretrained is not None and Path(self.pretrained).exists():
            hf_cfg = load_config_json(self.pretrained)
            self.is_v25 = hf_cfg.get("model_type") == "qwen2_5_vl"
            self.config = qvl.Qwen2VLConfig.from_hf_dict(hf_cfg)
            state = load_safetensors_state(self.pretrained)
            if self.is_v25:
                self.vision25_config = qvl25.Qwen25VisionConfig.from_hf_dict(
                    hf_cfg.get("vision_config", {})
                )
                self.params = qvl.convert_hf_decoder_weights(state, self.config, dtype)
                self.params["vision"] = qvl25.convert_hf_vision25_weights(
                    state, self.vision25_config, dtype
                )
            else:
                self.params = qvl.convert_hf_weights(state, self.config, dtype)
            del state
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(self.pretrained)
            log.info("loaded %s from %s", self.preset, self.pretrained)
        else:
            if not self.random_init:
                raise FileNotFoundError(f"checkpoint not found: {self.pretrained}")
            preset = dict(PRESET_CONFIGS.get(self.preset, PRESET_CONFIGS["qwen2-vl-2b"]))
            self.is_v25 = preset.get("model_type") == "qwen2_5_vl"
            self.config = qvl.Qwen2VLConfig.from_hf_dict(preset)
            if self.load_in_8bit or self.load_in_4bit:
                # Random-init + int8/int4 serving: generate every tensor ON
                # DEVICE and quantize in place (ops.quant.init_quantized_on_device)
                # — the full-precision tree never exists anywhere, and nothing
                # crosses the host->device link (a 7B tree is ~16 GB bf16;
                # tunneled links move ~20 MB/s).
                from lmms_owc_tpu.ops.quant import init_quantized_on_device

                if self.is_v25:
                    self.vision25_config = qvl25.Qwen25VisionConfig.from_hf_dict(
                        preset.get("vision_config", {})
                    )
                    spec = jax.eval_shape(
                        lambda: qvl.init_decoder_params(
                            jax.random.PRNGKey(0), self.config, dtype
                        )
                    )
                    spec["vision"] = jax.eval_shape(
                        lambda: qvl25.init_vision25_params(
                            jax.random.PRNGKey(0), self.vision25_config, dtype
                        )
                    )
                else:
                    spec = jax.eval_shape(
                        lambda: qvl.init_params(jax.random.PRNGKey(0), self.config, dtype)
                    )
                bits = 4 if self.load_in_4bit else 8
                self.params = init_quantized_on_device(
                    spec, self.jax_random_seed, dtype=dtype, bits=bits,
                    host_rng=self.host_rng_init,
                )
                self._int8_applied = True
                log.info("random-init int%d weights generated on device", bits)
            elif self.is_v25:
                self.vision25_config = qvl25.Qwen25VisionConfig.from_hf_dict(
                    preset.get("vision_config", {})
                )
                self.params = qvl.init_decoder_params(
                    jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
                )
                self.params["vision"] = qvl25.init_vision25_params(
                    jax.random.PRNGKey(self.jax_random_seed + 1), self.vision25_config, dtype
                )
            else:
                self.params = qvl.init_params(
                    jax.random.PRNGKey(self.jax_random_seed), self.config, dtype
                )
            self.tokenizer = _FallbackTokenizer(self.config)
            log.warning("random-init %s (benchmarking mode, no checkpoint)", self.preset)

    @property
    def eos_token_ids(self) -> list[int]:
        # Config is the source of truth (config.json for checkpoints, preset
        # otherwise); the defaults equal the released-checkpoint SPECIAL_IDS.
        ids = {int(self.config.eos_token_id), int(self.config.pad_token_id)}
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            ids.add(int(eos))
        return sorted(ids)

    # -------------------------------------------------------------- prompting

    def _build_prompt(self, context: str, num_images: int) -> str:
        """Chat-formatted prompt with one vision block per image.

        Matches the rendered Qwen2-VL chat template the reference obtains through
        ``processor.apply_chat_template(..., add_generation_prompt=True)``
        (reference: src/models/_qwen2_vl.py:237-276).
        """
        vision = f"{_VISION_START}{_IMAGE_PAD}{_VISION_END}" * num_images
        return (
            f"{_IM_START}system\n{self.system_prompt}{_IM_END}\n"
            f"{_IM_START}user\n{vision}{context}{_IM_END}\n"
            f"{_IM_START}assistant\n"
        )

    def apply_chat_template(self, messages: list[dict]) -> str:
        parts = []
        for msg in messages:
            parts.append(f"{_IM_START}{msg['role']}\n{msg['content']}{_IM_END}\n")
        parts.append(f"{_IM_START}assistant\n")
        return "".join(parts)

    @property
    def chat_template(self) -> str:
        return "qwen2-vl"

    @property
    def tokenizer_name(self) -> str:
        return f"qwen2_vl_{self.preset}"

    def _encode_images_flat(self, all_visuals: list):
        """Encode every image across a macro batch with minimal host<->device traffic.

        Flow: host PIL resize -> group by resized size -> ONE device program per size
        group (fused patchify -> pad-to-bucket -> batched vision tower) -> flatten all
        groups into a single device array of merged vision tokens.

        Returns (vision_flat [K, hidden] device array or None, per-image
        (flat_offset, token_count), grids).
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.ops.image import patchify_images_batch, resize_host_batch

        if not all_visuals:
            return None, [], []
        if getattr(self, "is_v25", False):
            return self._encode_images_flat_v25(all_visuals)

        v = self.config.vision
        merge_sq = v.spatial_merge_size ** 2
        factor = v.patch_size * v.spatial_merge_size
        dtype = self.params["vision"]["patch_embed"]["w"].dtype

        with hostprof("prep_resize"):
            resized: list[tuple[np.ndarray, tuple[int, int]]] = resize_host_batch(
                all_visuals, self.min_pixels, self.max_pixels, factor
            )
        grids = [(1, hw[0] // v.patch_size, hw[1] // v.patch_size) for _, hw in resized]

        by_size: dict[tuple[int, int], list[int]] = {}
        for idx, (_, hw) in enumerate(resized):
            by_size.setdefault(hw, []).append(idx)

        # Group the TOWER pass by patch bucket, not exact size: a mixed-
        # resolution chunk otherwise fragments into one small-batch program per
        # distinct size (measured: 107 tower launches per 384-image mixed run
        # vs 8 uniform, ROUND_NOTES r4). Patchify stays per exact size (it
        # needs a common H, W); sizes sharing a bucket then run as ONE batched
        # tower call with per-row rope freqs and padding masks gathered on
        # device from a per-size table (only [G, bucket, d] crosses the link).
        by_bucket: dict[int, list[tuple[list[int], int, object]]] = {}
        for hw, indices in by_size.items():
            with hostprof("prep_stack"):
                stacked = np.stack([resized[i][0] for i in indices])  # [n, C, H, W]
            num_patches = (hw[0] // v.patch_size) * (hw[1] // v.patch_size)
            bucket = pad_to_bucket(num_patches, PATCH_BUCKETS)
            with hostprof("prep_upload"):
                stacked_dev = jnp.asarray(stacked)
            with hostprof("prep_patchify"):
                patches = patchify_images_batch(
                    stacked_dev, v.patch_size, v.temporal_patch_size,
                    v.spatial_merge_size, dtype,
                )
                patches = jnp.pad(patches, ((0, 0), (0, bucket - num_patches), (0, 0)))
            by_bucket.setdefault(bucket, []).append((indices, num_patches, patches))

        group_outputs: list = []
        spans: dict[int, tuple[int, int]] = {}  # image idx -> (flat offset, merged count)
        flat_offset = 0
        for bucket, entries in by_bucket.items():
            patches = (
                entries[0][2]
                if len(entries) == 1
                else jnp.concatenate([e[2] for e in entries])
            )
            n = patches.shape[0]
            half_dim = v.head_dim // 2
            freq_table = np.zeros((len(entries), bucket, half_dim), np.float32)
            mask_table = np.zeros((len(entries), bucket), np.int32)
            gids: list[int] = []
            row_info: list[tuple[int, int]] = []  # (image idx, merged count) per row
            all_full = True
            for g, (indices, num_patches, _) in enumerate(entries):
                freq_table[g, :num_patches] = qvl.vision_rope_cos_sin(
                    [grids[indices[0]]], v
                )
                mask_table[g, :num_patches] = 1
                all_full = all_full and num_patches == bucket
                for idx in indices:
                    gids.append(g)
                    row_info.append((idx, num_patches // merge_sq))
            gids_np = np.asarray(gids, np.int32)
            freq_table_dev = jnp.asarray(freq_table)
            mask_table_dev = None if all_full else jnp.asarray(mask_table)
            merged_bucket = bucket // merge_sq
            # Cap each tower call at the uniform-448 envelope (batch_size x
            # 1024 patch-tokens): one whole-chunk grouped call otherwise scales
            # tower activations with chunk rows x the largest bucket, and that
            # transient must coexist with a live decode-pool cache under the
            # pipelined prepare (mixed-res RESOURCE_EXHAUSTED, r4). Segments of
            # a fixed cap also keep the compiled shape set bounded.
            cap = max(1, (self.batch_size * 1024) // bucket)
            for s in range(0, n, cap):
                seg_patches = patches[s : s + cap]
                m = seg_patches.shape[0]
                seg_gids = gids_np[s : s + cap]
                # Pad the batch axis to a row bucket by REPLICATING the last
                # row (real data, so no all-masked softmax rows); padded rows
                # occupy flat slots after the real rows and are never
                # referenced by spans.
                m_rows = pad_to_bucket(m, VISION_ROW_BUCKETS)
                if m_rows > m:
                    seg_patches = jnp.concatenate(
                        [
                            seg_patches,
                            jnp.broadcast_to(
                                seg_patches[-1], (m_rows - m, *seg_patches.shape[1:])
                            ),
                        ]
                    )
                    seg_gids = np.concatenate(
                        [seg_gids, np.repeat(seg_gids[-1:], m_rows - m)]
                    )
                gids_dev = jnp.asarray(seg_gids)
                freqs = jnp.take(freq_table_dev, gids_dev, axis=0)
                patch_mask = (
                    None  # all patches real: skip masked-select on scores
                    if all_full
                    else jnp.take(mask_table_dev, gids_dev, axis=0)
                )
                with hostprof("prep_tower"):
                    out = qvl.vision_encode_batch(
                        self.params["vision"], seg_patches, freqs, patch_mask, v
                    )  # [m_rows, bucket/merge_sq, hidden]
                group_outputs.append(out.reshape(m_rows * merged_bucket, -1))
                for row, (idx, merged_count) in enumerate(row_info[s : s + cap]):
                    spans[idx] = (flat_offset + row * merged_bucket, merged_count)
                flat_offset += m_rows * merged_bucket

        vision_flat = (
            group_outputs[0] if len(group_outputs) == 1 else jnp.concatenate(group_outputs)
        )
        ordered_spans = [spans[i] for i in range(len(all_visuals))]
        return vision_flat, ordered_spans, grids

    def _encode_images_flat_v25(self, all_visuals: list):
        """Qwen2.5-VL vision path: uniform window layout, same-grid images batched.

        Tokens are gathered into the [W, S] padded-window layout on device (one
        jnp.take per size group); the tower runs batched window attention plus
        global layers, and a second gather restores original merge-unit order.
        No O(P^2) mask is built or transferred.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_5_vl as qvl25
        from lmms_owc_tpu.ops.image import patchify_images_batch, resize_host_batch

        v25 = self.vision25_config
        mu = v25.spatial_merge_size ** 2
        factor = v25.patch_size * v25.spatial_merge_size
        dtype = self.params["vision"]["patch_embed"]["w"].dtype

        resized: list = []
        grids: list = []
        with hostprof("prep_resize"):
            pairs = resize_host_batch(
                all_visuals, self.min_pixels, self.max_pixels, factor
            )
        for chw, (rh, rw) in pairs:
            resized.append(chw)
            grids.append((1, rh // v25.patch_size, rw // v25.patch_size))

        by_size: dict = {}
        for i, g in enumerate(grids):
            by_size.setdefault(g, []).append(i)

        group_outputs: list = []
        spans: dict[int, tuple[int, int]] = {}
        flat_offset = 0
        for grid, indices in by_size.items():
            n = len(indices)
            stacked = np.stack([resized[i] for i in indices])
            patches = patchify_images_batch(
                jnp.asarray(stacked), v25.patch_size, v25.temporal_patch_size,
                v25.spatial_merge_size, dtype,
            )  # [n, P, patch_dim], merge units contiguous
            # Row-bucket the batch axis by replicating the last image (same
            # compile-shape bound as the 2.0 tower; padded rows are never
            # referenced by spans). Cross-grid bucket-grouping is NOT applied
            # here: the window layout (slot_src, W, S) is per-grid, so merging
            # grids would need W-axis padding plus per-row restore tables.
            n_rows = pad_to_bucket(n, VISION_ROW_BUCKETS)
            if n_rows > n:
                patches = jnp.concatenate(
                    [patches, jnp.broadcast_to(patches[-1], (n_rows - n, *patches.shape[1:]))]
                )
                n = n_rows
            n_units = patches.shape[1] // mu

            slot_src, num_windows, s_tokens = qvl25.get_window_layout(grid, v25)
            valid_units = slot_src >= 0
            safe_src = np.where(valid_units, slot_src, 0)
            tok_idx = (safe_src[:, None] * mu + np.arange(mu)[None, :]).reshape(-1)
            valid = np.repeat(valid_units, mu).astype(np.int32)  # [W*S]

            gathered = jnp.take(patches, jnp.asarray(tok_idx), axis=1)
            gathered = gathered * jnp.asarray(valid, dtype)[None, :, None]
            freqs = np.asarray(qvl25.vision25_rope_freqs(grid, v25))[tok_idx]
            freqs = freqs * valid[:, None]

            out = qvl25.vision25_encode(
                self.params["vision"],
                gathered.reshape(n, num_windows, s_tokens, -1),
                jnp.broadcast_to(
                    jnp.asarray(freqs, np.float32).reshape(1, num_windows, s_tokens, -1),
                    (n, num_windows, s_tokens, freqs.shape[-1]),
                ),
                jnp.broadcast_to(
                    jnp.asarray(valid.reshape(1, num_windows, s_tokens)),
                    (n, num_windows, s_tokens),
                ),
                v25,
            )  # [n, W*S/mu, out_hidden] in slot order
            # Restore original merge-unit order: slot position of each source unit.
            pos_of = np.zeros(n_units, np.int64)
            pos_of[slot_src[valid_units]] = np.where(valid_units)[0]
            restored = jnp.take(out, jnp.asarray(pos_of), axis=1)  # [n, n_units, H]
            group_outputs.append(restored.reshape(n * n_units, -1))
            for row, idx in enumerate(indices):
                spans[idx] = (flat_offset + row * n_units, n_units)
            flat_offset += n * n_units

        vision_flat = (
            group_outputs[0] if len(group_outputs) == 1 else jnp.concatenate(group_outputs)
        )
        return vision_flat, [spans[i] for i in range(len(all_visuals))], grids

    def _encode_images(self, visuals: list):
        """Compatibility wrapper: per-image merged embeddings as host arrays."""
        vision_flat, spans, grids = self._encode_images_flat(visuals)
        if vision_flat is None:
            return [], []
        flat = np.asarray(vision_flat)
        return [flat[off : off + count] for off, count in spans], grids

    # ------------------------------------------------------------- generation

    def _tokenize_with_images(
        self, prompt: str, image_token_counts: list[int]
    ) -> list[int]:
        """Tokenize, expanding each single <|image_pad|> to its merged token count."""
        ids = self.tokenizer.encode(prompt)
        image_pad = self.config.image_token_id
        out: list[int] = []
        img_idx = 0
        for tok in ids:
            if tok == image_pad:
                out.extend([image_pad] * image_token_counts[img_idx])
                img_idx += 1
            else:
                out.append(tok)
        return out

    def _build_batch_inputs(self, batch: list[tuple], vision_flat=None):
        """Assemble device inputs for one macro batch of (token_ids, vision_spans,
        grids): left-padded ids/mask, M-RoPE positions, and the token embeddings
        with vision embeds scattered in (one fused gather/where program — no
        per-row device dispatches).

        Returns (embeds, position_ids, attention_mask [np], next_pos [np],
        bucket_len)."""
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl

        bsz = len(batch)
        max_len = max(len(ids) for ids, _, _ in batch)
        bucket_len = pad_to_bucket(max_len)
        pad_id = self.config.pad_token_id

        input_ids = np.full((bsz, bucket_len), pad_id, np.int64)
        attention_mask = np.zeros((bsz, bucket_len), np.int64)
        index_map = np.full((bsz, bucket_len), -1, np.int32)
        for row, (ids, spans, _) in enumerate(batch):
            offset = bucket_len - len(ids)
            input_ids[row, offset:] = ids
            attention_mask[row, offset:] = 1
            positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
            cursor = 0
            for span_off, span_count in spans:
                span_positions = positions[cursor : cursor + span_count]
                index_map[row, offset + span_positions] = span_off + np.arange(span_count)
                cursor += span_count

        all_grids = [g for _, _, grids in batch for g in grids]
        position_ids, next_pos = qvl.get_rope_index(
            input_ids, attention_mask, all_grids, self.config
        )

        embeds = _assemble_embeds(
            self.params["embed_tokens"],
            jnp.asarray(input_ids),
            vision_flat,
            jnp.asarray(index_map) if vision_flat is not None else None,
        )
        return embeds, position_ids, attention_mask, next_pos, bucket_len

    def _detokenize(self, tokens: np.ndarray) -> list[str]:
        """Trim each row at the first EOS/pad token and decode to text."""
        texts = []
        eos_set = set(self.eos_token_ids) | {self.config.pad_token_id}
        for row in range(tokens.shape[0]):
            ids = []
            for tok in tokens[row]:
                if int(tok) in eos_set:
                    break
                ids.append(int(tok))
            texts.append(self.tokenizer.decode(ids, skip_special_tokens=True))
        return texts

    def _run_batch(self, batch: list[tuple], gen_kwargs: dict, vision_flat=None) -> list[str]:
        """Generate for one macro batch of (token_ids, vision_spans, grids).

        ``vision_spans`` are (offset, count) windows into ``vision_flat`` (a device
        array of merged vision tokens).
        """
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl

        max_new_tokens = int(gen_kwargs.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS))
        do_sample = bool(gen_kwargs.get("do_sample", False))
        temperature = float(gen_kwargs.get("temperature") or 1.0)
        top_p = float(gen_kwargs.get("top_p") or 1.0)

        embeds, position_ids, attention_mask, next_pos, bucket_len = (
            self._build_batch_inputs(batch, vision_flat)
        )

        cache_len = bucket_len + pad_to_bucket(max_new_tokens, GEN_LEN_BUCKETS)
        self._rng, subkey = jax.random.split(self._rng)
        tokens = qvl.greedy_generate(
            self.params,
            embeds,
            jnp.asarray(position_ids),
            jnp.asarray(attention_mask.astype(np.int32)),
            jnp.asarray(next_pos.astype(np.int32)),
            self.config,
            max_new_tokens=max_new_tokens,
            cache_len=cache_len,
            eos_ids=jnp.asarray(self.eos_token_ids, jnp.int32),
            rng_key=subkey,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
        )
        return self._detokenize(np.asarray(tokens))

    def _run_pooled(self, prepared_list: list, gen_kwargs: dict) -> list[str]:
        """Decode-pool serving (LMMS_OWC_DECODE_POOL=N): prefill each chunk at
        its own MXU-optimal (batch, bucket) shape, then decode ALL chunks as one
        pooled batch so the per-step weight read (the int8-7B decode roofline,
        ~7.6 GB/step) is amortized over N x batch rows instead of batch.

        Per-chunk caches are front-padded to the longest prompt bucket in the
        pool (masked like ordinary left-padding) so one static cache position
        serves every row. Returns the pool's texts in chunk order.
        """
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl

        max_new_tokens = int(gen_kwargs.get("max_new_tokens", DEFAULT_MAX_NEW_TOKENS))
        do_sample = bool(gen_kwargs.get("do_sample", False))
        temperature = float(gen_kwargs.get("temperature") or 1.0)
        top_p = float(gen_kwargs.get("top_p") or 1.0)

        # The pool cache is preallocated and each chunk's KV is written into it
        # right after that chunk's prefill (write_pool_chunk donates the pool),
        # so peak memory is the pool plus ONE chunk's cache — holding every
        # chunk and concatenating at the end OOM'd once row-target pooling let
        # mixed-res pools extend past 2 chunks.
        bucket_lens = [
            pad_to_bucket(max(len(ids) for ids, _, _ in rows))
            for rows, _ in prepared_list
        ]
        l_max = max(bucket_lens)
        cache_len = l_max + pad_to_bucket(max_new_tokens, GEN_LEN_BUCKETS)
        total_rows = sum(len(rows) for rows, _ in prepared_list)
        kv_mask_np = np.zeros((total_rows, cache_len), np.int32)
        # int8 KV serving (LMMS_OWC_KV_INT8): quantize each chunk's prefill KV
        # BEFORE the pool write so the bf16 pool never exists — halves the
        # resident pool (the footprint that caps row-target pool extension,
        # plan_decode_pools) on top of halving the per-step decode read.
        kv_int8 = qvl.kv_cache_int8_enabled()
        cache_k = cache_v = scale_k = scale_v = None
        logits_all, next_all = [], []
        row_offset = 0
        for (rows, vision_flat), bucket_len in zip(prepared_list, bucket_lens):
            with hostprof("build_inputs"):
                embeds, position_ids, attention_mask, next_pos, _ = (
                    self._build_batch_inputs(rows, vision_flat)
                )
            with hostprof("prefill_dispatch"):
                logits, ks, vs = qvl.prefill_logits(
                    self.params,
                    embeds,
                    jnp.asarray(position_ids),
                    jnp.asarray(attention_mask.astype(np.int32)),
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
            front = l_max - bucket_len
            row_off = jnp.asarray(row_offset, jnp.int32)
            front_off = jnp.asarray(front, jnp.int32)
            if kv_int8:
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
            kv_mask_np[row_offset : row_offset + len(rows), front : front + bucket_len] = (
                attention_mask
            )
            logits_all.append(logits)
            next_all.append(next_pos.astype(np.int32))
            row_offset += len(rows)

        kv_mask = jnp.asarray(kv_mask_np)
        logits0 = jnp.concatenate(logits_all, axis=0)
        next_pos_pool = jnp.asarray(np.concatenate(next_all), jnp.int32)

        self._rng, subkey = jax.random.split(self._rng)
        with hostprof("decode_dispatch"):
            tokens, _ = qvl.decode_pool(
                self.params,
                (cache_k, cache_v, scale_k, scale_v) if kv_int8 else (cache_k, cache_v),
                logits0,
                kv_mask,
                next_pos_pool,
                self.config,
                max_new_tokens=max_new_tokens,
                prompt_len=l_max,
                eos_ids=jnp.asarray(self.eos_token_ids, jnp.int32),
                rng_key=subkey,
                do_sample=do_sample,
                temperature=temperature,
                top_p=top_p,
            )
        with hostprof("fetch"):
            tokens_np = np.asarray(tokens)
        with hostprof("detok"):
            return self._detokenize(tokens_np)

    @staticmethod
    def _trim_until(text: str, until: list[str] | None) -> str:
        if until:
            for stop in until:
                if stop and stop in text:
                    text = text.split(stop)[0]
        return text

    def _fetch_visuals(self, args: tuple) -> list:
        ctx, _gen_kwargs, doc_to_visual, doc_id, task_name, split = args[:6]
        task = self.task_dict.get(task_name)
        if isinstance(task, tuple):
            task = task[1]
        if task is None or doc_to_visual is None:
            return []
        return doc_to_visual(task.dataset[split][doc_id]) or []

    def _prepare_requests_batch(self, chunk: list[tuple]) -> tuple[list[tuple], object]:
        """Prepare a whole macro batch: one batched vision-tower pass over every
        image in the chunk (grouped by resized size), then per-request tokenization.

        Returns (rows, vision_flat) where each row is (token_ids, vision_spans,
        grids) and vision_spans are (offset, count) windows into vision_flat.
        """
        all_visuals: list = []
        counts: list[int] = []
        with hostprof("prep_fetch"):
            for args in chunk:
                visuals = self._fetch_visuals(args)
                counts.append(len(visuals))
                all_visuals.extend(visuals)

        with hostprof("prep_vision"):
            vision_flat, spans, flat_grids = self._encode_images_flat(all_visuals)

        merge_sq = self.config.vision.spatial_merge_size ** 2
        rows = []
        offset = 0
        for args, n_images in zip(chunk, counts):
            row_spans = spans[offset : offset + n_images]
            grids = flat_grids[offset : offset + n_images]
            offset += n_images
            token_counts = [(g[0] * g[1] * g[2]) // merge_sq for g in grids]
            prompt = self._build_prompt(args[0], n_images)
            ids = self._tokenize_with_images(prompt, token_counts)
            rows.append((ids, row_spans, grids))
        return rows, vision_flat

    def _estimate_prompt_tokens(self, args: tuple) -> int:
        """Collator sort key: estimated total prompt tokens (text + vision).

        Each prefill chunk pads every row to the chunk's longest prompt bucket,
        so under a mixed-resolution workload a single large image drags a whole
        chunk to the 448 bucket while text-only sorting scatters sizes randomly
        (measured: prefill device time 9.8 s vs 5.3 s uniform at equal FLOPs,
        ROUND_NOTES r4). Sorting by text+vision tokens groups like-size images
        into the same chunk so short prompts stay in short buckets. Vision
        tokens come from the smart-resize arithmetic on ``img.size`` (a lazy
        PIL header read for file-backed tasks; datasets that decode eagerly pay
        one extra doc access — LMMS_OWC_SORT_BY_VISION=0 restores text-only).
        """
        est = len(args[0]) // 4
        try:
            visuals = self._fetch_visuals(args)
        except Exception:
            return est
        from lmms_owc_tpu.ops.image import smart_resize

        v = self.config.vision
        merge_sq = v.spatial_merge_size ** 2
        factor = v.patch_size * v.spatial_merge_size
        for img in visuals:
            try:
                width, height = img.size
                rh, rw = smart_resize(
                    height, width, factor=factor,
                    min_pixels=self.min_pixels, max_pixels=self.max_pixels,
                )
                est += (rh // v.patch_size) * (rw // v.patch_size) // merge_sq
            except Exception:
                continue
        return est

    def generate_until(self, requests) -> list[str]:
        batch_fn = None
        pool_bucket_fn = None
        if self.batch_size > 1 and bool(int(os.environ.get("LMMS_OWC_SORT_BY_VISION", "1"))):
            est_cache: dict[int, int] = {}

            def _est(args) -> int:
                key = id(args)
                if key not in est_cache:
                    est_cache[key] = self._estimate_prompt_tokens(args)
                return est_cache[key]

            sort_fn = lambda args: -_est(args)  # noqa: E731
            # Token-budget chunking: each batch's row count is set by its
            # leader (longest item — first after the descending sort) so
            # rows x prompt_bucket stays ~= batch_size x 320, the uniform-448
            # chunk's token footprint. Without this, vision-sorting groups the
            # largest images into one full-width chunk ([48, 512] prefill +
            # its KV pool) and OOMs the 16 GB chip; with it a 512-bucket chunk
            # runs 30 rows and a 192-bucket chunk 80 — constant workspace.
            budget = self.batch_size * 320
            state = {"flushed": -1, "cap": self.batch_size}

            def batch_fn(n_flushed, args):
                if n_flushed != state["flushed"]:  # first item of a new batch
                    state["flushed"] = n_flushed
                    bucket = pad_to_bucket(_est(args) + 48)
                    state["cap"] = max(8, min(2 * self.batch_size, budget // bucket))
                return state["cap"]

            def pool_bucket_fn(chunk):
                return pad_to_bucket(_est(chunk[0]) + 48)
        else:
            sort_fn = lambda args: -len(args[0])  # noqa: E731
        collator = Collator(
            [req.args for req in requests],
            sort_fn=sort_fn,
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        chunks = list(collator.get_batched(n=self.batch_size, batch_fn=batch_fn))

        pool_n = int(os.environ.get("LMMS_OWC_DECODE_POOL", "1"))
        if pool_n > 1:
            hostprof_reset()
            out = collator.get_original(
                self._generate_pooled(chunks, pool_n, pool_bucket_fn)
            )
            hostprof_dump(f"generate_until n={len(requests)}")
            return out

        # Pipeline: host preprocessing + vision encode (incl. host->device image
        # uploads) of the next chunks overlaps the decode of chunk k (the C++
        # loader releases the GIL; JAX dispatch is thread-safe). The reference
        # prepares every sample on the critical path.
        def run(chunk, prepared):
            rows, vision_flat = prepared
            gen_kwargs = dict(chunk[0][1] or {})
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            texts = self._run_batch(rows, gen_kwargs, vision_flat)
            return [self._trim_until(t, until).strip() for t in texts]

        results = self._foreach_chunk_pipelined(
            chunks, lambda chunk: self._prepare_requests_batch(chunk), run
        )
        return collator.get_original(results)

    def _generate_pooled(self, chunks: list, pool_n: int, bucket_fn=None) -> list[str]:
        """Decode-pool scheduling: consecutive chunks sharing gen_kwargs are
        pooled so prefill keeps the per-chunk batch while decode runs the whole
        pool as one batch (see :meth:`_run_pooled` and :func:`plan_decode_pools`
        for the row-target extension rule). The host-prep/vision pipeline moves
        to pool granularity."""
        pools = plan_decode_pools(chunks, pool_n, self.batch_size, bucket_fn)

        def prepare(pool):
            return [self._prepare_requests_batch(c) for c in pool]

        def run(pool, prepared):
            gen_kwargs = dict(pool[0][0][1] or {})
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            texts = self._run_pooled(prepared, gen_kwargs)
            return [self._trim_until(t, until).strip() for t in texts]

        return self._foreach_chunk_pipelined(pools, prepare, run)

    def generate_until_multi_round(self, requests) -> list[list[str]]:
        """Staged conversation until the task's ``doc_to_text`` signals termination.

        Protocol parity with reference src/models/_qwen2_vl.py:429-464: round 0 uses
        the prebuilt context; later rounds call
        ``doc_to_text(doc, round_idx=r, previous_round_results=..., last_round_info=...)``
        which returns ``(visual, text, terminal, previous_round_results, last_round_info)``.
        Unlike the reference's per-sample loop, each round runs every still-active
        request of a chunk as one batched decode — and the whole round sweep runs
        ACROSS chunks (round r of every chunk before round r+1 of any), so the
        per-round sub-chunks ride the same decode-pool serving
        (LMMS_OWC_DECODE_POOL, :meth:`_run_pooled`) and vision-aware sorted
        batching (LMMS_OWC_SORT_BY_VISION) as :meth:`generate_until`. The
        llamav_o1-style prompt variants hit this path on every classification
        benchmark, so it inherits the serving levers rather than decoding
        per-chunk at pool=1.
        """
        batch_fn = None
        if self.batch_size > 1 and bool(int(os.environ.get("LMMS_OWC_SORT_BY_VISION", "1"))):
            est_cache: dict[int, int] = {}

            def _est(args) -> int:
                key = id(args)
                if key not in est_cache:
                    est_cache[key] = self._estimate_prompt_tokens(args)
                return est_cache[key]

            sort_fn = lambda args: -_est(args)  # noqa: E731
            budget = self.batch_size * 320
            state = {"flushed": -1, "cap": self.batch_size}

            def batch_fn(n_flushed, args):
                if n_flushed != state["flushed"]:  # first item of a new batch
                    state["flushed"] = n_flushed
                    bucket = pad_to_bucket(_est(args) + 48)
                    state["cap"] = max(8, min(2 * self.batch_size, budget // bucket))
                return state["cap"]
        else:
            sort_fn = lambda args: -len(args[0])  # noqa: E731

        collator = Collator(
            [req.args for req in requests],
            sort_fn=sort_fn,
            group_fn=lambda args: repr(args[1]),
            group_by="gen_kwargs",
        )
        chunks = list(collator.get_batched(n=self.batch_size, batch_fn=batch_fn))

        # Per-chunk conversation state, advanced one ROUND at a time across all
        # chunks so each round's sub-chunks can pool.
        states = []
        for chunk in chunks:
            docs = []
            for args in chunk:
                task = self.task_dict.get(args[5])
                if isinstance(task, tuple):
                    task = task[1]
                docs.append(task.dataset[args[6]][args[4]])
            gen_kwargs = dict(chunk[0][1] or {})
            until = gen_kwargs.get("until") or []
            if isinstance(until, str):
                until = [until]
            states.append(
                {
                    "chunk": chunk,
                    "docs": docs,
                    "gen_kwargs": gen_kwargs,
                    "until": until,
                    "rounds": [[] for _ in chunk],
                    "infos": [None] * len(chunk),
                    "prompts": [args[0] for args in chunk],
                    "active": list(range(len(chunk))),
                }
            )

        pool_n = int(os.environ.get("LMMS_OWC_DECODE_POOL", "1"))
        round_idx = 0
        while round_idx <= 16:
            live: list[tuple[dict, list]] = []  # (state, this round's sub_chunk)
            for st in states:
                if round_idx != 0 and st["active"]:
                    still_active = []
                    for i in st["active"]:
                        doc_to_text = st["chunk"][i][3]
                        _vis, text, terminal, _prev, st["infos"][i] = doc_to_text(
                            st["docs"][i],
                            round_idx=round_idx,
                            previous_round_results=list(st["rounds"][i]),
                            last_round_info=st["infos"][i],
                        )
                        if not terminal:
                            st["prompts"][i] = text
                            still_active.append(i)
                    st["active"] = still_active
                if st["active"]:
                    # (ctx, gen_kwargs, doc_to_visual, doc_id, task, split) rows.
                    sub_chunk = [
                        (
                            st["prompts"][i],
                            st["chunk"][i][1],
                            st["chunk"][i][2],
                            st["chunk"][i][4],
                            st["chunk"][i][5],
                            st["chunk"][i][6],
                        )
                        for i in st["active"]
                    ]
                    live.append((st, sub_chunk))
            if not live:
                break

            if pool_n > 1 and len(live) > 1:
                # Pool this round's sub-chunks exactly like generate_until:
                # prefill per sub-chunk shape, decode pooled rows as one batch.
                texts_flat = self._generate_pooled(
                    [sc for _, sc in live], pool_n
                )
                offset = 0
                for st, sc in live:
                    for i, text in zip(st["active"], texts_flat[offset : offset + len(sc)]):
                        st["rounds"][i].append(
                            self._trim_until(text, st["until"]).strip()
                        )
                    offset += len(sc)
            else:

                def run(item, prepared):
                    st, _sc = item
                    rows, vision_flat = prepared
                    return st, self._run_batch(rows, dict(st["gen_kwargs"]), vision_flat)

                ran = self._foreach_chunk_pipelined(
                    live,
                    lambda item: self._prepare_requests_batch(item[1]),
                    lambda item, prepared: [run(item, prepared)],
                )
                for st, texts in ran:
                    for i, text in zip(st["active"], texts):
                        st["rounds"][i].append(
                            self._trim_until(text, st["until"]).strip()
                        )
            round_idx += 1

        results: list[list[str]] = []
        for st in states:
            results.extend(st["rounds"])
        return collator.get_original(results)

    def loglikelihood(self, requests) -> list[tuple[float, bool]]:
        """(ctx, doc_to_target, doc_to_visual, doc_id, task, split) -> (loss, is_greedy).

        The reference raises NotImplementedError for Qwen2-VL
        (src/models/_qwen2_vl.py:123-141); supported here — capability superset —
        with the same contract as the llava adapters (src/models/_llava_hf.py:169-260):
        mean CE over the continuation with the context masked, plus greedy match.
        """
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl

        merge_sq = self.config.vision.spatial_merge_size ** 2
        results: list[tuple[float, bool]] = []
        for start in range(0, len(requests), self.batch_size):
            batch = requests[start : start + self.batch_size]
            metas, counts, all_visuals = [], [], []
            for req in batch:
                ctx, continuation, visuals = self._resolve_loglikelihood_request(req)
                metas.append((ctx, continuation))
                counts.append(len(visuals))
                all_visuals.extend(visuals)
            vision_flat, spans_flat, flat_grids = self._encode_images_flat(all_visuals)

            full_rows = []
            img_off = 0
            for (ctx, continuation), n_images in zip(metas, counts):
                spans = spans_flat[img_off : img_off + n_images]
                grids = flat_grids[img_off : img_off + n_images]
                img_off += n_images
                token_counts = [(g[0] * g[1] * g[2]) // merge_sq for g in grids]
                prompt = self._build_prompt(ctx, n_images)
                ids = self._tokenize_with_images(prompt, token_counts)
                cont_ids = self._encode_continuation(continuation)
                full_rows.append((list(ids) + cont_ids, len(cont_ids), spans, grids))

            bucket = pad_to_bucket(max(len(ids) for ids, *_ in full_rows))
            pad_id = self.config.pad_token_id
            bsz = len(full_rows)
            input_ids = np.full((bsz, bucket), pad_id, np.int64)
            mask = np.zeros((bsz, bucket), np.int64)
            target_ids = np.zeros((bsz, bucket), np.int64)
            target_mask = np.zeros((bsz, bucket), np.int64)
            index_map = np.full((bsz, bucket), -1, np.int32)
            for row, (ids, n_cont, spans, _grids) in enumerate(full_rows):
                offset = bucket - len(ids)
                input_ids[row, offset:] = ids
                mask[row, offset:] = 1
                # Position t predicts token t+1: continuation targets occupy the
                # last n_cont prediction slots.
                target_ids[row, offset : bucket - 1] = ids[1:]
                target_mask[row, bucket - 1 - n_cont : bucket - 1] = 1
                positions = np.where(np.asarray(ids) == self.config.image_token_id)[0]
                cursor = 0
                for span_off, span_count in spans:
                    span_positions = positions[cursor : cursor + span_count]
                    index_map[row, offset + span_positions] = span_off + np.arange(span_count)
                    cursor += span_count

            all_grids = [g for *_, grids in full_rows for g in grids]
            position_ids, _ = qvl.get_rope_index(input_ids, mask, all_grids, self.config)
            embeds = _assemble_embeds(
                self.params["embed_tokens"],
                jnp.asarray(input_ids),
                vision_flat,
                jnp.asarray(index_map) if vision_flat is not None else None,
            )
            loss, is_greedy = qvl.score_continuation(
                self.params,
                embeds,
                jnp.asarray(position_ids),
                jnp.asarray(mask.astype(np.int32)),
                jnp.asarray(target_ids),
                jnp.asarray(target_mask.astype(np.int32)),
                self.config,
            )
            results.extend(
                (float(l), bool(g)) for l, g in zip(np.asarray(loss), np.asarray(is_greedy))
            )
        return results


@register_model("qwen2-vl-7b")
def qwen2_vl_7b(**kwargs) -> Qwen2VL:
    """Qwen2-VL-7B-Instruct (reference registration: src/models/_qwen2_vl.py:619-624)."""
    kwargs.setdefault("preset", "qwen2-vl-7b")
    return Qwen2VL(**kwargs)


@register_model("qwen2-vl-2b")
def qwen2_vl_2b(**kwargs) -> Qwen2VL:
    """Qwen2-VL-2B-Instruct."""
    kwargs.setdefault("preset", "qwen2-vl-2b")
    return Qwen2VL(**kwargs)


@register_model("qwen2.5-vl-7b")
def qwen2_5_vl_7b(**kwargs) -> Qwen2VL:
    """Qwen2.5-VL-7B-Instruct (window-attention vision tower)."""
    kwargs.setdefault("preset", "qwen2.5-vl-7b")
    return Qwen2VL(**kwargs)


@register_model("qwen2.5-vl-3b")
def qwen2_5_vl_3b(**kwargs) -> Qwen2VL:
    """Qwen2.5-VL-3B-Instruct."""
    kwargs.setdefault("preset", "qwen2.5-vl-3b")
    return Qwen2VL(**kwargs)


@register_model("qwen2-vl-tiny")
def qwen2_vl_tiny(**kwargs) -> Qwen2VL:
    """Miniature Qwen2-VL for CPU tests and pipeline smoke runs."""
    kwargs.setdefault("preset", "qwen2-vl-tiny")
    return Qwen2VL(**kwargs)


@register_model("qwen2.5-vl-tiny")
def qwen2_5_vl_tiny(**kwargs) -> Qwen2VL:
    """Miniature Qwen2.5-VL (window + global vision layers) for CPU tests."""
    kwargs.setdefault("preset", "qwen2.5-vl-tiny")
    return Qwen2VL(**kwargs)
