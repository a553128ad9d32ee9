"""Model adapter base class — the bridge between engine requests and the JAX stack.

Functional parity with reference src/models/_base.py (Model ABC: distributed setup,
dtype/quantization flags, response CacheHook, abstract ``loglikelihood`` /
``generate_until`` / ``generate_until_multi_round``), re-architected for TPU:

  - The reference replicates a torch model per accelerate process and hard-limits
    ``batch_size=1`` (src/models/_base.py:103-104). Here one JAX process drives all
    local TPU chips through a ``jax.sharding.Mesh``; ``batch_size`` is the per-step
    *macro batch* that continuous batching packs onto the data axis of the mesh.
  - DDP/FSDP/DeepSpeed/device_map (src/models/_base.py:146-186) are replaced by GSPMD
    sharding rules applied at weight-load time (lmms_owc_tpu.parallel).
  - ``rank`` / ``world_size`` map to ``jax.process_index()`` / ``jax.process_count()``
    (multi-host DCN), not to devices: request sharding stays identical to the
    reference, while intra-host parallelism happens inside the batched forward.
"""

from __future__ import annotations

import abc
import hashlib
import json
import os
from typing import TYPE_CHECKING

from lmms_owc_tpu.utils import get_logger

if TYPE_CHECKING:
    from lmms_owc_tpu.tasks._base import TaskInstance

log = get_logger(__name__)

__all__ = ["CacheHook", "Model"]


class CacheHook:
    """sha256(request) -> response cache, persisted as JSON lines.

    Functional replacement for the reference's sqlite-intended cache scaffold
    (src/models/_base.py:23-53); enabled via ``--use_cache DIR``.
    """

    def __init__(self, cache_dir: str | None = None) -> None:
        self.cache_dir = cache_dir
        self._store: dict[str, object] = {}
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            self._path = os.path.join(cache_dir, "responses.jsonl")
            if os.path.exists(self._path):
                with open(self._path, encoding="utf-8") as f:
                    for line in f:
                        try:
                            record = json.loads(line)
                            self._store[record["key"]] = record["value"]
                        except (json.JSONDecodeError, KeyError):
                            continue

    @staticmethod
    def hash_args(attr: str, args: tuple) -> str:
        payload = json.dumps([attr, *[str(a) for a in args]], ensure_ascii=False)
        return hashlib.sha256(payload.encode("utf-8")).hexdigest()

    def get(self, attr: str, args: tuple):
        return self._store.get(self.hash_args(attr, args))

    def add_partial(self, attr: str, args: tuple, value) -> None:
        key = self.hash_args(attr, args)
        self._store[key] = value
        if self.cache_dir is not None:
            with open(self._path, "a", encoding="utf-8") as f:
                f.write(json.dumps({"key": key, "value": value}, ensure_ascii=False) + "\n")


class Model(abc.ABC):
    """Base class for all model adapters.

    Subclasses implement ``load_model`` plus the three request handlers. The handlers
    receive lists of ``TaskInstance`` and must append responses to each instance's
    ``resps`` — identical dataflow to the reference engine.
    """

    def __init__(
        self,
        model_id: str | None = None,
        batch_size: int = 8,
        dtype: str = "bfloat16",
        device: str | None = None,
        use_cache: str | None = None,
        mesh_shape: dict | None = None,
        load_in_8bit: bool = False,
        load_in_4bit: bool = False,
        **kwargs,
    ) -> None:
        self.model_id = model_id
        self.batch_size = int(batch_size)
        self.dtype = dtype
        self.device = device
        self.mesh_shape = mesh_shape
        # Weight-only int8/int4 (bitsandbytes load_in_8bit/load_in_4bit
        # equivalents, reference src/models/_base.py:116-121; ops.quant).
        # Adapters that need quantization earlier (e.g. before mesh sharding)
        # handle it inside load_model and set ``_int8_applied``.
        self.load_in_8bit = bool(getattr(self, "load_in_8bit", False)) or bool(load_in_8bit)
        self.load_in_4bit = bool(getattr(self, "load_in_4bit", False)) or bool(load_in_4bit)
        if self.load_in_8bit and self.load_in_4bit:
            raise ValueError("load_in_8bit and load_in_4bit are mutually exclusive")
        self._extra_kwargs = kwargs
        self.cache_hook = CacheHook(use_cache)
        self.task_dict: dict = {}

        quant_bits = 4 if self.load_in_4bit else (8 if self.load_in_8bit else None)
        if quant_bits is not None and not getattr(self, "_handles_quantized_load", False):
            # Memory-safe generic path: build the full-precision tree on HOST,
            # then stream it to the accelerator with eligible kernels quantized
            # (ops.quant.stream_quantize_to_device) — a 13B-class adapter would
            # otherwise hold bf16 + intN trees on-device simultaneously.
            # Adapters with their own loading strategy (e.g. on-device
            # quantized init) set ``_handles_quantized_load``.
            import jax

            from lmms_owc_tpu.ops.quant import stream_quantize_to_device

            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                self.load_model()
            self.params = stream_quantize_to_device(self.params, bits=quant_bits)
            self._int8_applied = True
            log.info("stream-quantized linear weights to int%d (weight-only)", quant_bits)
        else:
            self.load_model()

        if quant_bits is not None and not getattr(self, "_int8_applied", False):
            # Fallback for adapters that declared _handles_quantized_load but
            # took a path that skipped it (e.g. full-precision debug flags).
            from lmms_owc_tpu.ops.quant import quantize_params_int4, quantize_params_int8

            quantize = quantize_params_int8 if quant_bits == 8 else quantize_params_int4
            self.params = quantize(self.params)
            self._int8_applied = True
            log.info("quantized linear weights to int%d (weight-only)", quant_bits)

        # Load-time decoder q/k/v merge (LMMS_OWC_DECODER_QKV_MERGE, see
        # nn.qwen2_vl.merge_decoder_qkv): every family's decoder rides the
        # shared prefill/decode_step, so the merged single-projection layout
        # applies uniformly — the decoder tree lives either at the top level
        # (Qwen2-VL) or under "text" (all other families). Skipped under a TP
        # mesh (per-role Megatron sharding) and for int4 trees (the int4
        # kernel dispatches per-projection); a no-op on already-merged trees.
        if quant_bits != 4 and getattr(self, "params", None) is not None:
            from lmms_owc_tpu.nn.qwen2_vl import decoder_qkv_merge_enabled, merge_decoder_qkv

            if decoder_qkv_merge_enabled() and getattr(self, "mesh", None) is None:
                def _is_decoder(tree) -> bool:
                    return (
                        isinstance(tree, dict)
                        and isinstance(tree.get("layers"), dict)
                        and isinstance(tree["layers"].get("attn"), dict)
                    )

                if _is_decoder(self.params):
                    self.params = merge_decoder_qkv(self.params)
                    log.info("merged decoder q/k/v projections")
                elif isinstance(self.params, dict) and _is_decoder(self.params.get("text")):
                    self.params = dict(self.params)
                    self.params["text"] = merge_decoder_qkv(self.params["text"])
                    log.info("merged decoder q/k/v projections (text tree)")

    # ---------------------------------------------------------------- identity

    @property
    def rank(self) -> int:
        """Process index over the DCN (multi-host) axis; 0 on a single host."""
        try:
            import jax

            return jax.process_index()
        except Exception:
            return 0

    @property
    def world_size(self) -> int:
        try:
            import jax

            return jax.process_count()
        except Exception:
            return 1

    # ---------------------------------------------------------------- interface

    @abc.abstractmethod
    def load_model(self) -> None:
        """Load weights / build the jitted forward functions."""

    @abc.abstractmethod
    def loglikelihood(self, requests: list["TaskInstance"]) -> list[tuple[float, bool]]:
        """Return (loss, is_greedy) per request; loss is the continuation NLL."""

    @abc.abstractmethod
    def generate_until(self, requests: list["TaskInstance"]) -> list[str]:
        """Generate free-text responses for each request."""

    def generate_until_multi_round(self, requests: list["TaskInstance"]) -> list[list[str]]:
        """Multi-round conversation protocol, generic over any adapter.

        Protocol parity with reference src/models/_qwen2_vl.py:429-464 (the only
        reference adapter implementing it): round 0 uses the prebuilt context;
        later rounds call ``doc_to_text(doc, round_idx=r,
        previous_round_results=[...], last_round_info=...)`` which returns
        ``(visual, text, terminal, previous_round_results, last_round_info)``.
        Each round delegates all still-active requests to the adapter's batched
        :meth:`generate_until` (capability superset: every family gets
        multi-round). Request args: (ctx, gen_kwargs, doc_to_visual, doc_to_text,
        doc_id, task, split).
        """

        class _PseudoReq:
            __slots__ = ("args",)

            def __init__(self, args):
                self.args = args

        docs = []
        for req in requests:
            task = self.task_dict.get(req.args[5])
            if isinstance(task, tuple):
                task = task[1]
            docs.append(task.dataset[req.args[6]][req.args[4]])

        n = len(requests)
        rounds: list[list[str]] = [[] for _ in range(n)]
        infos: list = [None] * n
        prompts: list = [req.args[0] for req in requests]
        active = list(range(n))
        round_idx = 0
        while active and round_idx <= 16:
            if round_idx != 0:
                still_active = []
                for i in active:
                    doc_to_text = requests[i].args[3]
                    _vis, text, terminal, _prev, infos[i] = doc_to_text(
                        docs[i],
                        round_idx=round_idx,
                        previous_round_results=list(rounds[i]),
                        last_round_info=infos[i],
                    )
                    if not terminal:
                        prompts[i] = text
                        still_active.append(i)
                active = still_active
                if not active:
                    break

            sub_reqs = [
                _PseudoReq(
                    (
                        prompts[i],
                        requests[i].args[1],
                        requests[i].args[2],
                        requests[i].args[4],
                        requests[i].args[5],
                        requests[i].args[6],
                    )
                )
                for i in active
            ]
            texts = self.generate_until(sub_reqs)
            for i, text in zip(active, texts):
                rounds[i].append(text)
            round_idx += 1
        return rounds

    def _resolve_loglikelihood_request(self, req) -> tuple[str, str, list]:
        """(context, continuation_text, visuals) for a loglikelihood request.

        Task-built requests carry (ctx, doc_to_target, doc_to_visual, doc_id,
        task, split); ``acc_mutual_info``'s unconditional P(choice) requests
        carry just (ctx, choice) (reference src/data/tasks/_manager.py:578).
        """
        args = req.args
        ctx = args[0]
        if len(args) < 6:
            return ctx, str(args[1]), []
        _, doc_to_target, doc_to_visual, doc_id, task_name, split = args[:6]
        task = self.task_dict.get(task_name)
        if isinstance(task, tuple):
            task = task[1]
        doc = task.dataset[split][doc_id]
        continuation = doc_to_target(doc) if callable(doc_to_target) else doc_to_target
        if isinstance(continuation, list):
            continuation = continuation[0]
        visuals = (doc_to_visual(doc) if doc_to_visual else []) or []
        return ctx, str(continuation), visuals

    def _encode_continuation(self, continuation: str) -> list[int]:
        """Token ids for a loglikelihood continuation, encoded on its own.

        Contract (reference src/models/_llava_hf.py:181-183): any word-boundary
        delimiter is already IN the continuation — the task layer prepends
        ``target_delimiter`` for multiple_choice requests — so the scored text is
        ``prompt + continuation`` with no extra join character. Encoding the
        continuation separately (no special tokens) is deterministic across
        prompts, unlike slicing ``encode(prompt + continuation)`` at
        ``len(encode(prompt))``, which drifts when BPE merges across the boundary.
        """
        tok = self.tokenizer
        try:
            return list(tok.encode(continuation, add_special_tokens=False))
        except TypeError:
            return list(tok.encode(continuation))

    def _foreach_chunk_pipelined(
        self, chunks: list, prepare, run, depth: int = 2, finish=None
    ) -> list:
        """Process chunks with up to ``depth`` chunks' preparation in flight.

        ``prepare(chunk)`` does host preprocessing + vision encode (GIL-friendly);
        ``run(chunk, prepared)`` does the serial decode and returns a list of
        outputs — or, with ``finish``, only dispatches and returns a handle that
        ``finish(chunk, handle)`` fetches + postprocesses one iteration later.
        See :func:`lmms_owc_tpu.utils.foreach_chunk_pipelined`.
        """
        from lmms_owc_tpu.utils import foreach_chunk_pipelined

        return foreach_chunk_pipelined(chunks, prepare, run, depth=depth, finish=finish)

    def apply_chat_template(self, messages: list[dict]) -> str:
        """Render chat messages to a prompt string (--apply_chat_template).

        Adapters override with their family's template; the default is a plain
        role-prefixed concatenation.
        """
        rendered = "".join(f"{m['role']}: {m['content']}\n" for m in messages)
        return rendered + "assistant:"

    @property
    def chat_template(self) -> str:
        return type(self).__name__
