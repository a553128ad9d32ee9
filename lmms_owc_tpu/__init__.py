"""lmms_owc_tpu — TPU-native framework for evaluating Large Multimodal Models as
open-world image classifiers.

A from-scratch JAX/XLA/Pallas/pjit rebuild with the capabilities of the reference
PyTorch harness (altndrr/lmms-owc): task registry driven by YAML configs, model
adapter registry, request -> filter -> metric dataflow, open-world text-matching and
embedding-similarity scoring, and Elo-style pairwise ranking.

Architecture (TPU-first, not a port):
  - ``lmms_owc_tpu.nn``        pure-functional JAX model stack (ViT towers, decoders,
                               KV-cache generation under ``jax.jit`` + ``lax.scan``).
  - ``lmms_owc_tpu.ops``       Pallas TPU kernels (flash attention, fused image
                               preprocessing, batched similarity matmuls) with jnp
                               fallbacks for CPU testing.
  - ``lmms_owc_tpu.parallel``  device-mesh construction + sharding rules (pjit/GSPMD)
                               replacing the reference's accelerate/NCCL stack.
  - ``lmms_owc_tpu.engine``    evaluator + results tracker (host orchestration).
  - ``lmms_owc_tpu.tasks``     YAML task system (config, manager, instances).
  - ``lmms_owc_tpu.models``    model adapters bridging requests to the JAX stack.
  - ``lmms_owc_tpu.metrics`` / ``filters`` / ``samplers`` / ``pipelines``
                               scoring stages; embedding similarity runs as batched
                               TPU matmuls.
"""

__version__ = "0.1.0"
