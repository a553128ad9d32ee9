"""Pallas TPU kernels with jnp fallbacks for CPU testing.

Hot ops replacing the reference's CUDA fast-paths (flash-attn/xformers, PIL+processor
image preprocessing, torch.bmm similarity): flash attention, fused image
preprocessing (resize/normalize/patchify), and batched similarity matmuls.
"""
