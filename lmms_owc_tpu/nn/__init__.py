"""Pure-functional JAX model stack: layers, transformers, vision towers, generation.

Models are parameter pytrees (nested dicts of jax.Arrays) plus apply functions —
no module framework — so weight loading from safetensors and GSPMD sharding
annotations stay explicit and composable.
"""
