"""Pallas TPU kernel: matmul against a packed int4 groupwise-quantized weight.

XLA cannot fuse the nibble-unpack chain (shift/mask/concat) into a dot operand,
so the pure-XLA int4 path materializes the dequantized weight in HBM per matmul
— measured 3.2 vs 14.1 img/s/chip e2e for the 7B (see ops/quant.py). This kernel
keeps the weight 4-bit all the way to VMEM: each grid step DMAs a packed block,
unpacks + applies the per-(group, channel) scale in VMEM, and feeds the MXU —
HBM traffic is half the int8 path's.

Packed layout (ops.quant.quantize_int4): ``q4[i, n]`` holds contraction row
``i`` in the low nibble and row ``i + K/2`` in the high nibble (halves layout),
so one packed block yields one "lo" and one "hi" weight block whose scales are
groups ``[k]`` and ``[k + K/2/group]`` — both contiguous, no interleave.

Shape contract (dispatch falls back to XLA otherwise):
  x [M, K] (any float dtype), q4 [K/2, N] int8, scale [K/group, N] f32;
  K/2 % block_k == 0, N % block_n == 0, block_k % group == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int4_matmul", "int4_matmul_supported"]

_USE_PALLAS_OVERRIDE: bool | None = None


def set_use_pallas(value: bool | None) -> None:
    """Force the kernel on/off (None = auto: TPU backend only)."""
    global _USE_PALLAS_OVERRIDE
    _USE_PALLAS_OVERRIDE = value


def _use_pallas() -> bool:
    if _USE_PALLAS_OVERRIDE is not None:
        return _USE_PALLAS_OVERRIDE
    return jax.default_backend() == "tpu"


def pick_blocks(k: int, n: int, groups: int) -> tuple[int, int] | None:
    """Largest (block_k, block_n) satisfying the kernel's divisibility contract.

    block_k must divide K/2 and be a multiple of the scale group; block_n must
    divide N and the 128-lane tile. Adaptive rather than fixed so presets whose
    dims aren't 512-multiples (2B inter=8960, 3B inter=11008) stay on the
    4-bit kernel path instead of silently falling back to XLA dequant.
    """
    if k % 2:
        return None
    k2 = k // 2
    group = k // groups if groups else 0
    if group <= 0 or k2 % group:
        return None
    block_k = next((b for b in (512, 384, 256, 128) if k2 % b == 0 and b % group == 0), None)
    block_n = next((b for b in (1024, 512, 256, 128) if n % b == 0), None)
    if block_k is None or block_n is None:
        return None
    return block_k, block_n


def int4_matmul_supported(k: int, n: int, groups: int) -> bool:
    """Whether the kernel's divisibility contract holds for these dims."""
    return pick_blocks(k, n, groups) is not None and _use_pallas()


def _kernel(x_lo_ref, x_hi_ref, packed_ref, scale_ref,
            out_ref, acc_ref, *, n_k_steps: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = packed_ref[:]  # [bk, bn] int8
    bk, bn = packed.shape
    sg = bk // group  # scale rows consumed per block per half
    # Mosaic has no int8 vector shifts (arith.shli fails to legalize): widen to
    # int32, arithmetic-shift to sign-extend each nibble, operate from there.
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)

    # scale_ref block: [1, P, bn] — this k-step's lo rows [0:sg] and hi rows
    # [sg:2sg], pre-arranged (and sublane-padded) by the caller so every slice
    # here is STATIC: Mosaic cannot prove 8-alignment of dynamic sublane starts.
    scale_block = scale_ref[0]

    def dequant(nibbles, scale):
        wf = nibbles.astype(jnp.float32).reshape(sg, group, bn)
        wf = wf * scale[:, None, :]
        return wf.reshape(bk, bn).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(
        x_lo_ref[:].astype(jnp.bfloat16), dequant(lo, scale_block[:sg]),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jnp.dot(
        x_hi_ref[:].astype(jnp.bfloat16), dequant(hi, scale_block[sg : 2 * sg]),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_steps - 1)
    def _flush():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_k", "block_n", "interpret")
)
def _int4_matmul_2d(x, packed, scale, block_m: int, block_k: int, block_n: int,
                    interpret: bool = False):
    m, k_dim = x.shape
    k2, n = packed.shape
    groups = scale.shape[0]
    group = k_dim // groups
    n_k_steps = k2 // block_k
    sg = block_k // group  # scale rows per block

    # Per-k-step scale layout [n_k_steps, P, n]: rows [0:sg] are the step's lo
    # groups, [sg:2sg] its hi groups, sublane-padded to a multiple of 8 so the
    # BlockSpec satisfies the tile minimum and all kernel slices are static.
    half = groups // 2
    scale_lo = scale[:half].reshape(n_k_steps, sg, n)
    scale_hi = scale[half:].reshape(n_k_steps, sg, n)
    rows = 2 * sg
    padded_rows = (rows + 7) // 8 * 8
    scale_blocks = jnp.concatenate([scale_lo, scale_hi], axis=1)
    if padded_rows != rows:
        scale_blocks = jnp.pad(scale_blocks, ((0, 0), (0, padded_rows - rows), (0, 0)))

    grid = (m // block_m, n // block_n, n_k_steps)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k_steps=n_k_steps, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),           # x lo cols
            pl.BlockSpec((block_m, block_k), lambda i, j, k, s=n_k_steps: (i, k + s)),  # x hi cols
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),           # packed
            pl.BlockSpec((1, padded_rows, block_n), lambda i, j, k: (k, 0, j)),  # step scales
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=interpret,
    )(x, x, packed, scale_blocks)
    return out


def int4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array,
                block_k: int | None = None, block_n: int | None = None,
                interpret: bool = False) -> jax.Array:
    """``x @ dequant(packed, scale)`` with the weight 4-bit end-to-end in HBM.

    x: [..., K]; packed: [K/2, N] int8 (halves layout); scale: [G, N] f32.
    Returns [..., N] in x.dtype. Caller must have checked
    :func:`int4_matmul_supported`.
    """
    lead = x.shape[:-1]
    k_dim = x.shape[-1]
    if block_k is None or block_n is None:
        blocks = pick_blocks(k_dim, packed.shape[-1], scale.shape[-2])
        if blocks is None:
            raise ValueError(
                f"int4_matmul: unsupported dims K={k_dim} N={packed.shape[-1]}"
            )
        block_k, block_n = blocks
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k_dim)

    # Row blocking: one block for decode-size M, 128-row blocks for prefill.
    if m >= 128:
        block_m = 128
        pad = (-m) % block_m
    else:
        block_m = max(16, (m + 15) // 16 * 16)
        pad = block_m - m
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    out = _int4_matmul_2d(x2, packed, scale, block_m, block_k, block_n,
                          interpret=interpret)
    if pad:
        out = out[:m]
    return out.reshape(*lead, packed.shape[-1])
