"""Flash attention: Pallas TPU kernel with a jnp reference fallback.

Replaces the reference's CUDA flash-attn/xformers dependency (pyproject.toml
``nvidia`` extra, enabled via ``attn_implementation="flash_attention_2"`` at
src/models/_qwen2_vl.py:100-101). Online-softmax tiling keeps the [Lq, Lk] score
matrix out of HBM: per q-block, k/v are streamed through VMEM in blocks with a
running (max, sum, accumulator) triple carried across k blocks.

Layouts: q [B, H, Lq, D], k/v [B, H, Lk, D] or GQA [B, KVH, Lk, D], optional
kv_mask [B, Lk] (1 = valid). Sequence lengths must be padded to multiples of the
block sizes (the nn layer pads to MXU-aligned buckets anyway). GQA/MQA streams the
raw KV: the kernel grid is (batch, kv-head, group, q-block) with division-free k/v
index maps, and the XLA fallback contracts grouped q against the raw cache —
neither materializes repeated heads in HBM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = [
    "flash_attention",
    "fused_qkv_attention",
    "fused_qkv_attention_fm",
    "attention_reference",
    "gqa_attention_reference",
    "gqa_decode_attention",
    "packed_vision_attention",
    "packed_attention_reference",
]

import os as _os

# Block-size sweep on v5e (end-to-end bench, vision tower [32,16,1024,80]):
# 128/128 -> 18-19 img/s, 256/512 -> 24.4, 512/1024 -> 24.7, 1024/1024 -> 24.8
# vs 23.7 for XLA's fused attention. Large q blocks amortize per-program
# overhead and keep the MXU fed despite head_dim 80 lane padding. None = adapt
# to the sequence (min(512, Lq) / min(1024, Lk)).
DEFAULT_BLOCK_Q = int(_os.environ.get("LMMS_OWC_FLASH_BLOCK_Q", "0")) or None
DEFAULT_BLOCK_K = int(_os.environ.get("LMMS_OWC_FLASH_BLOCK_K", "0")) or None

_NEG_INF = -1e30

# Process-wide kernel toggle: None = auto (pallas on TPU backend). Set False when
# compiling for a virtual CPU mesh while a TPU plugin owns the default backend.
_USE_PALLAS_OVERRIDE: bool | None = None


def set_use_pallas(value: bool | None) -> None:
    global _USE_PALLAS_OVERRIDE
    _USE_PALLAS_OVERRIDE = value


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_mask: jax.Array | None = None,
    pair_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Plain jnp attention; the numerical ground truth for the Pallas kernel.

    ``pair_mask`` is an optional [Lq, Lk] (or [B, Lq, Lk]) boolean allow-mask used
    for block-diagonal patterns (e.g. Qwen2.5-VL window attention).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        q_idx = jnp.arange(lq)[:, None] + (lk - lq)
        k_idx = jnp.arange(lk)[None, :]
        scores = jnp.where(k_idx <= q_idx, scores, _NEG_INF)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :].astype(bool), scores, _NEG_INF)
    if pair_mask is not None:
        if pair_mask.ndim == 2:
            pair_mask = pair_mask[None]
        scores = jnp.where(pair_mask[:, None, :, :].astype(bool), scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def gqa_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Grouped-query attention without materializing repeated K/V heads.

    ``repeat_kv`` + plain attention makes XLA write out the broadcast cache
    (num_heads/num_kv_heads times the KV bytes) before the dot — on the decode
    path that multiplies the dominant HBM read. Here q is grouped to
    [B, KVH, G, Lq, D] and contracted against the raw [B, KVH, Lk, D] cache, so
    the cache is read once.

    Args: q [B, H, Lq, D]; k, v [B, KVH, Lk, D] with H % KVH == 0.
    """
    b, h, lq, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qg = q.reshape(b, kvh, g, lq, d)
    scores = jnp.einsum("bkgqd,bkld->bkgql", qg, k, preferred_element_type=jnp.float32) * scale
    if causal:
        lk = k.shape[2]
        q_idx = jnp.arange(lq)[:, None] + (lk - lq)
        k_idx = jnp.arange(lk)[None, :]
        scores = jnp.where(k_idx <= q_idx, scores, _NEG_INF)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, None, :].astype(bool), scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgql,bkld->bkgqd", weights.astype(v.dtype), v)
    return out.reshape(b, h, lq, d)


def _rope_rotate(x, cos, sin):
    """HF half-split rope on a [rows, D] tile; rotation in f32, back to x.dtype."""
    half = x.shape[-1] // 2
    x1 = x[:, :half].astype(jnp.float32)
    x2 = x[:, half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float, causal: bool, block_k: int,
    q_offset_blocks: bool, cos_ref=None, sin_ref=None,
):
    """One (batch, head, q-block) program: stream k/v blocks with online softmax.

    ``cos_ref``/``sin_ref`` ([1, L, D/2] f32, shared q/k positions) fold the rope
    rotation into the kernel: q/k tiles rotate on load, riding the attention
    memory traffic instead of materializing rotated copies in HBM (the vision
    tower's rope showed up as ~2.4 ms/layer of standalone elementwise plus
    ~1.9 ms/layer of cos/sin staging in the round-3 xplane).
    """
    block_q = q_ref.shape[2]
    head_dim = q_ref.shape[3]
    kv_len = k_ref.shape[2]
    num_k_blocks = kv_len // block_k

    import jax.experimental.pallas as pl

    i = pl.program_id(3)
    scalar_mask = mask_ref is not None and len(mask_ref.shape) == 2
    if scalar_mask:
        # (start, end) of the row's contiguous valid run, from the whole-array
        # SMEM table (program_id is illegal inside the fori body in interpret
        # mode, so read the scalars here).
        bi = pl.program_id(0)
        valid_start, valid_end = mask_ref[bi, 0], mask_ref[bi, 1]
    # Keep q/k/v in their stored dtype (bf16): the MXU runs bf16-multiply with
    # f32 accumulation at full rate, while f32xf32 dots run ~8x slower. The
    # scale folds into the f32 scores after the dot.
    q = q_ref[0, 0, :, :]
    if cos_ref is not None:
        q = _rope_rotate(
            q,
            cos_ref[0, pl.ds(i * block_q, block_q), :],
            sin_ref[0, pl.ds(i * block_q, block_q), :],
        )

    q_abs = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        if cos_ref is not None:
            k_blk = _rope_rotate(
                k_blk,
                cos_ref[0, pl.ds(kb * block_k, block_k), :],
                sin_ref[0, pl.ds(kb * block_k, block_k), :],
            )
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k] f32

        if causal or scalar_mask:
            k_abs = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if causal:
            scores = jnp.where(k_abs <= q_abs + (kv_len - pl.num_programs(3) * block_q), scores, _NEG_INF)
        if scalar_mask:
            # Contiguous padding run reduced to (start, end) SMEM scalars — no
            # mask tensor in HBM/VMEM, and no lane-axis slice to 128-align.
            valid = (k_abs >= valid_start) & (k_abs < valid_end)
            scores = jnp.where(valid, scores, _NEG_INF)
        elif mask_ref is not None:
            # Lane-axis mask tensor: the in-kernel slice offset kb*block_k must be
            # 128-aligned (Mosaic lane constraint) — dispatch enforces block_k%128==0.
            valid = mask_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(jnp.bool_)
            scores = jnp.where(valid[None, :], scores, _NEG_INF)

        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        # p in the value dtype for the second dot (bf16 multiply, f32 accumulate);
        # p is in [0, 1] so the bf16 rounding stays well inside attention noise.
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, head_dim), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    if causal:
        # Skip k blocks that lie entirely above the causal diagonal: the last valid
        # kv index for this q block is (i+1)*block_q - 1 + (Lk - Lq).
        offset = kv_len - pl.num_programs(3) * block_q
        upper = jnp.minimum(
            pl.cdiv((i + 1) * block_q + offset, block_k), num_k_blocks
        )
    else:
        upper = num_k_blocks
    acc, _, l_final = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l_final, 1e-30)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "scale", "block_q", "block_k", "use_pallas", "interpret",
        "kv_mask_contiguous",
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
    block_q: int | None = DEFAULT_BLOCK_Q,
    block_k: int | None = DEFAULT_BLOCK_K,
    use_pallas: bool | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    kv_mask_contiguous: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention. Pallas kernel on TPU; jnp reference elsewhere.

    Args:
        q: [B, H, Lq, D]; k, v: [B, H, Lk, D] or GQA [B, KVH, Lk, D] with
            H % KVH == 0. Neither path materializes repeated KV heads: the XLA
            path contracts grouped q against the raw cache, the Pallas path
            streams each kv head once over a (batch, kv-head, group, q-block)
            grid with division-free k/v index maps.
        causal: apply causal mask aligned to the sequence end (prefill).
        kv_mask: [B, Lk] validity mask (1 = attend).
        kv_mask_contiguous: static promise that each row of ``kv_mask`` is ONE
            contiguous run of ones (left/right padding masks). The kernel then
            reduces the mask to per-row (start, end) SMEM scalars — no mask
            tensor traffic, and any 16-multiple block_k tiles (e.g. the 144
            blocks of the 288 bucket). Non-contiguous masks (Idefics2's 2-D
            grid padding, Qwen2.5-VL's per-window packing) must leave this
            False: the tensor-mask path then requires 128-multiple k blocks
            and otherwise falls back to XLA.
        scale: score scale; defaults to 1/sqrt(D).
        use_pallas: force the kernel on/off (None = auto by backend).
        rope_cos, rope_sin: [B, L, D/2] position tables (self-attention, Lq == Lk):
            the kernel rotates q/k tiles on load (HF half-split convention) so no
            rotated copies hit HBM; the fallback pre-rotates and is bit-equivalent
            to apply_rope + attention.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if rope_cos is not None and q.shape[2] != k.shape[2]:
        raise ValueError("fused rope expects self-attention (Lq == Lk)")
    if use_pallas is None:
        if _USE_PALLAS_OVERRIDE is not None:
            use_pallas = _USE_PALLAS_OVERRIDE
        else:
            # Dispatch by END-TO-END A/B, not kernel microbenchmarks (isolated
            # timings through the deferred-execution tunnel do not predict e2e).
            # With bf16 dot operands + large blocks (see DEFAULT_BLOCK_* note)
            # the kernel beats XLA's fused attention from kv=512 up (r1 A/B:
            # 24.4-24.8 img/s vs 23.7 e2e); once scalar masks let the 288/384
            # buckets tile (16-multiple k blocks), 288 beat 512 in both
            # interleaved r3 pairs (19.55/20.32 vs 18.96/20.14). Tunable via
            # LMMS_OWC_PALLAS_MIN_KV.
            import os

            min_kv = int(os.environ.get("LMMS_OWC_PALLAS_MIN_KV", "288"))
            use_pallas = jax.default_backend() == "tpu" and k.shape[2] >= min_kv

    b, h, lq, d = q.shape
    lk = k.shape[2]
    # Candidates include the 32-granular bucket divisors (96/144/160/176/192)
    # so the 256-384 prefill buckets tile instead of falling back to XLA.
    if block_q is None:
        block_q = max(
            (x for x in (96, 128, 144, 160, 176, 192, 256, 384, 512) if x <= lq and lq % x == 0),
            default=128,
        )
    if block_k is None:
        # A lane-axis mask tensor is sliced at kb*block_k inside the kernel, so
        # its blocks must stay 128-aligned; scalar (contiguous) masks and the
        # maskless path may use any 16-multiple divisor.
        if kv_mask is not None and not kv_mask_contiguous:
            k_cands = (128, 256, 384, 512, 768, 1024)
        else:
            k_cands = (96, 128, 144, 160, 176, 192, 256, 384, 512, 768, 1024)
        block_k = max((x for x in k_cands if x <= lk and lk % x == 0), default=128)
    if not use_pallas or lq % block_q != 0 or lk % block_k != 0 or lq < block_q:
        if rope_cos is not None:
            from lmms_owc_tpu.nn.layers import apply_rope

            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        if k.shape[1] != h:
            return gqa_attention_reference(q, k, v, causal=causal, kv_mask=kv_mask, scale=scale)
        return attention_reference(q, k, v, causal=causal, kv_mask=kv_mask, scale=scale)
    # GQA rides the GRID: (batch, kv-head, group, q-block) with the k/v index
    # maps reading only (bi, ki) — the raw KV is streamed once per kv head and
    # revisited across the g * nq inner programs, with no repeated-head
    # broadcast materialized in HBM. The maps must stay division-free: a
    # `hi // g` map (3-D grid variant) cost ~35% e2e on the vision tower in a
    # hardware A/B (11.7 vs 17.9 img/s/chip) — Mosaic stopped proving that
    # consecutive programs revisit the same k/v block and re-DMA'd the
    # full-length KV per q-block program.
    kvh = k.shape[1]
    g = h // kvh

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b, kvh, g, lq // block_q)
    q_map = lambda bi, ki, gi, qi: (bi, ki * g + gi, qi, 0)
    kv_map = lambda bi, ki, gi, qi: (bi, ki, 0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, d), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if kv_mask is not None:
        if kv_mask_contiguous:
            # One contiguous run per row: ship (start, end) scalars via SMEM.
            m = kv_mask.astype(jnp.int32)
            first = jnp.argmax(m, axis=1).astype(jnp.int32)
            count = jnp.sum(m, axis=1)
            mask_se = jnp.stack([first, first + count], axis=1)  # [B, 2] i32
            # One whole-array SMEM block (Mosaic requires block dims == array
            # dims here); the kernel rows-indexes it by program_id(0).
            in_specs.append(
                pl.BlockSpec((b, 2), lambda bi, ki, gi, qi: (0, 0), memory_space=pltpu.SMEM)
            )
            args.append(mask_se)
        else:
            # TPU tiling needs the last two dims (sublane, lane) aligned; broadcast
            # the [B, Lk] mask to [B, 8, Lk] so the block shape is (1, 8, Lk).
            mask8 = jnp.broadcast_to(kv_mask.astype(jnp.int32)[:, None, :], (b, 8, lk))
            in_specs.append(
                pl.BlockSpec((1, 8, lk), lambda bi, ki, gi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(mask8)
        base_kernel = _flash_kernel
    else:
        base_kernel = _maskless_kernel_adapter
    kernel = functools.partial(
        base_kernel, scale=scale, causal=causal, block_k=block_k,
        **({"q_offset_blocks": True} if base_kernel is _flash_kernel else {}),
    )
    if rope_cos is not None:
        half = d // 2
        # Full-length [1, L, D/2] blocks (last dim == array dim, exempt from the
        # 128-lane tile minimum); q/k tiles index rows with pl.ds inside.
        for table in (rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32)):
            in_specs.append(
                pl.BlockSpec(
                    (1, lq, half), lambda bi, ki, gi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(table)

        def kernel_with_rope(*refs):
            # pallas passes refs as (*inputs, *outputs): q, k, v, [mask], cos, sin, o.
            q_ref, k_ref, v_ref = refs[:3]
            o_ref = refs[-1]
            rest = refs[3:-1]
            mask_ref = rest[0] if len(rest) == 3 else None
            cos_ref, sin_ref = rest[-2], rest[-1]
            _flash_kernel(
                q_ref, k_ref, v_ref, mask_ref, o_ref, scale=scale, causal=causal,
                block_k=block_k, q_offset_blocks=True, cos_ref=cos_ref, sin_ref=sin_ref,
            )

        kernel = kernel_with_rope

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(*args)
    return out


def _maskless_kernel_adapter(q_ref, k_ref, v_ref, o_ref, **kwargs):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, q_offset_blocks=True, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_q_heads", "num_kv_heads", "causal", "scale", "block_q", "block_k",
        "use_pallas", "interpret", "kv_mask_contiguous",
    ),
)
def fused_qkv_attention(
    qkvh: jax.Array,
    num_q_heads: int,
    num_kv_heads: int,
    *,
    causal: bool = False,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
    block_q: int | None = DEFAULT_BLOCK_Q,
    block_k: int | None = DEFAULT_BLOCK_K,
    use_pallas: bool | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    kv_mask_contiguous: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention over a COMBINED-heads qkv array — no q/k/v slice copies.

    ``qkvh``: [B, H + 2*KVH, L, D] with q heads at [0, H), k heads at
    [H, H+KVH), v heads at [H+KVH, H+2*KVH). This is ONE transpose away from a
    fused qkv projection's [B, L, (3*H)*D] output — versus the three per-role
    slice+transpose materializations XLA emits when q/k/v are separate arrays
    (~4.5 ms of the 18.3 ms vision layer at the 7B bench shapes: r3d xplane
    copy.41/copy.42/slice_bitcast_fusion). The kernel body is the proven
    :func:`_flash_kernel` unchanged; q/k/v arrive as three BlockSpec views of
    the one array whose index maps offset the HEAD axis by constants (the head
    axis is not lane-tiled, so unlike :func:`packed_vision_attention` there is
    no head_dim padding and no extra MXU work). Args otherwise match
    :func:`flash_attention`; returns [B, H, L, D].
    """
    b, total_h, l, d = qkvh.shape
    h, kvh = num_q_heads, num_kv_heads
    if total_h != h + 2 * kvh or h % kvh != 0:
        raise ValueError(f"qkvh head axis {total_h} != {h} + 2*{kvh}")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        if _USE_PALLAS_OVERRIDE is not None:
            use_pallas = _USE_PALLAS_OVERRIDE
        else:
            import os

            min_kv = int(os.environ.get("LMMS_OWC_PALLAS_MIN_KV", "288"))
            use_pallas = jax.default_backend() == "tpu" and l >= min_kv

    if block_q is None:
        block_q = max(
            (x for x in (96, 128, 144, 160, 176, 192, 256, 384, 512) if x <= l and l % x == 0),
            default=128,
        )
    if block_k is None:
        if kv_mask is not None and not kv_mask_contiguous:
            k_cands = (128, 256, 384, 512, 768, 1024)
        else:
            k_cands = (96, 128, 144, 160, 176, 192, 256, 384, 512, 768, 1024)
        block_k = max((x for x in k_cands if x <= l and l % x == 0), default=128)
    if not use_pallas or l % block_q != 0 or l % block_k != 0 or l < block_q:
        # Fallback: slice the roles apart and reuse the reference path.
        q = qkvh[:, :h]
        k = qkvh[:, h : h + kvh]
        v = qkvh[:, h + kvh :]
        if rope_cos is not None:
            from lmms_owc_tpu.nn.layers import apply_rope

            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        if kvh != h:
            return gqa_attention_reference(q, k, v, causal=causal, kv_mask=kv_mask, scale=scale)
        return attention_reference(q, k, v, causal=causal, kv_mask=kv_mask, scale=scale)

    g = h // kvh

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b, kvh, g, l // block_q)
    # Same grid/maps as flash_attention, but all three operands view ONE array:
    # constant head-axis offsets keep the maps affine and division-free, so
    # Mosaic still proves consecutive (gi, qi) programs revisit the same k/v
    # block (single DMA per (batch, kv head)).
    q_map = lambda bi, ki, gi, qi: (bi, ki * g + gi, qi, 0)
    k_map = lambda bi, ki, gi, qi: (bi, h + ki, 0, 0)
    v_map = lambda bi, ki, gi, qi: (bi, h + kvh + ki, 0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, l, d), k_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, l, d), v_map, memory_space=pltpu.VMEM),
    ]
    args = [qkvh, qkvh, qkvh]
    if kv_mask is not None:
        if kv_mask_contiguous:
            m = kv_mask.astype(jnp.int32)
            first = jnp.argmax(m, axis=1).astype(jnp.int32)
            count = jnp.sum(m, axis=1)
            mask_se = jnp.stack([first, first + count], axis=1)  # [B, 2] i32
            in_specs.append(
                pl.BlockSpec((b, 2), lambda bi, ki, gi, qi: (0, 0), memory_space=pltpu.SMEM)
            )
            args.append(mask_se)
        else:
            mask8 = jnp.broadcast_to(kv_mask.astype(jnp.int32)[:, None, :], (b, 8, l))
            in_specs.append(
                pl.BlockSpec((1, 8, l), lambda bi, ki, gi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(mask8)
        base_kernel = _flash_kernel
    else:
        base_kernel = _maskless_kernel_adapter
    kernel = functools.partial(
        base_kernel, scale=scale, causal=causal, block_k=block_k,
        **({"q_offset_blocks": True} if base_kernel is _flash_kernel else {}),
    )
    if rope_cos is not None:
        half = d // 2
        for table in (rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32)):
            in_specs.append(
                pl.BlockSpec(
                    (1, l, half), lambda bi, ki, gi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(table)

        def kernel_with_rope(*refs):
            q_ref, k_ref, v_ref = refs[:3]
            o_ref = refs[-1]
            rest = refs[3:-1]
            mask_ref = rest[0] if len(rest) == 3 else None
            cos_ref, sin_ref = rest[-2], rest[-1]
            _flash_kernel(
                q_ref, k_ref, v_ref, mask_ref, o_ref, scale=scale, causal=causal,
                block_k=block_k, q_offset_blocks=True, cos_ref=cos_ref, sin_ref=sin_ref,
            )

        kernel = kernel_with_rope

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, l, d), qkvh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * l * d,
            bytes_accessed=qkvh.size * qkvh.dtype.itemsize * 2,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(*args)
    return out


def packed_attention_reference(
    qkv: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    kv_mask: jax.Array | None = None,
    freqs: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """jnp ground truth for :func:`packed_vision_attention` (packed layout).

    Unpacks ``qkv`` [B, L, 3*NH*HP] (HP = padded head width, lanes >= head_dim
    zero) into standard [B, NH, L, head_dim] tensors, runs the reference
    attention, and re-packs the output to [B, L, NH*HP].
    """
    b, l, width = qkv.shape
    hp = width // (3 * num_heads)
    x = qkv.reshape(b, l, 3, num_heads, hp)
    q = x[:, :, 0].transpose(0, 2, 1, 3)[..., :head_dim]
    k = x[:, :, 1].transpose(0, 2, 1, 3)[..., :head_dim]
    v = x[:, :, 2].transpose(0, 2, 1, 3)[..., :head_dim]
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if freqs is not None:
        from lmms_owc_tpu.nn.layers import apply_rope

        cos = jnp.cos(freqs.astype(jnp.float32))
        sin = jnp.sin(freqs.astype(jnp.float32))
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    out = attention_reference(q, k, v, kv_mask=kv_mask, scale=scale)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, hp - head_dim)))
    return out.transpose(0, 2, 1, 3).reshape(b, l, num_heads * hp)


def _packed_kernel(
    q_ref, k_ref, v_ref, mask_ref, freqs_ref, o_ref, *, scale: float, block_k: int,
    head_dim: int,
):
    """One (batch, head, q-block) program over the packed [B, L, 3*NH*HP] qkv.

    q/k/v refs are lane-block views of the SAME packed array (the BlockSpec
    index maps select the role x head lane block), so the qkv projection's
    output is consumed in place — no [B, L, 3*NH*HD] -> 3x[B, NH, L, HD]
    layout copies ever exist in HBM (~4.5 ms of 18.3 ms per vision layer at
    the 7B bench shapes). Lanes >= head_dim carry exact zeros from the padded
    projection columns, contribute 0 to scores, and come out 0 in the output.
    Rope cos/sin are computed IN-KERNEL from the frequency table (VPU
    transcendentals are noise next to the softmax exp), replacing two
    staged f32 cos/sin operands with one.
    """
    block_q = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    num_k_blocks = kv_len // block_k

    import jax.experimental.pallas as pl

    i = pl.program_id(2)
    if mask_ref is not None:
        bi = pl.program_id(0)
        valid_start, valid_end = mask_ref[bi, 0], mask_ref[bi, 1]
    half = head_dim // 2

    def rotate(x, fr):
        # x [rows, HP] (lanes >= head_dim are zero), fr [rows, head_dim/2] f32.
        cos = jnp.cos(fr)
        sin = jnp.sin(fr)
        x1 = x[:, :half].astype(jnp.float32)
        x2 = x[:, half:head_dim].astype(jnp.float32)
        rot = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return jnp.concatenate([rot.astype(x.dtype), x[:, head_dim:]], axis=-1)

    q = q_ref[0, :, :]
    if freqs_ref is not None:
        q = rotate(q, freqs_ref[0, pl.ds(i * block_q, block_q), :])

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        if freqs_ref is not None:
            k_blk = rotate(k_blk, freqs_ref[0, pl.ds(kb * block_k, block_k), :])
        scores = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k] f32

        if mask_ref is not None:
            k_abs = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            valid = (k_abs >= valid_start) & (k_abs < valid_end)
            scores = jnp.where(valid, scores, _NEG_INF)

        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    hp = q_ref.shape[2]
    acc0 = jnp.zeros((block_q, hp), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc, _, l_final = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l_final, 1e-30)
    o_ref[0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "head_dim", "scale", "block_q", "block_k", "use_pallas",
        "interpret",
    ),
)
def packed_vision_attention(
    qkv: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    kv_mask: jax.Array | None = None,
    freqs: jax.Array | None = None,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal MHA over a PACKED qkv projection output (vision towers).

    Args:
        qkv: [B, L, 3*NH*HP] — the qkv dense output with each head's columns
            padded from head_dim to HP (a lane multiple, 128): column
            (role, head, c) lives at lane role*NH*HP + head*HP + c, padding
            columns are exact zeros (zero weight columns + zero bias). The
            kernel's q/k/v operands are three lane-block views of this one
            array, so no unpack/transpose copies are materialized
            (`nn/qwen2_vl.py _pad_vision_attn_params` builds the layout).
        num_heads, head_dim: true head geometry (head_dim 80 for qwen2-vl;
            the MXU pads the contraction to 128 either way, so the padded
            lanes cost nothing in the dots).
        kv_mask: [B, L] validity mask that MUST be one contiguous run per row
            (vision prefix padding) — reduced to (start, end) SMEM scalars.
        freqs: [B, L, head_dim/2] f32 rope angle table; cos/sin computed
            in-kernel (one staged operand instead of two).
    Returns: [B, L, NH*HP] attention output in packed layout (padding lanes
        zero), ready for a row-padded output projection.
    """
    b, l, width = qkv.shape
    hp = width // (3 * num_heads)
    if width != 3 * num_heads * hp or hp % 128 != 0:
        raise ValueError(f"packed qkv width {width} not 3*{num_heads}*128k")
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    if use_pallas is None:
        if _USE_PALLAS_OVERRIDE is not None:
            use_pallas = _USE_PALLAS_OVERRIDE
        else:
            use_pallas = jax.default_backend() == "tpu"
    if block_q is None:
        block_q = max(
            (x for x in (96, 128, 144, 160, 176, 192, 256, 384, 512) if x <= l and l % x == 0),
            default=128,
        )
    if block_k is None:
        block_k = max(
            (x for x in (96, 128, 144, 160, 176, 192, 256, 384, 512, 768, 1024) if x <= l and l % x == 0),
            default=128,
        )
    if not use_pallas or l % block_q != 0 or l % block_k != 0 or l < block_q:
        return packed_attention_reference(
            qkv, num_heads, head_dim, kv_mask=kv_mask, freqs=freqs, scale=scale
        )

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b, num_heads, l // block_q)
    nh = num_heads
    in_specs = [
        pl.BlockSpec((1, block_q, hp), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l, hp), lambda bi, hi, qi: (bi, 0, nh + hi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, l, hp), lambda bi, hi, qi: (bi, 0, 2 * nh + hi), memory_space=pltpu.VMEM),
    ]
    args = [qkv, qkv, qkv]
    has_mask = kv_mask is not None
    if has_mask:
        m = kv_mask.astype(jnp.int32)
        first = jnp.argmax(m, axis=1).astype(jnp.int32)
        count = jnp.sum(m, axis=1)
        mask_se = jnp.stack([first, first + count], axis=1)  # [B, 2] i32
        in_specs.append(
            pl.BlockSpec((b, 2), lambda bi, hi, qi: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(mask_se)
    has_freqs = freqs is not None
    if has_freqs:
        half = head_dim // 2
        in_specs.append(
            pl.BlockSpec((1, l, half), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(freqs.astype(jnp.float32))

    def kernel(*refs):
        # refs: qkv x3, [mask], [freqs], o.
        q_ref, k_ref, v_ref = refs[:3]
        o_ref = refs[-1]
        rest = refs[3:-1]
        idx = 0
        mask_ref = rest[idx] if has_mask else None
        idx += 1 if has_mask else 0
        freqs_ref = rest[idx] if has_freqs else None
        _packed_kernel(
            q_ref, k_ref, v_ref, mask_ref, freqs_ref, o_ref,
            scale=scale, block_k=block_k, head_dim=head_dim,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, hp), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, l, num_heads * hp), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * l * l * hp,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=b * num_heads * l * l,
        ),
        interpret=interpret,
    )(*args)
    return out


def _decode_kernel(lidx_ref, q_ref, k_ref, v_ref, mask_ref, *rest, scale: float):
    """One (batch-block, kv-head) program of single-token GQA decode attention.

    Block shapes: q [block_b, 1, G, D], k/v [1, block_b, 1, S, D] (the layer
    block of the STACKED cache, selected by the scalar-prefetched layer index
    in the BlockSpec index map — the cache is never sliced/copied in HBM),
    mask [block_b, 8, S]. The whole kv length fits in VMEM at decode shapes,
    so plain (not online) softmax in f32.

    With an int8 cache (``rest`` = k-scale ref, v-scale ref, out ref; scales
    [1, block_b, 1, 8, S], value replicated over the 8-sublane axis like the
    mask), the per-position dequant scales apply where S is already the LANE
    axis of a live f32 tile — to the scores row after the QK dot and to the
    softmax row before the PV dot — mathematically identical to dequantizing
    k/v and never touching the [S, D] tiles' sublane-oriented layout.
    """
    del lidx_ref  # consumed by the index maps
    if len(rest) == 3:
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest
        ks_ref = vs_ref = None
    block_b = q_ref.shape[0]
    for bi in range(block_b):
        qt = q_ref[bi, 0]  # [G, D] stored dtype (bf16 dot, f32 accumulate)
        kt = k_ref[0, bi, 0]  # [S, D]
        vt = v_ref[0, bi, 0]  # [S, D]
        if ks_ref is not None:
            # s8 values dot exactly in bf16 (|x| <= 127 is representable);
            # scales fold into the f32 score/softmax rows below.
            kt = kt.astype(qt.dtype)
            vt = vt.astype(qt.dtype)
        scores = (
            jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [G, S] f32
        if ks_ref is not None:
            scores = scores * ks_ref[0, bi, 0, 0, :][None, :]
        valid = mask_ref[bi, 0, :] != 0
        scores = jnp.where(valid[None, :], scores, _NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        # Normalize in f32 then cast, matching gqa_attention_reference's
        # softmax(f32).astype(v.dtype) before the PV dot.
        w = p / jnp.sum(p, axis=-1, keepdims=True)
        if vs_ref is not None:
            w = w * vs_ref[0, bi, 0, 0, :][None, :]
        w = w.astype(vt.dtype)
        out = jax.lax.dot_general(
            w, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[bi, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "use_pallas", "interpret"))
def gqa_decode_attention(
    q: jax.Array,
    cache_k: jax.Array,
    cache_v: jax.Array,
    layer_idx: jax.Array,
    kv_mask: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    *,
    scale: float | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Single-token GQA attention against ONE LAYER of a stacked KV cache.

    Decode-path replacement for dynamic_index_in_dim + gqa_attention_reference
    inside the layer fori-loop: the r3b xplane showed that form costing
    ~5.4 ms/step at 7B B=48 against a ~1.2 ms cache-read roofline — XLA
    materializes the per-layer cache slice (2x 0.68 ms/step) and runs the
    f32 score/softmax/PV chain as separate HBM-bound fusions (1.9 ms/step).
    Here the layer block is DMA'd straight out of the stacked cache (the
    scalar-prefetched ``layer_idx`` feeds the BlockSpec index map) and
    scores+softmax+PV fuse into one VMEM-resident program.

    Args:
        q: [B, H, D] current-token queries (consecutive-head GQA grouping).
        cache_k, cache_v: [L, B, KVH, S, D] stacked caches, H % KVH == 0.
            May be int8 (halves the per-step cache read, the second-largest
            decode HBM stream after the weights); then k_scale/v_scale are
            required.
        layer_idx: scalar int32 layer to attend against.
        kv_mask: [B, S], 1 = attend.
        k_scale, v_scale: [L, B, KVH, 8, S] f32 per-token dequant scales for an
            int8 cache (value replicated over the 8-sublane axis so the layer
            block meets the (8, 128) tile minimum, like the mask).
    Returns: [B, H, D] in q.dtype.
    """
    b, h, d = q.shape
    kvh, s = cache_k.shape[2], cache_k.shape[3]
    g = h // kvh
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        if _USE_PALLAS_OVERRIDE is not None:
            use_pallas = _USE_PALLAS_OVERRIDE
        else:
            # LMMS_OWC_DECODE_KERNEL=0 opts out (A/B hygiene; see e2e numbers
            # in ROUND_NOTES before trusting a change here).
            use_pallas = (
                jax.default_backend() == "tpu"
                and _os.environ.get("LMMS_OWC_DECODE_KERNEL", "1") != "0"
            )

    if not use_pallas:
        ck = jax.lax.dynamic_index_in_dim(cache_k, layer_idx, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(cache_v, layer_idx, 0, keepdims=False)
        if k_scale is not None:
            sk = jax.lax.dynamic_index_in_dim(k_scale, layer_idx, 0, keepdims=False)
            sv = jax.lax.dynamic_index_in_dim(v_scale, layer_idx, 0, keepdims=False)
            ck = (ck.astype(jnp.float32) * sk[:, :, 0, :, None]).astype(q.dtype)
            cv = (cv.astype(jnp.float32) * sv[:, :, 0, :, None]).astype(q.dtype)
        out = gqa_attention_reference(
            q[:, :, None, :], ck, cv, kv_mask=kv_mask, scale=scale
        )
        return out[:, :, 0, :]

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_b = max(x for x in range(1, min(b, 8) + 1) if b % x == 0)
    qg = q.reshape(b, kvh, g, d)
    # (1, 8, S)-tiled mask (sublane broadcast), same trick as flash_attention.
    mask8 = jnp.broadcast_to(kv_mask.astype(jnp.int32)[:, None, :], (b, 8, s))
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    in_specs = [
        pl.BlockSpec((block_b, 1, g, d), lambda bi, hi, lref: (bi, hi, 0, 0)),
        pl.BlockSpec(
            (1, block_b, 1, s, d), lambda bi, hi, lref: (lref[0], bi, hi, 0, 0)
        ),
        pl.BlockSpec(
            (1, block_b, 1, s, d), lambda bi, hi, lref: (lref[0], bi, hi, 0, 0)
        ),
        pl.BlockSpec((block_b, 8, s), lambda bi, hi, lref: (bi, 0, 0)),
    ]
    args = [qg, cache_k, cache_v, mask8]
    scale_bytes = 0
    if k_scale is not None:
        scale_spec = pl.BlockSpec(
            (1, block_b, 1, 8, s), lambda bi, hi, lref: (lref[0], bi, hi, 0, 0)
        )
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
        scale_bytes = 2 * b * kvh * 8 * s * k_scale.dtype.itemsize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b, kvh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 1, g, d), lambda bi, hi, lref: (bi, hi, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * d,
            bytes_accessed=2 * b * kvh * s * d * cache_k.dtype.itemsize
            + 2 * b * h * d * q.dtype.itemsize
            + scale_bytes,
            transcendentals=b * h * s,
        ),
        interpret=interpret,
    )(lidx, *args)
    return out.reshape(b, h, d)


def _rope_rotate_fm(x, cos, sin):
    """HF half-split rope on a FEATURE-MAJOR [D, cols] tile (head_dim on the
    SUBLANE axis): static sublane-half slices, rotation in f32."""
    half = x.shape[0] // 2
    x1 = x[:half, :].astype(jnp.float32)
    x2 = x[half:, :].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=0
    ).astype(x.dtype)


def _flash_kernel_fm(
    mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int,
    cos_ref=None, sin_ref=None,
):
    """One (batch, head, q-block) program of FEATURE-MAJOR flash attention.

    Operand tiles carry head_dim on SUBLANES and sequence on LANES — q
    [1, D, block_q], k/v [1, D, L] — so the caller never transposes the qkv
    projection's [N, 3*H*D, L] feature-major output into [N, H, L, D] tiles
    (the token-major tower pays a 2-pass XLA transpose per layer for that,
    ~2.8 ms/layer at the 7B bench shapes: r3e xplane copy.41/copy.42).

    Score orientation is [block_k, block_q] (k on sublanes): softmax reduces
    over SUBLANES, so the online (m, l) state is [1, block_q] — lane-aligned
    with the [D, block_q] accumulator, and both dots are plain MXU forms:
    scores = dot(k_blk^T contracted on D) and acc += v_blk @ p.

    ``mask_ref`` is the optional [B, 2] SMEM (start, end) table of each row's
    contiguous valid run (None = no mask).

    VPU economy (the r5 MFU table showed this kernel VPU-bound, not MXU-bound,
    at the [48, 16, 1024, 80] bench shape — QK+PV are ~42 ms of ~130 ms/chunk):
    the softmax scale AND log2(e) fold into the tiny [D, block_q] q tile before
    the dot, and the exponentials run in base 2 (exp(x·scale) ≡ exp2(x·scale·
    log2e) — the same softmax exactly), so the [block_k, block_q] score tensor
    sees one fewer full multiply pass and each exp skips its internal
    ·log2e step. With a single k-block (the 448px tower: L = block_k = 1024)
    the online (m, l) update reduces to a plain softmax with no correction
    terms.
    """
    head_dim = q_ref.shape[1]
    block_q = q_ref.shape[2]
    kv_len = k_ref.shape[2]
    num_k_blocks = kv_len // block_k

    import jax.experimental.pallas as pl

    i = pl.program_id(2)
    if mask_ref is not None:
        bi = pl.program_id(0)
        valid_start, valid_end = mask_ref[bi, 0], mask_ref[bi, 1]

    q = q_ref[0, :, :]  # [D, block_q]
    if cos_ref is not None:
        q = _rope_rotate_fm(
            q,
            cos_ref[0, :, pl.ds(i * block_q, block_q)],
            sin_ref[0, :, pl.ds(i * block_q, block_q)],
        )
    # Fold scale·log2e into q (a [D, block_q] pass) so scores need no scaling
    # pass and the exps can run in base 2. f32 multiply, cast back for the MXU.
    _LOG2E = 1.4426950408889634
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

    def scores_for(kb):
        k_blk = k_ref[0, :, pl.ds(kb * block_k, block_k)]  # [D, block_k]
        if cos_ref is not None:
            k_blk = _rope_rotate_fm(
                k_blk,
                cos_ref[0, :, pl.ds(kb * block_k, block_k)],
                sin_ref[0, :, pl.ds(kb * block_k, block_k)],
            )
        # [block_k, block_q] f32 (log2 units): contraction over head_dim.
        scores = jax.lax.dot_general(
            k_blk, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask_ref is not None:
            k_abs = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 0
            )
            valid = (k_abs >= valid_start) & (k_abs < valid_end)
            scores = jnp.where(valid, scores, _NEG_INF)
        return scores

    def pv(kb, p):
        v_blk = v_ref[0, :, pl.ds(kb * block_k, block_k)]
        return jax.lax.dot_general(
            v_blk, p.astype(v_blk.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, block_q]

    if num_k_blocks == 1:
        scores = scores_for(0)
        m = jnp.max(scores, axis=0, keepdims=True)  # [1, block_q]
        p = jnp.exp2(scores - m)
        l_final = jnp.sum(p, axis=0, keepdims=True)
        acc = pv(0, p)
    else:
        def body(kb, carry):
            acc, m_prev, l_prev = carry
            scores = scores_for(kb)
            m_cur = jnp.max(scores, axis=0, keepdims=True)  # [1, block_q]
            m_new = jnp.maximum(m_prev, m_cur)
            correction = jnp.exp2(m_prev - m_new)
            p = jnp.exp2(scores - m_new)
            l_new = l_prev * correction + jnp.sum(p, axis=0, keepdims=True)
            acc = acc * correction + pv(kb, p)
            return acc, m_new, l_new

        acc0 = jnp.zeros((head_dim, block_q), dtype=jnp.float32)
        m0 = jnp.full((1, block_q), _NEG_INF, dtype=jnp.float32)
        l0 = jnp.zeros((1, block_q), dtype=jnp.float32)
        acc, _, l_final = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l_final, 1e-30)
    o_ref[0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "head_dim", "scale", "block_q", "block_k", "use_pallas",
        "interpret",
    ),
)
def fused_qkv_attention_fm(
    qkv_fm: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    kv_mask: jax.Array | None = None,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    use_pallas: bool | None = None,
    rope_cos: jax.Array | None = None,
    rope_sin: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Feature-major self-attention over a combined qkv projection output.

    ``qkv_fm``: [B, 3*H*D, L] — the UNTRANSPOSED output of a feature-major qkv
    dense (channels ordered role-major: q heads' rows at [0, H*D), k at
    [H*D, 2*H*D), v at [2*H*D, 3*H*D)). The kernel's q/k/v operands are
    sublane-offset BlockSpec views (blocks of D=head_dim rows — D is a
    multiple of 8, so the 80-row head offsets are legal sublane tiles, unlike
    the 128-granular LANE offsets that sank packed_vision_attention).

    ``kv_mask``: optional [B, L] with ONE contiguous valid run per row (the
    vision towers' [:num_patches] prefix), shipped as SMEM (start, end).
    ``rope_cos``/``rope_sin``: optional FEATURE-MAJOR [B or 1, D/2, L] f32.
    MHA only (vision towers). Returns [B, H*D, L].
    """
    b, total_c, l = qkv_fm.shape
    h, d = num_heads, head_dim
    if total_c != 3 * h * d:
        raise ValueError(f"qkv_fm channels {total_c} != 3*{h}*{d}")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        if _USE_PALLAS_OVERRIDE is not None:
            use_pallas = _USE_PALLAS_OVERRIDE
        else:
            import os

            min_kv = int(os.environ.get("LMMS_OWC_PALLAS_MIN_KV", "288"))
            use_pallas = jax.default_backend() == "tpu" and l >= min_kv
    if block_q is None:
        import os

        env_bq = int(os.environ.get("LMMS_OWC_VISION_BLOCK_Q", "0"))
        if env_bq and l % env_bq == 0 and env_bq <= l:
            block_q = env_bq
        else:
            # 1024 included since the r5 microbench A/B at [48,16,1024,80]:
            # block_q 512 -> 1024 cut the tower 392.6 -> 370.5 ms/call (fewer
            # programs, k-rope rotated once per head). VMEM stays modest
            # (f32 scores block 4 MB).
            block_q = max(
                (x for x in (128, 256, 512, 1024) if x <= l and l % x == 0),
                default=128,
            )
    if block_k is None:
        block_k = max(
            (x for x in (128, 256, 512, 1024) if x <= l and l % x == 0), default=128
        )
    if not use_pallas or l % block_q != 0 or l % block_k != 0:
        # Fallback: transpose to token-major and reuse the reference path.
        qkv = qkv_fm.reshape(b, 3 * h, d, l).transpose(0, 1, 3, 2)
        q, k, v = qkv[:, :h], qkv[:, h : 2 * h], qkv[:, 2 * h :]
        if rope_cos is not None:
            from lmms_owc_tpu.nn.layers import apply_rope

            cos_tm = jnp.swapaxes(rope_cos, -1, -2)  # [B, L, D/2]
            sin_tm = jnp.swapaxes(rope_sin, -1, -2)
            q = apply_rope(q, cos_tm, sin_tm)
            k = apply_rope(k, cos_tm, sin_tm)
        out = attention_reference(q, k, v, kv_mask=kv_mask, scale=scale)
        return out.transpose(0, 1, 3, 2).reshape(b, h * d, l)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b, h, l // block_q)
    # Head offsets are block indices along the CHANNEL axis (block = d rows):
    # constant addition only, keeping Mosaic's revisit detection intact.
    q_map = lambda bi, hi, qi, *_: (bi, hi, qi)
    k_map = lambda bi, hi, qi, *_: (bi, h + hi, 0)
    v_map = lambda bi, hi, qi, *_: (bi, 2 * h + hi, 0)
    in_specs = [
        pl.BlockSpec((1, d, block_q), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, l), k_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, l), v_map, memory_space=pltpu.VMEM),
    ]
    args = [qkv_fm, qkv_fm, qkv_fm]

    num_scalar = 0
    scalar_args: list = []
    if kv_mask is not None:
        m = kv_mask.astype(jnp.int32)
        first = jnp.argmax(m, axis=1).astype(jnp.int32)
        count = jnp.sum(m, axis=1)
        mask_se = jnp.stack([first, first + count], axis=1)  # [B, 2] i32
        num_scalar = 1
        scalar_args = [mask_se]

    if rope_cos is not None:
        cos = jnp.broadcast_to(rope_cos.astype(jnp.float32), (b, d // 2, l))
        sin = jnp.broadcast_to(rope_sin.astype(jnp.float32), (b, d // 2, l))
        rope_spec = pl.BlockSpec(
            (1, d // 2, l),
            (lambda bi, hi, qi, *_: (bi, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs += [rope_spec, rope_spec]
        args += [cos, sin]

    base = functools.partial(_flash_kernel_fm, scale=scale, block_k=block_k)
    has_rope = rope_cos is not None
    if num_scalar and has_rope:
        def kernel(mref, qr, kr, vr, cr, sr, orf):
            base(mref, qr, kr, vr, orf, cos_ref=cr, sin_ref=sr)
    elif num_scalar:
        def kernel(mref, qr, kr, vr, orf):
            base(mref, qr, kr, vr, orf)
    elif has_rope:
        def kernel(qr, kr, vr, cr, sr, orf):
            base(None, qr, kr, vr, orf, cos_ref=cr, sin_ref=sr)
    else:
        def kernel(qr, kr, vr, orf):
            base(None, qr, kr, vr, orf)
    out_spec = pl.BlockSpec(
        (1, d, block_q), lambda bi, hi, qi, *_: (bi, hi, qi)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalar, grid=grid, in_specs=in_specs, out_specs=out_spec
    )
    call_args = scalar_args + args
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * d, l), qkv_fm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * l * d,
            bytes_accessed=qkv_fm.size * qkv_fm.dtype.itemsize,
            transcendentals=b * h * l * l,
        ),
        interpret=interpret,
    )(*call_args)
    return out
