"""Per-stage MFU table for the flagship serving config (docs/architecture.md).

Merges ANALYTIC per-stage FLOPs (computed from the real preset config below)
with MEASURED per-XLA-module device times from an xplane capture:

    BENCH_PROFILE_DIR=/tmp/prof BENCH_REPEATS=1 python bench.py   # capture
    python tools/mfu_table.py /tmp/prof                           # table

Stage attribution is by jit module name: ``vision_encode_batch`` -> vision,
``prefill_logits``/``prefill`` -> prefill, ``decode_pool``/``greedy_generate``
-> decode (the fused greedy_generate module contains BOTH prefill and decode;
with the decode-pool default the stages are separate modules, which is what
makes this table measurable). FLOP counts are 2*M*N*K per matmul, full causal
attention counted unmasked (what the MXU actually executes at bucket shapes).

Peaks (v5e, one chip): 197 bf16 TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM.
Reference motivation: the reference never profiles per stage; its serving
bound is batch_size=1 per GPU (reference src/models/_base.py:103-104).
"""

from __future__ import annotations

import argparse
import sys

BF16_PEAK = 197e12
INT8_PEAK = 394e12
HBM_GBPS = 819e9

# Flagship serving shapes (bench.py defaults)
BATCH = 48
POOL = 2  # decode rows = POOL * BATCH
IMAGE_PATCHES = 1024  # 448x448 / 14x14
PROMPT_BUCKET = 320  # single-image chat prompt bucket (256 merged + text)
NEW_TOKENS = 64

# Qwen2-VL-7B dims (models/qwen2_vl.py PRESET_CONFIGS)
H, L, NH, KVH, HD, INTER, VOCAB = 3584, 28, 28, 4, 128, 18944, 152064
# vision tower (nn/qwen2_vl.py Qwen2VLVisionConfig defaults)
VD, VE, VH, VMLP, MERGE = 32, 1280, 16, 5120, 2


def vision_flops_per_image(n: int = IMAGE_PATCHES) -> float:
    patch_embed = 2 * n * (3 * 2 * 14 * 14) * VE
    per_layer = (
        2 * n * VE * (3 * VE)  # qkv
        + 2 * 2 * n * n * VE  # scores + PV
        + 2 * n * VE * VE  # proj
        + 2 * 2 * n * VE * VMLP  # fc1 + fc2
    )
    merged = n // (MERGE * MERGE)
    merger = 2 * merged * (VE * MERGE * MERGE) * (VE * MERGE * MERGE) + 2 * merged * (
        VE * MERGE * MERGE
    ) * H
    return patch_embed + VD * per_layer + merger


def decoder_linear_flops_per_token() -> float:
    qkvo = 2 * H * (NH * HD + 2 * KVH * HD + NH * HD)
    mlp = 3 * 2 * H * INTER
    return L * (qkvo + mlp)


def prefill_flops_per_seq(p: int = PROMPT_BUCKET) -> float:
    attn = L * 2 * 2 * p * p * NH * HD  # scores + PV, full (unmasked) matmuls
    return p * decoder_linear_flops_per_token() + attn + 2 * H * VOCAB


def decode_flops_per_seq(p: int = PROMPT_BUCKET, t: int = NEW_TOKENS) -> float:
    per_step_attn = L * 2 * 2 * (p + t) * NH * HD  # worst-case cache length
    per_step = decoder_linear_flops_per_token() + per_step_attn + 2 * H * VOCAB
    return t * per_step


def decode_hbm_bytes_per_step(rows: int = BATCH * POOL, p: int = PROMPT_BUCKET) -> float:
    weights = L * (H * (NH * HD + 2 * KVH * HD + NH * HD) + 3 * H * INTER) + 2 * (
        H * VOCAB
    )  # int8 linears (1 B each) + bf16 embed/lm_head... lm_head int8 too
    weight_bytes = weights  # int8: ~1 byte/param for all matmul weights
    cache_bytes = rows * L * 2 * KVH * (p + NEW_TOKENS) * HD * 2  # bf16 k+v
    return weight_bytes + cache_bytes


STAGE_OF = {
    "vision_encode_batch": "vision",
    "prefill_logits": "prefill",
    "prefill": "prefill",
    "decode_pool": "decode",
    "greedy_generate": "prefill+decode (fused)",
    "write_pool_chunk": "pool-assembly",
}


def stage_for_module(name: str) -> str | None:
    stripped = name.removeprefix("jit_").removeprefix("_")
    for key, stage in STAGE_OF.items():
        if stripped.startswith(key):
            return stage
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?")
    ap.add_argument("--images", type=int, default=384, help="timed images in the capture")
    ap.add_argument("--repeats", type=int, default=1, help="timed repeats in the capture")
    args = ap.parse_args()

    n_img = args.images * args.repeats
    flops = {
        "vision": vision_flops_per_image() * n_img,
        "prefill": prefill_flops_per_seq() * n_img,
        "decode": decode_flops_per_seq() * n_img,
    }
    flops["prefill+decode (fused)"] = flops["prefill"] + flops["decode"]

    if not args.trace_dir:
        print("analytic per-image FLOPs (no trace given):")
        for k in ("vision", "prefill", "decode"):
            print(f"  {k:<8} {flops[k] / n_img / 1e12:.3f} TFLOP/image")
        total = sum(flops[k] for k in ("vision", "prefill", "decode")) / n_img
        print(f"  total    {total / 1e12:.3f} TFLOP/image")
        print(f"  decode HBM floor: {decode_hbm_bytes_per_step() / 1e9:.2f} GB/step"
              f" at pool rows={BATCH * POOL}")
        return 0

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from profile_xplane import aggregate_modules, load_xspace

    spaces = load_xspace(args.trace_dir)
    mod_totals, mod_counts = aggregate_modules(spaces)
    stage_ms: dict[str, float] = {}
    stage_calls: dict[str, int] = {}
    for name, secs in mod_totals.items():
        stage = stage_for_module(name)
        if stage:
            stage_ms[stage] = stage_ms.get(stage, 0.0) + secs * 1e3
            stage_calls[stage] = stage_calls.get(stage, 0) + mod_counts[name]
    other_ms = sum(secs * 1e3 for n, secs in mod_totals.items() if not stage_for_module(n))

    print(f"{'stage':<26} {'ms':>10} {'calls':>7} {'TFLOP':>9} {'%int8pk':>8} {'%bf16pk':>8}")
    for stage in ("vision", "prefill", "decode", "prefill+decode (fused)", "pool-assembly"):
        if stage not in stage_ms:
            continue
        ms = stage_ms[stage]
        fl = flops.get(stage, 0.0)
        int8_pct = fl / (ms / 1e3) / INT8_PEAK * 100 if ms else 0.0
        bf16_pct = fl / (ms / 1e3) / BF16_PEAK * 100 if ms else 0.0
        print(
            f"{stage:<26} {ms:>10.1f} {stage_calls[stage]:>7} {fl / 1e12:>9.1f}"
            f" {int8_pct:>7.1f}% {bf16_pct:>7.1f}%"
        )
    total_ms = sum(stage_ms.values()) + other_ms
    total_fl = sum(flops[k] for k in ("vision", "prefill", "decode"))
    print(f"{'other modules':<26} {other_ms:>10.1f}")
    print(
        f"{'TOTAL (device)':<26} {total_ms:>10.1f} {'':>7} {total_fl / 1e12:>9.1f}"
        f" {total_fl / (total_ms / 1e3) / INT8_PEAK * 100:>7.1f}%"
        f" {total_fl / (total_ms / 1e3) / BF16_PEAK * 100:>7.1f}%"
    )
    print(f"\ndecode HBM floor: {decode_hbm_bytes_per_step() / 1e9:.2f} GB/step"
          f" at pool rows={BATCH * POOL} -> "
          f"{decode_hbm_bytes_per_step() / HBM_GBPS * 1e3:.2f} ms/step roofline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
