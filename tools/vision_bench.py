"""Vision-tower microbenchmark: time `vision_encode_batch` alone at bench shapes.

The e2e bench (bench.py) mixes the tower with prefill/decode, so a tower change
needs ~15 min per A/B point; this isolates the tower (the 49%-of-int8-peak stage
in docs/architecture.md's MFU table) for minute-scale iteration. Same int8
on-device random-init and feature-major layout as the flagship serving config.

Usage (on the TPU host):
    python tools/vision_bench.py [--rows 48] [--repeats 5] [--profile DIR]
Env: the usual tower gates (LMMS_OWC_VISION_FM, LMMS_OWC_VISION_INT8_QK, ...).

Prints one JSON line: ms/call, img/s (rows*repeats / s), and % of int8 peak
using tools/mfu_table.py's analytic FLOP count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_INT8_PEAK = 394e12


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=48, help="images per tower call")
    ap.add_argument("--patches", type=int, default=1024, help="patches per image (448px = 1024)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--profile", default=os.environ.get("BENCH_PROFILE_DIR", ""))
    ap.add_argument("--bf16", action="store_true", help="bf16 weights instead of int8")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from lmms_owc_tpu.nn import qwen2_vl as qvl
    from lmms_owc_tpu.nn.layers import set_int8_activations
    from lmms_owc_tpu.ops.quant import init_quantized_on_device

    if int(os.environ.get("BENCH_INT8_ACT", "1")):
        set_int8_activations(True)

    vcfg = qvl.Qwen2VLVisionConfig()

    def init_vision(key):
        # Mirrors the vision section of nn/qwen2_vl.py init_params.
        v, dtype = vcfg, jnp.bfloat16
        vk = jax.random.split(key, 8)
        w = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
        zeros = lambda shape: jnp.zeros(shape, dtype)
        ones = lambda shape: jnp.ones(shape, dtype)
        layers = {
            "norm1": {"scale": ones((v.depth, v.embed_dim)), "bias": zeros((v.depth, v.embed_dim))},
            "norm2": {"scale": ones((v.depth, v.embed_dim)), "bias": zeros((v.depth, v.embed_dim))},
            "qkv": {"w": w(vk[0], (v.depth, v.embed_dim, 3 * v.embed_dim)), "b": zeros((v.depth, 3 * v.embed_dim))},
            "proj": {"w": w(vk[1], (v.depth, v.embed_dim, v.embed_dim)), "b": zeros((v.depth, v.embed_dim))},
            "fc1": {"w": w(vk[2], (v.depth, v.embed_dim, v.mlp_hidden)), "b": zeros((v.depth, v.mlp_hidden))},
            "fc2": {"w": w(vk[3], (v.depth, v.mlp_hidden, v.embed_dim)), "b": zeros((v.depth, v.embed_dim))},
        }
        merge_dim = v.embed_dim * v.spatial_merge_size**2
        return {
            "patch_embed": {"w": w(vk[4], (v.patch_dim, v.embed_dim))},
            "layers": layers,
            "merger": {
                "ln_q": {"scale": ones(v.embed_dim), "bias": zeros(v.embed_dim)},
                "fc1": {"w": w(vk[5], (merge_dim, merge_dim)), "b": zeros(merge_dim)},
                "fc2": {"w": w(vk[6], (merge_dim, 3584)), "b": zeros(3584)},  # 7B hidden
            },
        }

    key = jax.random.PRNGKey(0)
    if args.bf16:
        params = init_vision(key)
    else:
        vision_spec = jax.eval_shape(init_vision, key)
        params = init_quantized_on_device({"vision": vision_spec}, seed=0)["vision"]
    if qvl._vision_fm_enabled():
        params = qvl.vision_params_to_fm(params)

    side = int(round(args.patches**0.5))
    grid = (1, side, side)
    freqs_one = qvl.vision_rope_cos_sin([grid], vcfg)  # [P, hd/2]
    freqs = jnp.asarray(np.broadcast_to(freqs_one, (args.rows, *freqs_one.shape)))
    patches = jax.random.normal(
        jax.random.PRNGKey(1), (args.rows, args.patches, vcfg.patch_dim), jnp.bfloat16
    )

    def run():
        out = qvl.vision_encode_batch(params, patches, freqs, None, vcfg)
        # Terminal FETCH, not block_until_ready: the axon tunnel defers
        # execution until a host fetch, so timing without one measures nothing
        # (ROUND_NOTES operational note; first version of this tool read
        # 0.05 ms/call). The tiny slice forces the whole program.
        np.asarray(out[0, 0, :8])
        return out

    for _ in range(args.warmup):
        run()

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        run()
    elapsed = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()

    ms_per_call = elapsed / args.repeats * 1000
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mfu_table import vision_flops_per_image

    flops = vision_flops_per_image(args.patches) * args.rows
    print(
        json.dumps(
            {
                "metric": "vision_tower_ms_per_call",
                "rows": args.rows,
                "patches": args.patches,
                "value": round(ms_per_call, 2),
                "img_per_sec": round(args.rows / (elapsed / args.repeats), 2),
                "pct_int8_peak": round(100 * flops / (elapsed / args.repeats) / V5E_INT8_PEAK, 1),
                "gates": {
                    k: os.environ.get(k, "")
                    for k in (
                        "LMMS_OWC_VISION_FM",
                        "LMMS_OWC_VISION_INT8_QK",
                        "LMMS_OWC_PALLAS_MIN_KV",
                        "BENCH_INT8_ACT",
                    )
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
