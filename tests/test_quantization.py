"""Weight-only int8 quantization (ops.quant) — the bitsandbytes replacement.

Reference parity target: ``BitsAndBytesConfig`` 8-bit loading at
src/models/_base.py:116-121, re-done as per-channel symmetric int8 with the
upcast fused into the TPU matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmms_owc_tpu.nn.layers import dense
from lmms_owc_tpu.ops.quant import (
    dense_out_dim,
    dequantize_int8,
    quantize_int8,
    quantize_params_int8,
)


class TestQuantizeInt8:
    def test_roundtrip_error_bound(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(64, 48).astype(np.float32))
        qp = quantize_int8(w)
        assert qp["q"].dtype == jnp.int8
        assert qp["scale"].shape == (48,)
        deq = dequantize_int8(qp)
        # Symmetric rounding error is at most half a quantization step per column.
        err = np.abs(np.asarray(deq) - np.asarray(w))
        bound = np.asarray(qp["scale"]) * 0.5 + 1e-7
        assert (err <= bound[None, :]).all()

    def test_stacked_layers_get_per_layer_scales(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(3, 16, 8).astype(np.float32))
        w = w * jnp.asarray([1.0, 10.0, 100.0])[:, None, None]
        qp = quantize_int8(w)
        assert qp["q"].shape == (3, 16, 8)
        assert qp["scale"].shape == (3, 8)
        deq = np.asarray(dequantize_int8(qp))
        rel = np.abs(deq - np.asarray(w)).max(axis=(1, 2)) / np.abs(np.asarray(w)).max(axis=(1, 2))
        assert (rel < 0.01).all()

    def test_dense_dispatch_matches_full_precision(self):
        rng = np.random.RandomState(2)
        params = {
            "w": jnp.asarray(rng.randn(32, 24).astype(np.float32)),
            "b": jnp.asarray(rng.randn(24).astype(np.float32)),
        }
        x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
        full = np.asarray(dense(params, x))
        qparams = quantize_params_int8({"proj": params})["proj"]
        assert "w" not in qparams and "b" in qparams
        assert dense_out_dim(qparams) == 24
        quant = np.asarray(dense(qparams, x))
        cos = (full * quant).sum() / (np.linalg.norm(full) * np.linalg.norm(quant))
        assert cos > 0.999
        np.testing.assert_allclose(quant, full, rtol=0.05, atol=0.15)

    def test_int8_activations_close_to_weight_only(self):
        """W8A8 (set_int8_activations): bounded extra drift over weight-only int8,
        restored cleanly after the toggle."""
        from lmms_owc_tpu.nn.layers import set_int8_activations

        rng = np.random.RandomState(3)
        params = {"w": jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05)}
        x = jnp.asarray(rng.randn(6, 48, 256).astype(np.float32))
        full = np.asarray(dense(params, x))
        qparams = quantize_params_int8({"proj": params})["proj"]
        w8 = np.asarray(dense(qparams, x))
        set_int8_activations(True)
        try:
            w8a8 = np.asarray(dense(qparams, x))
        finally:
            set_int8_activations(False)
        assert not np.allclose(w8a8, w8)  # the toggle actually changed the path
        scale = np.abs(full).max()
        assert np.abs(w8 - full).max() / scale < 0.02
        assert np.abs(w8a8 - full).max() / scale < 0.03
        # toggle restored: back to the weight-only result
        again = np.asarray(dense(qparams, x))
        np.testing.assert_array_equal(again, w8)

    def test_exclusions_preserved(self):
        tree = {
            "patch_embed": {"w": jnp.ones((8, 4))},
            "embed_tokens": jnp.ones((10, 4)),
            "mlp": {"up": {"w": jnp.ones((4, 8))}},
        }
        out = quantize_params_int8(tree)
        assert "w" in out["patch_embed"]
        assert out["embed_tokens"].shape == (10, 4)
        assert "w_q8" in out["mlp"]["up"]


class TestQuantizedDecoder:
    def test_prefill_logits_close_and_generate_runs(self):
        from lmms_owc_tpu.nn import qwen2_vl as qvl

        config = qvl.Qwen2VLConfig.from_hf_dict(
            dict(
                vocab_size=128, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
                tie_word_embeddings=True,
                rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            )
        )
        params = qvl.init_decoder_params(jax.random.PRNGKey(0), config, jnp.float32)
        qparams = quantize_params_int8(params)

        rng = np.random.RandomState(3)
        b, l = 2, 16
        embeds = jnp.asarray(rng.randn(b, l, 64).astype(np.float32))
        pos = jnp.broadcast_to(jnp.arange(l)[None, None, :], (3, b, l)).astype(jnp.int32)
        mask = jnp.ones((b, l), jnp.int32)

        logits_full, _ = qvl.prefill(params, embeds, pos, mask, config, cache_len=32)
        logits_q8, _ = qvl.prefill(qparams, embeds, pos, mask, config, cache_len=32)
        lf, lq = np.asarray(logits_full), np.asarray(logits_q8)
        cos = (lf * lq).sum() / (np.linalg.norm(lf) * np.linalg.norm(lq))
        assert cos > 0.99

        next_pos = jnp.full((b,), l, jnp.int32)
        tokens = qvl.greedy_generate(
            qparams, embeds, pos, mask, next_pos, config,
            max_new_tokens=4, cache_len=32,
            eos_ids=jnp.asarray([127], jnp.int32),
        )
        assert np.asarray(tokens).shape == (b, 4)

    def test_adapter_load_in_8bit_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model(
            "qwen2-vl-tiny", batch_size=2, random_init=True,
            dtype="float32", load_in_8bit=True,
        )
        assert "w_q8" in model.params["layers"]["attn"]["q"]

        tm = TaskManager(include_path=toy_task_path, model_name="qwen2-vl-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task

        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True,
        )
        assert "toy" in results["results"]
        assert isinstance(results["samples"]["toy"][0]["filtered_resps"][0], str)


class TestW8A8Decoder:
    def test_prefill_logits_and_tokens_vs_weight_only(self):
        """Decoder-level W8A8 drift: prefill logits stay close to weight-only
        int8 and greedy tokens agree on a tiny decoder (the model-level version
        of the per-matmul drift bound)."""
        import jax

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.nn.layers import set_int8_activations
        from lmms_owc_tpu.ops.quant import quantize_params_int8

        config = qvl.Qwen2VLConfig.from_hf_dict(dict(
            vocab_size=512, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
            tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            vision_config=dict(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0),
        ))
        params = qvl.init_decoder_params(jax.random.PRNGKey(0), config, jnp.float32)
        qparams = quantize_params_int8(params)

        rng = np.random.RandomState(0)
        B, L = 2, 16
        embeds = jnp.asarray(rng.randn(B, L, 64).astype(np.float32) * 0.1)
        pos = jnp.broadcast_to(jnp.arange(L)[None, None, :], (3, B, L)).astype(jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)

        w8, _ = qvl.prefill(qparams, embeds, pos, mask, config, cache_len=L + 8)
        set_int8_activations(True)
        try:
            w8a8, _ = qvl.prefill(qparams, embeds, pos, mask, config, cache_len=L + 8)
        finally:
            set_int8_activations(False)
        w8, w8a8 = np.asarray(w8), np.asarray(w8a8)
        assert not np.array_equal(w8, w8a8)
        denom = np.abs(w8).max()
        assert np.abs(w8a8 - w8).max() / denom < 0.05
        # Greedy argmax agreement on the last position.
        agree = (w8.argmax(-1) == w8a8.argmax(-1)).mean()
        assert agree >= 0.5  # tiny random model; real gaps are far wider


class TestInt8OtherAdapters:
    def test_instructblip_base_class_path(self, toy_task_path, toy_dataset):
        """load_in_8bit through the Model base class (adapter has no own handling)."""
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model(
            "instructblip-tiny", batch_size=2, random_init=True,
            dtype="float32", load_in_8bit=True,
        )
        assert model._int8_applied
        assert "w_q8" in model.params["text"]["layers"]["attn"]["q"]
        # Vision patch embedding must stay full precision (direct jnp.dot user).
        assert "w" in model.params["vision"]["patch_embed"]

        tm = TaskManager(include_path=toy_task_path, model_name="instructblip-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert isinstance(results["samples"]["toy"][0]["filtered_resps"][0], str)


class TestStreamQuantize:
    """stream_quantize_to_device: host tree -> device int8, numerically identical
    to post-hoc quantize_params_int8 (the 7B-enabler: bf16 never device-resident)."""

    def test_matches_posthoc_quantization(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.ops.quant import quantize_params_int8, stream_quantize_to_device

        rng = np.random.RandomState(0)
        tree = {
            "layers": {
                "mlp": {
                    "down": {"w": jnp.asarray(rng.randn(3, 16, 8), jnp.float32)},
                    "gate": {"w": jnp.asarray(rng.randn(3, 8, 16), jnp.float32)},
                },
            },
            "lm_head": {"w": jnp.asarray(rng.randn(8, 32), jnp.float32)},
            "embed_tokens": jnp.asarray(rng.randn(32, 8), jnp.float32),
            "final_norm": {"scale": jnp.ones(8, jnp.float32)},
        }
        posthoc = quantize_params_int8(tree)
        streamed = stream_quantize_to_device(jax.tree.map(np.asarray, tree))

        flat_a = jax.tree.leaves(posthoc)
        flat_b = jax.tree.leaves(streamed)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == np.int8:
                # XLA folds /127.0 into a reciprocal multiply under jit; a 1-ulp
                # scale difference can flip the round() of knife-edge values by
                # exactly one quantization level. Bound: |diff| <= 1, rare.
                diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
                assert diff.max() <= 1
                assert (diff != 0).mean() < 0.01
            else:
                np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_adapter_stream_path_generates(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.models import get_model

        model = get_model(
            "qwen2-vl-tiny", batch_size=2, random_init=True, dtype="float32",
            load_in_8bit=True,
        )
        assert model._int8_applied
        assert "w_q8" in model.params["layers"]["mlp"]["down"]


class TestInt4:
    """Weight-only int4 (bitsandbytes load_in_4bit equivalent, groupwise scales)."""

    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.ops.quant import quantize_int4, unpack_int4

        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(256, 32), jnp.float32)
        qp = quantize_int4(w, group=128)
        assert qp["q4"].shape == (128, 32) and qp["q4"].dtype == jnp.int8
        assert qp["scale"].shape == (2, 32)
        vals = np.asarray(unpack_int4(qp))
        assert vals.shape == (256, 32)
        assert vals.min() >= -7 and vals.max() <= 7

    def test_dequant_error_bound(self):
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.ops.quant import dequantize_int4, quantize_int4

        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(256, 64), jnp.float32)
        back = np.asarray(dequantize_int4(quantize_int4(w, group=64)))
        # 4-bit symmetric: |err| <= scale/2 = max|group|/14 per (group, channel)
        grouped = np.asarray(w).reshape(4, 64, 64)
        bound = np.abs(grouped).max(axis=1, keepdims=True) / 14.0 + 1e-6
        assert (np.abs(grouped - back.reshape(4, 64, 64)) <= bound).all()

    def test_dense_matches_dequantized(self):
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.nn.layers import dense
        from lmms_owc_tpu.ops.quant import dequantize_int4, quantize_int4

        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.randn(256, 48), jnp.float32)
        x = jnp.asarray(rng.randn(5, 256), jnp.float32)
        qp = quantize_int4(w, group=128)
        got = np.asarray(dense({"w_q4": qp}, x))
        want = np.asarray(x @ dequantize_int4(qp))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_stacked_layers(self):
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.ops.quant import dequantize_int4, quantize_int4

        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(3, 256, 16), jnp.float32)
        qp = quantize_int4(w, group=128)
        assert qp["q4"].shape == (3, 128, 16)
        assert qp["scale"].shape == (3, 2, 16)
        back = np.asarray(dequantize_int4(qp))
        assert back.shape == (3, 256, 16)

    def test_adapter_load_in_4bit_generates(self, toy_task_path, toy_dataset):
        import numpy as np
        from PIL import Image

        from lmms_owc_tpu.models import get_model

        model = get_model(
            "qwen2-vl-tiny", batch_size=2, random_init=True, dtype="float32",
            load_in_4bit=True,
        )
        assert model._int8_applied
        assert "w_q4" in model.params["layers"]["mlp"]["down"]

        class _Task:
            dataset = {"test": [{"image": Image.fromarray(np.zeros((64, 64, 3), np.uint8))}]}

        model.task_dict["b"] = _Task()

        class _Req:
            args = ("What is this?", {"max_new_tokens": 3, "do_sample": False, "until": None},
                    lambda d: [d["image"]], 0, "b", "test")

        out = model.generate_until([_Req()])
        assert len(out) == 1 and isinstance(out[0], str)

    def test_mutually_exclusive_flags(self):
        import pytest as _pytest

        from lmms_owc_tpu.models import get_model

        with _pytest.raises(ValueError):
            get_model("qwen2-vl-tiny", batch_size=1, random_init=True,
                      dtype="float32", load_in_8bit=True, load_in_4bit=True)


class TestInt4Kernel:
    """Pallas int4 matmul kernel (interpret mode on CPU; real on TPU)."""

    @pytest.mark.parametrize("m", [5, 48, 300])
    def test_matches_dequantized_reference(self, m):
        from lmms_owc_tpu.ops.int4_matmul import int4_matmul
        from lmms_owc_tpu.ops.quant import dequantize_int4, quantize_int4

        rng = np.random.RandomState(0)
        k_dim, n_dim = 1024, 512
        w = jnp.asarray(rng.randn(k_dim, n_dim), jnp.float32)
        qp = quantize_int4(w, group=128)
        x = jnp.asarray(rng.randn(m, k_dim), jnp.bfloat16)
        got = np.asarray(int4_matmul(x, qp["q4"], qp["scale"], interpret=True), np.float32)
        want = np.asarray(x.astype(jnp.float32) @ dequantize_int4(qp))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
        assert rel < 0.02  # bf16 dot operands vs f32 reference

    def test_supported_contract(self):
        from lmms_owc_tpu.ops.int4_matmul import int4_matmul_supported, set_use_pallas

        set_use_pallas(True)
        try:
            assert int4_matmul_supported(3584, 18944, 28)   # 7B MLP gate/up
            assert int4_matmul_supported(18944, 3584, 148)  # 7B MLP down
            assert int4_matmul_supported(3584, 152064, 28)  # lm_head
            assert int4_matmul_supported(1536, 8960, 12)    # 2B gate/up (adaptive blocks)
            assert int4_matmul_supported(8960, 1536, 70)    # 2B down
            assert int4_matmul_supported(1280, 3840, 10)    # vision qkv
            assert not int4_matmul_supported(3584, 18000, 28)  # N not 128-divisible
            assert not int4_matmul_supported(3585, 512, 28)    # odd K
        finally:
            set_use_pallas(False)


class TestStreamQuantizeInt4:
    def test_stream_bits4_matches_posthoc(self):
        import jax
        import numpy as np

        from lmms_owc_tpu.ops.quant import (
            quantize_params_int4,
            stream_quantize_to_device,
        )

        rng = np.random.RandomState(0)
        tree = {
            "mlp": {"down": {"w": jnp.asarray(rng.randn(3, 256, 16), jnp.float32)}},
            "lm_head": {"w": jnp.asarray(rng.randn(256, 32), jnp.float32)},
            "embed_tokens": jnp.asarray(rng.randn(32, 8), jnp.float32),
        }
        posthoc = quantize_params_int4(tree)
        streamed = stream_quantize_to_device(jax.tree.map(np.asarray, tree), bits=4)
        assert "w_q4" in streamed["mlp"]["down"] and "w_q4" in streamed["lm_head"]
        for a, b in zip(jax.tree.leaves(posthoc), jax.tree.leaves(streamed)):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype == np.int8:
                # 1-ulp scale differences can flip knife-edge nibbles; the
                # packed byte then differs in one nibble.
                assert a.shape == b.shape
                mismatch = (a != b).mean()
                assert mismatch < 0.02
            else:
                np.testing.assert_allclose(a, b, rtol=1e-6)
