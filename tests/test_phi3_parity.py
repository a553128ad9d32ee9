"""Phi-3 text decoder parity (fused-weight split + longrope) + phi3v adapter smoke."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


class TestPhi3TextParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import Phi3Config, Phi3ForCausalLM

        from lmms_owc_tpu.models.phi3v import split_phi3_fused_weights
        from lmms_owc_tpu.nn import llama as L

        torch.manual_seed(0)
        hf_config = Phi3Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=256, original_max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
            pad_token_id=0,
            rope_scaling={
                "type": "longrope",
                "short_factor": [1.0 + 0.1 * i for i in range(8)],
                "long_factor": [2.0] * 8,
            },
        )
        model = Phi3ForCausalLM(hf_config).eval().float()
        state = split_phi3_fused_weights({k: v.numpy() for k, v in model.state_dict().items()})
        config = L.llama_config_from_hf(hf_config.to_dict())
        params = L.convert_hf_llama_weights(state, config, jnp.float32)
        return model, config, params

    def test_longrope_config(self, setup):
        _, config, _ = setup
        dec = config.to_decoder_config()
        assert dec.rope_longrope is not None
        attention_factor, factors = dec.rope_longrope
        assert len(factors) == 8
        assert attention_factor > 1.0  # max 256 > original 64

    def test_prefill_logits(self, setup):
        from lmms_owc_tpu.nn import llama as L

        model, config, params = setup
        rng = np.random.RandomState(0)
        B, Lseq = 2, 16
        input_ids = rng.randint(3, 250, size=(B, Lseq))
        mask = np.ones((B, Lseq), dtype=np.int64)
        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
            ).logits[:, -1, :].numpy()

        position_ids, _ = L.llama_positions(mask)
        embeds = jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
        logits, _ = L.prefill(
            params, embeds, jnp.asarray(position_ids),
            jnp.asarray(mask.astype(np.int32)), config.to_decoder_config(), cache_len=Lseq + 8,
        )
        np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-3, atol=5e-3)


class TestPhi3vAdapter:
    def test_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("phi3v-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="phi3v-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]


class TestPhi3vHDTransform:
    @pytest.fixture(scope="class")
    def model(self):
        from lmms_owc_tpu.models import get_model

        # tiny preset: crop size 28, patch 14 -> side 2, half 1
        return get_model("phi3v-tiny", batch_size=2, random_init=True, dtype="float32")

    def test_token_count_formula(self, model):
        from PIL import Image

        img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (60, 100, 3), dtype=np.uint8))
        # ratio 100/60: scale=5 -> 5x3 crops; tokens = 15*1 + 3*1 + 1 + 1*(1+1) = 21
        feats = model._encode_one_image(img)
        assert feats.shape[0] == 21
        assert feats.shape[1] == model.text_config.hidden_size

    def test_portrait_transposes(self, model):
        from PIL import Image

        img = Image.fromarray(np.random.RandomState(1).randint(0, 255, (100, 60, 3), dtype=np.uint8))
        hd = model._hd_transform(img, 16)
        w, h = hd.size
        assert w % 28 == 0 and h % 28 == 0
        # portrait stays portrait after transpose-back
        assert h > w

    def test_global_only_mode(self):
        from PIL import Image

        from lmms_owc_tpu.models import get_model

        model = get_model(
            "phi3v-tiny", batch_size=2, random_init=True, dtype="float32", num_crops=0
        )
        img = Image.fromarray(np.random.RandomState(2).randint(0, 255, (60, 100, 3), dtype=np.uint8))
        feats = model._encode_one_image(img)
        # half*(half+1) + glb_GN = 1*2 + 1 = 3
        assert feats.shape[0] == 3


class TestGlobalViewTorchBicubic:
    """The HD global view uses torch tensor-bicubic semantics (published
    processing_phi3_v.py order): pixel parity vs torch.nn.functional.interpolate."""

    @pytest.mark.parametrize("in_hw,out_hw", [((672, 1008), (336, 336)),
                                              ((336, 672), (336, 336)),
                                              ((100, 73), (336, 336)),
                                              ((50, 50), (200, 100))])
    def test_matches_torch_interpolate(self, in_hw, out_hw):
        import torch
        import torch.nn.functional as F

        from lmms_owc_tpu.models.phi3v import Phi3v

        rng = np.random.RandomState(0)
        arr = rng.randn(3, *in_hw).astype(np.float32)
        ours = Phi3v._bicubic_resize_tensor(arr, *out_hw)
        theirs = F.interpolate(
            torch.from_numpy(arr)[None], size=out_hw, mode="bicubic", align_corners=False
        )[0].numpy()
        # f32 accumulation-order noise only (observed max ~3e-5 on upscales).
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)

    def test_global_view_enters_pipeline(self, toy_task_path, toy_dataset):
        """Integration: the tensor-bicubic global view flows through _encode_one_image."""
        from PIL import Image

        from lmms_owc_tpu.models import get_model

        model = get_model("phi3v-tiny", batch_size=1, random_init=True, dtype="float32")
        rng = np.random.RandomState(0)
        img = Image.fromarray(rng.randint(0, 255, (50, 80, 3), dtype=np.uint8))
        feats = model._encode_one_image(img)
        assert feats.ndim == 2 and np.isfinite(feats).all()
