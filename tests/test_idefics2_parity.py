"""Idefics2 parity vs HF torch (random weights) + adapter smoke test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from transformers import Idefics2Config as HFConfig
    from transformers.models.idefics2.modeling_idefics2 import Idefics2ForConditionalGeneration

    from lmms_owc_tpu.nn import idefics2 as idf

    torch.manual_seed(0)
    hf_config = HFConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=4,
            resampler_head_dim=8, num_key_value_heads=2,
            hidden_size=48, rms_norm_eps=1e-5,
        ),
        text_config=dict(
            model_type="mistral", vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        image_token_id=200,
    )
    model = Idefics2ForConditionalGeneration(hf_config).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    config = idf.idefics2_config_from_hf(hf_config.to_dict())
    params = idf.convert_hf_idefics2_weights(state, config, jnp.float32)
    return model, config, params


class TestIdefics2Parity:
    def test_vision_tower(self, setup):
        from lmms_owc_tpu.nn import idefics2 as idf

        model, config, params = setup
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            hf = model.model.vision_model(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
        ours = idf.siglip_vision_forward(params["vision"], jnp.asarray(pixels), config.vision)
        # 8e-3: TPU-vs-torch-CPU transcendental noise peaks slightly above 5e-3.
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=8e-3, atol=8e-3)

    def test_connector_resampler(self, setup):
        from lmms_owc_tpu.nn import idefics2 as idf

        model, config, params = setup
        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            vision = model.model.vision_model(pixel_values=torch.tensor(pixels)).last_hidden_state
            attn_mask = torch.ones(vision.shape[:2], dtype=torch.long)
            hf = model.model.connector(vision, attention_mask=attn_mask).numpy()
        ours = idf.encode_images(params, jnp.asarray(pixels), config)
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=5e-3, atol=5e-3)


@pytest.fixture(scope="module")
def setup56():
    """Larger tiny config (image_size 56 -> 4x4 patch grid) for variable aspect."""
    from transformers import Idefics2Config as HFConfig
    from transformers.models.idefics2.modeling_idefics2 import Idefics2ForConditionalGeneration

    from lmms_owc_tpu.nn import idefics2 as idf

    torch.manual_seed(1)
    hf_config = HFConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=56, patch_size=14,
        ),
        perceiver_config=dict(
            resampler_n_latents=4, resampler_depth=1, resampler_n_heads=4,
            resampler_head_dim=8, num_key_value_heads=2,
            hidden_size=48, rms_norm_eps=1e-5,
        ),
        text_config=dict(
            model_type="mistral", vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        ),
        image_token_id=200,
    )
    model = Idefics2ForConditionalGeneration(hf_config).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    config = idf.idefics2_config_from_hf(hf_config.to_dict())
    params = idf.convert_hf_idefics2_weights(state, config, jnp.float32)
    return model, config, params


class TestIdefics2VariableAspect:
    def test_vision_and_connector_match_hf(self, setup56):
        """Padded variable-aspect batch: patch mask + bucketized position ids."""
        from lmms_owc_tpu.nn import idefics2 as idf

        model, config, params = setup56
        p = config.vision.patch_size
        num_side = config.vision.image_size // p
        rng = np.random.RandomState(2)
        dims = [(56, 28), (28, 56)]  # (h, w): portrait and landscape
        pixels = np.zeros((2, 3, 56, 56), np.float32)
        for i, (h, w) in enumerate(dims):
            pixels[i, :, :h, :w] = rng.randn(3, h, w)
        position_ids, patch_mask = idf.variable_patch_layout(dims, (4, 4), num_side, p)

        with torch.no_grad():
            hf_mask = torch.tensor(patch_mask.reshape(2, 4, 4), dtype=torch.bool)
            hf_vision = model.model.vision_model(
                pixel_values=torch.tensor(pixels), patch_attention_mask=hf_mask
            ).last_hidden_state
            hf_out = model.model.connector(
                hf_vision, attention_mask=hf_mask.view(2, -1).long()
            ).numpy()

        ours_vision = idf.siglip_vision_forward(
            params["vision"], jnp.asarray(pixels), config.vision,
            position_ids=jnp.asarray(position_ids), patch_mask=jnp.asarray(patch_mask),
        )
        valid = patch_mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(ours_vision)[valid], hf_vision.numpy()[valid], rtol=8e-3, atol=8e-3
        )

        ours = idf.encode_images(
            params, jnp.asarray(pixels), config,
            jnp.asarray(position_ids), jnp.asarray(patch_mask),
        )
        np.testing.assert_allclose(np.asarray(ours), hf_out, rtol=5e-3, atol=5e-3)

    def test_preprocess_matches_hf_processor(self):
        """Host preprocessing vs the HF Idefics2ImageProcessor (resize+pad+mask)."""
        from PIL import Image
        from transformers.models.idefics2.image_processing_idefics2 import (
            Idefics2ImageProcessor,
        )

        from lmms_owc_tpu.models import get_model

        model = get_model("idefics2-tiny", batch_size=2, random_init=True, dtype="float32")
        rng = np.random.RandomState(3)
        images = [
            Image.fromarray(rng.randint(0, 255, (40, 70, 3), dtype=np.uint8)),
            Image.fromarray(rng.randint(0, 255, (90, 30, 3), dtype=np.uint8)),
        ]
        longest = model.config.vision.image_size
        shortest = max(model.config.vision.patch_size, round(longest * 378 / 980))
        processor = Idefics2ImageProcessor(
            size={"shortest_edge": shortest, "longest_edge": longest},
            image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5],
            do_image_splitting=False,
        )
        hf = processor(images=images, return_tensors="np")
        hf_pixels = hf["pixel_values"].reshape(-1, *hf["pixel_values"].shape[-3:])

        pixels, position_ids, patch_mask = model._preprocess_hf(images)
        # Ours buckets the padded canvas up to 8-patch multiples; compare on the
        # HF canvas region and require everything beyond it to be masked padding.
        hh, ww = hf_pixels.shape[-2:]
        np.testing.assert_allclose(pixels[:, :, :hh, :ww], hf_pixels, rtol=1e-5, atol=1e-5)
        assert np.abs(pixels[:, :, hh:, :]).max(initial=0.0) == 0.0
        assert np.abs(pixels[:, :, :, ww:]).max(initial=0.0) == 0.0

        # Patch mask must match HF's (pixel mask unfolded to full patches).
        p = model.config.vision.patch_size
        hf_mask = hf["pixel_attention_mask"].reshape(-1, hh, ww)
        gh, gw = pixels.shape[2] // p, pixels.shape[3] // p
        for i in range(2):
            full = np.zeros((gh, gw), np.int32)
            for r in range(hh // p):
                for c in range(ww // p):
                    full[r, c] = int(
                        hf_mask[i, r * p : (r + 1) * p, c * p : (c + 1) * p].sum() == p * p
                    )
            np.testing.assert_array_equal(patch_mask[i].reshape(gh, gw), full)


class TestTinyIdefics2Adapter:
    def test_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("idefics2-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="idefics2-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]
