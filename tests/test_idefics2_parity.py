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
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=5e-3, atol=5e-3)

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
