"""InstructBLIP parity vs HF torch (random weights) + adapter smoke test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from transformers import InstructBlipConfig as HFConfig
    from transformers.models.instructblip.modeling_instructblip import (
        InstructBlipForConditionalGeneration,
    )

    from lmms_owc_tpu.nn import instructblip as ib

    torch.manual_seed(0)
    hf_config = HFConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14,
        ),
        qformer_config=dict(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, encoder_hidden_size=32, cross_attention_frequency=1,
            vocab_size=64,
        ),
        text_config=dict(
            model_type="llama", vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        ),
        num_query_tokens=4,
    )
    model = InstructBlipForConditionalGeneration(hf_config).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    config = ib.instructblip_config_from_hf(hf_config.to_dict())
    params = ib.convert_hf_instructblip_weights(state, config, jnp.float32)
    return model, config, params


class TestInstructBlipParity:
    def test_vision_tower(self, setup):
        from lmms_owc_tpu.nn import instructblip as ib

        model, config, params = setup
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            hf = model.vision_model(pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
        ours = ib.blip_vision_forward(params["vision"], jnp.asarray(pixels), config.vision)
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=5e-3, atol=5e-3)

    def test_query_embeddings(self, setup):
        from lmms_owc_tpu.nn import instructblip as ib

        model, config, params = setup
        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
        qf_ids = np.array([[5, 9, 20, 31, 2]])
        qf_mask = np.ones_like(qf_ids)

        with torch.no_grad():
            vision = model.vision_model(pixel_values=torch.tensor(pixels)).last_hidden_state
            queries = model.query_tokens.expand(1, -1, -1)
            qf_attn = torch.cat(
                [torch.ones(queries.shape[:2], dtype=torch.long), torch.tensor(qf_mask)], dim=1
            )
            hf_q = model.qformer(
                input_ids=torch.tensor(qf_ids),
                attention_mask=qf_attn,
                query_embeds=queries,
                encoder_hidden_states=vision,
            ).last_hidden_state[:, : queries.shape[1]]
            hf_proj = model.language_projection(hf_q).numpy()

        ours = ib.encode_image_queries(
            params, jnp.asarray(pixels), jnp.asarray(qf_ids), jnp.asarray(qf_mask), config
        )
        np.testing.assert_allclose(np.asarray(ours), hf_proj, rtol=5e-3, atol=5e-3)


class TestTinyInstructBlipAdapter:
    def test_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("instructblip-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="instructblip-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]

    def test_multi_image_canvas(self):
        from PIL import Image

        from lmms_owc_tpu.models.instructblip import concatenate_images_with_labels

        imgs = [Image.new("RGB", (32, 32), (255, 0, 0)), Image.new("RGB", (48, 40), (0, 255, 0))]
        canvas = concatenate_images_with_labels(imgs)
        assert canvas.size == (32 + 48 + 8, 40)
