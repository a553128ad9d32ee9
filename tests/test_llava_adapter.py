"""LLaVA adapter tests: tiny random model through generate + loglikelihood paths,
plus full-model parity of the assembled forward vs HF LlavaForConditionalGeneration."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_model():
    from lmms_owc_tpu.models import get_model

    return get_model("llava-tiny", batch_size=4, random_init=True, dtype="float32")


class TestTinyLlava:
    def test_loads(self, tiny_model):
        assert tiny_model.config.text.hidden_size == 64
        assert tiny_model.config.image_seq_length == 4  # (28/14)^2

    def test_prompt(self, tiny_model):
        prompt = tiny_model._build_prompt("What is this?", 1)
        assert prompt == "USER: <image>\nWhat is this? ASSISTANT:"

    def test_end_to_end_eval(self, tiny_model, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        tm = TaskManager(include_path=toy_task_path, model_name="llava-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        tiny_model.task_dict["toy"] = task

        results = evaluate(
            model=tiny_model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]
        assert len(results["samples"]["toy"]) == 2

    def test_loglikelihood_path(self, tiny_model, toy_task_path, toy_dataset):
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict
        from lmms_owc_tpu.tasks._base import TaskInstance

        tm = TaskManager(include_path=toy_task_path, model_name="llava-tiny")
        task = get_tasks_as_dict(["toy"], tm)["toy"]
        tiny_model.task_dict["toy"] = task

        reqs = [
            TaskInstance(
                request_type="loglikelihood",
                arguments=("What is this?", task.doc_to_target, task.doc_to_visual, i, "toy", "test"),
                idx=0,
                metadata={"task": "toy", "doc_id": i, "repeats": 1},
            )
            for i in range(2)
        ]
        out = tiny_model.loglikelihood(reqs)
        assert len(out) == 2
        for loss, is_greedy in out:
            assert loss > 0 and isinstance(is_greedy, bool)


class TestLlavaForwardParity:
    """Assembled multimodal forward vs HF torch with shared random weights."""

    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import LlavaConfig as HFLlavaConfig
        from transformers import LlavaForConditionalGeneration

        from lmms_owc_tpu.nn import llava as lv

        torch.manual_seed(0)
        hf_config = HFLlavaConfig(
            vision_config=dict(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, image_size=28, patch_size=14,
            ),
            text_config=dict(
                model_type="llama", vocab_size=256, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
            ),
            image_token_index=200,
            pad_token_id=0,
        )
        model = LlavaForConditionalGeneration(hf_config).eval().float()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        config = lv.llava_config_from_hf(hf_config.to_dict())
        params = lv.convert_hf_llava_weights(state, config, jnp.float32)
        return model, config, params

    def test_multimodal_logits(self, setup):
        from lmms_owc_tpu.nn import llama as L
        from lmms_owc_tpu.nn import llava as lv

        model, config, params = setup
        rng = np.random.RandomState(0)
        pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
        n_img_tokens = config.image_seq_length  # 4
        ids = [1, 10, 11] + [200] * n_img_tokens + [12, 13, 14]
        input_ids = np.array([ids])
        mask = np.ones_like(input_ids)

        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(mask),
                pixel_values=torch.tensor(pixels),
            ).logits[:, -1, :].numpy()

        embeds = jnp.take(params["text"]["embed_tokens"], jnp.asarray(input_ids), axis=0)
        vision = lv.encode_images(params, jnp.asarray(pixels), config)
        rows, cols = np.where(input_ids == config.image_token_id)
        embeds = embeds.at[jnp.asarray(rows), jnp.asarray(cols)].set(
            vision.reshape(-1, vision.shape[-1])
        )
        position_ids, _ = L.llama_positions(mask)
        logits, _ = L.prefill(
            params["text"], embeds, jnp.asarray(position_ids),
            jnp.asarray(mask.astype(np.int32)), config.text.to_decoder_config(),
            cache_len=len(ids) + 8,
        )
        np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-3, atol=5e-3)
