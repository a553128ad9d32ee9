"""InternVL parity vs HF torch (random weights) + adapter smoke tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    from transformers import InternVLConfig as HFInternVLConfig
    from transformers.models.internvl.modeling_internvl import InternVLForConditionalGeneration

    from lmms_owc_tpu.nn import internvl as iv

    torch.manual_seed(0)
    hf_config = HFInternVLConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=[28, 28], patch_size=[14, 14],
            use_qk_norm=False, layer_norm_eps=1e-6,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=256, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6, tie_word_embeddings=False,
        ),
        image_token_id=200,
        downsample_ratio=0.5,
    )
    model = InternVLForConditionalGeneration(hf_config).eval().float()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    config = iv.internvl_config_from_hf(hf_config.to_dict())
    params = iv.convert_hf_internvl_weights(state, config, jnp.float32)
    return model, config, params


class TestInternVLParity:
    def test_config(self, setup):
        _, config, _ = setup
        assert config.vision.hidden_size == 32
        assert config.tokens_per_tile == 1  # (28/14 * 0.5)^2
        assert config.text_attn_bias  # qwen2 backbone

    def test_vision_features(self, setup):
        from lmms_owc_tpu.nn import internvl as iv

        model, config, params = setup
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            hf = model.model.get_image_features(
                pixel_values=torch.tensor(pixels),
                vision_feature_layer=-1,
                vision_feature_select_strategy="default",
            ).numpy()
        ours = iv.encode_tiles(params, jnp.asarray(pixels), config)
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=5e-3, atol=5e-3)

    def test_multimodal_logits(self, setup):
        from lmms_owc_tpu.nn import internvl as iv
        from lmms_owc_tpu.nn import llama as L
        from lmms_owc_tpu.models.qwen2_vl import _assemble_embeds

        model, config, params = setup
        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
        ids = [10, 11] + [200] * config.tokens_per_tile + [12, 13]
        input_ids = np.array([ids])
        mask = np.ones_like(input_ids)

        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(mask),
                pixel_values=torch.tensor(pixels),
            ).logits[:, -1, :].numpy()

        vision = iv.encode_tiles(params, jnp.asarray(pixels), config)
        vision_flat = vision.reshape(-1, vision.shape[-1])
        index_map = np.full_like(input_ids, -1, dtype=np.int32)
        positions = np.where(input_ids[0] == 200)[0]
        index_map[0, positions] = np.arange(len(positions))
        embeds = _assemble_embeds(
            params["text"]["embed_tokens"], jnp.asarray(input_ids),
            vision_flat, jnp.asarray(index_map),
        )
        position_ids, _ = L.llama_positions(mask)
        logits, _ = L.prefill(
            params["text"], embeds, jnp.asarray(position_ids),
            jnp.asarray(mask.astype(np.int32)), config.text.to_decoder_config(),
            cache_len=len(ids) + 8,
        )
        np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-3, atol=5e-3)


class TestDynamicPreprocess:
    def test_tiling_semantics(self):
        from PIL import Image

        from lmms_owc_tpu.models.internvl2 import dynamic_preprocess

        img = Image.new("RGB", (896, 448), (10, 20, 30))
        tiles = dynamic_preprocess(img, max_num=6, image_size=448, use_thumbnail=True)
        assert len(tiles) == 3  # 2x1 grid + thumbnail
        assert all(t.size == (448, 448) for t in tiles)
        square = Image.new("RGB", (300, 300))
        tiles = dynamic_preprocess(square, max_num=6, image_size=448, use_thumbnail=True)
        assert len(tiles) == 1  # 1x1, no thumbnail


class TestTinyInternVLAdapter:
    def test_end_to_end(self, toy_task_path, toy_dataset):
        from lmms_owc_tpu.engine import evaluate
        from lmms_owc_tpu.models import get_model
        from lmms_owc_tpu.tasks import TaskManager, get_tasks_as_dict

        model = get_model("internvl2-tiny", batch_size=4, random_init=True, dtype="float32")
        tm = TaskManager(include_path=toy_task_path, model_name="internvl2-tiny")
        task_dict = get_tasks_as_dict(["toy"], tm)
        task = task_dict["toy"]
        task.set_fewshot_seed(1234)
        task.set_config(key="num_fewshot", value=0)
        model.task_dict["toy"] = task
        results = evaluate(
            model=model, task_dict=task_dict, limit=2, bootstrap_iters=0, log_samples=True
        )
        assert "exact_match,none" in results["results"]["toy"]
        assert len(results["samples"]["toy"]) == 2
