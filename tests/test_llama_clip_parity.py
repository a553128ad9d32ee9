"""Numerical parity for the Llama decoder and CLIP towers vs HF torch (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


class TestLlamaParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        from lmms_owc_tpu.nn import llama as L

        torch.manual_seed(0)
        hf_config = HFLlamaConfig(
            vocab_size=256,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
            rope_theta=500000.0,
            rms_norm_eps=1e-5,
            tie_word_embeddings=False,
            attention_bias=False,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 32.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
        )
        model = LlamaForCausalLM(hf_config).eval().float()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        config = L.llama_config_from_hf(hf_config.to_dict())
        params = L.convert_hf_llama_weights(state, config, jnp.float32)
        return model, config, params

    def test_prefill_logits(self, setup):
        from lmms_owc_tpu.nn import llama as L

        model, config, params = setup
        rng = np.random.RandomState(0)
        B, Lseq = 2, 16
        input_ids = rng.randint(3, 250, size=(B, Lseq))
        mask = np.ones((B, Lseq), dtype=np.int64)
        mask[1, :4] = 0

        with torch.no_grad():
            hf_logits = model(
                input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
            ).logits[:, -1, :].numpy()

        position_ids, _ = L.llama_positions(mask)
        dec_config = config.to_decoder_config()
        embeds = jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
        logits, _ = L.prefill(
            params, embeds, jnp.asarray(position_ids),
            jnp.asarray(mask.astype(np.int32)), dec_config, cache_len=Lseq + 8,
        )
        np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=5e-3, atol=5e-3)

    def test_greedy_matches_hf(self, setup):
        from lmms_owc_tpu.nn import llama as L

        model, config, params = setup
        rng = np.random.RandomState(1)
        B, Lseq, NEW = 2, 12, 6
        input_ids = rng.randint(3, 250, size=(B, Lseq))
        mask = np.ones((B, Lseq), dtype=np.int64)

        with torch.no_grad():
            hf_out = model.generate(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(mask),
                max_new_tokens=NEW, do_sample=False, eos_token_id=None, pad_token_id=0,
            )[:, Lseq:].numpy()

        position_ids, next_pos = L.llama_positions(mask)
        dec_config = config.to_decoder_config()
        embeds = jnp.take(params["embed_tokens"], jnp.asarray(input_ids), axis=0)
        tokens = L.greedy_generate(
            params, embeds, jnp.asarray(position_ids),
            jnp.asarray(mask.astype(np.int32)), jnp.asarray(next_pos.astype(np.int32)),
            dec_config, max_new_tokens=NEW, cache_len=Lseq + NEW,
            eos_ids=jnp.asarray([-1], jnp.int32),
        )
        np.testing.assert_array_equal(np.asarray(tokens), hf_out)


class TestClipParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import CLIPConfig, CLIPModel

        from lmms_owc_tpu.nn import clip as C

        torch.manual_seed(0)
        hf_config = CLIPConfig(
            vision_config=dict(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64, image_size=28, patch_size=14,
            ),
            text_config=dict(
                vocab_size=128, hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=48, max_position_embeddings=16,
                bos_token_id=126, eos_token_id=127,
            ),
            projection_dim=20,
        )
        model = CLIPModel(hf_config).eval().float()
        state = {k: v.numpy() for k, v in model.state_dict().items()}
        vision_config = C.ClipVisionConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            image_size=28, patch_size=14, projection_dim=20,
        )
        text_config = C.ClipTextConfig(
            vocab_size=128, hidden_size=24, num_layers=2, num_heads=4,
            intermediate_size=48, max_position_embeddings=16, projection_dim=20,
            eos_token_id=model.config.text_config.eos_token_id,
        )
        params = C.convert_hf_clip_weights(state, vision_config, text_config, jnp.float32)
        return model, vision_config, text_config, params

    def test_vision_embeds(self, setup):
        from lmms_owc_tpu.nn import clip as C

        model, vision_config, _, params = setup
        rng = np.random.RandomState(0)
        pixels = rng.randn(2, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            hf = model.get_image_features(pixel_values=torch.tensor(pixels)).numpy()
        ours = C.clip_vision_forward(params["vision"], jnp.asarray(pixels), vision_config)
        # 2.5e-2: TPU-vs-torch-CPU noise accumulates through the projection head;
        # structural bugs produce O(1) errors, so this still discriminates.
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=2.5e-2, atol=2.5e-2)

    def test_vision_hidden_layer_feature(self, setup):
        from lmms_owc_tpu.nn import clip as C

        model, vision_config, _, params = setup
        rng = np.random.RandomState(1)
        pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
        with torch.no_grad():
            hf_states = model.vision_model(
                pixel_values=torch.tensor(pixels), output_hidden_states=True
            ).hidden_states
        # feature_layer=-2 == hidden_states[-2] (input to the last encoder layer).
        ours = C.clip_vision_forward(
            params["vision"], jnp.asarray(pixels), vision_config, feature_layer=-2
        )
        np.testing.assert_allclose(np.asarray(ours), hf_states[-2].numpy(), rtol=2.5e-2, atol=2.5e-2)

    def test_text_embeds(self, setup):
        from lmms_owc_tpu.nn import clip as C

        model, _, text_config, params = setup
        input_ids = np.array([[5, 9, 20, 127], [5, 30, 127, 0]])  # 127 == eos token
        with torch.no_grad():
            hf = model.get_text_features(input_ids=torch.tensor(input_ids)).numpy()
        ours = C.clip_text_encode(params["text"], jnp.asarray(input_ids), text_config)
        np.testing.assert_allclose(np.asarray(ours), hf, rtol=2.5e-2, atol=2.5e-2)
