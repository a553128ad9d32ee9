"""Mesh construction and sharding-rule tests (8 virtual CPU devices)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lmms_owc_tpu.parallel import MeshConfig, create_mesh

    return create_mesh(MeshConfig(data=4, model=2))


class TestMesh:
    def test_shape(self, mesh):
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_resolve_infers_axis(self):
        from lmms_owc_tpu.parallel import MeshConfig

        assert MeshConfig(data=-1, model=2).resolve(8) == (4, 2)
        assert MeshConfig(data=-1, model=1).resolve(8) == (8, 1)
        with pytest.raises(ValueError):
            MeshConfig(data=3, model=2).resolve(8)


class TestShardingRules:
    def test_qwen_params_shard_over_model_axis(self, mesh):
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.parallel.sharding import make_param_shardings, shard_params

        config = qvl.Qwen2VLConfig.from_hf_dict(
            dict(
                vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
                tie_word_embeddings=True,
                rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
                vision_config=dict(depth=2, embed_dim=32, num_heads=4, mlp_ratio=2.0),
            )
        )
        params = qvl.init_decoder_params(jax.random.PRNGKey(0), config, jnp.float32)
        shardings = make_param_shardings(params, mesh)

        # MLP up/gate are column-sharded over "model".
        up_spec = shardings["layers"]["mlp"]["up"]["w"].spec
        assert tuple(up_spec) == (None, None, "model")
        down_spec = shardings["layers"]["mlp"]["down"]["w"].spec
        assert tuple(down_spec) == (None, "model", None)
        # Norm scales replicated.
        assert tuple(shardings["layers"]["input_ln"]["scale"].spec) == ()

        sharded = shard_params(params, mesh)
        up = sharded["layers"]["mlp"]["up"]["w"]
        # Each model-axis shard holds half the output features.
        shard_shapes = {s.data.shape for s in up.addressable_shards}
        assert shard_shapes == {(2, 64, 64)}

    def test_indivisible_dims_fall_back_to_replication(self, mesh):
        import jax.numpy as jnp

        from lmms_owc_tpu.parallel.sharding import make_param_shardings

        params = {"layers": {"mlp": {"up": {"w": jnp.ones((2, 8, 3))}}}}  # 3 % 2 != 0
        shardings = make_param_shardings(params, mesh)
        assert tuple(shardings["layers"]["mlp"]["up"]["w"].spec) == (None, None, None)


class TestInt8Sharding:
    def test_quantized_tree_shards_like_full_precision(self, mesh):
        """int8 q shards exactly like w; the per-channel scale follows the out axis."""
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.ops.quant import quantize_params_int8
        from lmms_owc_tpu.parallel.sharding import make_param_shardings, shard_params

        config = qvl.Qwen2VLConfig.from_hf_dict(
            dict(
                vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
                tie_word_embeddings=True,
                rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            )
        )
        params = quantize_params_int8(
            qvl.init_decoder_params(jax.random.PRNGKey(0), config, jnp.float32)
        )
        shardings = make_param_shardings(params, mesh)
        up = shardings["layers"]["mlp"]["up"]["w_q8"]
        assert tuple(up["q"].spec) == (None, None, "model")
        assert tuple(up["scale"].spec) == (None, "model")
        down = shardings["layers"]["mlp"]["down"]["w_q8"]
        assert tuple(down["q"].spec) == (None, "model", None)
        assert tuple(down["scale"].spec) == (None, None)

        # Sharded int8 prefill executes and matches the unsharded result.
        sharded = shard_params(params, mesh)
        rng = np.random.RandomState(0)
        embeds = jnp.asarray(rng.randn(4, 8, 64).astype(np.float32))
        pos = jnp.broadcast_to(jnp.arange(8)[None, None, :], (3, 4, 8)).astype(jnp.int32)
        mask = jnp.ones((4, 8), jnp.int32)
        with mesh:
            logits_sharded, _ = qvl.prefill(sharded, embeds, pos, mask, config, cache_len=16)
        logits, _ = qvl.prefill(params, embeds, pos, mask, config, cache_len=16)
        np.testing.assert_allclose(
            np.asarray(logits_sharded), np.asarray(logits), rtol=2e-4, atol=2e-4
        )


class TestTowerSharding:
    def test_clip_tower_shards(self, mesh):
        """CLIP/SigLIP-style towers (attn q/k/v/o + mlp fc1/fc2) follow the rules."""
        import jax
        import jax.numpy as jnp

        from lmms_owc_tpu.nn.clip import ClipVisionConfig, init_clip_vision_params
        from lmms_owc_tpu.parallel.sharding import make_param_shardings

        params = {"vision": init_clip_vision_params(
            jax.random.PRNGKey(0),
            ClipVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                             intermediate_size=128, image_size=28, patch_size=14),
            jnp.float32,
        )}
        sh = make_param_shardings(params, mesh)
        assert tuple(sh["vision"]["layers"]["attn"]["q"]["w"].spec) == (None, None, "model")
        assert tuple(sh["vision"]["layers"]["attn"]["o"]["w"].spec) == (None, "model", None)
        assert tuple(sh["vision"]["layers"]["mlp"]["fc1"]["w"].spec) == (None, None, "model")
        assert tuple(sh["vision"]["layers"]["mlp"]["fc2"]["w"].spec) == (None, "model", None)
        # Projection head and embeddings replicated.
        assert tuple(sh["vision"]["visual_projection"]["w"].spec) == ()


class TestKvInt8UnderMesh:
    def test_generate_kv_int8_sharded_matches(self, mesh, monkeypatch):
        """greedy_generate with the int8 KV cache under a TP mesh: the
        compiler picks shardings for the in-jit cache + scale arrays; tokens
        must match the unsharded bf16-cache run."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lmms_owc_tpu.nn import qwen2_vl as qvl
        from lmms_owc_tpu.parallel.sharding import shard_params

        config = qvl.Qwen2VLConfig.from_hf_dict(
            dict(
                vocab_size=128, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
                tie_word_embeddings=True,
                rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            )
        )
        params = qvl.init_decoder_params(jax.random.PRNGKey(5), config, jnp.float32)
        rng = np.random.RandomState(21)
        B, L = 2, 16
        embeds = jnp.asarray(rng.randn(B, L, 64).astype(np.float32) * 0.1)
        pos = jnp.broadcast_to(jnp.arange(L)[None, None, :], (3, B, L)).astype(jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        next_pos = jnp.asarray(np.full(B, L, np.int64))
        eos = jnp.asarray([127], jnp.int32)

        monkeypatch.delenv("LMMS_OWC_KV_INT8", raising=False)
        jax.clear_caches()
        base = np.asarray(qvl.greedy_generate(
            params, embeds, pos, mask, next_pos, config,
            max_new_tokens=6, cache_len=24, eos_ids=eos,
        ))
        monkeypatch.setenv("LMMS_OWC_KV_INT8", "force")
        jax.clear_caches()
        sharded = shard_params(params, mesh)
        with mesh:
            out = np.asarray(qvl.greedy_generate(
                sharded, embeds, pos, mask, next_pos, config,
                max_new_tokens=6, cache_len=24, eos_ids=eos,
            ))
        np.testing.assert_array_equal(base, out)
