"""Judge decode-pool serving: pooled output must equal unpooled output.

The pooled path (LMMS_OWC_JUDGE_DECODE_POOL=N, nn/judge.py _generate_pooled)
prefills each chunk at its own (batch, bucket) shape and decodes N chunks' rows
as one batch — the flagship's decode-pool pattern (models/qwen2_vl.py
_run_pooled) applied to the judge's 16-token greedy decode, whose roofline is
the per-step weight read. Pooling must not change a single token: front-padded
pool caches are masked exactly like ordinary left-padding.

Reference path being replaced: the torch text-generation pipeline judge at
reference src/data/pipelines/text/_text.py:211-332 (batch per GPU, no pooling).
"""

from __future__ import annotations

import pytest

pytest.importorskip("jax")


TINY_LLAMA = dict(
    vocab_size=512, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
    rope_theta=10000.0, rms_norm_eps=1e-5, max_position_embeddings=2048,
    tie_word_embeddings=True, eos_token_id=5, pad_token_id=0,
)


def _tiny_judge(monkeypatch, batch_size: int):
    import lmms_owc_tpu.nn.judge as judge_mod

    monkeypatch.setattr(judge_mod, "LLAMA32_3B_CONFIG", dict(TINY_LLAMA))
    judge = judge_mod.JudgeModel.random_init(seed=0, data_parallel=False)
    judge.batch_size = batch_size

    class _TinyTok(judge.tokenizer.__class__):
        eos_token_id = 5
        pad_token_id = 0

        def encode(self, text, add_special_tokens=True):
            return [tok % 512 for tok in super().encode(text, add_special_tokens)]

    judge.tokenizer = _TinyTok()
    return judge


# Mixed lengths so chunks land in DIFFERENT prompt buckets — the pooled path
# must front-pad the shorter chunk's cache to the pool's common bucket.
PROMPTS = (
    ["is w3 contained in w3 w7? yes or no"] * 3
    + ["judge " + " ".join(f"w{i}" for i in range(40)) + " score"] * 4
    + ["yes no tie"] * 3
)


class TestJudgeDecodePool:
    def test_pooled_identical_to_unpooled(self, monkeypatch):
        judge = _tiny_judge(monkeypatch, batch_size=4)
        monkeypatch.delenv("LMMS_OWC_JUDGE_DECODE_POOL", raising=False)
        base = judge.score_pairs(list(PROMPTS), None, None)

        monkeypatch.setenv("LMMS_OWC_JUDGE_DECODE_POOL", "2")
        pooled = judge.score_pairs(list(PROMPTS), None, None)
        assert pooled == base

    def test_pool_larger_than_chunks(self, monkeypatch):
        """A pool_n exceeding the number of chunks still works (one ragged pool)."""
        judge = _tiny_judge(monkeypatch, batch_size=8)
        monkeypatch.delenv("LMMS_OWC_JUDGE_DECODE_POOL", raising=False)
        base = judge.score_pairs(list(PROMPTS), None, None)
        monkeypatch.setenv("LMMS_OWC_JUDGE_DECODE_POOL", "4")
        pooled = judge.score_pairs(list(PROMPTS), None, None)
        assert pooled == base


class TestJudgePoolKvInt8:
    def test_int8_pool_matches_int8_unpooled(self, monkeypatch):
        """Pooled judge with the int8 KV pool (quantize-before-write assembly)
        matches the unpooled int8 path token-for-token — the memory shape that
        fits pool=2 x batch 256 on a 16 GB chip (the bf16 pool OOM'd, r5)."""
        import jax

        judge = _tiny_judge(monkeypatch, batch_size=4)
        monkeypatch.setenv("LMMS_OWC_KV_INT8", "force")
        monkeypatch.delenv("LMMS_OWC_JUDGE_DECODE_POOL", raising=False)
        jax.clear_caches()
        base = judge.score_pairs(list(PROMPTS), None, None)
        monkeypatch.setenv("LMMS_OWC_JUDGE_DECODE_POOL", "2")
        pooled = judge.score_pairs(list(PROMPTS), None, None)
        monkeypatch.delenv("LMMS_OWC_KV_INT8", raising=False)
        jax.clear_caches()
        assert pooled == base
