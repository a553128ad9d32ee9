"""Decode-pool serving parity (LMMS_OWC_DECODE_POOL).

The pool path decouples decode batch from prefill batch: chunks prefill at
their own (batch, bucket) shapes, their KV caches are front-padded and pooled,
and ONE decode loop serves the pooled rows (lmms_owc_tpu/nn/qwen2_vl.py
decode_pool). It must be token-identical to the default fused path — front
padding is masked exactly like ordinary left-padding, and M-RoPE positions come
from next_positions, not cache indices.
"""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def pool_model():
    from lmms_owc_tpu.models import get_model

    return get_model("qwen2-vl-tiny", batch_size=2, random_init=True, dtype="float32")


def _make_requests(model, contexts, gen_kwargs_list):
    rng = np.random.RandomState(7)
    docs = [
        {"image": Image.fromarray(rng.randint(0, 255, (56, 56, 3), dtype=np.uint8))}
        for _ in contexts
    ]

    class _Task:
        dataset = {"test": docs}

    model.task_dict["pool_test"] = _Task()

    def doc_to_visual(doc):
        return [doc["image"]]

    class _Req:
        def __init__(self, i):
            self.args = (
                contexts[i],
                gen_kwargs_list[i],
                doc_to_visual,
                i,
                "pool_test",
                "test",
            )

    return [_Req(i) for i in range(len(contexts))]


def _run_both(model, monkeypatch, contexts, gen_kwargs_list, pool):
    reqs = _make_requests(model, contexts, gen_kwargs_list)
    monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
    base = model.generate_until(reqs)
    monkeypatch.setenv("LMMS_OWC_DECODE_POOL", str(pool))
    pooled = model.generate_until(reqs)
    monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
    return base, pooled


class TestDecodePoolParity:
    def test_mixed_bucket_pool_matches_default(self, pool_model, monkeypatch):
        """Chunks landing in DIFFERENT prompt buckets pool via front-padding."""
        long_ctx = "Describe the scene in detail. " * 12
        contexts = [long_ctx, long_ctx, "What?", "Name it.", "What is shown?", "Say it."]
        gk = {"max_new_tokens": 8, "do_sample": False, "until": None}
        base, pooled = _run_both(
            pool_model, monkeypatch, contexts, [gk] * len(contexts), pool=2
        )
        assert pooled == base

    def test_pool_larger_than_chunks(self, pool_model, monkeypatch):
        """A pool bigger than the available chunk count degrades to one pool."""
        contexts = ["What is this?", "And this?", "Also this?"]
        gk = {"max_new_tokens": 6, "do_sample": False, "until": None}
        base, pooled = _run_both(
            pool_model, monkeypatch, contexts, [gk] * len(contexts), pool=4
        )
        assert pooled == base

    def test_mixed_gen_kwargs_never_pool_together(self, pool_model, monkeypatch):
        """Chunks with different gen_kwargs stay in separate pools (the decode
        loop is compiled per max_new_tokens)."""
        contexts = ["What is this?", "And this?", "Name this.", "Say this."]
        gk_a = {"max_new_tokens": 6, "do_sample": False, "until": None}
        gk_b = {"max_new_tokens": 10, "do_sample": False, "until": None}
        gen_kwargs_list = [gk_a, gk_a, gk_b, gk_b]
        base, pooled = _run_both(
            pool_model, monkeypatch, contexts, gen_kwargs_list, pool=2
        )
        assert pooled == base

    def test_pool_grouping(self):
        """Unit check of the consecutive-same-gen_kwargs pooling rule."""
        from lmms_owc_tpu.models.qwen2_vl import Qwen2VL

        gk_a, gk_b = {"m": 1}, {"m": 2}
        chunks = [
            [("c1", gk_a)], [("c2", gk_a)], [("c3", gk_a)],
            [("c4", gk_b)], [("c5", gk_b)],
        ]
        pools = []
        for chunk in chunks:
            key = repr(chunk[0][1])
            if pools and len(pools[-1]) < 2 and repr(pools[-1][0][0][1]) == key:
                pools[-1].append(chunk)
            else:
                pools.append([chunk])
        assert [len(p) for p in pools] == [2, 1, 2]
        assert pools[1][0][0][0] == "c3"
        assert Qwen2VL._generate_pooled is not None  # symbol exists
