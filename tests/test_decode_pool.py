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
        from lmms_owc_tpu.models.qwen2_vl import Qwen2VL, plan_decode_pools

        gk_a, gk_b = {"m": 1}, {"m": 2}
        chunks = [
            [("c1", gk_a)], [("c2", gk_a)], [("c3", gk_a)],
            [("c4", gk_b)], [("c5", gk_b)],
        ]
        pools = plan_decode_pools(chunks, pool_n=2, batch_size=1)
        assert [len(p) for p in pools] == [2, 1, 2]
        assert pools[1][0][0][0] == "c3"
        assert Qwen2VL._generate_pooled is not None  # symbol exists


class TestPoolPlanner:
    """plan_decode_pools: the pool_n envelope is always honored verbatim;
    extension past pool_n happens only while rows < pool_n x batch_size and
    the estimated KV footprint stays within 1.5x the uniform pool's."""

    GK = {"max_new_tokens": 64, "do_sample": False, "until": None}

    def _chunks(self, rows_list, gk=None):
        gk = gk or self.GK
        return [[("ctx", gk)] * rows for rows in rows_list]

    def test_uniform_pools_exactly_pool_n(self):
        """48-row 320-bucket chunks (the flagship uniform shape) pool exactly
        pool_n chunks — the headline-config schedule is byte-identical to the
        fixed-count rule."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        chunks = self._chunks([48] * 5)
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 320
        )
        assert [len(p) for p in pools] == [2, 2, 1]

    def test_small_row_chunks_extend_to_row_target(self):
        """30-row 512-bucket chunks (mixed-res large images) extend to 3
        chunks: 90 rows beats the fixed rule's 60, and 90 x (512 + 64) stays
        inside the 1.5x KV cap (55296 at pool_n=2, B=48)."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        chunks = self._chunks([30] * 7)
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 512
        )
        assert [len(p) for p in pools] == [3, 3, 1]

    def test_kv_cap_stops_extension(self):
        """Extension stops when the NEXT chunk would blow the KV cap even if
        rows are still under target: 40-row 640-bucket chunks stop at 2
        (120 x 704 > 55296 for the third)."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        chunks = self._chunks([40] * 4)
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 640
        )
        assert [len(p) for p in pools] == [2, 2]

    def test_pool_n_envelope_ignores_kv_cap(self):
        """Up to pool_n chunks always pool (the user's explicit envelope),
        even when the KV estimate exceeds the extension cap — long-generation
        tasks keep today's pooling behavior."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        gk = {"max_new_tokens": 512, "do_sample": False, "until": None}
        chunks = self._chunks([48] * 4, gk=gk)
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 320
        )
        assert [len(p) for p in pools] == [2, 2]

    def test_no_bucket_fn_assumes_uniform(self):
        """Without the vision-sort estimator the planner assumes the uniform
        320 bucket; full-width chunks still pool exactly pool_n."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        pools = plan_decode_pools(self._chunks([48] * 4), pool_n=2, batch_size=48)
        assert [len(p) for p in pools] == [2, 2]

    def test_extension_respects_gen_kwargs_boundary(self):
        """A gen_kwargs change always starts a new pool, even mid-extension."""
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        gk_b = {"max_new_tokens": 32, "do_sample": False, "until": None}
        chunks = self._chunks([30, 30], gk=self.GK) + self._chunks([30, 30], gk=gk_b)
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 512
        )
        assert [len(p) for p in pools] == [2, 2]

    def test_extended_pool_token_identical(self, pool_model, monkeypatch):
        """End-to-end: a workload whose chunks extend past pool_n must stay
        token-identical to unpooled serving. batch_size=16 with ~1600-char
        prompts caps chunks at 10 rows (budget 16x320, bucket 512), so the
        30-request run builds 3 chunks that the planner joins into ONE pool
        (30 rows < the 32-row target; KV 30x576 <= the 18432-token cap)."""
        monkeypatch.setattr(pool_model, "batch_size", 16)
        filler = "The picture shows a number of interesting objects to list. "
        contexts = [f"Q{i}: {filler * 26}" for i in range(30)]
        gk = {"max_new_tokens": 6, "do_sample": False, "until": None}
        reqs = _make_requests(pool_model, contexts, [gk] * len(contexts))
        monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
        base = pool_model.generate_until(reqs)
        from lmms_owc_tpu.models import qwen2_vl as qmod

        seen = []
        orig = qmod.plan_decode_pools

        def spy(chunks, pool_n, batch_size, bucket_fn=None):
            pools = orig(chunks, pool_n, batch_size, bucket_fn)
            seen.append([len(p) for p in pools])
            return pools

        monkeypatch.setattr(qmod, "plan_decode_pools", spy)
        monkeypatch.setenv("LMMS_OWC_DECODE_POOL", "2")
        pooled = pool_model.generate_until(reqs)
        monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
        assert pooled == base
        assert seen and max(seen[0]) >= 3


class TestPoolKvCapKnob:
    """LMMS_OWC_POOL_KV_CAP_X raises the extension cap (recalibration knob now
    that incremental pool assembly cut the assembly peak, VERDICT r5)."""

    GK = {"max_new_tokens": 64, "do_sample": False, "until": None}

    def test_raised_cap_extends_large_bucket_pools(self, monkeypatch):
        from lmms_owc_tpu.models.qwen2_vl import plan_decode_pools

        chunks = [[("ctx", self.GK)] * 40 for _ in range(4)]
        monkeypatch.setenv("LMMS_OWC_POOL_KV_CAP_X", "2.0")
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 640
        )
        # 120 rows x 704 = 84480 <= 2.0 x 2 x 48 x 384 = 73728? No: 84480 > 73728,
        # so still 2+2 at 2.0; at 2.5 (92160) the third chunk fits -> 3+1.
        assert [len(p) for p in pools] == [2, 2]
        monkeypatch.setenv("LMMS_OWC_POOL_KV_CAP_X", "2.5")
        pools = plan_decode_pools(
            chunks, pool_n=2, batch_size=48, bucket_fn=lambda c: 640
        )
        assert [len(p) for p in pools] == [3, 1]


class TestDecodePoolKvInt8:
    def test_int8_pool_matches_int8_unpooled(self, pool_model, monkeypatch):
        """LMMS_OWC_KV_INT8 + LMMS_OWC_DECODE_POOL compose token-identically.

        Per-vector KV quantization is position-independent, so quantizing each
        chunk BEFORE the front-padded pool write (models/qwen2_vl.py _run_pooled
        kv_int8 branch — the bf16 pool never exists) must produce the same
        tokens as the unpooled int8 path (greedy_generate, which quantizes the
        already-padded cache)."""
        import jax

        contexts = ["What is this?", "And this?", "Also this?", "More?"]
        gk = {"max_new_tokens": 8, "do_sample": False, "until": None}
        reqs = _make_requests(pool_model, contexts, [gk] * len(contexts))
        monkeypatch.setenv("LMMS_OWC_KV_INT8", "force")
        monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
        jax.clear_caches()
        base = pool_model.generate_until(reqs)
        monkeypatch.setenv("LMMS_OWC_DECODE_POOL", "2")
        pooled = pool_model.generate_until(reqs)
        monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
        monkeypatch.delenv("LMMS_OWC_KV_INT8", raising=False)
        jax.clear_caches()
        assert pooled == base
