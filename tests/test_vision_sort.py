"""Vision-aware length-sorted batching (LMMS_OWC_SORT_BY_VISION).

Chunks pad every row to the chunk's longest prompt bucket, so grouping
like-size images into the same chunk is a pure scheduling change: results must
be identical (in original request order) to the text-only sort, and the sort
key must order requests by estimated vision tokens. Mixed-resolution
motivation: reference benchmarks are variable-resolution
(reference src/data/tasks/_classification/), and the text-only sort measured
prefill at 9.8 s device time vs 5.3 s uniform at equal FLOPs (ROUND_NOTES r4).
"""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def sort_model():
    from lmms_owc_tpu.models import get_model

    return get_model("qwen2-vl-tiny", batch_size=2, random_init=True, dtype="float32")


def _make_requests(model, sizes, contexts=None):
    rng = np.random.RandomState(3)
    docs = [
        {"image": Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))}
        for h, w in sizes
    ]

    class _Task:
        dataset = {"test": docs}

    model.task_dict["sort_test"] = _Task()

    def doc_to_visual(doc):
        return [doc["image"]]

    class _Req:
        def __init__(self, i):
            self.args = (
                (contexts or ["Describe this image."] * len(sizes))[i],
                {"max_new_tokens": 6, "do_sample": False, "until": None},
                doc_to_visual,
                i,
                "sort_test",
                "test",
            )

    return [_Req(i) for i in range(len(sizes))]


def test_sort_key_orders_by_vision_tokens(sort_model):
    sizes = [(56, 56), (112, 112), (56, 112), (112, 56)]
    reqs = _make_requests(sort_model, sizes)
    keys = [sort_model._estimate_prompt_tokens(r.args) for r in reqs]
    # 112x112 has 4x the patches of 56x56; rectangles sit in between.
    assert keys[1] > keys[2] == keys[3] > keys[0]


def test_results_identical_to_text_only_sort(sort_model, monkeypatch):
    # Mixed sizes with identical text: the text-only sort keeps original order,
    # the vision sort reorders chunks — outputs must match in original order.
    sizes = [(56, 56), (112, 112), (56, 56), (112, 112), (84, 84), (56, 56)]
    reqs = _make_requests(sort_model, sizes)
    monkeypatch.setenv("LMMS_OWC_SORT_BY_VISION", "0")
    base = sort_model.generate_until(reqs)
    monkeypatch.setenv("LMMS_OWC_SORT_BY_VISION", "1")
    sorted_out = sort_model.generate_until(reqs)
    assert base == sorted_out
    assert len(base) == len(sizes)


def test_estimate_survives_missing_task(sort_model):
    args = ("some context", {}, None, 0, "no_such_task", "test")
    assert sort_model._estimate_prompt_tokens(args) == len("some context") // 4


def test_pooled_variable_row_chunks_token_identical(sort_model, monkeypatch):
    """The bench default combines decode-pool=2 with vision-sorted token-budget
    chunking, which pools chunks of DIFFERENT row counts (a 448-bucket chunk
    runs fewer rows than a 192-bucket one). The pooled+sorted path must match
    the unpooled text-only-sorted path token for token."""
    sizes = [(112, 112), (56, 56), (112, 112), (56, 56), (84, 112), (56, 84)]
    reqs = _make_requests(sort_model, sizes)
    monkeypatch.setenv("LMMS_OWC_SORT_BY_VISION", "0")
    monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
    base = sort_model.generate_until(reqs)
    monkeypatch.setenv("LMMS_OWC_SORT_BY_VISION", "1")
    monkeypatch.setenv("LMMS_OWC_DECODE_POOL", "2")
    pooled_sorted = sort_model.generate_until(reqs)
    monkeypatch.delenv("LMMS_OWC_DECODE_POOL", raising=False)
    assert pooled_sorted == base


def test_vision_tower_batches_by_bucket_not_size(sort_model, monkeypatch):
    """Distinct resized sizes that share a patch bucket must run as ONE batched
    tower call (mixed-res xplane: 107 per-size programs per 384-image run vs 8
    uniform, ROUND_NOTES r4), and the bucket-grouped outputs must match a
    per-image encode exactly."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    calls = []
    orig = qvl.vision_encode_batch

    def spy(params, patches, freqs, mask, cfg):
        calls.append(int(patches.shape[0]))
        return orig(params, patches, freqs, mask, cfg)

    monkeypatch.setattr(qvl, "vision_encode_batch", spy)
    rng = np.random.RandomState(7)
    # 16, 36, 64 patches -> all bucket 64; 256 patches -> bucket 256.
    sizes = [(56, 56), (84, 84), (112, 112), (56, 56), (224, 224)]
    images = [
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        for h, w in sizes
    ]
    flat, spans, grids = sort_model._encode_images_flat(images)
    assert sorted(calls) == [1, 4]  # one launch per bucket, not 4 per-size ones

    calls.clear()
    per_image = [sort_model._encode_images_flat([img]) for img in images]
    for i, (ref_flat, ref_spans, _) in enumerate(per_image):
        off, count = spans[i]
        ref_off, ref_count = ref_spans[0]
        assert count == ref_count
        np.testing.assert_allclose(
            np.asarray(flat[off : off + count]),
            np.asarray(ref_flat[ref_off : ref_off + ref_count]),
            rtol=2e-5,
            atol=2e-5,
        )


def test_vision_tower_calls_capped_at_uniform_envelope(sort_model, monkeypatch):
    """A grouped bucket batch splits into segments of at most
    batch_size x 1024 patch-tokens (the uniform-448 envelope) so tower
    activation transients never exceed what coexists with a decode-pool cache
    on the 16 GB chip; outputs must still match per-image encodes."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    calls = []
    orig = qvl.vision_encode_batch

    def spy(params, patches, freqs, mask, cfg):
        calls.append(int(patches.shape[0]))
        return orig(params, patches, freqs, mask, cfg)

    monkeypatch.setattr(qvl, "vision_encode_batch", spy)
    rng = np.random.RandomState(13)
    # 224x224 -> 256 patches -> bucket 256; batch_size=2 -> cap 2*1024//256 = 8.
    images = [
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), dtype=np.uint8))
        for _ in range(10)
    ]
    flat, spans, _ = sort_model._encode_images_flat(images)
    assert calls == [8, 2]
    ref_flat, ref_spans, _ = sort_model._encode_images_flat([images[9]])
    off, count = spans[9]
    np.testing.assert_allclose(
        np.asarray(flat[off : off + count]),
        np.asarray(ref_flat[: count]),
        rtol=2e-5,
        atol=2e-5,
    )


def test_vision_row_bucketing_pads_batch_and_preserves_outputs(sort_model, monkeypatch):
    """Tower batch sizes snap to VISION_ROW_BUCKETS (bounded compile-shape set
    for arbitrary size distributions); padded rows replicate real data and are
    never referenced by the returned spans."""
    from lmms_owc_tpu.nn import qwen2_vl as qvl

    calls = []
    orig = qvl.vision_encode_batch

    def spy(params, patches, freqs, mask, cfg):
        calls.append(int(patches.shape[0]))
        return orig(params, patches, freqs, mask, cfg)

    monkeypatch.setattr(qvl, "vision_encode_batch", spy)
    rng = np.random.RandomState(11)
    sizes = [(56, 56)] * 5  # 5 rows -> row bucket 6
    images = [
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        for h, w in sizes
    ]
    flat, spans, _ = sort_model._encode_images_flat(images)
    assert calls == [6]
    assert len(spans) == 5
    single = sort_model._encode_images_flat([images[2]])
    off, count = spans[2]
    np.testing.assert_allclose(
        np.asarray(flat[off : off + count]),
        np.asarray(single[0][: count]),
        rtol=2e-5,
        atol=2e-5,
    )


def test_token_budget_caps_chunk_rows(sort_model, monkeypatch):
    """A chunk of long-prompt rows must shrink so rows x bucket stays within
    the batch_size x 320 budget (the full-width [B, 512] chunk the plain sort
    would build OOM'd the 16 GB chip at the flagship config)."""
    monkeypatch.setenv("LMMS_OWC_SORT_BY_VISION", "1")
    monkeypatch.setattr(sort_model, "batch_size", 48)
    # 8 identical-size large images (est >> budget/48) + 8 small ones.
    sizes = [(448, 448)] * 8 + [(56, 56)] * 8
    reqs = _make_requests(sort_model, sizes)
    seen = []
    orig = sort_model._prepare_requests_batch

    def spy(chunk):
        seen.append(len(chunk))
        return orig(chunk)

    monkeypatch.setattr(sort_model, "_prepare_requests_batch", spy)
    out = sort_model.generate_until(reqs)
    assert len(out) == len(sizes)
    # 448x448 -> 256 merged vision tokens + text//4 + 48 margin -> bucket 320
    # -> cap 48x320/320 = 48: all 8 large fit one chunk. 56x56 -> bucket 128
    # -> cap min(96, 15360//128)=96: all 8 small fit the next chunk.
    assert seen == [8, 8] or sum(seen) == len(sizes)
    for n_rows in seen:
        assert n_rows <= 96
