"""Native loader tests: build, decode, and resize parity against PIL."""

import io

import numpy as np
import pytest

from lmms_owc_tpu.native import native_loader_available


pytestmark = pytest.mark.skipif(
    not native_loader_available(), reason="native loader could not be built"
)


@pytest.fixture(scope="module")
def loader():
    from lmms_owc_tpu.native import NativeImageLoader

    return NativeImageLoader(num_workers=2)


def _jpeg_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


class TestNativeLoader:
    def test_dims_and_decode(self, loader):
        rng = np.random.RandomState(0)
        arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        data = _jpeg_bytes(arr)
        assert loader.jpeg_dims(data) == (96, 128)
        out = loader.decode_resize(data, 96, 128)
        assert out.shape == (3, 96, 128)
        # JPEG is lossy: decoded content should still be close to the source.
        from PIL import Image

        pil = np.asarray(Image.open(io.BytesIO(data))).transpose(2, 0, 1)
        assert np.mean(np.abs(out.astype(int) - pil.astype(int))) < 1.0

    def test_resize_matches_pil(self, loader):
        from PIL import Image

        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (100, 80, 3), dtype=np.uint8)
        for out_w, out_h in [(56, 84), (160, 120), (28, 28)]:
            ours = loader.resize_u8(arr, out_h, out_w)
            pil = np.asarray(
                Image.fromarray(arr).resize((out_w, out_h), Image.BICUBIC)
            ).transpose(2, 0, 1)
            diff = np.abs(ours.astype(int) - pil.astype(int))
            # PIL uses fixed-point weights; allow +-2 levels on a tiny fraction.
            assert np.mean(diff) < 0.6, (out_w, out_h, np.mean(diff))
            assert np.percentile(diff, 99) <= 2

    def test_batch_decode(self, loader):
        rng = np.random.RandomState(2)
        jobs = []
        for _ in range(8):
            arr = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            jobs.append((_jpeg_bytes(arr), 56, 56))
        outs = loader.decode_resize_batch(jobs)
        assert len(outs) == 8
        assert all(o.shape == (3, 56, 56) for o in outs)
