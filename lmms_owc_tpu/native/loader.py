"""ctypes bindings for the native C++ image loader (owc_loader.cpp).

The shared library is compiled on first use (g++, cached next to this file).
Every call releases the GIL, so a ThreadPoolExecutor of decode jobs overlaps host
preprocessing with TPU compute — the reference's per-sample PIL decode/resize sits
on the critical path instead (src/models/_qwen2_vl.py:237-305).
"""

from __future__ import annotations

import ctypes
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from lmms_owc_tpu.utils import get_logger

log = get_logger(__name__)

__all__ = ["NativeImageLoader", "native_loader_available", "build_native_loader"]

_LIB_DIR = Path(__file__).resolve().parent
_LIB_PATH = _LIB_DIR / "libowcloader.so"
_lib = None
_build_failed = False


def build_native_loader(force: bool = False) -> Path | None:
    """Compile the shared library if missing; returns its path or None on failure."""
    global _build_failed
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    src = _LIB_DIR / "owc_loader.cpp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH), "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        log.info("built native loader at %s", _LIB_PATH)
        return _LIB_PATH
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as err:
        stderr = getattr(err, "stderr", b"")
        log.warning("native loader build failed: %s %s", err, stderr[:500] if stderr else "")
        _build_failed = True
        return None


def _get_lib():
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    path = build_native_loader()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.owc_decode_resize_jpeg.restype = ctypes.c_int
    lib.owc_decode_resize_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.owc_jpeg_dims.restype = ctypes.c_int
    lib.owc_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.owc_resize_u8.restype = ctypes.c_int
    lib.owc_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def native_loader_available() -> bool:
    return _get_lib() is not None


class NativeImageLoader:
    """Threaded decode+resize front end over the native library."""

    def __init__(self, num_workers: int = 4) -> None:
        self._lib = _get_lib()
        if self._lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def jpeg_dims(self, data: bytes) -> tuple[int, int]:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.owc_jpeg_dims(data, len(data), ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise ValueError("not a decodable JPEG")
        return h.value, w.value

    def decode_resize(self, data: bytes, out_h: int, out_w: int) -> np.ndarray:
        """JPEG bytes -> uint8 [3, out_h, out_w]."""
        out = np.empty((3, out_h, out_w), dtype=np.uint8)
        rc = self._lib.owc_decode_resize_jpeg(
            data, len(data), out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError("JPEG decode failed")
        return out

    def resize_u8(self, hwc: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """uint8 HWC -> uint8 CHW bicubic resize (PIL convention)."""
        hwc = np.ascontiguousarray(hwc, dtype=np.uint8)
        in_h, in_w, channels = hwc.shape
        out = np.empty((channels, out_h, out_w), dtype=np.uint8)
        rc = self._lib.owc_resize_u8(
            hwc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), in_h, in_w, channels,
            out_h, out_w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc != 0:
            raise ValueError("resize failed")
        return out

    def decode_resize_batch(self, jobs: list[tuple[bytes, int, int]]) -> list[np.ndarray]:
        """Decode+resize many JPEGs concurrently (GIL released inside each call)."""
        futures = [self._pool.submit(self.decode_resize, d, h, w) for d, h, w in jobs]
        return [f.result() for f in futures]
