"""Native (C++) runtime components: the image data loader."""

from lmms_owc_tpu.native.loader import NativeImageLoader, native_loader_available

__all__ = ["NativeImageLoader", "native_loader_available"]
