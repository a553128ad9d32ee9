"""Test shim: downloads never run in the golden tests."""
__version__ = "0.0.0"


def download(*args, **kwargs):
    raise RuntimeError("gdown shim: no network in tests")
