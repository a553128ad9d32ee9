"""Test shim for the reference checkout (absent dep; availability probe only)."""
__version__ = "0.0.0"


class DistributionNotFound(Exception):
    pass


def require(name):
    raise DistributionNotFound(name)
