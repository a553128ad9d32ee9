"""Test shim: zoneinfo-backed pytz (reference uses it for log timestamps)."""
import zoneinfo

__version__ = "0.0.0"


def timezone(name):
    return zoneinfo.ZoneInfo(name)
