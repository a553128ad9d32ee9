"""Test shim: plain logging formatter in place of colorlog."""
import logging

__version__ = "0.0.0"
StreamHandler = logging.StreamHandler


class ColoredFormatter(logging.Formatter):
    def __init__(self, fmt=None, *args, **kwargs):
        if isinstance(fmt, str):
            fmt = fmt.replace("%(log_color)s", "").replace("%(reset)s", "")
        super().__init__(fmt)
