"""Test shim: table writers unused by the golden CLI paths."""
__version__ = "0.0.0"


class _Writer:
    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def dumps(self):
        return ""


LatexTableWriter = MarkdownTableWriter = _Writer
