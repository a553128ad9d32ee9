"""Test shim: no .env loading needed."""
__version__ = "0.0.0"


def load_dotenv(*args, **kwargs):
    return False
