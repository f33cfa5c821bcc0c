from . import parity  # noqa: F401
