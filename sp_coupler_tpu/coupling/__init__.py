from . import convert, nudge  # noqa: F401
