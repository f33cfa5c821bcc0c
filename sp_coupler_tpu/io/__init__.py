from . import h5nc, spifs  # noqa: F401
