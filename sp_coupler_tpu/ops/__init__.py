from . import advect_pallas  # noqa: F401
