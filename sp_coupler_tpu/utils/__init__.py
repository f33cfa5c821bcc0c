from . import thermo, interp, geometry  # noqa: F401
