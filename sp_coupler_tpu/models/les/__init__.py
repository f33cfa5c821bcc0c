from . import grid, state, advect, subgrid, poisson, micro, step, diag  # noqa: F401
