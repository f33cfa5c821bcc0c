"""LES grid definition.

Staggered Arakawa C grid, periodic in x and y, rigid lid:
- scalars (thl, qt, qr) and pressure at cell centers (zf[k], y_j+dy/2, x_i+dx/2)
- u at x-faces, v at y-faces, w at z-faces (zh, nz+1 of them, w[0]=w[nz]=0)

Array layout is [z, y, x] per instance (batch axis added by vmap at the fleet
level): z first so the Poisson tridiagonal scan runs over the leading axis
and slab-average reductions contract the two trailing (large, contiguous)
axes.

Default dimensions follow the reference RICO case
(/root/reference/dales-input/namoptions.001:17-27): 64 x 64 x 160 cells,
12.8 km x 12.8 km x 4 km.
"""

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LESGrid:
    """Static grid description. Hashable -> usable as a jit static arg."""

    nx: int = 64
    ny: int = 64
    nz: int = 160
    dx: float = 200.0
    dy: float = 200.0
    dz: float = 25.0

    @property
    def xsize(self):
        return self.nx * self.dx

    @property
    def ysize(self):
        return self.ny * self.dy

    @property
    def zsize(self):
        return self.nz * self.dz

    def zf(self):
        """Cell-center ("full level") heights, ascending, [nz]."""
        return (jnp.arange(self.nz) + 0.5) * self.dz

    def zh(self):
        """Face ("half level") heights, ascending from 0, [nz+1]."""
        return jnp.arange(self.nz + 1) * self.dz

    def x(self):
        return (jnp.arange(self.nx) + 0.5) * self.dx

    def y(self):
        return (jnp.arange(self.ny) + 0.5) * self.dy

    @classmethod
    def from_config(cls, cfg):
        return cls(nx=cfg.les_itot, ny=cfg.les_jtot, nz=cfg.les_ktot,
                   dx=cfg.les_dx, dy=cfg.les_dy, dz=cfg.les_dz)
