"""Subgrid turbulence closure: Smagorinsky-Lilly with stability correction.

Stands in for DALES's subgrid model (the reference case runs the prognostic
TKE scheme, namoptions.001 &NAMSUBGRID lsmagorinsky=.false.; a TKE option
can reuse this module's diffusion operators). Eddy viscosity is computed at
cell centers from the full deformation plus a Richardson-number stability
factor, then interpolated to the faces where fluxes live.

The surface boundary condition injects the prescribed kinematic fluxes
(wthl, wqt) and a neutral drag-law momentum stress with roughness z0m,
mirroring what the coupler pushes through set_wt_surf / set_wq_surf /
set_z0m_surf (/root/reference/splib/spcpl.py:360-364).
"""

import jax.numpy as jnp

from ... import constants as c
from .advect import sp, sm, X, Y, Z

KAPPA = 0.4          # von Karman
CS = 0.15            # Smagorinsky constant
PRANDTL = 1.0 / 3.0  # turbulent Prandtl number (Kh = Km / Pr)
RI_C = 0.25          # critical Richardson number


def _center_gradients(grid, u, v, w):
    """Velocity gradients at cell centers."""
    dx, dy, dz = grid.dx, grid.dy, grid.dz
    dudx = (sp(u, X) - u) / dx
    dvdy = (sp(v, Y) - v) / dy
    dwdz = (w[1:] - w[:-1]) / dz
    # off-diagonal terms via centered differences of center-interpolated fields
    uc = 0.5 * (u + sp(u, X))
    vc = 0.5 * (v + sp(v, Y))
    wc = 0.5 * (w[1:] + w[:-1])
    ddy = lambda a: (sp(a, Y) - sm(a, Y)) / (2 * dy)
    ddx = lambda a: (sp(a, X) - sm(a, X)) / (2 * dx)

    def ddz(a):
        lo = (a[1:2] - a[0:1]) / dz
        mid = (a[2:] - a[:-2]) / (2 * dz)
        hi = (a[-1:] - a[-2:-1]) / dz
        return jnp.concatenate([lo, mid, hi], axis=Z)

    return dudx, dvdy, dwdz, ddy(uc), ddz(uc), ddx(vc), ddz(vc), ddx(wc), ddy(wc)


def strain_and_stability(grid, state, thv, thv_m=None):
    """(S2, N2) at cell centers: squared deformation and Brunt-Vaisala."""
    dudx, dvdy, dwdz, dudy, dudz, dvdx, dvdz, dwdx, dwdy = _center_gradients(
        grid, state.u, state.v, state.w)
    S2 = (2.0 * (dudx ** 2 + dvdy ** 2 + dwdz ** 2)
          + (dudy + dvdx) ** 2 + (dudz + dwdx) ** 2 + (dvdz + dwdy) ** 2)
    # Brunt-Vaisala from the slab-mean thv profile (robust, avoids local noise)
    if thv_m is None:
        thv_m = jnp.mean(thv, axis=(Y, X), keepdims=True)
    dthv = jnp.concatenate([
        (thv_m[1:2] - thv_m[0:1]),
        (thv_m[2:] - thv_m[:-2]) / 2.0,
        (thv_m[-1:] - thv_m[-2:-1]),
    ], axis=Z) / grid.dz
    N2 = c.grav / jnp.maximum(thv_m, 1.0) * dthv
    return S2, jnp.broadcast_to(N2, S2.shape)


def eddy_viscosity(grid, state, thv):
    """Smagorinsky-Lilly (Km, Kh) at cell centers, [nz, ny, nx]."""
    S2, N2 = strain_and_stability(grid, state, thv)
    Ri = N2 / jnp.maximum(S2, 1e-12)
    fstab = jnp.sqrt(jnp.clip(1.0 - Ri / RI_C, 0.0, 1.0))
    delta = (grid.dx * grid.dy * grid.dz) ** (1.0 / 3.0)
    # wall-limited mixing length
    zf = (jnp.arange(grid.nz) + 0.5) * grid.dz
    lam = 1.0 / jnp.sqrt(1.0 / delta ** 2 + 1.0 / (KAPPA * zf[:, None, None]) ** 2)
    Km = (CS * lam) ** 2 * jnp.sqrt(S2) * fstab
    Kh = Km / PRANDTL
    return Km, Kh


# prognostic-TKE (Deardorff) constants, DALES values
CM = 0.12
CH1, CH2 = 1.0, 2.0
CE1, CE2 = 0.19, 0.51
CN = 0.76
E12_MIN = 1e-3  # floor on sqrt(TKE)


def tke_viscosity(grid, state, thv, thv_m=None):
    """Deardorff prognostic-TKE closure: (Km, Kh, lam, S2, N2).

    The reference LES runs this scheme (namoptions &NAMSUBGRID
    lsmagorinsky=.false.): Km = cm * lam * e12, with the mixing length
    reduced to cn * e12 / N in stable stratification, and
    Kh = (ch1 + ch2 * lam/delta) * Km.
    """
    S2, N2 = strain_and_stability(grid, state, thv, thv_m)
    e12 = jnp.maximum(state.e12, E12_MIN)
    delta = (grid.dx * grid.dy * grid.dz) ** (1.0 / 3.0)
    lam_stable = CN * e12 / jnp.sqrt(jnp.maximum(N2, 1e-10))
    lam = jnp.where(N2 > 1e-10, jnp.minimum(delta, lam_stable), delta)
    Km = CM * lam * e12
    Kh = (CH1 + CH2 * lam / delta) * Km
    return Km, Kh, lam, S2, N2


def tke_sources(grid, Km, Kh, lam, S2, N2, e12, delta=None):
    """d(e12)/dt source terms: (shear + buoyancy - dissipation) / (2 e12).

    e = e12^2; de/dt = Km S^2 - Kh N^2 - (ce1 + ce2 lam/delta) e^{3/2}/lam.
    """
    if delta is None:
        delta = (grid.dx * grid.dy * grid.dz) ** (1.0 / 3.0)
    e12s = jnp.maximum(e12, E12_MIN)
    shear = Km * S2
    buoy = -Kh * N2
    diss = (CE1 + CE2 * lam / delta) * e12s ** 3 / lam
    return (shear + buoy - diss) / (2.0 * e12s)


def diffuse_scalar(grid, rhobf, rhobh, K, s, surf_flux=None):
    """Downgradient diffusion tendency of a cell-centered scalar.

    K at cell centers; fluxes at faces use interpolated K. ``surf_flux`` is
    the prescribed upward kinematic flux through the bottom face
    ([ny, nx] or scalar); the top face is zero flux.
    """
    dx, dy, dz = grid.dx, grid.dy, grid.dz
    # x faces: K and gradient at face i
    Kx = 0.5 * (sm(K, X) + K)
    Fx = -Kx * (s - sm(s, X)) / dx
    tend = -(sp(Fx, X) - Fx) / dx
    Ky = 0.5 * (sm(K, Y) + K)
    Fy = -Ky * (s - sm(s, Y)) / dy
    tend = tend - (sp(Fy, Y) - Fy) / dy
    # z faces
    Kz = 0.5 * (K[1:] + K[:-1])                        # [nz-1] interior faces
    Fz_int = -rhobh[1:-1, None, None] * Kz * (s[1:] - s[:-1]) / dz
    bottom = jnp.zeros_like(Fz_int[:1])
    if surf_flux is not None:
        bottom = bottom + rhobh[0] * jnp.broadcast_to(
            surf_flux, s.shape[1:])[None]
    top = jnp.zeros_like(Fz_int[:1])
    Fz = jnp.concatenate([bottom, Fz_int, top], axis=Z)
    tend = tend - (Fz[1:] - Fz[:-1]) / (rhobf[:, None, None] * dz)
    return tend


def surface_drag(grid, state, z0m):
    """Neutral drag law: (ustar, flux_u, flux_v) at the surface.

    flux_u/flux_v are the (upward) surface kinematic momentum fluxes
    -u*^2 u/|U| evaluated with the first-level wind.
    """
    z1 = 0.5 * grid.dz
    u1 = 0.5 * (state.u[0] + sp(state.u[0], X - 1))  # center, [ny, nx]
    v1 = 0.5 * (state.v[0] + sp(state.v[0], Y - 1))
    U1 = jnp.sqrt(u1 ** 2 + v1 ** 2 + 1e-4)
    cd = (KAPPA / jnp.log(z1 / jnp.maximum(z0m, 1e-6))) ** 2
    ustar2 = cd * U1 ** 2
    flux_u = -ustar2 * u1 / U1
    flux_v = -ustar2 * v1 / U1
    return jnp.sqrt(jnp.mean(ustar2)), flux_u, flux_v


def surface_momentum_fluxes(grid, state, z0m):
    """(ustar, fu, fv): drag-law stress interpolated to the u/v points."""
    ustar, flux_u_sfc, flux_v_sfc = surface_drag(grid, state, z0m)
    fu = 0.5 * (sm(flux_u_sfc, X - 1) + flux_u_sfc)   # [ny, nx] at x-faces
    fv = 0.5 * (sm(flux_v_sfc, Y - 1) + flux_v_sfc)
    return ustar, fu, fv


def diffuse_momentum(grid, rhobf, rhobh, Km, state, z0m):
    """Diffusion tendencies for (u, v, w) plus the surface drag stress.

    Gradient-diffusion approximation per component (the deformation
    transpose term is omitted — standard simplification; the energetically
    relevant vertical stress divergence and the wall stress are retained).
    """
    ustar, fu, fv = surface_momentum_fluxes(grid, state, z0m)
    tu = diffuse_scalar(grid, rhobf, rhobh, Km, state.u, surf_flux=fu)
    tv = diffuse_scalar(grid, rhobf, rhobh, Km, state.v, surf_flux=fv)
    # w: diffuse the interior faces as a scalar co-located with centers
    wi = state.w[1:-1]
    Kw = 0.5 * (Km[1:] + Km[:-1])
    # on the w grid the "cells" sit at zh[1..nz-1] with faces at zf, so the
    # face densities are rhobf and the cell densities are rhobh interior
    tw_int = diffuse_scalar(grid, rhobh[1:-1], rhobf, Kw, wi)
    zero = jnp.zeros_like(state.w[:1])
    tw = jnp.concatenate([zero, tw_int, zero], axis=Z)
    return tu, tv, tw, ustar
