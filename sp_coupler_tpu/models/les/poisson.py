"""Anelastic pressure projection: FFT in x/y + tridiagonal solve in z.

Enforces div(rho_b u) = 0 after each RK stage, the role of DALES's
Poisson solver. Periodic horizontal directions diagonalize with a real
2-D FFT; the remaining problem per horizontal wavenumber is tridiagonal
in z (variable base density) and is solved with a Thomas sweep expressed
as two lax.scans. Modified wavenumbers make the solve exact for the
2nd-order discrete divergence/gradient pair, so the projected velocity
field is discretely divergence-free to round-off.
"""

import jax
import jax.numpy as jnp

from .advect import sp, divergence, X, Y, Z


def _modified_wavenumbers(grid, dtype=jnp.float32):
    """lambda_{ky,kx} = modified horizontal Laplacian eigenvalues, [ny, nxh]."""
    kx = jnp.arange(grid.nx // 2 + 1)
    ky = jnp.arange(grid.ny)
    lx = (2.0 - 2.0 * jnp.cos(2.0 * jnp.pi * kx / grid.nx)) / grid.dx ** 2
    ly = (2.0 - 2.0 * jnp.cos(2.0 * jnp.pi * ky / grid.ny)) / grid.dy ** 2
    return (ly[:, None] + lx[None, :]).astype(dtype)


def solve_pressure(grid, rhobf, rhobh, rhs):
    """Solve d/dx(rho_f dphi/dx) + ... + d/dz(rho_h dphi/dz) = rhs.

    rhs at cell centers [nz, ny, nx]; returns phi at cell centers.
    Neumann (zero-gradient) BCs top and bottom; the mean mode is pinned.
    """
    nz = grid.nz
    lam = _modified_wavenumbers(grid, rhs.dtype)              # [ny, nxh]
    rhat = jnp.fft.rfft2(rhs, axes=(Y, X))                    # [nz, ny, nxh]

    dz2 = grid.dz ** 2
    a = (rhobh[:-1] / dz2)                                    # [nz] sub-diag
    cc = (rhobh[1:] / dz2)                                    # [nz] super-diag
    a = a.at[0].set(0.0)
    cc = cc.at[-1].set(0.0)
    # b[k, ky, kx] = -(a+c) - rho_f * lambda
    b = -(a + cc)[:, None, None] - rhobf[:, None, None] * lam[None]

    # pin the (0,0) mean mode: phi[0] = 0 for that column
    mean_mode = (lam == 0.0)[None]                             # [1, ny, nxh]
    b0 = jnp.where(mean_mode[0], 1.0, b[0])
    c0 = jnp.where(mean_mode[0], 0.0, cc[0])
    r0 = jnp.where(mean_mode[0], 0.0, rhat[0])

    # Thomas forward sweep
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ak, bk, ck, rk = inp
        denom = bk - ak * cp_prev
        cp = ck / denom
        dp = (rk - ak * dp_prev) / denom
        return (cp, dp), (cp, dp)

    b_rest = b[1:]
    c_rest = jnp.broadcast_to(cc[1:, None, None], b_rest.shape)
    a_rest = jnp.broadcast_to(a[1:, None, None], b_rest.shape)
    init_cp = c0 / b0
    init_dp = r0 / b0
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (init_cp, init_dp), (a_rest, b_rest, c_rest, rhat[1:]))
    cps = jnp.concatenate([init_cp[None], cps])                # [nz, ny, nxh]
    dps = jnp.concatenate([init_dp[None], dps])

    # back substitution
    def bwd(phi_next, inp):
        cp, dp = inp
        phi = dp - cp * phi_next
        return phi, phi

    _, phis = jax.lax.scan(bwd, dps[-1] * 0.0 + dps[-1],
                           (cps[:-1][::-1], dps[:-1][::-1]))
    phat = jnp.concatenate([phis[::-1], dps[-1][None]])
    return jnp.fft.irfft2(phat, s=(grid.ny, grid.nx), axes=(Y, X))


def project(grid, rhobf, rhobh, u, v, w, dt):
    """Project (u, v, w) onto the divergence-free subspace.

    Returns corrected velocities and the pressure potential phi.
    """
    div = divergence(grid, rhobf, rhobh, u, v, w) / dt
    phi = solve_pressure(grid, rhobf, rhobh, div)
    # gradient at faces (periodic horizontally)
    u = u - dt * (phi - jnp.roll(phi, 1, X)) / grid.dx
    v = v - dt * (phi - jnp.roll(phi, 1, Y)) / grid.dy
    dphidz = (phi[1:] - phi[:-1]) / grid.dz                    # interior z-faces
    zero = jnp.zeros_like(w[:1])
    w = w - dt * jnp.concatenate([zero, dphidz, zero], axis=Z)
    return u, v, w, phi
