"""Pallas TPU kernel: fused LES momentum advection + diffusion, flat layout.

Companion to ops/lesflat_pallas.py (same [nz, P=ny*nx] plane-flattened
layout, mod-nx lane rolls, ZP-padded z slabs). Computes in ONE pass the
tendencies the XLA path assembles from models/les/advect.py advect_u /
advect_v / advect_w plus models/les/subgrid.py diffuse_momentum:

- du, dv at cells: 2nd-order flux-form self/cross advection + down-gradient
  diffusion with Km (the prescribed surface stress enters as a plane-0
  correction added by the caller, exactly like the scalar kernel);
- dw at z-faces k=0..nz-1 (face nz appended as zero by the caller):
  advection against the staggered velocity plus diffusion with the
  face-interpolated viscosity, reproducing diffuse_momentum's
  "diffuse wi as a scalar with swapped densities" construction
  (subgrid.py:179-185) index for index.

Boundary conditions are inherited from the state invariant w=0 on the
outer faces and from edge padding (zero vertical gradient at the outer
faces => zero diffusive flux), with explicit masks only where the XLA
path zeroes flux planes that padding cannot emulate (the w-grid vertical
diffusion flux at cells 0 and nz-1, and the face-0 tendency itself).

Reference semantics: DALES 2nd-order momentum advection + subgrid stress
(/root/reference/dales-input/namoptions.001; consumed via the coupling
surface of spcpl.py:341-364).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lesflat_pallas import ZP, LANE, _rollx


def _kernel(u_hbm, v_hbm, w_hbm, K_hbm,
            irf_ref, rhlo_ref, rhhi_ref, rf_ref, rfm1_ref, irh_ref,
            m0_ref, fm_ref, fmm1_ref,
            du_ref, dv_ref, dw_ref,
            u_sl, v_sl, w_sl, K_sl, sems,
            *, bz, nx, dx, dy, dz):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    z0 = zi * bz

    cps = [
        pltpu.make_async_copy(u_hbm.at[b, pl.ds(z0, bz + 2 * ZP)], u_sl,
                              sems.at[0]),
        pltpu.make_async_copy(v_hbm.at[b, pl.ds(z0, bz + 2 * ZP)], v_sl,
                              sems.at[1]),
        pltpu.make_async_copy(w_hbm.at[b, pl.ds(z0, bz + 2 * ZP)], w_sl,
                              sems.at[2]),
        pltpu.make_async_copy(K_hbm.at[b, pl.ds(z0, bz + 2 * ZP)], K_sl,
                              sems.at[3]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    c = ZP
    u0 = u_sl[c:c + bz]
    um = u_sl[c - 1:c + bz - 1]
    up = u_sl[c + 1:c + bz + 1]
    v0 = v_sl[c:c + bz]
    vm = v_sl[c - 1:c + bz - 1]
    vp = v_sl[c + 1:c + bz + 1]
    # w is padded on the face grid: slab offset c+k-z0 holds face k
    w_k = w_sl[c:c + bz]
    w_km1 = w_sl[c - 1:c + bz - 1]
    w_k1 = w_sl[c + 1:c + bz + 1]
    K0 = K_sl[c:c + bz]
    Km_ = K_sl[c - 1:c + bz - 1]
    Kp_ = K_sl[c + 1:c + bz + 1]
    Kmm = K_sl[c - 2:c + bz - 2]

    shp = (bz, 1)
    irf = irf_ref[0].reshape(shp)      # 1/(rhobf dz)
    rh_lo = rhlo_ref[0].reshape(shp)   # rhobh[k]
    rh_hi = rhhi_ref[0].reshape(shp)   # rhobh[k+1]
    rf = rf_ref[0].reshape(shp)        # rhobf[k]
    rf_m1 = rfm1_ref[0].reshape(shp)   # rhobf[k-1] (0 at k=0)
    irh = irh_ref[0].reshape(shp)      # 1/(rhobh[k] dz)
    m0 = m0_ref[0].reshape(shp)        # 0 at k=0 else 1 (w faces)
    fm = fm_ref[0].reshape(shp)        # 0 at cells 0, nz-1 else 1
    fm_m1 = fmm1_ref[0].reshape(shp)   # fm shifted to k-1

    shx = functools.partial(_rollx, nx=nx)
    shy = lambda a, k: jnp.roll(a, k * nx, -1)

    # ---------------- du (x-face points) ----------------
    uc = 0.5 * (u0 + shx(u0, -1))
    Fx = uc * uc
    du = -(Fx - shx(Fx, 1)) / dx
    vbx = 0.5 * (shx(v0, 1) + v0)
    uby = 0.5 * (shy(u0, 1) + u0)
    Fy = vbx * uby
    du = du - (shy(Fy, -1) - Fy) / dy
    wbx_k = 0.5 * (shx(w_k, 1) + w_k)
    wbx_k1 = 0.5 * (shx(w_k1, 1) + w_k1)
    Flo = rh_lo * wbx_k * 0.5 * (um + u0)      # w=0 on outer faces
    Fhi = rh_hi * wbx_k1 * 0.5 * (u0 + up)
    du = du - (Fhi - Flo) * irf
    # diffusion (zero-flux z BCs via edge padding)
    Kx = 0.5 * (shx(K0, 1) + K0)
    Fdx = -Kx * (u0 - shx(u0, 1)) / dx
    du = du - (shx(Fdx, -1) - Fdx) / dx
    Ky = 0.5 * (shy(K0, 1) + K0)
    Fdy = -Ky * (u0 - shy(u0, 1)) / dy
    du = du - (shy(Fdy, -1) - Fdy) / dy
    Fz_lo = -rh_lo * 0.5 * (Km_ + K0) * (u0 - um) / dz
    Fz_hi = -rh_hi * 0.5 * (K0 + Kp_) * (up - u0) / dz
    du = du - (Fz_hi - Fz_lo) * irf

    # ---------------- dv (y-face points) ----------------
    vc = 0.5 * (v0 + shy(v0, -1))
    Fyv = vc * vc
    dv = -(Fyv - shy(Fyv, 1)) / dy
    ub2 = 0.5 * (shy(u0, 1) + u0)
    vb2 = 0.5 * (shx(v0, 1) + v0)
    Fxv = ub2 * vb2
    dv = dv - (shx(Fxv, -1) - Fxv) / dx
    wby_k = 0.5 * (shy(w_k, 1) + w_k)
    wby_k1 = 0.5 * (shy(w_k1, 1) + w_k1)
    Flo = rh_lo * wby_k * 0.5 * (vm + v0)
    Fhi = rh_hi * wby_k1 * 0.5 * (v0 + vp)
    dv = dv - (Fhi - Flo) * irf
    Fdx = -Kx * (v0 - shx(v0, 1)) / dx
    dv = dv - (shx(Fdx, -1) - Fdx) / dx
    Fdy = -Ky * (v0 - shy(v0, 1)) / dy
    dv = dv - (shy(Fdy, -1) - Fdy) / dy
    Fz_lo = -rh_lo * 0.5 * (Km_ + K0) * (v0 - vm) / dz
    Fz_hi = -rh_hi * 0.5 * (K0 + Kp_) * (vp - v0) / dz
    dv = dv - (Fz_hi - Fz_lo) * irf

    # ---------------- dw (z-faces k = z0..z0+bz-1) ----------------
    u_zf = 0.5 * (um + u0)          # u at (x-face, z-face k)
    v_zf = 0.5 * (vm + v0)
    Fxw = u_zf * 0.5 * (shx(w_k, 1) + w_k)
    dw = -(shx(Fxw, -1) - Fxw) / dx
    Fyw = v_zf * 0.5 * (shy(w_k, 1) + w_k)
    dw = dw - (shy(Fyw, -1) - Fyw) / dy
    wc_k = 0.5 * (w_k + w_k1)       # cell-center w at cell k
    wc_km1 = 0.5 * (w_km1 + w_k)    # ... at cell k-1
    dw = dw - (rf * wc_k * wc_k - rf_m1 * wc_km1 * wc_km1) * irh
    # diffusion of w: face-interpolated viscosity Kf(k)=(Km[k-1]+Km[k])/2
    Kf = 0.5 * (Km_ + K0)
    Kfx = 0.5 * (shx(Kf, 1) + Kf)
    Fdx = -Kfx * (w_k - shx(w_k, 1)) / dx
    dw = dw - (shx(Fdx, -1) - Fdx) / dx
    Kfy = 0.5 * (shy(Kf, 1) + Kf)
    Fdy = -Kfy * (w_k - shy(w_k, 1)) / dy
    dw = dw - (shy(Fdy, -1) - Fdy) / dy
    # vertical: flux at cell m between faces m and m+1, zeroed at the
    # outermost cells (the XLA path's [0, Fz_int, 0] on the w grid)
    Fd_k = -fm * rf * (0.25 * Km_ + 0.5 * K0 + 0.25 * Kp_) \
        * (w_k1 - w_k) / dz
    Fd_km1 = -fm_m1 * rf_m1 * (0.25 * Kmm + 0.5 * Km_ + 0.25 * K0) \
        * (w_k - w_km1) / dz
    dw = dw - (Fd_k - Fd_km1) * irh
    dw = m0 * dw

    du_ref[0] = du
    dv_ref[0] = dv
    dw_ref[0] = dw


@functools.partial(
    jax.jit, static_argnames=("nx", "dx", "dy", "dz", "bz", "interpret"))
def _batched_call(u, v, w, Km, rhobf, rhobh, nx, dx, dy, dz, bz, interpret):
    """u, v: [n, nz, P]; w: [n, nz+1, P]; Km: [n, nz, P]; rhobf: [n, nz];
    rhobh: [n, nz+1]. Returns (du, dv, dw) with dw [n, nz, P] = faces
    0..nz-1 (face nz is identically zero, appended by the wrapper)."""
    n, nz, P = u.shape
    assert nz % bz == 0 and bz % ZP == 0, (nz, bz)
    assert P % nx == 0 and P % LANE == 0, (P, nx)
    zpad = ((0, 0), (ZP, ZP), (0, 0))
    upad = jnp.pad(u, zpad, mode="edge")
    vpad = jnp.pad(v, zpad, mode="edge")
    wpad = jnp.pad(w, ((0, 0), (ZP, ZP - 1), (0, 0)), mode="edge")
    Kpad = jnp.pad(Km, zpad, mode="edge")

    k = jnp.arange(nz, dtype=u.dtype)
    ones = jnp.ones((n, 1), u.dtype)
    vec = lambda x: (ones * x[None])[:, :, None]      # [n, nz, 1]
    irf = (1.0 / (rhobf * dz))[:, :, None]
    rh_lo = rhobh[:, :-1, None]
    rh_hi = rhobh[:, 1:, None]
    rf = rhobf[:, :, None]
    rf_m1 = jnp.pad(rhobf[:, :-1], ((0, 0), (1, 0)))[:, :, None]
    irh = (1.0 / (rhobh[:, :-1] * dz))[:, :, None]
    m0 = vec((k != 0).astype(u.dtype))
    fmv = ((k != 0) & (k != nz - 1)).astype(u.dtype)
    fm = vec(fmv)
    fm_m1 = vec(jnp.pad(fmv[:-1], (1, 0)))

    kern = functools.partial(_kernel, bz=bz, nx=nx,
                             dx=float(dx), dy=float(dy), dz=float(dz))
    coef = pl.BlockSpec((1, bz, 1), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bz, P), lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, nz, P), u.dtype)
    return pl.pallas_call(
        kern,
        grid=(n, nz // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [coef] * 9,
        out_specs=[out_spec] * 3,
        out_shape=[shape, shape, shape],
        scratch_shapes=[
            pltpu.VMEM((bz + 2 * ZP, P), u.dtype),   # u slab
            pltpu.VMEM((bz + 2 * ZP, P), u.dtype),   # v slab
            pltpu.VMEM((bz + 2 * ZP, P), u.dtype),   # w slab
            pltpu.VMEM((bz + 2 * ZP, P), u.dtype),   # K slab
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(upad, vpad, wpad, Kpad, irf, rh_lo, rh_hi, rf, rf_m1, irh,
      m0, fm, fm_m1)


@functools.lru_cache(maxsize=None)
def _make_op(ny, nx, dx, dy, dz, bz, interpret):
    def call(args, n):
        u, v, w, Km, rhobf, rhobh = args
        nz = u.shape[-3]
        P = ny * nx
        du, dv, dw = _batched_call(
            u.reshape(n, nz, P), v.reshape(n, nz, P),
            w.reshape(n, nz + 1, P), Km.reshape(n, nz, P),
            rhobf.reshape(n, nz), rhobh.reshape(n, nz + 1),
            nx, dx, dy, dz, bz, interpret)
        dw_full = jnp.concatenate(
            [dw, jnp.zeros((n, 1, P), dw.dtype)], axis=1)
        return (du.reshape(n, nz, ny, nx), dv.reshape(n, nz, ny, nx),
                dw_full.reshape(n, nz + 1, ny, nx))

    @jax.custom_batching.custom_vmap
    def op(u, v, w, Km, rhobf, rhobh):
        du, dv, dw = call(tuple(x[None] for x in
                                (u, v, w, Km, rhobf, rhobh)), 1)
        return du[0], dv[0], dw[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = tuple(
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(args, in_batched))
        return call(full, axis_size), (True, True, True)

    return op


def momentum_tendencies(u, v, w, Km, rhobf, rhobh, dx, dy, dz,
                        bz=8, interpret=False):
    """Fused momentum advection+diffusion for one LES instance.

    u, v: [nz, ny, nx]; w: [nz+1, ny, nx]; Km: [nz, ny, nx]; rhobf: [nz];
    rhobh: [nz+1]. Returns (du, dv, dw) matching advect_u/v/w +
    diffuse_momentum (surface stress excluded — plane-0 correction by the
    caller). vmap-compatible.
    """
    if not interpret:
        interpret = jax.default_backend() != "tpu"
    ny, nx = u.shape[-2:]
    op = _make_op(int(ny), int(nx), float(dx), float(dy), float(dz),
                  int(bz), bool(interpret))
    return op(u, v, w, Km, rhobf, rhobh)
