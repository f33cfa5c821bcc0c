"""Pallas TPU kernel: fused scalar advection + diffusion for the LES.

The XLA version of the scalar tendency path (models/les/advect.py +
subgrid.diffuse_scalar) materializes every jnp.roll and flux array in HBM;
measured on the 2x(64x64x160) case: stacked scalar advection 1.38 ms +
stacked diffusion 0.88 ms of a 4.2 ms RK stage, ~11x above the HBM
roofline (~0.2 ms for one read of u,v,w,K,s and one tendency write).
This kernel computes the advection (5th-order upwind horizontal, 2nd-order
vertical, flux form — DALES iadv=52, the reference case's scheme,
/root/reference/dales-input/namoptions.001 &DYNAMICS) and downgradient-
diffusion tendencies for a whole stacked scalar batch in ONE pass: z-slabs
are DMA'd into VMEM with a one-plane halo, all shifted operands live
on-chip, and each grid step writes only the final tendency block to HBM.

STATUS: numerics validated against the XLA path in interpret mode
(tests/test_ops.py). On real TPU hardware Mosaic rejects the manual DMA
slices because nx=64 is below the 128-lane tile: the production variant
lives in ops/lesflat_pallas.py, which uses the plane-flattened
[z, y*x] layout with mod-nx lane rolls and is lane-aligned for any
ny*nx multiple of 128.

Boundary conditions match the XLA path exactly: periodic x/y via lane/
sublane rolls; the caller edge-pads the scalar and K arrays by one plane in
z, which makes the vertical diffusive flux through the outer faces exactly
zero (zero gradient) and — together with w=0 on the outer faces, a state
invariant — the advective flux too. The prescribed surface flux is a
single-plane correction added by the caller (see models/les/step.py).

The op is batched over LES instances via the leading grid axis; a
jax.custom_batching rule lets the same op be used per-instance under the
fleet's vmap.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

YA, XA = 2, 3  # axes of a [S, bz, ny, nx] slab


def _face5(s, vel, ax):
    """5th-order upwind face value at face i (between cells i-1, i)."""
    roll = jnp.roll
    s0 = s
    sp1 = roll(s, -1, ax)
    sp2 = roll(s, -2, ax)
    sm1 = roll(s, 1, ax)
    sm2 = roll(s, 2, ax)
    sm3 = roll(s, 3, ax)
    central = (37.0 * (sm1 + s0) - 8.0 * (sm2 + sp1) + (sm3 + sp2)) / 60.0
    upwind = (10.0 * (s0 - sm1) - 5.0 * (sp1 - sm2) + (sp2 - sm3)) / 60.0
    return central - jnp.sign(vel) * upwind


def _kernel(u_hbm, v_hbm, wr_hbm, K_hbm, s_hbm, irfdz_ref, rhlo_ref,
            rhhi_ref, out_ref, u_sl, v_sl, w_sl, K_sl, s_sl, sems,
            *, bz, S, dx, dy, dz):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    z0 = zi * bz

    cps = [
        pltpu.make_async_copy(u_hbm.at[b, pl.ds(z0, bz)], u_sl, sems.at[0]),
        pltpu.make_async_copy(v_hbm.at[b, pl.ds(z0, bz)], v_sl, sems.at[1]),
        pltpu.make_async_copy(wr_hbm.at[b, pl.ds(z0, bz + 1)], w_sl,
                              sems.at[2]),
        # K and s are z-padded by one plane on each side: slab [z0, z0+bz+2)
        # of the padded array covers global planes [z0-1, z0+bz+1).
        pltpu.make_async_copy(K_hbm.at[b, :, pl.ds(z0, bz + 2)], K_sl,
                              sems.at[3]),
        pltpu.make_async_copy(s_hbm.at[b, :, pl.ds(z0, bz + 2)], s_sl,
                              sems.at[4]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    s0 = s_sl[:, 1:bz + 1]
    sm = s_sl[:, 0:bz]
    sp_ = s_sl[:, 2:bz + 2]
    K0 = K_sl[:, 1:bz + 1]
    Km_ = K_sl[:, 0:bz]
    Kp_ = K_sl[:, 2:bz + 2]
    uk = u_sl[:][None]
    vk = v_sl[:][None]
    wr_lo = w_sl[0:bz][None]       # rhobh * w at the bottom faces
    wr_hi = w_sl[1:bz + 1][None]   # ... top faces
    irfdz = irfdz_ref[:].reshape(1, bz, 1, 1)    # 1 / (rhobf dz)
    rh_lo = rhlo_ref[:].reshape(1, bz, 1, 1)     # rhobh at bottom faces
    rh_hi = rhhi_ref[:].reshape(1, bz, 1, 1)

    # --- advection, horizontal (periodic) ---
    Fx = uk * _face5(s0, uk, XA)
    Fy = vk * _face5(s0, vk, YA)
    tend = (-(jnp.roll(Fx, -1, XA) - Fx) / dx
            - (jnp.roll(Fy, -1, YA) - Fy) / dy)
    # --- advection, vertical cd2 (w=0 on the outer faces) ---
    Flo = wr_lo * 0.5 * (sm + s0)
    Fhi = wr_hi * 0.5 * (s0 + sp_)
    tend = tend - (Fhi - Flo) * irfdz

    # --- diffusion, horizontal ---
    Kx = 0.5 * (jnp.roll(K0, 1, XA) + K0)
    Fdx = -Kx * (s0 - jnp.roll(s0, 1, XA)) / dx
    tend = tend - (jnp.roll(Fdx, -1, XA) - Fdx) / dx
    Ky = 0.5 * (jnp.roll(K0, 1, YA) + K0)
    Fdy = -Ky * (s0 - jnp.roll(s0, 1, YA)) / dy
    tend = tend - (jnp.roll(Fdy, -1, YA) - Fdy) / dy
    # --- diffusion, vertical (edge padding => zero flux at outer faces) ---
    Fz_lo = -rh_lo * 0.5 * (Km_ + K0) * (s0 - sm) / dz
    Fz_hi = -rh_hi * 0.5 * (K0 + Kp_) * (sp_ - s0) / dz
    tend = tend - (Fz_hi - Fz_lo) * irfdz

    out_ref[0] = tend


def pick_bz(nz, target=16):
    """Largest divisor of nz that is <= target (slab height)."""
    for b in range(min(target, nz), 0, -1):
        if nz % b == 0:
            return b
    return 1


@functools.partial(jax.jit,
                   static_argnames=("dx", "dy", "dz", "bz", "interpret"))
def _batched_call(u, v, w, Ks, scalars, rhobf, rhobh,
                  dx, dy, dz, bz, interpret):
    """[n]-batched fused tendencies.

    u, v: [n, nz, ny, nx]; w: [n, nz+1, ny, nx]; Ks, scalars:
    [n, S, nz, ny, nx]; rhobf: [n, nz]; rhobh: [n, nz+1].
    Returns [n, S, nz, ny, nx].
    """
    n, S, nz, ny, nx = scalars.shape
    assert nz % bz == 0, (nz, bz)
    # fold rhobh into w (advective face fluxes); pad K, s in z with edge
    # values (=> zero-gradient outer faces); per-level coefficient vectors
    wr = w * rhobh[:, :, None, None]
    zpad = ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0))
    spad = jnp.pad(scalars, zpad, mode="edge")
    Kpad = jnp.pad(Ks, zpad, mode="edge")
    irfdz = (1.0 / (rhobf * dz))[:, :, None]
    rh_lo = rhobh[:, :-1, None]
    rh_hi = rhobh[:, 1:, None]

    kern = functools.partial(_kernel, bz=bz, S=S,
                             dx=float(dx), dy=float(dy), dz=float(dz))
    coef_spec = pl.BlockSpec((1, bz, 1), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, nz // bz),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # u
            pl.BlockSpec(memory_space=pl.ANY),   # v
            pl.BlockSpec(memory_space=pl.ANY),   # wr
            pl.BlockSpec(memory_space=pl.ANY),   # K (padded)
            pl.BlockSpec(memory_space=pl.ANY),   # s (padded)
            coef_spec,                              # 1/(rhobf dz)
            coef_spec,                              # rhobh[:-1]
            coef_spec,                              # rhobh[1:]
        ],
        out_specs=pl.BlockSpec((1, S, bz, ny, nx),
                               lambda b, i: (b, 0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, S, nz, ny, nx), scalars.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz, ny, nx), scalars.dtype),          # u slab
            pltpu.VMEM((bz, ny, nx), scalars.dtype),          # v slab
            pltpu.VMEM((bz + 1, ny, nx), scalars.dtype),      # wr slab
            pltpu.VMEM((S, bz + 2, ny, nx), scalars.dtype),   # K slab
            pltpu.VMEM((S, bz + 2, ny, nx), scalars.dtype),   # s slab
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
    )(u, v, wr, Kpad, spad, irfdz, rh_lo, rh_hi)


@functools.lru_cache(maxsize=None)
def _make_op(dx, dy, dz, bz, interpret):
    """Unbatched op with a custom vmap rule mapping to the batched kernel."""

    @jax.custom_batching.custom_vmap
    def op(u, v, w, Ks, scalars, rhobf, rhobh):
        out = _batched_call(u[None], v[None], w[None], Ks[None],
                            scalars[None], rhobf[None], rhobh[None],
                            dx, dy, dz, bz, interpret)
        return out[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, u, v, w, Ks, scalars, rhobf, rhobh):
        args = []
        for x, b in zip((u, v, w, Ks, scalars, rhobf, rhobh), in_batched):
            args.append(x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape))
        return _batched_call(*args, dx, dy, dz, bz, interpret), True

    return op


def advect_diffuse_scalars(u, v, w, Ks, scalars, rhobf, rhobh,
                           dx, dy, dz, bz=None, interpret=False):
    """Fused advection+diffusion tendencies for a scalar stack, one LES.

    u, v: [nz, ny, nx]; w: [nz+1, ny, nx]; Ks, scalars: [S, nz, ny, nx];
    rhobf: [nz]; rhobh: [nz+1]. Returns [S, nz, ny, nx]. vmap-compatible
    (batches into a single kernel launch over a [n, ...] fleet).
    """
    nz = scalars.shape[1]
    if bz is None:
        bz = pick_bz(nz)
    op = _make_op(float(dx), float(dy), float(dz), int(bz), bool(interpret))
    return op(u, v, w, Ks, scalars, rhobf, rhobh)
