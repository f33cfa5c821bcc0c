"""Pallas TPU kernel: fused LES scalar advection + diffusion, flat layout.

Production variant of ops/advect_pallas.py. The horizontal plane is
flattened into the lane dimension — fields are [nz, P] with P = ny*nx —
so every DMA slice is 128-lane aligned for any ny*nx multiple of 128
(64x64 and 128x128 reference grids included) and z lives on sublanes
where vertical stencils are static slices.

Horizontal periodicity on the flattened plane:
- a y-shift by k rows is a plain lane roll by k*nx: the lane axis holds
  exactly one z-plane, so the global wrap IS the periodic y wrap;
- an x-shift is a roll within each nx-sized row: implemented as two full
  rolls + a lane-index select (`_rollx`), which the VPU executes as pure
  register moves — nothing is materialized in HBM.

The z dimension is processed in bz-plane slabs. Scalars and diffusivities
are edge-padded by ZP=8 planes top and bottom so (a) every DMA offset and
size is a multiple of the 8-sublane tile and (b) the one-plane halo reads
at the domain edges return the boundary plane itself, which makes the
vertical diffusive flux through the outer faces exactly zero — the
zero-flux BC of the XLA path (subgrid.diffuse_scalar) with no masking.
The advective flux through the outer faces vanishes because w=0 there (a
state invariant maintained by the projection).

Measured motivation (2 instances of 64x64x160, TPU): the XLA path spends
1.38 ms (stacked advection) + 0.88 ms (stacked diffusion) per RK stage,
~11x above the ~0.2 ms HBM roofline, because every jnp.roll materializes
a full 4-scalar copy. This kernel reads u, v, w, K, s once per slab and
writes only the fused tendency.

Reference semantics reproduced: DALES iadv=52 (5th-order upwind
horizontal, 2nd-order vertical, flux form) + down-gradient diffusion
(/root/reference/dales-input/namoptions.001 &DYNAMICS; the surface-flux
plane correction is added by the caller, models/les/step.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZP = 8      # z padding planes on each side of scalars/K (sublane tile)
LANE = 128  # TPU lane width


def _rollx(a, k, nx):
    """Cyclic shift by k within each nx-sized lane row: out[x] = a[(x-k) % nx].

    a: [..., P] with P a multiple of nx. k in (-nx, nx), k != 0.
    """
    P = a.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    r1 = jnp.roll(a, k, -1)
    if k > 0:
        r2 = jnp.roll(a, k - nx, -1)
        mask = (lanes % nx) < k
    else:
        r2 = jnp.roll(a, k + nx, -1)
        mask = (lanes % nx) >= nx + k
    del P
    return jnp.where(mask, r2, r1)


def _face5(s, vel, shift):
    """5th-order upwind face value at face i (between cells i-1 and i).

    shift(a, k) returns a shifted so that out[x] = a[x-k] (periodic).
    """
    s0 = s
    sp1 = shift(s, -1)
    sp2 = shift(s, -2)
    sm1 = shift(s, 1)
    sm2 = shift(s, 2)
    sm3 = shift(s, 3)
    central = (37.0 * (sm1 + s0) - 8.0 * (sm2 + sp1) + (sm3 + sp2)) / 60.0
    upwind = (10.0 * (s0 - sm1) - 5.0 * (sp1 - sm2) + (sp2 - sm3)) / 60.0
    return central - jnp.sign(vel) * upwind


def _kernel(u_hbm, v_hbm, wr_hbm, K_hbm, s_hbm, irfdz_ref, rhlo_ref,
            rhhi_ref, out_ref, u_sl, v_sl, w_sl, K_sl, s_sl, sems,
            *, bz, S, nx, dx, dy, dz):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    z0 = zi * bz

    cps = [
        pltpu.make_async_copy(u_hbm.at[b, pl.ds(z0, bz)], u_sl, sems.at[0]),
        pltpu.make_async_copy(v_hbm.at[b, pl.ds(z0, bz)], v_sl, sems.at[1]),
        # wr is z-padded to nz+ZP faces; faces [z0, z0+bz] live at slab
        # offsets [0, bz]; copy bz+8 planes to stay sublane-aligned
        pltpu.make_async_copy(wr_hbm.at[b, pl.ds(z0, bz + ZP)], w_sl,
                              sems.at[2]),
        # s/K are padded by ZP planes each side: global plane k sits at
        # padded index k+ZP; the slab [z0, z0+bz+2*ZP) covers the halo
        # range [z0-1, z0+bz+1) at offsets [ZP-1, ZP+bz+1)
        pltpu.make_async_copy(K_hbm.at[b, :, pl.ds(z0, bz + 2 * ZP)], K_sl,
                              sems.at[3]),
        pltpu.make_async_copy(s_hbm.at[b, :, pl.ds(z0, bz + 2 * ZP)], s_sl,
                              sems.at[4]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    c = ZP
    s0 = s_sl[:, c:c + bz]
    sm = s_sl[:, c - 1:c + bz - 1]
    sp_ = s_sl[:, c + 1:c + bz + 1]
    K0 = K_sl[:, c:c + bz]
    Km_ = K_sl[:, c - 1:c + bz - 1]
    Kp_ = K_sl[:, c + 1:c + bz + 1]
    uk = u_sl[:][None]
    vk = v_sl[:][None]
    wr_lo = w_sl[0:bz][None]       # rhobh * w at the bottom faces
    wr_hi = w_sl[1:bz + 1][None]   # ... top faces
    irfdz = irfdz_ref[:].reshape(1, bz, 1)    # 1 / (rhobf dz)
    rh_lo = rhlo_ref[:].reshape(1, bz, 1)     # rhobh at bottom faces
    rh_hi = rhhi_ref[:].reshape(1, bz, 1)

    shx = functools.partial(_rollx, nx=nx)
    shy = lambda a, k: jnp.roll(a, k * nx, -1)

    # --- advection, horizontal (periodic) ---
    Fx = uk * _face5(s0, uk, shx)
    Fy = vk * _face5(s0, vk, shy)
    tend = -(shx(Fx, -1) - Fx) / dx - (shy(Fy, -1) - Fy) / dy
    # --- advection, vertical cd2 (w = 0 on the outer faces) ---
    Flo = wr_lo * 0.5 * (sm + s0)
    Fhi = wr_hi * 0.5 * (s0 + sp_)
    tend = tend - (Fhi - Flo) * irfdz

    # --- diffusion, horizontal ---
    Kx = 0.5 * (shx(K0, 1) + K0)
    Fdx = -Kx * (s0 - shx(s0, 1)) / dx
    tend = tend - (shx(Fdx, -1) - Fdx) / dx
    Ky = 0.5 * (shy(K0, 1) + K0)
    Fdy = -Ky * (s0 - shy(s0, 1)) / dy
    tend = tend - (shy(Fdy, -1) - Fdy) / dy
    # --- diffusion, vertical (edge padding => zero flux at outer faces) ---
    Fz_lo = -rh_lo * 0.5 * (Km_ + K0) * (s0 - sm) / dz
    Fz_hi = -rh_hi * 0.5 * (K0 + Kp_) * (sp_ - s0) / dz
    tend = tend - (Fz_hi - Fz_lo) * irfdz

    out_ref[0] = tend


@functools.partial(
    jax.jit, static_argnames=("nx", "dx", "dy", "dz", "bz", "interpret"))
def _batched_call(u, v, w, Ks, scalars, rhobf, rhobh,
                  nx, dx, dy, dz, bz, interpret):
    """[n]-batched fused tendencies on flat-plane fields.

    u, v: [n, nz, P]; w: [n, nz+1, P]; Ks, scalars: [n, S, nz, P];
    rhobf: [n, nz]; rhobh: [n, nz+1]; P = ny*nx. Returns [n, S, nz, P].
    """
    n, S, nz, P = scalars.shape
    # bz must be a multiple of the 8-sublane tile so every DMA offset
    # (z0 = zi*bz) stays aligned
    assert nz % bz == 0 and bz % ZP == 0, (nz, bz)
    assert P % nx == 0 and P % LANE == 0, (P, nx)
    # fold rhobh into w; pad scalars/K in z (edge) for alignment + BCs
    wr = w * rhobh[:, :, None]
    wr = jnp.pad(wr, ((0, 0), (0, ZP - 1), (0, 0)), mode="edge")
    zpad = ((0, 0), (0, 0), (ZP, ZP), (0, 0))
    spad = jnp.pad(scalars, zpad, mode="edge")
    Kpad = jnp.pad(Ks, zpad, mode="edge")
    irfdz = (1.0 / (rhobf * dz))[:, :, None]
    rh_lo = rhobh[:, :-1, None]
    rh_hi = rhobh[:, 1:, None]

    kern = functools.partial(_kernel, bz=bz, S=S, nx=nx,
                             dx=float(dx), dy=float(dy), dz=float(dz))
    coef_spec = pl.BlockSpec((1, bz, 1), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, nz // bz),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # u
            pl.BlockSpec(memory_space=pl.ANY),   # v
            pl.BlockSpec(memory_space=pl.ANY),   # wr (padded)
            pl.BlockSpec(memory_space=pl.ANY),   # K (padded)
            pl.BlockSpec(memory_space=pl.ANY),   # s (padded)
            coef_spec,                              # 1/(rhobf dz)
            coef_spec,                              # rhobh[:-1]
            coef_spec,                              # rhobh[1:]
        ],
        out_specs=pl.BlockSpec((1, S, bz, P), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, S, nz, P), scalars.dtype),
        scratch_shapes=[
            pltpu.VMEM((bz, P), scalars.dtype),            # u slab
            pltpu.VMEM((bz, P), scalars.dtype),            # v slab
            pltpu.VMEM((bz + ZP, P), scalars.dtype),       # wr slab
            pltpu.VMEM((S, bz + 2 * ZP, P), scalars.dtype),  # K slab
            pltpu.VMEM((S, bz + 2 * ZP, P), scalars.dtype),  # s slab
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
    )(u, v, wr, Kpad, spad, irfdz, rh_lo, rh_hi)


@functools.lru_cache(maxsize=None)
def _make_op(ny, nx, dx, dy, dz, bz, interpret):
    """Unbatched [.., nz, ny, nx] op with a custom vmap rule."""

    def call(args, n):
        u, v, w, Ks, scalars, rhobf, rhobh = args
        S, nz = scalars.shape[-4], scalars.shape[-3]
        P = ny * nx
        out = _batched_call(
            u.reshape(n, nz, P), v.reshape(n, nz, P),
            w.reshape(n, nz + 1, P), Ks.reshape(n, S, nz, P),
            scalars.reshape(n, S, nz, P),
            rhobf.reshape(n, nz), rhobh.reshape(n, nz + 1),
            nx, dx, dy, dz, bz, interpret)
        return out.reshape(n, S, nz, ny, nx)

    @jax.custom_batching.custom_vmap
    def op(u, v, w, Ks, scalars, rhobf, rhobh):
        return call(tuple(x[None] for x in
                          (u, v, w, Ks, scalars, rhobf, rhobh)), 1)[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = tuple(
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(args, in_batched))
        return call(full, axis_size), True

    return op


def advect_diffuse_scalars(u, v, w, Ks, scalars, rhobf, rhobh,
                           dx, dy, dz, bz=8, interpret=False):
    """Fused advection+diffusion tendencies for a scalar stack, one LES.

    u, v: [nz, ny, nx]; w: [nz+1, ny, nx]; Ks, scalars: [S, nz, ny, nx];
    rhobf: [nz]; rhobh: [nz+1]. Returns [S, nz, ny, nx]. vmap-compatible
    (a fleet batches into a single kernel launch). Requires ny*nx % 128
    == 0 and nz % bz == 0.
    """
    S, nz, ny, nx = scalars.shape
    if not interpret:
        # run the kernel in interpret mode off-TPU (CPU tests/parity runs)
        interpret = jax.default_backend() != "tpu"
    op = _make_op(int(ny), int(nx), float(dx), float(dy), float(dz),
                  int(bz), bool(interpret))
    return op(u, v, w, Ks, scalars, rhobf, rhobh)


def supported(grid):
    """Whether the kernel supports this LESGrid."""
    return (grid.ny * grid.nx) % LANE == 0 and grid.nz % 16 == 0
