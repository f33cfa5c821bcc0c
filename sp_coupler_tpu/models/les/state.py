"""LES prognostic state, base state, and initialization.

The anelastic base state (rho_b, p_b profiles) plays the role of the
reference LES's internal base profiles, consumed by the coupler through
get_rhof/get_rhobf/get_presf (/root/reference/splib/spcpl.py:750-752).

All state lives in one pytree; the fleet dimension is added by vmap, so
every function here is written for a single instance [nz(,+1), ny, nx].
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ... import constants as c
from ...utils import thermo


class LESState(NamedTuple):
    """Prognostic + slowly-varying auxiliary state of one LES instance."""

    # prognostic fields
    u: jax.Array          # [nz, ny, nx] at x-faces
    v: jax.Array          # [nz, ny, nx] at y-faces
    w: jax.Array          # [nz+1, ny, nx] at z-faces; w[0] = w[nz] = 0
    thl: jax.Array        # [nz, ny, nx] liquid-water potential temperature
    qt: jax.Array         # [nz, ny, nx] total water
    qr: jax.Array         # [nz, ny, nx] rain water
    e12: jax.Array        # [nz, ny, nx] sqrt(subgrid TKE)
    # base state (recomputed when the surface pressure changes)
    ps: jax.Array         # [] surface pressure
    pbf: jax.Array        # [nz] base-state pressure at full levels
    pbh: jax.Array        # [nz+1] base-state pressure at half levels
    rhobf: jax.Array      # [nz] base-state density at full levels
    rhobh: jax.Array      # [nz+1] base-state density at half levels
    # accumulators / surface
    rain: jax.Array       # [] accumulated surface rain, kg/m^2
    ustar: jax.Array      # [] friction velocity diagnostic
    time: jax.Array       # [] model time, s


class LESForcing(NamedTuple):
    """Per-GCM-step forcings pushed onto an instance by the coupler.

    Mirrors the tendency setters of the reference LES interface
    (set_tendency_{U,V,THL,QT,QL}, set_tendency_surface_pressure,
    set_ref_profile_QL, set_z0*_surf, set_w*_surf — spcpl.py:341-364).
    """

    f_u: jax.Array        # [nz]
    f_v: jax.Array        # [nz]
    f_thl: jax.Array      # [nz]
    f_qt: jax.Array       # [nz]
    f_ql: jax.Array       # [nz]  (experimental local qt nudging)
    f_ps: jax.Array       # []
    ql_ref: jax.Array     # [nz]  GCM condensate on the LES grid (nudge target)
    wthl: jax.Array       # [] surface kinematic heat flux, K m/s
    wqt: jax.Array        # [] surface kinematic moisture flux, m/s
    z0m: jax.Array        # [] roughness length momentum
    z0h: jax.Array        # [] roughness length heat

    @classmethod
    def zeros(cls, nz, dtype=jnp.float32):
        z = jnp.zeros(nz, dtype)
        s = jnp.zeros((), dtype)
        return cls(f_u=z, f_v=z, f_thl=z, f_qt=z, f_ql=z, f_ps=s,
                   ql_ref=z, wthl=s, wqt=s,
                   z0m=jnp.asarray(0.1, dtype), z0h=jnp.asarray(0.02, dtype))


def base_state(grid, thl0, qt0, ps):
    """Hydrostatic anelastic base state from initial profiles.

    Integrates the Exner function hydrostatically on the virtual potential
    temperature of the initial sounding (standard anelastic base-profile
    construction; the reference LES computes the same internally and exposes
    it via get_rhobf).
    """
    dz = grid.dz
    thv0 = thl0 * (1.0 + c.eps_i * qt0)  # no condensate in the base state
    # Exner at half levels: pi[0] at surface
    pi_s = thermo.exner(ps)
    # thv at half levels (extrapolate ends)
    thvh = jnp.concatenate([thv0[:1], 0.5 * (thv0[1:] + thv0[:-1]), thv0[-1:]])

    def step_fn(pi, thv_f):
        pi_next = pi - c.grav * dz / (c.cp * thv_f)
        return pi_next, pi_next

    _, pih_rest = jax.lax.scan(step_fn, pi_s, thv0)
    pih = jnp.concatenate([jnp.array([pi_s]), pih_rest])     # [nz+1]
    # full-level Exner: half-step integration from each lower half level
    pif = pih[:-1] - 0.5 * c.grav * dz / (c.cp * thv0)
    pbf = c.pref0 * pif ** (c.cp / c.rd)
    pbh = c.pref0 * pih ** (c.cp / c.rd)
    Tf = thv0 * pif
    rhobf = pbf / (c.rd * Tf)
    rhobh = jnp.concatenate([
        pbh[:1] / (c.rd * (thvh[0] * pih[0])),
        pbh[1:-1] / (c.rd * (thvh[1:-1] * pih[1:-1])),
        pbh[-1:] / (c.rd * (thvh[-1] * pih[-1])),
    ])
    return pbf, pbh, rhobf, rhobh


def init_state(grid, u0, v0, thl0, qt0, ps, key, dtype=jnp.float32,
               vabsmax=0.5, thlabsmax=0.1, qabsmax=2.5e-5, e12_0=0.1):
    """Initial 3-D state: broadcast profiles plus uniform random noise.

    Noise amplitudes match the reference coupler's set_les_state
    (spcpl.py:284-291): +-0.5 m/s on U and V, +-0.1 K on THL, +-2.5e-5 on QT.
    The reference uses a global numpy seed (splib.py:181); here each
    instance derives its own counter-based threefry key so results are
    independent of instance count and execution order.
    """
    nz, ny, nx = grid.nz, grid.ny, grid.nx
    shp = (nz, ny, nx)
    ku, kv, kt, kq = jax.random.split(key, 4)
    unif = lambda k: jax.random.uniform(k, shp, dtype, -1.0, 1.0)
    u = u0[:, None, None] + vabsmax * unif(ku)
    v = v0[:, None, None] + vabsmax * unif(kv)
    thl = thl0[:, None, None] + thlabsmax * unif(kt)
    qt = jnp.maximum(qt0[:, None, None] + qabsmax * unif(kq), 0.0)
    pbf, pbh, rhobf, rhobh = base_state(grid, thl0, qt0, ps)
    zero = jnp.zeros((), dtype)
    return LESState(
        u=u.astype(dtype), v=v.astype(dtype),
        w=jnp.zeros((nz + 1, ny, nx), dtype),
        thl=thl.astype(dtype), qt=qt.astype(dtype),
        qr=jnp.zeros(shp, dtype),
        e12=jnp.full(shp, e12_0, dtype),
        ps=jnp.asarray(ps, dtype),
        pbf=pbf.astype(dtype), pbh=pbh.astype(dtype),
        rhobf=rhobf.astype(dtype), rhobh=rhobh.astype(dtype),
        rain=zero, ustar=jnp.asarray(0.1, dtype), time=zero,
    )
