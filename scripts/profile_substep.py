#!/usr/bin/env python
"""Micro-profile of the LES substep components on the current backend.

Times each piece of the hot path (models/les/step.py) in isolation on the
reference 64x64x160 grid, batched over 2 instances like the bench, to show
where substep wall-clock goes.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                       step as lstep, poisson, subgrid)
from sp_coupler_tpu.ops import lesflat_pallas, lesmom_pallas
from sp_coupler_tpu.utils import thermo
from sp_coupler_tpu.models.les.state import LESForcing


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print("%-28s %8.3f ms" % (name, dt * 1e3), flush=True)
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=160)
    args = ap.parse_args()
    n_les = args.n
    grid = lgrid.LESGrid(nx=args.nx, ny=args.ny, nz=args.nz,
                         dx=200.0, dy=200.0, dz=25.0)
    phys = lstep.LESPhysics(use_pallas=jax.default_backend() == "tpu")
    print("backend:", jax.default_backend(), " pallas:", phys.use_pallas)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_les)
    zf = grid.zf()
    nz = grid.nz
    u0 = jnp.full(nz, 5.0) + 0.01 * zf / 1000
    v0 = jnp.full(nz, -3.0)
    thl0 = 298.0 + 6e-3 * zf
    qt0 = 16e-3 * jnp.exp(-zf / 2500.0)

    st = jax.vmap(lambda k: lstate.init_state(
        grid, u0, v0, thl0, qt0, jnp.asarray(101500.0), k))(keys)
    zero = jnp.zeros((n_les, nz))
    zs = jnp.zeros(n_les)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                         f_ql=zero, f_ps=zs, ql_ref=zero,
                         wthl=zs + 0.01, wqt=zs + 1e-5,
                         z0m=zs + 0.1, z0h=zs + 0.02)

    dt = 3.0

    # full substep (with prebuilt solver, like evolve does)
    def full(st):
        def one(s, f):
            solver = poisson.build_solver(grid, s.rhobf, s.rhobh)
            return lstep.substep(grid, phys, s, f, dt, solver=solver)[0]
        return jax.vmap(one)(st, forcing)
    full_j = jax.jit(full)
    st2 = timeit("full substep (3 RK stages)", full_j, st)

    # tendencies only
    def tend(st):
        def one(s, f):
            t = lstep.tendencies(grid, phys, s, f, dt)
            return t["u"], t["thl"], t["kmax"]
        return jax.vmap(one)(st, forcing)
    timeit("tendencies (1 stage)", jax.jit(tend), st)

    # pressure projection only
    def proj(st):
        def one(s):
            solver = poisson.build_solver(grid, s.rhobf, s.rhobh)
            u, v, w, p = poisson.project(grid, s.rhobf, s.rhobh,
                                         s.u, s.v, s.w, dt, solver=solver)
            return u, v, w
        return jax.vmap(one)(st)
    timeit("projection (1x)", jax.jit(proj), st)

    # saturation adjustment
    def sat(st):
        def one(s):
            return lstep.thermodynamics(s)
        return jax.vmap(one)(st)
    timeit("thermodynamics (1x)", jax.jit(sat), st)

    # subgrid TKE viscosity
    def tke(st):
        def one(s):
            T, ql, qs, thv = lstep.thermodynamics(s)
            thv_m = jnp.mean(thv, axis=(1, 2), keepdims=True)
            return subgrid.tke_viscosity(grid, s, thv, thv_m)[0]
        return jax.vmap(one)(st)
    timeit("thermo+TKE visc (1x)", jax.jit(tke), st)

    if phys.use_pallas and lesflat_pallas.supported(grid):
        def scal(st):
            def one(s):
                Km = jnp.ones_like(s.u)
                scalars = jnp.stack([s.thl, s.qt, s.qr, s.e12])
                Ks = jnp.stack([Km, Km, Km, 2 * Km])
                return lesflat_pallas.advect_diffuse_scalars(
                    s.u, s.v, s.w, Ks, scalars, s.rhobf, s.rhobh,
                    grid.dx, grid.dy, grid.dz)
            return jax.vmap(one)(st)
        timeit("scalar kernel (4 scalars)", jax.jit(scal), st)

        def mom(st):
            def one(s):
                Km = jnp.ones_like(s.u)
                return lesmom_pallas.momentum_tendencies(
                    s.u, s.v, s.w, Km, s.rhobf, s.rhobh,
                    grid.dx, grid.dy, grid.dz)
            return jax.vmap(one)(st)
        timeit("momentum kernel (1x)", jax.jit(mom), st)

    return 0


if __name__ == "__main__":
    sys.exit(main())
