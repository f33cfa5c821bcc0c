#!/usr/bin/env python
"""Amortized per-op cost: scan each hot-path component N times inside one
jit, chaining FULL FIELDS through the loop (output feeds the next input)
so XLA cannot fold iterations or skip work. Numbers are device time."""

import sys
import time

import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                       step as lstep, poisson, subgrid,
                                       micro)
from sp_coupler_tpu.ops import lesflat_pallas, lesmom_pallas
from sp_coupler_tpu.models.les.state import LESForcing

N = 50
N_LES = 2


def make_state(grid):
    keys = jax.random.split(jax.random.PRNGKey(0), N_LES)
    zf = grid.zf()
    nz = grid.nz
    st = jax.vmap(lambda k: lstate.init_state(
        grid, jnp.full(nz, 5.0), jnp.full(nz, -3.0),
        298.0 + 6e-3 * zf, 16e-3 * jnp.exp(-zf / 2500.0),
        jnp.asarray(101500.0), k))(keys)
    zero = jnp.zeros((N_LES, nz))
    zs = jnp.zeros(N_LES)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                         f_ql=zero, f_ps=zs, ql_ref=zero,
                         wthl=zs + 0.01, wqt=zs + 1e-5,
                         z0m=zs + 0.1, z0h=zs + 0.02)
    return st, forcing


def bench(name, step1, st, forcing):
    """step1(state_instance, forcing_instance) -> state_instance.

    Must route its own output back into its own inputs (full fields)."""
    def run(st):
        def one(s, f):
            def body(ss, _):
                return step1(ss, f), ()
            return jax.lax.scan(body, s, None, length=N)[0]
        return jax.vmap(one)(st, forcing)

    import numpy as np
    j = jax.jit(run)
    out = j(st)
    np.asarray(out.thl[:, :1, :1, :1])  # force execution
    t0 = time.time()
    for _ in range(3):
        out = j(st)
        np.asarray(out.thl[:, :1, :1, :1])
    per = (time.time() - t0) / 3 / N * 1e3
    print("%-34s %8.3f ms" % (name, per), flush=True)
    return out


def main():
    grid = lgrid.LESGrid()
    print("backend:", jax.default_backend())
    dt = 0.001  # tiny dt: state stays physical over N chained applications

    st, forcing = make_state(grid)
    solver0 = jax.vmap(
        lambda s: poisson.build_solver(grid, s.rhobf, s.rhobh))(st)

    def sat(s, f):
        T, ql, qs, thv = lstep.thermodynamics(s)
        return s._replace(
            thl=s.thl + dt * 1e-6 * (T - 300.0 + ql + qs + thv))
    bench("sat adjust -> thl feedback", sat, st, forcing)

    def tkev(s, f):
        T, ql, qs, thv = lstep.thermodynamics(s)
        thv_m = jnp.mean(thv, axis=(1, 2), keepdims=True)
        Km, Kh, lam, S2, N2 = subgrid.tke_viscosity(grid, s, thv, thv_m)
        return s._replace(e12=s.e12 + dt * 1e-6 * Km)
    bench("sat + TKE viscosity", tkev, st, forcing)

    def scal(s, f):
        scalars = jnp.stack([s.thl, s.qt, s.qr, s.e12])
        Ks = jnp.stack([s.e12, s.e12, s.e12, 2 * s.e12])
        out = lesflat_pallas.advect_diffuse_scalars(
            s.u, s.v, s.w, Ks, scalars, s.rhobf, s.rhobh,
            grid.dx, grid.dy, grid.dz)
        return s._replace(thl=s.thl + dt * out[0], qt=s.qt + dt * out[1],
                          qr=s.qr + dt * out[2], e12=s.e12 + dt * out[3])
    bench("pallas scalar kernel (4x)", scal, st, forcing)

    def mom(s, f):
        du, dv, dw = lesmom_pallas.momentum_tendencies(
            s.u, s.v, s.w, s.e12, s.rhobf, s.rhobh,
            grid.dx, grid.dy, grid.dz)
        return s._replace(u=s.u + dt * du, v=s.v + dt * dv,
                          w=s.w + dt * dw)
    bench("pallas momentum kernel", mom, st, forcing)

    def mic(s, f):
        T, ql, qs, thv = lstep.thermodynamics(s)
        dqt, dqr, dthl, srain = micro.rain_tendencies(
            grid, micro.MicroParams(), s.rhobf, T, s.pbf[:, None, None],
            s.qt - ql, ql, s.qr, dt)
        return s._replace(qt=s.qt + dt * dqt, qr=s.qr + dt * dqr,
                          thl=s.thl + dt * dthl)
    bench("sat + microphysics", mic, st, forcing)

    phys = lstep.LESPhysics(use_pallas=jax.default_backend() == "tpu")

    def tend(s, f):
        t = lstep.tendencies(grid, phys, s, f, dt)
        return s._replace(u=s.u + dt * t["u"], v=s.v + dt * t["v"],
                          w=s.w + dt * t["w"], thl=s.thl + dt * t["thl"],
                          qt=s.qt + dt * t["qt"], qr=s.qr + dt * t["qr"],
                          e12=jnp.maximum(s.e12 + dt * t["e12"],
                                          subgrid.E12_MIN))
    bench("full tendencies (1 stage)", tend, st, forcing)

    def run_proj(st):
        def one(s, sol):
            def body(ss, _):
                u, v, w, p = poisson.project(grid, ss.rhobf, ss.rhobh,
                                             ss.u, ss.v, ss.w, dt,
                                             solver=sol)
                return ss._replace(u=u, v=v, w=w), ()
            return jax.lax.scan(body, s, None, length=N)[0]
        return jax.vmap(one)(st, solver0)
    import numpy as np
    j = jax.jit(run_proj)
    np.asarray(j(st).u[:, :1, :1, :1])
    t0 = time.time()
    for _ in range(3):
        np.asarray(j(st).u[:, :1, :1, :1])
    print("%-34s %8.3f ms" % ("projection (prebuilt solver)",
                              (time.time() - t0) / 3 / N * 1e3), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
