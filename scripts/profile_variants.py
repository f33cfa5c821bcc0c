#!/usr/bin/env python
"""Amortized substep cost by variant: scan 30 substeps inside one jit so
remote-dispatch latency is negligible, and compare physics variants to
attribute time (projection, microphysics, subgrid, kernels)."""

import sys
import time

import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                       step as lstep, poisson)
from sp_coupler_tpu.models.les.state import LESForcing

N_SUB = 30
N_LES = 2


def make_state(grid):
    keys = jax.random.split(jax.random.PRNGKey(0), N_LES)
    zf = grid.zf()
    nz = grid.nz
    u0 = jnp.full(nz, 5.0)
    v0 = jnp.full(nz, -3.0)
    thl0 = 298.0 + 6e-3 * zf
    qt0 = 16e-3 * jnp.exp(-zf / 2500.0)
    st = jax.vmap(lambda k: lstate.init_state(
        grid, u0, v0, thl0, qt0, jnp.asarray(101500.0), k))(keys)
    zero = jnp.zeros((N_LES, nz))
    zs = jnp.zeros(N_LES)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                         f_ql=zero, f_ps=zs, ql_ref=zero,
                         wthl=zs + 0.01, wqt=zs + 1e-5,
                         z0m=zs + 0.1, z0h=zs + 0.02)
    return st, forcing


def bench_variant(name, grid, phys, project=True):
    st, forcing = make_state(grid)
    dt = 3.0

    def run(st):
        def one(s, f):
            solver = poisson.build_solver(grid, s.rhobf, s.rhobh)

            def body(ss, _):
                if project:
                    out = lstep.substep(grid, phys, ss, f, dt,
                                        solver=solver)[0]
                else:
                    t = lstep.tendencies(grid, phys, ss, f, dt)
                    out = ss._replace(
                        u=ss.u + dt * t["u"], v=ss.v + dt * t["v"],
                        w=ss.w + dt * t["w"],
                        thl=ss.thl + dt * t["thl"],
                        qt=jnp.maximum(ss.qt + dt * t["qt"], 0.0))
                return out, ()
            return jax.lax.scan(body, s, None, length=N_SUB)[0]
        return jax.vmap(one)(st, forcing)

    fn = jax.jit(run)
    t0 = time.time()
    out = jax.block_until_ready(fn(st))
    compile_s = time.time() - t0
    t0 = time.time()
    n_rep = 3
    for _ in range(n_rep):
        out = jax.block_until_ready(fn(st))
    per_sub = (time.time() - t0) / n_rep / N_SUB * 1e3
    print("%-34s %8.2f ms/substep   (compile %.0fs)"
          % (name, per_sub, compile_s), flush=True)


def main():
    grid = lgrid.LESGrid()
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    base = lstep.LESPhysics(use_pallas=on_tpu)

    bench_variant("full (pallas, tke, hybrid52)", grid, base)
    bench_variant("no projection", grid, base, project=False)
    bench_variant("no pallas (pure XLA)", grid,
                  base._replace(use_pallas=False))
    bench_variant("smagorinsky subgrid", grid,
                  base._replace(subgrid="smagorinsky"))
    bench_variant("no micro (autoconv off)", grid, base._replace(
        mphys=base.mphys._replace(auto_k=0.0, accr_k=0.0)))
    bench_variant("cd2 advection", grid, base._replace(scheme="cd2"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
