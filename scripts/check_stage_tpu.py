#!/usr/bin/env python
"""On-TPU check of the fused-stage substep: numerics vs the split path,
then amortized substep timing on the reference 64x64x160 case."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                       step as lstep, poisson)
from sp_coupler_tpu.models.les.state import LESForcing

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


def run_n(phys, grid, st, forcing, n, dt=3.0):
    def go(st):
        def one(s, f):
            solver = poisson.build_solver(grid, s.rhobf, s.rhobh)

            def body(ss, _):
                return lstep.substep(grid, phys, ss, f, dt,
                                     solver=solver)[0], ()
            return jax.lax.scan(body, s, None, length=n)[0]
        return jax.vmap(one)(st, forcing)
    return jax.jit(go)


def main():
    grid = lgrid.LESGrid()
    print("backend:", jax.default_backend(), flush=True)
    st, forcing = make_state(grid)

    fused = lstep.LESPhysics(use_pallas=True)
    split = lstep.LESPhysics(use_pallas=False)

    # numerics: 5 substeps, fused vs split
    jf = run_n(fused, grid, st, forcing, 5)
    js = run_n(split, grid, st, forcing, 5)
    t0 = time.time()
    of = jf(st)
    thl_f = np.asarray(of.thl)
    print("fused compile+run %.0fs" % (time.time() - t0), flush=True)
    os_ = js(st)
    thl_s = np.asarray(os_.thl)
    for f in ("u", "v", "w", "thl", "qt", "qr", "e12"):
        a, b = np.asarray(getattr(of, f)), np.asarray(getattr(os_, f))
        err = np.max(np.abs(a - b))
        scale = max(np.max(np.abs(b)), 1e-12)
        print("  %-4s max|diff| %.3e  (rel %.2e)" % (f, err, err / scale),
              flush=True)
        assert err / scale < 2e-3, f
    assert np.all(np.isfinite(thl_f))

    # timing: 50 substeps amortized
    for name, phys in (("fused", fused), ("split", split)):
        j = run_n(phys, grid, st, forcing, 50)
        np.asarray(j(st).thl[:, :1, :1, :1])
        t0 = time.time()
        for _ in range(3):
            np.asarray(j(st).thl[:, :1, :1, :1])
        print("%-6s %8.3f ms/substep" % (name,
                                         (time.time() - t0) / 3 / 50 * 1e3),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
