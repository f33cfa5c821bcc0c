#!/usr/bin/env python
"""Roofline breakdown of the fused LES substep on the current backend.

The TPU is reached through a remote tunnel: single dispatches carry
~25 ms of round-trip latency, so every phase is timed as a lax.scan of N
chained applications inside ONE jit call and reported as the marginal
per-application device time (delta between N and 2N scans would be
cleaner still; N is large enough that the dispatch is <5%).

Phases on the bench configuration (2 x 64x64x160):
  - fused Pallas RK stage alone (incl. the jnp.pad producers)
  - projection at refine={0,1} + post-projection |div| residuals
  - full substep (3 stages + 3 projections)
  - adaptive evolve (while_loop) vs fixed scan: loop bookkeeping cost
Prints achieved HBM GB/s per phase from the analytic traffic model.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                       step as lstep, poisson)
from sp_coupler_tpu.models.les.advect import divergence
from sp_coupler_tpu.ops import lesstage_pallas
from sp_coupler_tpu.models.les.state import LESForcing

N_LES = 2
HBM_PEAK_GBS = 819.0  # v5e
NSCAN = 50


def _sync(out):
    """Force completion with a tiny fetch (block_until_ready can return
    before execution finishes on the tunneled backend)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit_scan(name, body1, carry0, mb=None, nscan=NSCAN, reps=3):
    """body1: carry -> carry. Times scan of nscan inside one jit."""
    def scanned(c):
        def b(cc, _):
            return body1(cc), ()
        return jax.lax.scan(b, c, None, length=nscan)[0]
    j = jax.jit(scanned)
    out = j(carry0)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = j(carry0)
        _sync(out)
    per = (time.time() - t0) / reps / nscan
    extra = ""
    if mb is not None:
        gbs = mb / 1e3 / per
        extra = "  %7.1f GB/s (%4.1f%% of peak)" % (
            gbs, 100.0 * gbs / HBM_PEAK_GBS)
    print("%-36s %8.3f ms%s" % (name, per * 1e3, extra), flush=True)
    return out, per


def main():
    grid = lgrid.LESGrid()
    phys = lstep.LESPhysics(use_pallas=jax.default_backend() == "tpu")
    print("backend:", jax.default_backend(), " grid:",
          grid.nx, grid.ny, grid.nz, " n_les:", N_LES, flush=True)
    fld_mb = grid.nx * grid.ny * grid.nz * 4 / 1e6      # one field, MB

    keys = jax.random.split(jax.random.PRNGKey(0), N_LES)
    zf = grid.zf()
    nz = grid.nz
    st = jax.vmap(lambda k: lstate.init_state(
        grid, jnp.full(nz, 5.0) + 2e-3 * zf, jnp.full(nz, -3.0),
        298.0 + 6e-3 * zf, 16e-3 * jnp.exp(-zf / 2500.0),
        jnp.asarray(101500.0), k))(keys)
    zero = jnp.zeros((N_LES, nz))
    zs = jnp.zeros(N_LES)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                         f_ql=zero, f_ps=zs, ql_ref=zero,
                         wthl=zs + 0.01, wqt=zs + 1e-5,
                         z0m=zs + 0.1, z0h=zs + 0.02)
    dt = 3.0
    solver = jax.vmap(
        lambda s: poisson.build_solver(grid, s.rhobf, s.rhobh))(st)

    # ---- fused stage alone, chained via its own outputs ----
    def stage1(s_batch):
        def one(s, f):
            (u, v, wn, thl, qt, qr, e12, kmax, us2,
             rain) = lesstage_pallas.stage_fused(grid, phys, s, s, f,
                                                 1e-6, dt)
            w = jnp.concatenate([wn, jnp.zeros_like(wn[:1])], axis=0)
            return s._replace(u=u, v=v, w=w, thl=thl, qt=qt, qr=qr,
                              e12=e12)
        return jax.vmap(one)(s_batch, forcing)
    # reads 7 fields (x1.5 z-halo) + 7 base + pad copies (7r+7w) + 7 writes
    stage_mb = (7 * 1.5 + 7 + 14 + 7) * fld_mb * N_LES
    if phys.use_pallas and lesstage_pallas.supported(grid, phys):
        _, t_stage = timeit_scan("fused stage (incl pads)", stage1, st,
                                 mb=stage_mb)

    # ---- projection, chained ----
    def mk_proj(refine):
        def proj1(s_batch):
            def one(s, sol):
                u, v, w, _ = poisson.project(
                    grid, s.rhobf, s.rhobh, s.u, s.v, s.w, dt, solver=sol)
                return s._replace(u=u, v=v, w=w)
            return jax.vmap(one)(s_batch, solver)
        return proj1
    mb0 = (4 + 12 + 7) * fld_mb * N_LES
    mb1 = mb0 + (3 + 12) * fld_mb * N_LES
    st0, t_p0 = timeit_scan("projection refine=0", mk_proj(0), st, mb=mb0)
    st1, t_p1 = timeit_scan("projection refine=1", mk_proj(1), st, mb=mb1)

    def resid(sb):
        return float(jnp.max(jax.vmap(
            lambda s: jnp.max(jnp.abs(divergence(
                grid, s.rhobf, s.rhobh, s.u, s.v, s.w))))(sb)))
    print("  max|div| refine=0: %.3e  refine=1: %.3e  (pre: %.3e)"
          % (resid(st0), resid(st1), resid(st)), flush=True)

    # ---- full substep ----
    def sub1(s_batch):
        def one(s, f, sol):
            return lstep.substep(grid, phys, s, f, dt, solver=sol)[0]
        return jax.vmap(one)(s_batch, forcing, solver)
    _, t_sub = timeit_scan("full substep (3 stage + 3 proj)", sub1, st,
                           mb=3 * (stage_mb + mb1), nscan=10)

    # ---- adaptive evolve for the same span (while_loop bookkeeping) ----
    def adaptive(s_batch):
        def one(s, f):
            return lstep.evolve_adaptive(grid, phys, s, f,
                                         s.time + 10 * dt, dt_max=dt)[:2]
        return jax.vmap(one)(s_batch, forcing)
    j = jax.jit(adaptive)
    out = j(st)
    _sync(out)
    t0 = time.time()
    for _ in range(3):
        out = j(st)
        _sync(out)
    t_ad = (time.time() - t0) / 3
    nsub = int(np.max(np.asarray(out[1])))
    print("%-36s %8.3f ms  (%d substeps; fixed-scan equiv %.3f)"
          % ("adaptive evolve per substep", t_ad / nsub * 1e3, nsub,
             t_sub * 1e3), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
