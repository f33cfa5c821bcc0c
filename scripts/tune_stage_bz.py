#!/usr/bin/env python
"""Empirical bz sweep for the fused stage kernel (T255 plane-efficiency
investigation, VERDICT r04 item 3).

Forces lesstage_pallas._pick_bz to each candidate slab depth and times
stage_fused on (nx, ny, 160) x n instances, printing ms/stage and
gridpoint-updates/s so the degradation at 128x128 planes can be
attributed to slab depth (halo/compute amplification) vs plane size.
"""

import argparse
import time

import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import grid as lgrid, state as lstate
from sp_coupler_tpu.models.les import step as lstep
from sp_coupler_tpu.models.les.state import LESForcing
from sp_coupler_tpu.ops import lesstage_pallas as lsp


def build(nx, ny, nz, n):
    grid = lgrid.LESGrid(nx=nx, ny=ny, nz=nz, dx=200.0, dy=200.0, dz=25.0)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    zf = grid.zf()
    u0 = jnp.full(nz, 5.0) + 0.01 * zf / 1000
    v0 = jnp.full(nz, -3.0)
    thl0 = 298.0 + 6e-3 * zf
    qt0 = 16e-3 * jnp.exp(-zf / 2500.0)
    st = jax.vmap(lambda k: lstate.init_state(
        grid, u0, v0, thl0, qt0, jnp.asarray(101500.0), k))(keys)
    zero = jnp.zeros((n, nz))
    zs = jnp.zeros(n)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                        f_ql=zero, f_ps=zs, ql_ref=zero,
                        wthl=zs + 0.01, wqt=zs + 1e-5,
                        z0m=zs + 0.1, z0h=zs + 0.02)
    return grid, st, forcing


def time_stage(grid, phys, st, forcing, n, reps=60):
    """Chain `reps` stages inside ONE jitted program (feeding each
    stage's u output back in) so the per-dispatch tunnel latency
    (~20 ms on this remote backend) is amortized away."""

    def one(s, f):
        outs = lsp.stage_fused(grid, phys, s, s, f, 1.0, 3.0)
        return s._replace(u=outs[0], v=outs[1], thl=outs[3])

    def chain(st):
        def body(_, s):
            return jax.vmap(one)(s, forcing)
        return jax.lax.fori_loop(0, reps, body, st).u

    fn = jax.jit(chain)
    out = jax.block_until_ready(fn(st))
    t0 = time.time()
    out = jax.block_until_ready(fn(st))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=160)
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()
    phys = lstep.LESPhysics(use_pallas=True)
    print("backend:", jax.default_backend())
    orig = lsp._pick_bz
    for nx, ny in ((64, 64), (128, 128)):
        grid, st, forcing = build(nx, ny, args.nz, args.n)
        npts = args.n * args.nz * nx * ny
        for bz in (32, 16, 8):
            if args.nz % bz:
                continue
            lsp._pick_bz = lambda nz, P=None, _b=bz: _b
            lsp._make_op.cache_clear()
            try:
                dt = time_stage(grid, phys, st, forcing, args.n)
                print("%dx%d bz=%-3d %8.3f ms/stage  %.3e pts/s"
                      % (nx, ny, bz, dt * 1e3, npts / dt), flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print("%dx%d bz=%-3d FAILED: %s" % (nx, ny, bz, msg),
                      flush=True)
            finally:
                lsp._pick_bz = orig
    lsp._make_op.cache_clear()


if __name__ == "__main__":
    main()
