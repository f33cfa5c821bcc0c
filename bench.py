#!/usr/bin/env python
"""Benchmark: the reference T21 + 2-LES case, one chip.

Metric: LES grid-point updates per second per chip on the coupled
configuration of run_T21_sockets.sh — T21/L19 GCM (900 s steps) coupled to
2 LES instances of 64 x 64 x 160 (the dales-input RICO case).

Baseline (BASELINE.md): the reference does ~470 s per coupled step on a
quad-core i7-4790, with each DALES instance taking ~15 adaptive substeps
per 900 s GCM step => 2 * 64*64*160 * 15 / 470 s ~= 4.18e4 grid-point
updates/s. vs_baseline is measured throughput over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REF_GRIDPOINTS_PER_S = 2 * 64 * 64 * 160 * 15 / 470.0  # ~41.8e3


def main():
    import jax
    import jax.numpy as jnp
    from sp_coupler_tpu.models.gcm import model as gcm_model
    from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                           step as lstep, diag as ldiag)
    from sp_coupler_tpu.coupling.coupler import CoupledStepFn

    from sp_coupler_tpu.coupling import convert

    n_les = 2
    dt_les = 15.0   # max substep; actual dt is CFL-adaptive like DALES

    gcfg = gcm_model.GCMConfig(trunc=21, nlev=19, dt=900.0)
    core = gcm_model.GCMCore(gcfg)
    grid = lgrid.LESGrid()  # 64 x 64 x 160 reference case
    phys = lstep.LESPhysics(use_pallas=jax.default_backend() == "tpu")

    print("bench: initializing states ...", file=sys.stderr, flush=True)
    gcm_state = core.initial_state(seed=0)
    # the two Barbados-region columns of the reference case; LES instances
    # start from the GCM column state like the real driver (set_les_state)
    cols = np.asarray([1208, 1272], np.int32)

    @jax.jit
    def init_les(gstate):
        zf = grid.zf()
        prof0 = core.column_profiles(gstate, jnp.asarray(cols))
        conv0 = jax.vmap(lambda p: convert.convert_profiles(p, zf))(prof0)
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(42), i))(jnp.arange(n_les))
        return jax.vmap(
            lambda u, v, thl, qt, ps, k: lstate.init_state(
                grid, u, v, thl, qt, ps, k))(
            conv0.u, conv0.v, conv0.thl, conv0.qt, conv0.ps, keys)

    les_state = init_les(gcm_state)

    step_fn = CoupledStepFn(core, grid, phys, cols, dt_les=dt_les,
                            n_substeps=0)
    prof = jax.vmap(lambda s: ldiag.slab_profiles(grid, s))(les_state)
    rain = jnp.zeros(n_les)

    # warmup: first=True and first=False compile to DIFFERENT programs
    # (static leapfrog Euler-start arg); run one step of each so the timed
    # window measures steady state, not a recompile
    print("bench: compiling + first coupled step ...", file=sys.stderr,
          flush=True)
    t0 = time.time()
    out = step_fn(gcm_state, les_state, prof, rain, 0, first=True)
    gcm_state, les_state, prof, rain, d0 = jax.block_until_ready(out)
    out = step_fn(gcm_state, les_state, prof, rain, 1, first=False)
    gcm_state, les_state, prof, rain, d0 = jax.block_until_ready(out)
    warm = time.time() - t0
    print("bench: warmup %.0fs, %s substeps" % (
        warm, np.asarray(step_fn.unpack_diag(np.asarray(d0))["n_substeps"])),
        file=sys.stderr, flush=True)

    n_timed = 3
    total_sub = 0
    t0 = time.time()
    for s in range(2, n_timed + 2):
        out = step_fn(gcm_state, les_state, prof, rain, s, first=False)
        gcm_state, les_state, prof, rain, diag = jax.block_until_ready(out)
        total_sub += int(np.sum(
            step_fn.unpack_diag(np.asarray(diag))["n_substeps"]))
    elapsed = time.time() - t0

    thl = np.asarray(prof["THL"])
    assert np.all(np.isfinite(thl)), "NaN in coupled state"

    phase = phase_breakdown(grid, phys, les_state)

    updates = grid.nx * grid.ny * grid.nz * total_sub
    gps = updates / elapsed
    print(json.dumps({
        "metric": "les_gridpoint_updates_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoint-updates/s (T21+2xLES 64x64x160 coupled, "
                "adaptive dt, %d total substeps; step %.2fs, warmup %.0fs)"
                % (total_sub, elapsed / n_timed, warm),
        "vs_baseline": round(gps / REF_GRIDPOINTS_PER_S, 2),
        **phase,
    }))
    return 0


HBM_PEAK_GBS = 819.0     # v5e
# VPU peak estimate for v5e: 8x128 lanes x 4 ALUs x ~0.94 GHz (public
# v5e-class figures; the MXU peak 197 bf16 TFLOP/s is not reachable by
# this stencil/elementwise workload, so the VPU roofline is the one that
# matters)
VPU_PEAK_OPS = 8 * 128 * 4 * 0.94e9
# hand count of the fused-stage arithmetic per grid point (advection
# stencils, TKE closure, saturation adjustment, micro, axpy), with each
# of the 7 transcendentals (exp/log/pow in thermo + micro) costed at ~12
# VPU ops (their polynomial/iteration expansion), not 1
STAGE_OPS_PER_POINT = 1500 - 7 + 7 * 12


def phase_breakdown(grid, phys, les_state):
    """SELF-CONSISTENT substep phase accounting (VERDICT r2 item 4).

    All numbers come from the SAME scanned in-context program: the full
    substep is timed, then re-timed with the pressure projection skipped
    (substep(..., skip_projection=True)); the difference IS the in-context
    cost of the 3 projections and the remainder is the 3 fused stages +
    glue — so stage3 + projection3 == substep by construction, unlike
    standalone phase scans (whose per-phase carries add layout overhead
    the fused program doesn't pay).

    Also emits the achieved-vs-peak HBM bandwidth (traffic model per
    application, n instances of [160, 64, 64] f32: fused stage reads
    u,v,w + 4 scalars with ~1.5x z-halo amplification + 7 base reads + 7
    writes; projection ~34 field-passes) and an estimated VPU utilization
    from the documented ops model above.
    """
    import time as _time
    import jax
    import jax.numpy as jnp
    from sp_coupler_tpu.models.les import step as lstep, poisson
    from sp_coupler_tpu.models.les.state import LESForcing

    n = les_state.thl.shape[0]
    fld_mb = grid.nx * grid.ny * grid.nz * 4 / 1e6
    nz = grid.nz
    zero = jnp.zeros((n, nz))
    zs = jnp.zeros(n)
    forcing = LESForcing(f_u=zero, f_v=zero, f_thl=zero, f_qt=zero,
                         f_ql=zero, f_ps=zs, ql_ref=zero,
                         wthl=zs + 0.01, wqt=zs + 1e-5,
                         z0m=zs + 0.1, z0h=zs + 0.02)
    dt = 3.0
    solver = jax.vmap(
        lambda s: poisson.build_solver(grid, s.rhobf, s.rhobh))(les_state)

    def sync(out):
        # force completion with a tiny fetch: on the tunneled backend
        # block_until_ready can return before execution finishes
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def scan_time(body1, carry0, nscan=50, reps=3):
        def scanned(c):
            def b(cc, _):
                return body1(cc), ()
            return jax.lax.scan(b, c, None, length=nscan)[0]
        j = jax.jit(scanned)
        sync(j(carry0))
        t0 = _time.time()
        for _ in range(reps):
            sync(j(carry0))
        return (_time.time() - t0) / reps / nscan

    def sub1(skip):
        def f(sb):
            def one(s, f_, sol):
                return lstep.substep(grid, phys, s, f_, dt, solver=sol,
                                     skip_projection=skip)[0]
            return jax.vmap(one)(sb, forcing, solver)
        return f

    t_full = scan_time(sub1(False), les_state)
    t_noproj = scan_time(sub1(True), les_state)
    t_proj3 = max(t_full - t_noproj, 0.0)

    pts = n * grid.nx * grid.ny * grid.nz
    # 3 fused stages run in t_noproj -> per-point-update ops rate
    vpu_ops = 3 * pts * STAGE_OPS_PER_POINT / max(t_noproj, 1e-9)
    vpu_util = vpu_ops / VPU_PEAK_OPS

    sub_mb = n * fld_mb * 3 * ((7 * 1.5 + 7 + 7) + (4 + 12 + 15 + 3))
    gbs = sub_mb / 1e3 / t_full
    out = {
        "phase_ms": {
            "substep": round(t_full * 1e3, 3),
            "stage_x3": round(t_noproj * 1e3, 3),
            "projection_x3": round(t_proj3 * 1e3, 3),
        },
        "phase_method": "in-context differential: same scanned program "
                        "with/without the projection; stage_x3 + "
                        "projection_x3 == substep by construction",
        "hbm_gbs": round(gbs, 1),
        "hbm_frac": round(gbs / HBM_PEAK_GBS, 3),
        "vpu_util_est": round(vpu_util, 3),
        "vpu_model": "%d ops/point/stage (7 transcendentals @ ~12 ops) "
                     "vs %.1fT VPU-op/s peak" % (
                         STAGE_OPS_PER_POINT, VPU_PEAK_OPS / 1e12),
    }
    return out


if __name__ == "__main__":
    sys.exit(main())
