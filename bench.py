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
        warm, np.asarray(d0["n_substeps"])), file=sys.stderr, flush=True)

    n_timed = 3
    total_sub = 0
    t0 = time.time()
    for s in range(2, n_timed + 2):
        out = step_fn(gcm_state, les_state, prof, rain, s, first=False)
        gcm_state, les_state, prof, rain, diag = jax.block_until_ready(out)
        total_sub += int(np.sum(np.asarray(diag["n_substeps"])))
    elapsed = time.time() - t0

    thl = np.asarray(prof["THL"])
    assert np.all(np.isfinite(thl)), "NaN in coupled state"

    updates = grid.nx * grid.ny * grid.nz * total_sub
    gps = updates / elapsed
    print(json.dumps({
        "metric": "les_gridpoint_updates_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoint-updates/s (T21+2xLES 64x64x160 coupled, "
                "adaptive dt, %d total substeps; step %.2fs, warmup %.0fs)"
                % (total_sub, elapsed / n_timed, warm),
        "vs_baseline": round(gps / REF_GRIDPOINTS_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
