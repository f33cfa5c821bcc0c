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

    n_les = 2
    dt_les = 5.0
    n_substeps = 180  # 900 s GCM step

    gcfg = gcm_model.GCMConfig(trunc=21, nlev=19, dt=900.0)
    core = gcm_model.GCMCore(gcfg)
    grid = lgrid.LESGrid()  # 64 x 64 x 160 reference case
    phys = lstep.LESPhysics()

    gcm_state = core.initial_state(seed=0)
    zf = np.asarray(grid.zf())
    thl0 = jnp.asarray(297.9 + np.maximum(zf - 740.0, 0) * 19.1 / 3260.0,
                       jnp.float32)
    qt0 = jnp.asarray(16e-3 * np.exp(-zf / 2500.0), jnp.float32)
    u0 = jnp.asarray(-9.9 + 2e-3 * zf, jnp.float32)
    v0 = jnp.full(grid.nz, -3.8, jnp.float32)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(42), i))(jnp.arange(n_les))
    les_state = jax.vmap(
        lambda k: lstate.init_state(grid, u0, v0, thl0, qt0, 1.0e5, k))(keys)

    # the two Barbados-region columns of the reference case
    cols = np.asarray([1208, 1272], np.int32)
    step_fn = CoupledStepFn(core, grid, phys, cols, dt_les=dt_les,
                            n_substeps=n_substeps)
    prof = jax.vmap(lambda s: ldiag.slab_profiles(grid, s))(les_state)
    rain = jnp.zeros(n_les)

    # warmup (compile + first coupled step)
    t0 = time.time()
    out = step_fn(gcm_state, les_state, prof, rain, 0, first=True)
    gcm_state, les_state, prof, rain, _ = jax.block_until_ready(out)
    warm = time.time() - t0

    n_timed = 3
    t0 = time.time()
    for s in range(1, n_timed + 1):
        out = step_fn(gcm_state, les_state, prof, rain, s, first=False)
        gcm_state, les_state, prof, rain, _ = jax.block_until_ready(out)
    elapsed = time.time() - t0

    thl = np.asarray(prof["THL"])
    assert np.all(np.isfinite(thl)), "NaN in coupled state"

    updates = n_les * grid.nx * grid.ny * grid.nz * n_substeps * n_timed
    gps = updates / elapsed
    print(json.dumps({
        "metric": "les_gridpoint_updates_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoint-updates/s (T21+2xLES 64x64x160 coupled, "
                "%d substeps/step; step %.2fs, warmup %.0fs)" % (
                    n_substeps, elapsed / n_timed, warm),
        "vs_baseline": round(gps / REF_GRIDPOINTS_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
