#!/usr/bin/env python
"""Write the recorded CPU<->TPU parity report at the REAL case size.

Consumes two summaries produced by
    python -m sp_coupler_tpu.verify.parity run <out.npz> real 10
on each backend (T21/L19 GCM + 2 x 64x64x160 LES — BASELINE config 1)
and writes sp_coupler_tpu/verify/PARITY_REAL.md with the per-field
numbers and the tolerance-model discussion.

Usage: python scripts/parity_real_report.py cpu.npz tpu.npz [out.md]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp_coupler_tpu.verify import parity  # noqa: E402

HEADER = """# CPU <-> TPU parity at the real case size (BASELINE config 1)

Configuration: T21/L19 GCM (dt 600 s) coupled to 2 LES instances of
64 x 64 x 160 (200 m / 25 m spacing — the run_T21 case grid), 10 coupled
steps, CFL-adaptive substepping (~120 LES substeps per coupled step per
instance). Each backend runs ITS production path: the fused Pallas
RK-stage kernel on TPU, the XLA reference path on CPU
(`python -m sp_coupler_tpu.verify.parity run <out> real 10`).

## Tolerance model

The LES is chaotic: float32 rounding differences between backends
(matmul pass structure, fusion order, kernel vs XLA arithmetic) grow at
the turbulence Lyapunov rate, so BIT parity across platforms is
impossible by construction after ~minutes of simulated time. One coupled
step is already ~120 chaotic substeps. The enforced observables are the
COUPLED quantities — LES slab-mean profiles and GCM column state — with
per-step relative-to-max tolerances {tols} for steps 0, 1, >=2; the
per-level standard deviations of 3-D turbulence fields are compared
report-only (their magnitude is the honest indicator that the two
trajectories realize the same turbulent state, not the same sample).

## Result: **{verdict}**

| field | max rel diff | tol | status |
|---|---|---|---|
{rows}
"""


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sp_coupler_tpu", "verify", "PARITY_REAL.md")
    a = np.load(a_path)
    b = np.load(b_path)
    assert set(a.files) == set(b.files)
    rows = []
    failures = 0
    for key in sorted(a.files):
        xa, xb = a[key], b[key]
        scale = np.abs(xa).max() + 1e-12
        diff = np.abs(xa - xb).max() / scale
        step = int(key[4])
        if "_std_" in key:
            tol = parity.STD_TOL[min(step, len(parity.STD_TOL) - 1)]
            status = "note" if diff > tol else "ok (note)"
        else:
            tol = parity.PROFILE_TOL[min(step, len(parity.PROFILE_TOL) - 1)]
            status = "ok" if diff <= tol else "FAIL"
            failures += diff > tol
        rows.append("| %s | %.2e | %.1e | %s |" % (key, diff, tol, status))
    verdict = "PASS" if failures == 0 else "FAIL (%d fields)" % failures
    with open(out, "w") as f:
        f.write(HEADER.format(tols=parity.PROFILE_TOL, verdict=verdict,
                              rows="\n".join(rows)))
    print("wrote", out, "verdict:", verdict)
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
