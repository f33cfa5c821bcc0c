"""Per-instance LES statistics output: cross sections and column integrals.

The reference's DALES instances write their own netCDF files per work
directory — surf_xy cross-sections at configured heights and time
statistics (reference README.md:108-111; namoptions &NAMCROSSSECTION
crossheight = 2,40,80, dtav = 60). This module reproduces that capability
on the batched fleet: per instance, one netCDF-classic file written
through the native async C++ writer (io/spnc.py), so serialization happens
off the step-loop thread.

Variables: xy cross sections of thl, qt, ql, w at the configured level
indices, plus LWP / RWP / TWP maps (liquid / rain / total water paths).
"""

import os

import numpy as np

from .. import constants as c
from . import spnc

CROSS_FIELDS = ("thl", "qt", "ql", "w")


class CrossSectionWriter:
    """One writer per LES instance."""

    def __init__(self, path, grid, heights=(2, 40, 80)):
        self.grid = grid
        self.heights = [h for h in heights if h < grid.nz]
        self.w = spnc.create_writer(path)
        t = self.w.def_dim("time", None)
        y = self.w.def_dim("y", grid.ny)
        x = self.w.def_dim("x", grid.nx)
        self.time_vid = self.w.def_var("time", "s", [t])
        self.vids = {}
        for name in CROSS_FIELDS:
            for k in self.heights:
                unit = {"thl": "K", "qt": "1", "ql": "1", "w": "m/s"}[name]
                self.vids[(name, k)] = self.w.def_var(
                    f"{name}xy{k:03d}", unit, [t, y, x])
        for name, unit in (("lwp", "kg/m^2"), ("rwp", "kg/m^2"),
                           ("twp", "kg/m^2")):
            self.vids[name] = self.w.def_var(name, unit, [t, y, x])
        self.w.enddef()
        self.rec = 0

    def write(self, state_i, ql_3d, t):
        """state_i: single-instance LESState (numpy views); ql_3d [nz,ny,nx]."""
        g = self.grid
        self.w.put(self.time_vid, self.rec, np.asarray([t], np.float32))
        fields = {"thl": state_i.thl, "qt": state_i.qt, "ql": ql_3d,
                  "w": state_i.w[:-1]}
        for name in CROSS_FIELDS:
            for k in self.heights:
                self.w.put(self.vids[(name, k)], self.rec,
                           np.asarray(fields[name][k]))
        rho_dz = np.asarray(state_i.rhobf)[:, None, None] * g.dz
        self.w.put(self.vids["lwp"], self.rec,
                   np.sum(rho_dz * np.asarray(ql_3d), axis=0))
        self.w.put(self.vids["rwp"], self.rec,
                   np.sum(rho_dz * np.asarray(state_i.qr), axis=0))
        self.w.put(self.vids["twp"], self.rec,
                   np.sum(rho_dz * np.asarray(state_i.qt), axis=0))
        self.rec += 1

    def flush(self):
        self.w.flush()

    def close(self):
        self.w.close()


def _gather_local(x, positions):
    """{pos: full per-instance ndarray} assembled from ADDRESSABLE shards.

    Multi-controller runs hold globally-sharded fleet arrays; a process
    can only read the shards on its own devices. `positions` must be
    instances whose devices all belong to this process (see
    parallel.mesh.local_les_positions) — spatial (x, y) sub-shards of a
    locally-owned instance are stitched back into the full plane here.
    """
    shape = x.shape
    out = {p: np.zeros(shape[1:], np.float32) for p in positions}
    for sh in x.addressable_shards:
        sl0 = sh.index[0] if sh.index else slice(0, shape[0])
        i0 = sl0.start or 0
        i1 = sl0.stop if sl0.stop is not None else shape[0]
        data = np.asarray(sh.data)
        for p in range(i0, i1):
            if p in out:
                out[p][tuple(sh.index[1:])] = data[p - i0]
    return out


class _Inst:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FleetCrossIO:
    """Cross-section writers for the fleet.

    ``positions``: instance positions this process owns (multi-controller
    runs pass the local subset — every worker writes its own instances'
    cross.nc, matching the reference where each DALES instance writes its
    own files from its own ranks, README.md:108-111). Default: all.
    ``sp_cols`` must align with ``positions``.
    """

    def __init__(self, out_dir, grid, sp_cols, heights=(2, 40, 80),
                 positions=None):
        self.positions = (list(positions) if positions is not None
                          else list(range(len(sp_cols))))
        assert len(self.positions) == len(sp_cols)
        self.writers = {}
        for pos, col in zip(self.positions, sp_cols):
            d = os.path.join(out_dir, "les-work-%d" % col)
            os.makedirs(d, exist_ok=True)
            self.writers[pos] = CrossSectionWriter(
                os.path.join(d, "cross.nc"), grid, heights)

    _STATE_FIELDS = ("thl", "qt", "w", "qr", "rhobf")

    def write(self, fleet_state, ql_3d, t):
        import jax
        if jax.process_count() == 1:
            state_np = jax.tree.map(np.asarray, fleet_state)
            ql_np = np.asarray(ql_3d)
            for pos, w in self.writers.items():
                inst = jax.tree.map(lambda x: x[pos], state_np)
                w.write(inst, ql_np[pos], t)
            return
        # multi-controller: stitch this process's shards per instance
        parts = {name: _gather_local(getattr(fleet_state, name),
                                     self.positions)
                 for name in self._STATE_FIELDS}
        ql = _gather_local(ql_3d, self.positions)
        for pos, w in self.writers.items():
            inst = _Inst(**{name: parts[name][pos]
                            for name in self._STATE_FIELDS})
            w.write(inst, ql[pos], t)

    def flush(self):
        for w in self.writers.values():
            w.flush()

    def close(self):
        for w in self.writers.values():
            w.close()
