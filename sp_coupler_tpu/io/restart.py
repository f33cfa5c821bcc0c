"""Checkpoint / resume.

The reference restarts via model-native restart files plus append-mode
spifs.nc and a one-step overlap (SURVEY.md section 5 'Checkpoint/resume';
spmaster.py:267, spio.py:44-53, modfac.py:89-92). Here the whole coupled
state is two pytrees; a checkpoint is one compressed npz of flattened
leaves plus a small JSON of host-side scalars, written into the run's
output directory. Resume rebinds spifs.nc in append mode (the driver
suppresses writes on the first restarted step, splib.py:272-274).
"""

import json
import logging
import os

import numpy as np
import jax

log = logging.getLogger(__name__)

FNAME = "restart.npz"
META = "restart.json"


def _to_host(x):
    """Fetch a (possibly multi-process-sharded) array to host numpy.

    In a multi-controller run the LES fleet state is sharded over
    processes and not fully addressable; gather it first (a collective —
    every process must reach this call, which save() guarantees by
    running the flatten on all processes and gating only the file write).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _flatten(tag, tree):
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"{tag}_{i}": _to_host(x) for i, x in enumerate(leaves)}
    return arrays, treedef


def save(runner):
    out = {}
    meta = {
        "gcm_time": float(runner.gcm.get_model_time()),
        "fleet_time": float(getattr(runner.fleet, "time", 0.0)),
        "sp_cols": list(map(int, runner.sp_cols)),
        "rain_last": [float(x) for x in np.asarray(runner.rain_last)],
        "gcm_step": int(getattr(runner.gcm, "step_count", 0)),
    }
    if hasattr(runner.gcm, "state"):
        arrays, _ = _flatten("gcm", runner.gcm.state)
        out.update(arrays)
    if getattr(runner.fleet, "state", None) is not None:
        arrays, _ = _flatten("les", runner.fleet.state)
        out.update(arrays)
    if runner.prev_profiles is not None:
        arrays, _ = _flatten("prof", runner.prev_profiles)
        out.update(arrays)
        meta["has_profiles"] = True
    path = os.path.join(runner.cfg.output_dir, FNAME)
    if jax.process_index() != 0:
        return  # gathers above are collective; only rank 0 owns the files
    np.savez_compressed(path, **out)
    with open(os.path.join(runner.cfg.output_dir, META), "w") as f:
        json.dump(meta, f)
    log.info("restart written to %s", path)


def _unflatten(tag, data, template):
    leaves, treedef = jax.tree.flatten(template)
    new = [data[f"{tag}_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new)


def load(runner):
    path = os.path.join(runner.cfg.output_dir, FNAME)
    with open(os.path.join(runner.cfg.output_dir, META)) as f:
        meta = json.load(f)
    data = np.load(path)
    if hasattr(runner.gcm, "state"):
        runner.gcm.state = _unflatten("gcm", data, runner.gcm.state)
        runner.gcm._first = False
        runner.gcm.step_count = int(meta.get("gcm_step", 0))
    if getattr(runner.fleet, "state", None) is not None:
        runner.fleet.state = _unflatten("les", runner.fleet.state)
    elif hasattr(runner.fleet, "init_states") and any(
            k.startswith("les_") for k in data.files):
        # fleet state exists in the checkpoint but not in memory yet:
        # build a template by initializing, then overwrite
        nz = runner.fleet.get_ktot()
        z = np.zeros((runner.fleet.n, nz), np.float32)
        runner.fleet.init_states(z, z, z + 300.0, z + 1e-3,
                                 np.full(runner.fleet.n, 1e5, np.float32))
        runner.fleet.state = _unflatten("les", data, runner.fleet.state)
    runner.fleet.time = meta["fleet_time"]
    if meta.get("has_profiles") and runner.prev_profiles is None:
        runner.prev_profiles = jax.tree.map(np.asarray,
                                            runner.fleet.get_profiles())
        runner.prev_profiles = _unflatten("prof", data, runner.prev_profiles)
    runner.rain_last = np.asarray(meta["rain_last"])
    log.info("restart loaded from %s (gcm t=%s)", path, meta["gcm_time"])
