"""LES fleet: all embedded instances as one batched, vmapped state.

The reference runs one OS process group per LES and steps them in parallel
with async RPC (SURVEY.md P1, splib.py:554-593). Here the fleet is a single
pytree with a leading instance axis: evolve/profiles/init are vmapped jitted
transforms, so "instance parallelism" is data parallelism the XLA way and
shards across chips over the `les` mesh axis.

LESInstance provides the reference's per-instance duck-typed API
(get_profile_U, set_tendency_QT, get_cloudfraction, ... — the surface
consumed in spcpl.py:274-385, 747-767) on top of the fleet for the generic
orchestration path and tests.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import grid as lgrid, state as lstate, step as lstep, diag as ldiag
from .state import LESForcing


class LESFleet:
    """Batched LES instances sharing one grid and physics configuration."""

    def __init__(self, grid: lgrid.LESGrid, phys: lstep.LESPhysics,
                 n_les: int, dt_les: float, seed: int = 42,
                 schedule: str = "auto", cfl: float = 0.7,
                 peclet: float = 0.1, dt_min: float = 0.2,
                 n_substeps: int = 0):
        self.grid = grid
        self.phys = phys
        self.n = n_les
        self.dt = float(dt_les)
        self.seed = seed
        self.n_substeps = int(n_substeps)  # >0: fixed substeps per evolve
        self.state = None              # batched LESState after init_states
        self.time = 0.0                # fleet clock (s); all instances share it

        g, p = grid, phys
        serial = (lstep.serial_fleet_default(g) if schedule == "auto"
                  else schedule == "serial")
        self._init_v = jax.jit(jax.vmap(
            lambda u, v, thl, qt, ps, key: lstate.init_state(
                g, u, v, thl, qt, ps, key)))

        def _evolve(s, f, t_end, nn):
            if nn:
                def one(si, fi):
                    span = t_end - si.time
                    si = lstep.evolve(g, p, si, fi, span / nn, nn)
                    z = jnp.zeros((), jnp.int32)
                    return si, z + nn, z
            else:
                one = lambda si, fi: lstep.evolve_adaptive(
                    g, p, si, fi, t_end, dt_max=dt_les, cfl=cfl,
                    peclet=peclet, dt_min=dt_min)
            return lstep.map_fleet(one, s, f, serial)

        self._evolve_v = jax.jit(_evolve, static_argnames=("nn",))
        self._profiles_v = jax.jit(jax.vmap(
            lambda s: ldiag.slab_profiles(g, s)))
        self._fields_v = jax.jit(jax.vmap(ldiag.fields_3d))
        self._cf_v = jax.jit(jax.vmap(
            lambda cf, Zh: ldiag.cloud_fraction_on_gcm_levels(g, cf, Zh)))

    # ---- grid metadata (reference getters, spio.py:94-116) ----------------

    def get_itot(self):
        return self.grid.nx

    def get_jtot(self):
        return self.grid.ny

    def get_ktot(self):
        return self.grid.nz

    def get_dx(self):
        return self.grid.dx

    def get_dy(self):
        return self.grid.dy

    def get_xsize(self):
        return self.grid.xsize

    def get_ysize(self):
        return self.grid.ysize

    def get_zf(self):
        return np.asarray(self.grid.zf())

    def get_zh(self):
        """Half-level heights [nz]: cell tops, matching DALES's zh export."""
        return np.asarray(self.grid.zh())[1:]

    # ---- state management --------------------------------------------------

    def init_states(self, u, v, thl, qt, ps, start_time=0.0):
        """Initialize all instances from per-instance profiles [n, nz].

        Noise amplitudes follow set_les_state (spcpl.py:285-291); each
        instance gets an independent counter-based key derived from the
        fleet seed, replacing the reference's global numpy seed 42.
        """
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(self.seed), i))(jnp.arange(self.n))
        self.state = self._init_v(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(thl),
            jnp.asarray(qt), jnp.asarray(ps), keys)
        self.time = float(start_time)
        self.state = self.state._replace(
            time=jnp.full((self.n,), start_time, jnp.float32))

    def evolve_to(self, t_end, forcing: LESForcing):
        """Advance every instance to t_end under the given batched forcing.

        The substep count is static per (interval length) -> one compiled
        executable for the regular coupling interval.
        """
        span = float(t_end) - self.time
        if span <= 0:
            return
        self.state, n_sub, n_clamp = self._evolve_v(self.state, forcing,
                                                    float(t_end),
                                                    self.n_substeps)
        self.last_substeps = int(n_sub[0])
        self.last_dtmin_clamped = np.asarray(n_clamp)
        if np.any(self.last_dtmin_clamped > 0):
            import logging
            logging.getLogger(__name__).warning(
                "CFL-required dt fell below dt_min in instance(s) %s "
                "(%s clamped substeps): LES likely unstable",
                list(np.where(self.last_dtmin_clamped > 0)[0]),
                self.last_dtmin_clamped[self.last_dtmin_clamped > 0])
        self.time = float(t_end)

    def get_profiles(self):
        """Batched slab means: dict of [n, nz] (+ scalars [n])."""
        return self._profiles_v(self.state)

    def get_fields(self):
        """Batched 3-D diagnostic fields for the variability nudge."""
        return self._fields_v(self.state)

    def cloud_fractions(self, gcm_Zh):
        """A_d on GCM layers for every instance; gcm_Zh [n, L+1] descending."""
        prof = self.get_profiles()
        return self._cf_v(prof["cloudfrac_z"], jnp.asarray(gcm_Zh))

    def set_qt_thl(self, qt, thl):
        """Write back 3-D fields (variability nudge, spcpl.py:732-734)."""
        self.state = self.state._replace(qt=jnp.asarray(qt),
                                         thl=jnp.asarray(thl))

    def write_restart(self):
        pass  # restart handled by io.restart checkpointing of the pytree

    def cleanup_code(self):
        pass

    def stop(self):
        pass


class LESInstance:
    """Per-instance duck-typed view with the reference LES API surface."""

    support_async = False

    def __init__(self, fleet: LESFleet, index: int):
        self.fleet = fleet
        self.index = index
        self.grid_index = -1           # GCM column index, set by the driver
        self.lat = 0.0
        self.lon = 0.0
        self._forcing = LESForcing.zeros(fleet.grid.nz)
        self._prof_cache = None

    # grid
    def get_itot(self):
        return self.fleet.get_itot()

    def get_jtot(self):
        return self.fleet.get_jtot()

    def get_ktot(self):
        return self.fleet.get_ktot()

    def get_zf(self):
        return self.fleet.get_zf()

    def get_zh(self):
        return self.fleet.get_zh()

    def get_model_time(self):
        return self.fleet.time

    # state / profile getters (one instance out of the batch)
    def _profiles(self):
        if self._prof_cache is None:
            self._prof_cache = jax.tree.map(lambda x: np.asarray(x),
                                            self.fleet.get_profiles())
        return self._prof_cache

    def invalidate_cache(self):
        self._prof_cache = None

    def _p(self, key):
        return self._profiles()[key][self.index]

    def get_profile_U(self):
        return self._p("U")

    def get_profile_V(self):
        return self._p("V")

    def get_profile_THL(self):
        return self._p("THL")

    def get_profile_QT(self):
        return self._p("QT")

    def get_profile_QL(self):
        return self._p("QL")

    def get_profile_QL_ice(self):
        return self._p("QL_ice")

    def get_profile_QL_water(self):
        return self._p("QL_water")

    def get_profile_QR(self):
        return self._p("QR")

    def get_profile_T(self):
        return self._p("T")

    def get_presf(self):
        return self._p("presf")

    def get_rhof(self):
        return self._p("Rhof")

    def get_rhobf(self):
        return self._p("Rhobf")

    def get_surface_pressure(self):
        return float(self._p("PS"))

    def get_rain(self):
        return float(self._p("Rain"))

    def get_cloudfraction(self, gcm_Zh):
        cf = self.fleet.cloud_fractions(
            np.broadcast_to(gcm_Zh, (self.fleet.n,) + np.shape(gcm_Zh)))
        return np.asarray(cf[self.index])
