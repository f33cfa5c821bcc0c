"""Single-moment bulk rain microphysics (warm rain + diagnostic ice split).

Stands in for the reference LES's imicro=6 "simpleice" scheme
(/root/reference/dales-input/namoptions.001 &NAMMICROPHYSICS): prognostic
rain water qr with Khairoutdinov-Kogan warm-rain conversion rates, rain
evaporation, power-law sedimentation with surface rain accumulation, and a
temperature-based diagnostic liquid/ice partition of the cloud condensate
(consumed by the coupler as ql_ice / ql_water, spcpl.py:401-402).
"""

from typing import NamedTuple

import jax.numpy as jnp

from ... import constants as c
from ...utils import thermo


class MicroParams(NamedTuple):
    nc0: float = 200.0e6     # cloud droplet number (1/m^3), namoptions Nc_0
    auto_k: float = 1350.0   # KK2000 autoconversion prefactor
    accr_k: float = 67.0     # KK2000 accretion prefactor
    evap_tau: float = 60.0   # rain evaporation timescale (s)
    sed_a: float = 14.34     # Kessler fall speed prefactor
    sed_b: float = 0.1346    # Kessler fall speed exponent


def rain_tendencies(grid, params, rhobf, T, p, qv, ql, qr, dt):
    """(dqt/dt, dqr/dt, dthl/dt, surface_rain_flux).

    All source terms are limited so one substep cannot produce negative
    water. The thl tendency carries the latent-heat effect of rain
    evaporation (condensation itself is inside the saturation adjustment).
    """
    nc_cm3 = params.nc0 * 1e-6
    # autoconversion + accretion (KK2000 power laws)
    auto = params.auto_k * jnp.maximum(ql, 0.0) ** 2.47 * nc_cm3 ** (-1.79)
    accr = params.accr_k * (jnp.maximum(ql, 0.0) * jnp.maximum(qr, 0.0)) ** 1.15
    to_rain = jnp.minimum(auto + accr, jnp.maximum(ql, 0.0) / dt)
    # rain evaporation in subsaturated air
    qs = thermo.qsat_liq(T, p)
    subsat = jnp.clip((qs - qv) / jnp.maximum(qs, 1e-8), 0.0, 1.0)
    evap = jnp.minimum(subsat * qr / params.evap_tau,
                       jnp.maximum(qr, 0.0) / dt)
    dqr = to_rain - evap
    dqt = -to_rain + evap
    dthl = -c.rlv / c.cp * thermo.iexner(p) * evap
    # sedimentation: upwind flux through cell bottoms, fall speed Kessler-style
    rho = rhobf[:, None, None]
    vt = params.sed_a * jnp.maximum(rho * qr, 0.0) ** params.sed_b
    flux = rho * vt * jnp.maximum(qr, 0.0)         # [nz] downward at centers
    # divergence: cell k gains flux from k+1, loses its own
    flux_above = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], axis=0)
    dqr_sed = (flux_above - flux) / (rho * grid.dz)
    # limit total qr sink
    dqr_total = dqr + dqr_sed
    dqr_total = jnp.maximum(dqr_total, -jnp.maximum(qr, 0.0) / dt)
    surf_flux = jnp.mean(flux[0])                  # kg/m^2/s, domain mean
    return dqt, dqr_total, dthl, surf_flux


def ice_split(T, ql):
    """Diagnostic (ql_water, ql_ice) partition by temperature."""
    fi = thermo.ice_fraction(T)
    return ql * (1.0 - fi), ql * fi
