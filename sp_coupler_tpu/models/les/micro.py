"""Single-moment bulk "simpleice" microphysics (mixed-phase precipitation).

Stands in for the reference LES's imicro=6 "simpleice" scheme
(/root/reference/dales-input/namoptions.001 &NAMMICROPHYSICS; DALES
modsimpleice, Grabowski 1998 lineage): ONE prognostic precipitation
category qr whose phase follows the local temperature —

- cloud condensate is split ql_water / ql_ice by ice_fraction(T) (also
  what the coupler exports, spcpl.py:401-402);
- the LIQUID part autoconverts with the KK2000 warm-rain power law, the
  ICE part with a threshold/timescale law (Grabowski-style snow
  autoconversion); accretion collects total condensate;
- sedimentation blends rain and snow power-law fall speeds by the local
  precip ice fraction (snow falls ~1 m/s vs rain ~5-7 m/s, so cold
  precip survives longer and drifts farther — the physically visible
  ice interaction);
- evaporation/sublimation of precip weights the latent heat by phase
  (rlv vs rls).

Documented deviations from DALES simpleice: the saturation adjustment
(and hence the thl budget of condensation) stays liquid-based, precip
subsaturation is measured against liquid qsat, and the latent heat of
melting/freezing of falling precip (rlm ~ 13% of rlv) is neglected —
the precip phase is diagnostic in T, not integrated along the fall path.
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
    sed_a: float = 14.34     # rain fall speed prefactor (Kessler-style)
    sed_b: float = 0.1346    # rain fall speed exponent
    ice_tau: float = 600.0   # ice -> snow autoconversion timescale (s)
    ice_qi0: float = 1.0e-5  # ice autoconversion threshold (kg/kg)
    sed_ai: float = 3.29     # snow fall speed prefactor (Heymsfield-
                             # Donner / Grabowski 1998: 3.29 (rho q)^0.16)
    sed_bi: float = 0.16     # snow fall speed exponent


def rain_tendencies(grid, params, rhobf, T, p, qv, ql, qr, dt):
    """(dqt/dt, dqr/dt, dthl/dt, surface_rain_flux).

    All source terms are limited so one substep cannot produce negative
    water. The thl tendency carries the latent-heat effect of precip
    evaporation/sublimation (condensation itself is inside the
    saturation adjustment).
    """
    nc_cm3 = params.nc0 * 1e-6
    fi = thermo.ice_fraction(T)                    # cloud AND precip phase
    ql_w = jnp.maximum(ql, 0.0) * (1.0 - fi)
    ql_i = jnp.maximum(ql, 0.0) * fi
    # liquid: KK2000 autoconversion; ice: threshold/timescale snow source
    auto = (params.auto_k * ql_w ** 2.47 * nc_cm3 ** (-1.79)
            + jnp.maximum(ql_i - params.ice_qi0, 0.0) / params.ice_tau)
    accr = params.accr_k * (jnp.maximum(ql, 0.0) * jnp.maximum(qr, 0.0)) ** 1.15
    to_rain = jnp.minimum(auto + accr, jnp.maximum(ql, 0.0) / dt)
    # precip evaporation/sublimation in subsaturated air (subsaturation
    # measured against liquid qsat; latent heat weighted by phase)
    qs = thermo.qsat_liq(T, p)
    subsat = jnp.clip((qs - qv) / jnp.maximum(qs, 1e-8), 0.0, 1.0)
    evap = jnp.minimum(subsat * qr / params.evap_tau,
                       jnp.maximum(qr, 0.0) / dt)
    lheat = (1.0 - fi) * c.rlv + fi * c.rls
    dqr = to_rain - evap
    dqt = -to_rain + evap
    dthl = -lheat / c.cp * thermo.iexner(p) * evap
    # sedimentation: upwind flux through cell bottoms; fall speed blends
    # the rain and snow power laws by the local precip ice fraction
    rho = rhobf[:, None, None]
    rq = jnp.maximum(rho * qr, 0.0)
    vt = ((1.0 - fi) * params.sed_a * rq ** params.sed_b
          + fi * params.sed_ai * rq ** params.sed_bi)
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
