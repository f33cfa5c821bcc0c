"""GCM physics: radiation, surface fluxes + vertical diffusion, cloud scheme.

Deliberately simple parameterizations with the same *structure* as the
reference's OpenIFS physics as seen by the coupler:

- the timestep is split at the cloud scheme (evolve_model_until_cloud_scheme
  / evolve_model_cloud_scheme / evolve_model_from_cloud_scheme,
  splib.py:186-188, 296-299, 335);
- vertical diffusion can be switched off inside superparameterized columns
  (set_vdf_in_sp_mask, splib.py:480);
- the surface scheme produces the seven flux/roughness fields the coupler
  fetches (Z0M, Z0H, QLflux, QIflux, SHflux, TLflux, TSflux,
  spcpl.py:33,69-75) with the OpenIFS positive-downward sign convention
  (spcpl.py:163-166).

All functions operate on grid fields [L, nlat, nlon], top level first.
"""

from typing import NamedTuple

import jax.numpy as jnp

from ... import constants as c
from ...utils import thermo


class PhysicsParams(NamedTuple):
    tau_rad: float = 20.0 * 86400.0   # Newtonian relaxation timescale (s)
    tau_rad_sfc: float = 4.0 * 86400.0
    t_strat: float = 200.0            # stratospheric equilibrium T
    t_eq_sfc: float = 300.0           # surface equatorial equilibrium T
    dT_eq_pole: float = 60.0          # equator-pole equilibrium contrast
    dtheta_z: float = 25.0            # static-stability parameter (~3 K/km
                                      # in the lowest 4 km at the equator,
                                      # matching observed trade-wind
                                      # stratification; the Held-Suarez
                                      # value of 10 leaves the tropics
                                      # strongly moist-unstable)
    sst: float = 300.0                # fixed ocean surface temperature base
    dsst_pole: float = 27.0           # SST equator-pole contrast
    z0m: float = 1.6e-4               # ocean momentum roughness
    z0h: float = 3.2e-5
    cd_max: float = 2.5e-3
    k_vdiff: float = 15.0             # PBL eddy diffusivity (m^2/s)
    pbl_top_sigma: float = 0.75       # diffusion active below this sigma
    rh_crit: float = 0.85             # Sundqvist critical relative humidity
    tau_cond: float = 900.0           # condensation adjustment time (s)
    tau_cld: float = 3.0 * 3600.0     # cloud fraction relaxation time
    rayleigh_tau: float = 0.0         # HS94 boundary-layer Rayleigh
                                      # friction timescale (s); 0 = off
                                      # (production runs use the bulk
                                      # surface drag + K-diffusion PBL
                                      # instead). The Held-Suarez check
                                      # sets 86400 with dtheta_z=10 for
                                      # the canonical dry benchmark.


def equilibrium_temperature(p, lat_rad, prm: PhysicsParams):
    """Held-Suarez-style radiative-equilibrium temperature [L, nlat, 1]."""
    sin2 = jnp.sin(lat_rad) ** 2
    cos2 = 1.0 - sin2
    pr = p / c.pref0
    Teq = (prm.t_eq_sfc - prm.dT_eq_pole * sin2
           - prm.dtheta_z * jnp.log(jnp.maximum(pr, 1e-6)) * cos2) * pr ** c.kappa
    return jnp.maximum(prm.t_strat, Teq)


def radiation(T, p, lat_rad, sigma_full, prm: PhysicsParams):
    """Newtonian cooling tendency dT/dt [L, nlat, nlon]."""
    Teq = equilibrium_temperature(p, lat_rad, prm)
    sig = sigma_full[:, None, None]
    kt = (1.0 / prm.tau_rad
          + (1.0 / prm.tau_rad_sfc - 1.0 / prm.tau_rad)
          * jnp.maximum(0.0, (sig - 0.7) / 0.3)
          * jnp.cos(lat_rad) ** 4)
    return -kt * (T - Teq)


def sst_field(lat_rad, prm: PhysicsParams):
    return prm.sst - prm.dsst_pole * jnp.sin(lat_rad) ** 2


def surface_fluxes(u1, v1, T1, q1, p_sfc, z1, lat_rad, prm: PhysicsParams):
    """Bulk ocean surface fluxes.

    Returns a dict with the OpenIFS-convention fields (positive DOWNWARD,
    spcpl.py:163-166): TSflux (sensible, W/m^2), TLflux (latent, W/m^2),
    SHflux (vapor mass flux, kg/m^2/s), QLflux/QIflux (zero), Z0M, Z0H,
    plus the raw upward kinematic fluxes used by vertical diffusion.
    """
    sst = sst_field(lat_rad, prm)
    rho = p_sfc / (c.rd * T1)
    U1 = jnp.sqrt(u1 ** 2 + v1 ** 2 + 0.25)
    cd = jnp.minimum((0.4 / jnp.log(z1 / prm.z0m)) ** 2, prm.cd_max)
    ch = jnp.minimum((0.4 / jnp.log(z1 / prm.z0h)) ** 2, prm.cd_max)
    # potential temperature difference surface - first level
    th1 = T1 * thermo.iexner(p_sfc)  # approx: first level near surface
    wth = ch * U1 * (sst * thermo.iexner(p_sfc) - th1)       # K m/s upward
    qs_sst = thermo.qsat_liq(sst, p_sfc)
    wq = ch * U1 * (qs_sst - q1)                             # m/s * kg/kg upward
    wq = jnp.maximum(wq, 0.0)  # ocean: no dew sink for simplicity
    tau_u = -cd * U1 * u1
    tau_v = -cd * U1 * v1
    return {
        "wth": wth, "wq": wq, "tau_u": tau_u, "tau_v": tau_v, "rho": rho,
        # OpenIFS sign convention: positive downward
        "TSflux": -rho * c.cp * wth * thermo.exner(p_sfc),
        "TLflux": -rho * c.rlv * wq,
        "SHflux": -rho * wq,
        "QLflux": jnp.zeros_like(wq),
        "QIflux": jnp.zeros_like(wq),
        "Z0M": jnp.full_like(wq, prm.z0m),
        "Z0H": jnp.full_like(wq, prm.z0h),
    }


def vertical_diffusion(vc, u, v, T, q, sfc, dz_levels, prm: PhysicsParams,
                       vdiff_mask):
    """Simple K-diffusion in the boundary layer + surface flux injection.

    vdiff_mask [nlat, nlon]: 1 where diffusion is active, 0 in SP columns
    when the coupler disabled it (set_vdf_in_sp_mask semantics).
    Returns tendencies (du, dv, dT, dq).
    """
    sig = vc.sf[:, None, None]
    K = prm.k_vdiff * jnp.clip((sig - prm.pbl_top_sigma) /
                               (1.0 - prm.pbl_top_sigma), 0.0, 1.0)
    dz = dz_levels                                 # [L, nlat, nlon] layer depths

    def diff(X, sflux):
        # upward fluxes at half levels; level order is top-first, so the
        # cell below X[k] is X[k+1] and dX/dz = (X[k] - X[k+1]) / dzh
        Kh = 0.5 * (K[1:] + K[:-1])
        dzh = 0.5 * (dz[1:] + dz[:-1])
        F_int = -Kh * (X[:-1] - X[1:]) / dzh       # [L-1] interior half levels
        zero = jnp.zeros_like(F_int[:1])
        F = jnp.concatenate([zero, F_int, sflux[None]], axis=0)  # [L+1]
        # tendency = -dF/dz; cell k sits between F[k] (above) and F[k+1]
        return (F[1:] - F[:-1]) / dz

    du = diff(u, sfc["tau_u"]) * vdiff_mask
    dv = diff(v, sfc["tau_v"]) * vdiff_mask
    dT = diff(T, sfc["wth"]) * vdiff_mask
    dq = diff(q, sfc["wq"]) * vdiff_mask
    return du, dv, dT, dq


def cloud_scheme(T, q, ql, qi, a, p, dt, prm: PhysicsParams):
    """Large-scale condensation + Sundqvist cloud fraction.

    Saturation adjustment relaxed over tau_cond; condensate partitioned
    liquid/ice by temperature; cloud fraction relaxes toward the Sundqvist
    diagnostic A = 1 - sqrt((1 - RH)/(1 - RHcrit)).
    Returns adjusted (T, q, ql, qi, a).
    """
    qs = thermo.qsat_liq(T, p)
    dqsdT = qs * c.rlv / (c.rv * T ** 2)
    excess = (q - qs) / (1.0 + (c.rlv / c.cp) * dqsdT)
    cond = jnp.where(excess > 0,
                     excess * jnp.minimum(1.0, dt / prm.tau_cond),
                     0.0)
    # evaporation of existing condensate in subsaturated air
    evap = jnp.where(excess < 0,
                     jnp.minimum(ql + qi, -excess * jnp.minimum(
                         1.0, dt / prm.tau_cond)),
                     0.0)
    dcond = cond - evap
    fi = thermo.ice_fraction(T)
    ql_new = jnp.maximum(ql + dcond * (1.0 - fi), 0.0)
    qi_new = jnp.maximum(qi + dcond * fi, 0.0)
    q_new = jnp.maximum(q - dcond, 0.0)
    T_new = T + (c.rlv / c.cp) * dcond
    rh = jnp.clip(q_new / thermo.qsat_liq(T_new, p), 0.0, 1.0)
    a_diag = 1.0 - jnp.sqrt(jnp.clip((1.0 - rh) / (1.0 - prm.rh_crit),
                                     0.0, 1.0))
    has_cond = (ql_new + qi_new) > 1e-7
    a_diag = jnp.where(has_cond, jnp.maximum(a_diag, 0.1), a_diag)
    w = jnp.minimum(1.0, dt / prm.tau_cld)
    a_new = jnp.clip(a + w * (a_diag - a), 0.0, 1.0)
    # autoconversion-like sink keeps condensate bounded (precip removed)
    sink = jnp.minimum(1.0, dt / (4.0 * prm.tau_cond)) * jnp.maximum(
        ql_new + qi_new - 1e-3, 0.0)
    frac = sink / jnp.maximum(ql_new + qi_new, 1e-12)
    ql_new = ql_new * (1.0 - frac)
    qi_new = qi_new * (1.0 - frac)
    return T_new, q_new, ql_new, qi_new, a_new
