"""Moist-thermodynamic helper functions (pure JAX, jit/vmap-safe).

Covers the conversion math of the reference coupler
(/root/reference/splib/spcpl.py:136-246 and sputils.py:22-34):
Exner functions, virtual temperature, liquid-water potential temperature,
total water, and saturation quantities used by the LES saturation
adjustment and the variability nudge.
"""

import jax.numpy as jnp

from .. import constants as c


def rms(a):
    """Root mean square (sputils.py:22-24)."""
    return jnp.sqrt(jnp.mean(jnp.square(a)))


def exner(p):
    """Exner function (p/p0)^(Rd/cp) (sputils.py:28-30)."""
    return (p / c.pref0) ** (c.rd / c.cp)


def iexner(p):
    """Inverse Exner function (sputils.py:33-34)."""
    return (p / c.pref0) ** (-c.rd / c.cp)


def virtual_temperature(T, qv, qcond):
    """Tv = T (1 + 0.61 qv - qcond); qcond = ql + qi (spcpl.py:175-178)."""
    return T * (1.0 + c.eps_i * qv - qcond)


def thl_from_T(T, p, qcond):
    """Liquid-water potential temperature thl = (T - Lv qcond/cp) / exner(p).

    Mirrors spcpl.py:214 where the inverse Exner multiplies both terms.
    """
    return (T - c.rlv * qcond / c.cp) * iexner(p)


def T_from_thl(thl, p, ql):
    """Real temperature from thl on known pressure: T = thl*exner + Lv ql/cp.

    Mirrors spcpl.py:408-409 (t = thl_d * exner(pf) + rlv * ql_d / cp).
    """
    return thl * exner(p) + c.rlv * ql / c.cp


def esat_liq(T):
    """Saturation vapor pressure over liquid water (Tetens)."""
    return c.es0 * jnp.exp(c.at_liq * (T - c.tmelt) / (T - c.bt_liq))


def esat_ice(T):
    """Saturation vapor pressure over ice (Tetens/Murray)."""
    return c.es0 * jnp.exp(c.at_ice * (T - c.tmelt) / (T - c.bt_ice))


def qsat_liq(T, p):
    """Saturation specific humidity over liquid water."""
    es = esat_liq(T)
    es = jnp.minimum(es, 0.9 * p)  # guard very low pressure columns
    return (c.rd / c.rv) * es / (p - (1.0 - c.rd / c.rv) * es)


def qsat_ice(T, p):
    es = esat_ice(T)
    es = jnp.minimum(es, 0.9 * p)
    return (c.rd / c.rv) * es / (p - (1.0 - c.rd / c.rv) * es)


def ice_fraction(T):
    """Smooth liquid/ice partition of condensate by temperature.

    1 below 250 K, 0 above the triple point, linear ramp between. Stands in
    for the reference LES's simple-ice split (ql_ice vs ql_water,
    spcpl.py:401-402) without a second prognostic category.
    """
    t_all_ice = 250.0
    w = (c.tmelt - T) / (c.tmelt - t_all_ice)
    return jnp.clip(w, 0.0, 1.0)


def sat_adjust(thl, qt, p, n_iter=3):
    """All-or-nothing saturation adjustment: (thl, qt, p) -> (T, ql, qsat).

    Fixed-point iteration (fixed count => jit-friendly):
        T_0 = thl * exner(p)
        ql_{i+1} = max(qt - qsat(T_i, p), 0)
        T_{i+1} = thl * exner(p) + (Lv/cp) * ql_{i+1}

    This is the standard DALES-style thermodynamic closure the reference LES
    implements in Fortran (consumed via get_profile_T / get_field('Qsat'),
    spcpl.py:627, 759).
    """
    ex = exner(p)
    T = thl * ex
    ql = jnp.zeros_like(qt)
    for _ in range(n_iter):
        qs = qsat_liq(T, p)
        # account for dqsat/dT in the update for faster convergence
        dqsdt = qs * c.rlv / (c.rv * T * T)
        ql = jnp.maximum((qt - qs + dqsdt * (T - thl * ex)) /
                         (1.0 + c.rlv / c.cp * dqsdt), 0.0)
        T = thl * ex + c.rlv * ql / c.cp
    qs = qsat_liq(T, p)
    return T, ql, qs
