"""Variability nudge: align LES condensate with the GCM's cloud profile.

Jit-safe re-design of the reference's variability_nudge
(/root/reference/splib/spcpl.py:613-744, enabled by --qt_forcing variance):
per vertical level, find a multiplicative factor beta scaling the qt
fluctuations so the implied mean condensate matches the GCM reference
ql_ref; fall back to additive Gaussian noise when the fluctuations are too
weak (beta would exceed beta_max); optionally compensate THL to keep
temperature constant.

The reference root-finds with scipy.brentq per level in a Python loop; here
both root-finds are fixed-iteration bisections vectorized over all levels
and all instances at once.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as c
from ..utils import thermo

BETA_MAX = 5.0
N_BISECT = 40  # |interval| / 2^40 -> float32-exact roots


class NudgeResult(NamedTuple):
    qt: jnp.ndarray        # [nz, ny, nx] adjusted total water
    thl: jnp.ndarray       # [nz, ny, nx] adjusted (only if constant_T)
    beta: jnp.ndarray      # [nz]
    alpha: jnp.ndarray     # [nz] log(beta)/dt
    qt_std: jnp.ndarray    # [nz]


def _bisect(f, lo, hi, n=N_BISECT):
    """Vectorized bisection for f monotone increasing in its argument.

    lo/hi/f-outputs may be arrays (per-level). Returns the root location;
    if f has no sign change in [lo, hi] the result clamps to an endpoint.
    """
    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        fm = f(m)
        a2 = jnp.where(fm < 0, m, a)
        b2 = jnp.where(fm < 0, b, m)
        return (a2, b2)

    a, b = jax.lax.fori_loop(0, n, body, (lo, hi))
    return 0.5 * (a + b)


def variability_nudge(qt, thl, qsat, ql_ref, p, key, dt,
                      constant_T=False, ql_significant=1e-9):
    """One LES instance. qt/thl/qsat: [nz, ny, nx]; ql_ref/p: [nz].

    Returns NudgeResult. Level cases (mirroring spcpl.py:658-729):
    1. ql_ref significant  -> bisect beta in [0, BETA_MAX] so that
       mean(max(beta (qt - qt_mean) + qt_mean - qsat, 0)) = ql_ref.
    2. GCM clear but LES cloudy -> scale to barely unsaturated using the
       most saturated cell; beta < 0 -> 1.
    3. neither -> beta = 1 (no nudge).
    If case-1 beta hits BETA_MAX (or no bracketing), switch to ADDITIVE
    zero-mean Gaussian noise (same horizontal field for every level for
    vertical correlation) with amplitude from a second bisection, and
    beta = 1.
    """
    nz, ny, nx = qt.shape
    qt_mean = jnp.mean(qt, axis=(1, 2))                        # [nz]
    ql_mean = jnp.mean(jnp.maximum(qt - qsat, 0.0), axis=(1, 2))
    dqt = qt - qt_mean[:, None, None]

    # shared horizontal noise field, exactly zero mean (spcpl.py:620-622)
    R = jax.random.normal(key, (ny, nx), qt.dtype)
    R = R - jnp.mean(R)

    def ql_of_beta(beta):                                      # beta: [nz]
        excess = beta[:, None, None] * dqt + qt_mean[:, None, None] - qsat
        return jnp.mean(jnp.maximum(excess, 0.0), axis=(1, 2))

    def ql_of_a(a):                                            # a: [nz]
        excess = qt + a[:, None, None] * R[None] - qsat
        return jnp.mean(jnp.maximum(excess, 0.0), axis=(1, 2))

    zeros = jnp.zeros(nz, qt.dtype)
    # case 1: multiplicative bisection (ql_of_beta is monotone increasing)
    f_mult = lambda b: ql_of_beta(b) - ql_ref
    bracketed = (f_mult(zeros) <= 0.0) & (f_mult(zeros + BETA_MAX) >= 0.0)
    beta_root = _bisect(f_mult, zeros, zeros + BETA_MAX)
    beta1 = jnp.where(bracketed, beta_root, BETA_MAX)

    # case 2: nudge toward barely unsaturated using the most saturated cell
    flat = (qt - qsat).reshape(nz, -1)
    imax = jnp.argmax(flat, axis=1)
    qt_max = jnp.take_along_axis(qt.reshape(nz, -1), imax[:, None], 1)[:, 0]
    qs_at_max = jnp.take_along_axis(qsat.reshape(nz, -1), imax[:, None],
                                    1)[:, 0]
    denom = qt_max - qt_mean
    beta2 = (qs_at_max - qt_mean) / jnp.where(jnp.abs(denom) > 1e-12,
                                              denom, 1e-12)
    beta2 = jnp.where(beta2 < 0, 1.0, beta2)

    significant = ql_ref > ql_significant
    les_cloudier = ql_mean > ql_ref
    beta = jnp.where(significant, beta1,
                     jnp.where(les_cloudier, beta2, 1.0))

    # additive fallback where beta hit the cap
    need_additive = significant & (beta >= BETA_MAX)
    f_add = lambda a: ql_of_a(a) - ql_ref
    a_root = _bisect(f_add, zeros, zeros + BETA_MAX)
    a_amp = jnp.where(need_additive & (ql_ref > ql_mean), a_root, 0.0)
    beta = jnp.where(need_additive, 1.0, beta)

    dQT = ((beta - 1.0)[:, None, None] * dqt
           + a_amp[:, None, None] * R[None])
    qt_new = qt + dQT

    if constant_T:
        ql_old = jnp.maximum(qt - qsat, 0.0)
        ql_target = jnp.maximum(qt_new - qsat, 0.0)
        dQL = ql_target - ql_old
        dTHL = -c.rlv / (c.cp * thermo.exner(p))[:, None, None] * dQL
        thl_new = thl + dTHL
    else:
        thl_new = thl

    alpha = jnp.log(jnp.maximum(beta, 1e-6)) / dt
    qt_std = jnp.std(qt_new, axis=(1, 2))
    return NudgeResult(qt=qt_new, thl=thl_new, beta=beta, alpha=alpha,
                       qt_std=qt_std)
