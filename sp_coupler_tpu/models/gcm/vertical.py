"""Vertical discretization: sigma/hybrid levels + semi-implicit matrices.

Simmons & Burridge (1981)-style energy-consistent vertical scheme on sigma
levels (hybrid A/B kept general in the half-level pressure definition;
the default level set is pure sigma). Precomputes:

- alpha_k, ln-ratio coefficients for hydrostatic integration and omega/p,
- G:  geopotential matrix, Phi' = Phi_s + G @ T        [L, L]
- W:  semi-implicit T-tendency coupling, dT/dt |= W @ D [L, L]
- b:  surface-pressure coupling, dlnps/dt |= -b @ D     [L]
- per-total-wavenumber implicit inverses (I - dt^2 lam_n (G W - R Tref 1 b^T))^-1

These play the role of OpenIFS's semi-implicit solver consumed through the
evolve_model_* phases (splib.py:186-188, 296-299, 335).
"""

import functools

import numpy as np
import jax.numpy as jnp

from ... import constants as c


def sigma_levels(nlev, stretch=1.7):
    """Half-level sigma values [nlev+1]: 0 at top -> 1 at surface."""
    k = np.arange(nlev + 1) / nlev
    return k ** stretch


class VerticalCoords:
    """Precomputed vertical-coordinate operators (numpy at init, jnp after)."""

    def __init__(self, nlev, tref=300.0, sigma_half=None, dtype=jnp.float32):
        self.nlev = nlev
        self.tref = tref
        sh = sigma_levels(nlev) if sigma_half is None else np.asarray(sigma_half)
        assert sh.shape == (nlev + 1,)
        ds = sh[1:] - sh[:-1]                       # [L]
        sf = 0.5 * (sh[1:] + sh[:-1])               # full levels (midpoints)
        # ln ratios; top layer (sigma=0 at top edge) uses the IFS convention
        lnr = np.zeros(nlev)
        lnr[1:] = np.log(sh[2:] / sh[1:-1])
        lnr[0] = 1.0 + np.log(2.0)                  # effective value, unused rows guard
        alpha = np.zeros(nlev)
        alpha[1:] = 1.0 - sh[1:-1] / ds[1:] * lnr[1:]
        alpha[0] = np.log(2.0)                      # IFS top-layer alpha
        # geopotential matrix: Phi_k = Phi_s + R [ sum_{j>k} T_j lnr_j + T_k alpha_k ]
        G = np.zeros((nlev, nlev))
        for k in range(nlev):
            G[k, k] = c.rd * alpha[k]
            for j in range(k + 1, nlev):
                G[k, j] = c.rd * lnr[j]
        # omega/p linear operator: (omega/p)_k = V.grad(lnps) - (Pmat @ C)_k
        # with C_j = D_j + V_j . grad(lnps):
        #   (Pmat @ C)_k = (1/ds_k)[ lnr_k sum_{j<k} C_j ds_j + alpha_k C_k ds_k ]
        Pm = np.zeros((nlev, nlev))
        for k in range(nlev):
            Pm[k, k] = alpha[k]
            for j in range(k):
                Pm[k, j] = lnr[k] * ds[j] / ds[k]
        Pm[0, 0] = alpha[0]
        # semi-implicit: dT/dt |= -kappa Tref (Pmat @ D)  => W = -kappa Tref Pm
        W = -c.kappa * tref * Pm
        b = ds.copy()                                # dlnps/dt = -sum ds_j C_j

        self.sh = jnp.asarray(sh, dtype)
        self.sf = jnp.asarray(sf, dtype)
        self.ds = jnp.asarray(ds, dtype)
        self.lnr = jnp.asarray(lnr, dtype)
        self.alpha = jnp.asarray(alpha, dtype)
        self.G = jnp.asarray(G, dtype)
        self.Pmat = jnp.asarray(Pm, dtype)
        self.W = jnp.asarray(W, dtype)
        self.b = jnp.asarray(b, dtype)
        self._G64, self._W64, self._b64 = G, W, b

    @functools.lru_cache(maxsize=4)
    def implicit_inverse(self, dt, trunc, radius=c.a_earth):
        """[(trunc+2,), L, L] inverse matrices for the semi-implicit solve.

        M_n = I - dt^2 lam_n (G W - R Tref 1 b^T), lam_n = n(n+1)/a^2.
        Returned as one stacked jnp array indexed by total wavenumber n.
        """
        L = self.nlev
        GW = self._G64 @ self._W64 - c.rd * self.tref * np.outer(
            np.ones(L), self._b64)
        ns = np.arange(trunc + 2)
        lam = ns * (ns + 1) / radius ** 2
        eye = np.eye(L)
        Ms = np.stack([np.linalg.inv(eye - dt * dt * l * GW) for l in lam])
        return jnp.asarray(Ms, jnp.float32)

    def geopotential_half(self, T, phis=0.0):
        """Phi at half levels [..., L+1] from T [..., L] (top first).

        Phi_{k-1/2} = Phi_s + R sum_{j >= k} T_j lnr_j  (k = L..1);
        Phi at the bottom half level (surface) = Phi_s.
        """
        incr = c.rd * T * self.lnr                     # [..., L]
        csum = jnp.cumsum(incr[..., ::-1], axis=-1)[..., ::-1]
        phih = jnp.concatenate([csum, jnp.zeros_like(csum[..., :1])], axis=-1)
        return phis + phih

    def geopotential_full(self, T, phis=0.0):
        """Phi at full levels [..., L] (top first)."""
        return phis + jnp.einsum("kj,...j->...k", self.G, T)
