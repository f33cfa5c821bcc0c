"""Semi-Lagrangian advection for the spectral dycore (3-time-level SL-SI).

OpenIFS is a semi-Lagrangian spectral model: it runs TSTEP=900 s at T21
(/root/reference/oifs-input/fort.4:52) and ~720 s at TL639, far beyond the
Eulerian advective CFL. This module supplies that capability for the
TPU-native dycore: the classic three-time-level SL semi-implicit scheme of
the ECMWF lineage (Ritchie 1991; Ritchie et al. 1995), which slots into the
existing leapfrog semi-implicit solver (dycore.semi_implicit_step's matrices)
without changing its linear algebra:

    X+(x_a) = [X- + h L X-](x_d)  +  tau N(t)(x_m)  +  h L X+(x_a)

with tau the time window (2 dt; dt on the Euler start), h = tau/2, L the
semi-implicit linear operators (L_D = +lam (G T + R Tref pi), L_T = +W D,
L_pi = -b.D — vertical.py:102-131), x_d/x_m the departure/midpoint of the
great-circle trajectory, and N everything explicit minus L.

TPU mapping:
- Trajectories and momentum advection use 3-D CARTESIAN unit vectors:
  no pole problem, no metric terms, and the wind components are true
  scalars under interpolation (continuous across the poles), so ONE
  interpolation kernel serves winds and tracers alike.
- Departure interpolation is cubic Lagrange (lon: uniform tensor weights;
  lat: non-uniform Gaussian nodes) over an extended grid with NGHOST
  pole-mirrored rows; the 16 taps are XLA gathers batched over ALL fields
  at once (shared indices/weights), so the gather cost is amortized over
  the whole prognostic set.
- Everything is shape-static and jit-compiles into the same one-program
  step as the Eulerian path; grid-space work stays lat-band sharded under
  the P3 mesh (spharm.constrain_grid at the transform boundaries).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp

from ... import constants as c
from . import dycore


class SLGrid:
    """Precomputed geometry for trajectories + departure interpolation."""

    def __init__(self, sht, nghost=12):
        self.sht = sht
        self.nlat, self.nlon = sht.nlat, sht.nlon
        self.ng = ng = int(min(nghost, self.nlat))
        mu = np.asarray(sht.mu, np.float64)             # north -> south
        phi = np.arcsin(mu)
        lam = 2.0 * np.pi * np.arange(self.nlon) / self.nlon
        # extended latitude nodes (descending): pole-mirrored ghost rows
        phi_ext = np.concatenate([
            (np.pi - phi[:ng])[::-1], phi, (-np.pi - phi[-ng:])[::-1]])
        self.phi = jnp.asarray(phi, jnp.float32)
        self.phi_ext = jnp.asarray(phi_ext, jnp.float32)
        self.dlon = 2.0 * np.pi / self.nlon
        # local basis at grid points [3, nlat, nlon]
        ph = phi[:, None] + 0.0 * lam[None, :]
        lm = lam[None, :] + 0.0 * phi[:, None]
        cph, sph = np.cos(ph), np.sin(ph)
        clm, slm = np.cos(lm), np.sin(lm)
        r = np.stack([cph * clm, cph * slm, sph])
        e = np.stack([-slm, clm, np.zeros_like(clm)])
        n = np.stack([-sph * clm, -sph * slm, cph])
        self.r = jnp.asarray(r, jnp.float32)
        self.e = jnp.asarray(e, jnp.float32)
        self.n = jnp.asarray(n, jnp.float32)
        self.cosphi = jnp.asarray(cph, jnp.float32)      # [nlat, nlon]

    # ---- constant threading (see spharm.SpectralTransform.consts) -----
    _CONST_KEYS = ("e", "n", "r")

    def consts(self):
        return {k: getattr(self, k) for k in self._CONST_KEYS}

    @contextlib.contextmanager
    def bound(self, c):
        if not c:
            yield
            return
        old = {k: getattr(self, k) for k in c}
        for k, v in c.items():
            setattr(self, k, v)
        try:
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    # ---- extension + interpolation ------------------------------------

    def extend(self, f):
        """[..., nlat, nlon] -> [..., nlat+2 ng, nlon] with pole-mirrored
        ghost rows (value at lon + 180 deg; exact for scalars, and the
        Cartesian wind components ARE scalars on the sphere)."""
        ng, half = self.ng, self.nlon // 2
        north = jnp.roll(f[..., :ng, :], half, axis=-1)[..., ::-1, :]
        south = jnp.roll(f[..., -ng:, :], half, axis=-1)[..., ::-1, :]
        return jnp.concatenate([north, f, south], axis=-2)

    def _lat_taps(self, phi_t, k):
        """Indices j0 (topmost tap row, in extended coords) and the k
        surrounding node latitudes for target phi_t."""
        neg = -self.phi_ext                              # ascending
        j = jnp.searchsorted(neg, -phi_t, side="right") - 1
        # j: phi_ext[j] >= phi_t > phi_ext[j+1]
        j0 = j - (k - 2) // 2                            # cubic: j-1; linear: j
        j0 = jnp.clip(j0, 0, self.phi_ext.shape[0] - k)
        return j0

    @staticmethod
    def _lagrange(x, nodes):
        """Lagrange weights of `x` on `nodes` (list of k arrays shaped
        like x) -> list of k weight arrays.

        Taps and weights are kept as PER-TAP LISTS, never stacked on a
        trailing size-k axis: a [K, P, k] array with k in {2, 4}
        minormost gets tiled to (8, 128) lanes on TPU — 64x/32x HBM
        padding, which at TL639 (P = 640*1280) turned a 119 MB gather
        into a 7.4 GB allocation and OOMed the chip."""
        k = len(nodes)
        w = []
        for l in range(k):
            num, den = 1.0, 1.0
            for m in range(k):
                if m == l:
                    continue
                num = num * (x - nodes[m])
                den = den * (nodes[l] - nodes[m])
            w.append(num / den)
        return w

    def interp(self, fields, lam_t, phi_t, cubic=True):
        """Interpolate a stack of fields at target points.

        fields: [F, K, nlat, nlon] (K broadcast dim, e.g. levels; the
        lat/lon taps and weights are computed once and shared over F).
        lam_t, phi_t: [K, nlat, nlon] target angles (lam in [0, 2 pi)).
        Returns [F, K, nlat, nlon].
        """
        k = 4 if cubic else 2
        F = fields.shape[0]
        K = lam_t.shape[0]
        npts = K * self.nlat * self.nlon
        lam_f = lam_t.reshape(K, -1)
        phi_f = phi_t.reshape(K, -1)

        # ---- longitude taps + weights (uniform nodes)
        xi = lam_f / self.dlon
        i1 = jnp.floor(xi).astype(jnp.int32)
        t = xi - i1                                       # in [0, 1)
        # per-tap LISTS of [K, P] arrays (see _lagrange: a trailing
        # size-k axis would be lane-padded 64x/32x on TPU)
        if cubic:
            tt = t
            wlon = [
                -tt * (tt - 1.0) * (tt - 2.0) / 6.0,
                (tt * tt - 1.0) * (tt - 2.0) / 2.0,
                -tt * (tt + 1.0) * (tt - 2.0) / 2.0,
                tt * (tt * tt - 1.0) / 6.0]
            di0 = -1
        else:
            wlon = [1.0 - t, t]
            di0 = 0

        # ---- latitude taps + weights (non-uniform Gaussian nodes)
        j0 = self._lat_taps(phi_f, k)                     # [K, P]
        nodes = [self.phi_ext[j0 + l] for l in range(k)]  # k x [K, P]
        wlat = self._lagrange(phi_f, nodes)               # k x [K, P]

        ext = self.extend(fields)                         # [F, K, J_ext, nlon]
        ext_flat = ext.reshape(F, K, -1)                  # [F, K, J_ext*nlon]

        # taps accumulated under lax.scan with the gather index computed
        # INSIDE the body: an unrolled k*k loop keeps all 16 index
        # buffers and gather temporaries live at once, which at TL639
        # fragmented HBM by ~9.5 GB (67% fragmentation) and OOMed, and
        # pre-stacked [k2, K, P] index/weight arrays cost 2.4 GB of scan
        # inputs at that size. Per-tap weights index the small [k, K, P]
        # leading-axis stacks (layout-safe). Summation order is identical
        # to the unrolled loop (bitwise-same result). Indices are in
        # bounds by construction (j0 clipped, col wrapped) ->
        # promise_in_bounds skips the clamp/select of the default mode.
        wlat_s = jnp.stack(wlat)                          # [k, K, P]
        wlon_s = jnp.stack(wlon)                          # [k, K, P]

        def tap(acc, t):
            dj = t // k
            di = t % k
            row = (j0 + dj) * self.nlon                   # [K, P]
            col = jnp.remainder(i1 + di0 + di, self.nlon)
            idx = row + col
            w = wlat_s[dj] * wlon_s[di]
            vals = jnp.take_along_axis(
                ext_flat, jnp.broadcast_to(idx[None], (F,) + idx.shape),
                axis=-1, mode="promise_in_bounds")
            return acc + vals * w[None], None

        out = jnp.zeros((F, K, lam_f.shape[-1]), fields.dtype)
        out, _ = jax.lax.scan(tap, out, jnp.arange(k * k))
        return out.reshape((F, K, self.nlat, self.nlon))

    # ---- trajectories ---------------------------------------------------

    @staticmethod
    def _angles(rv):
        """Unit vectors [3, ...] -> (lam in [0, 2 pi), phi)."""
        phi = jnp.arcsin(jnp.clip(rv[2], -1.0, 1.0))
        lam = jnp.arctan2(rv[1], rv[0])
        lam = jnp.where(lam < 0.0, lam + 2.0 * np.pi, lam)
        return lam, phi

    def trajectories(self, u, v, half_tau, radius, iters=2):
        """Great-circle departure/midpoint angles from winds at time t.

        u, v: [K, nlat, nlon]. Returns (lam_d, phi_d), (lam_m, phi_m),
        each [K, nlat, nlon]. Midpoint iteration (McDonald 1986 fixed
        point): r_m <- normalize(r_a - (tau/2) V(r_m)/a); departure =
        arrival reflected through the midpoint (exact great-circle).
        """
        K = u.shape[0]
        e = self.e[:, None]
        n = self.n[:, None]
        r_a = jnp.broadcast_to(self.r[:, None],
                               (3, K, self.nlat, self.nlon))
        V3 = u[None] * e + v[None] * n                    # [3, K, ...]
        s = half_tau / radius
        # first guess: winds at the arrival point
        r_m = r_a - s * V3
        r_m = r_m / jnp.linalg.norm(r_m, axis=0, keepdims=True)
        for _ in range(max(iters - 1, 0)):
            lam_m, phi_m = self._angles(r_m)
            Vm = self.interp(V3, lam_m, phi_m, cubic=False)
            # keep the interpolated wind tangent at the midpoint
            Vm = Vm - jnp.sum(Vm * r_m, axis=0, keepdims=True) * r_m
            r_m = r_a - s * Vm
            r_m = r_m / jnp.linalg.norm(r_m, axis=0, keepdims=True)
        lam_m, phi_m = self._angles(r_m)
        dot = jnp.sum(r_a * r_m, axis=0, keepdims=True)
        r_d = 2.0 * dot * r_m - r_a
        lam_d, phi_d = self._angles(r_d)
        return (lam_d, phi_d), (lam_m, phi_m)


def _stack(*fields):
    return jnp.stack(fields, axis=0)


def _coriolis_inverse(W, r3, a):
    """Solve V + a (r x V) = W analytically for tangent V (W tangent).

    The arrival half of the TRAPEZOIDAL Coriolis treatment along the
    trajectory: unconditionally stable in f dt (an explicit midpoint
    Coriolis term goes unstable once f dt > 1, which TL639-class steps
    approach at the poles), and exactly preserves a resting atmosphere.
    """
    rxW = jnp.cross(r3, W, axis=0)
    return (W - a * rxW) / (1.0 + a * a)


def sl_step(sht, vc, slg: SLGrid, now, prev, tau, decenter=0.1):
    """One 3TL semi-Lagrangian semi-implicit step: prev -> new over tau.

    Replaces dycore.tendencies + semi_implicit_step when
    GCMConfig.advection == "sl". Same prognostics, same SI matrices
    (vertical.py), same downstream hyperdiffusion/Robert filter.

    ``decenter``: first-order off-centering of the semi-implicit GRAVITY
    terms — the implicit (arrival) half-weight is (1+eps) h, the
    explicit (departure) half-weight (1-eps) h. A CENTERED 3TL SL-SI
    scheme supports a slowly-amplifying spurious gravity-wave resonance;
    in the HS94 T42/L19 climatology it grows from the model top at the
    poles until NaN near day 47 REGARDLESS of vertical coordinate or
    lnps diffusion (round-4 bisection: sigma and hybrid blow up
    identically, Eulerian is stable). Off-centering is the standard
    IFS-lineage remedy and damps exactly this mode. The Coriolis
    trapezoid stays centered (see the note at V3_comb: off-centering a
    rotation damps the jets themselves).
    """
    L = vc.nlev
    h = tau / 2.0
    ha = (1.0 + decenter) * h          # implicit / arrival half
    hd = (1.0 - decenter) * h          # explicit / departure half
    a = sht.radius
    _P = jax.lax.Precision.HIGHEST

    g = dycore.to_grid(sht, vc, now)          # arrival-time fields
    gp = dycore.to_grid(sht, vc, prev)        # departure-time fields
    hc = dycore._hybrid_coeffs_grid(vc, g.lnps)

    # ---- vertical velocity + hybrid coefficients at time t --------------
    dpx, dpy = sht.grad(now.lnps)
    vgrad = g.u * dpx[None] + g.v * dpy[None]
    if hc is None:
        ds = vc.ds[:, None, None]
        Ct = (g.div + vgrad) * ds
        dpt = None
        dpt_full = ds
        Bh = vc.sh
        wp = 1.0
        wbar = vc.ds
    else:
        dpt = hc["dpt"]
        dpt_full = dpt
        Ct = g.div * dpt + vc.dB[:, None, None] * vgrad
        Bh = vc.B
        wp = hc["wp"]
        wbar = vc.dB
    csum = jnp.cumsum(Ct, axis=0)
    total = csum[-1:]
    sdot_int = Bh[1:-1, None, None] * total - csum[:-1]
    zero = jnp.zeros_like(sdot_int[:1])
    sdot = jnp.concatenate([zero, sdot_int, zero], axis=0)

    # ---- trajectories ----------------------------------------------------
    (lam_d, phi_d), (lam_m, phi_m) = slg.trajectories(g.u, g.v, h, a)
    # 2-D trajectory of the mass-weighted mean wind (continuity equation:
    # d(lnps)/dt following ubar = -sum_k dpt_k D_k in sigma/hybrid form)
    ubar = jnp.einsum("k,kij->ij", wbar, g.u, precision=_P)[None]
    vbar = jnp.einsum("k,kij->ij", wbar, g.v, precision=_P)[None]
    (lam_d2, phi_d2), (lam_m2, phi_m2) = slg.trajectories(ubar, vbar, h, a)

    # ---- departure-time combined fields  X- + h (L X)-  ------------------
    # gamma = G T + R Tref pi (the implicitly-treated geopotential head)
    gamma_p = (jnp.einsum("kj,j...->k...", vc.G.astype(prev.T.dtype), prev.T,
                          precision=_P)
               + c.rd * vc.tref * prev.lnps[None])
    dgx_p, dgy_p = sht.grad(gamma_p)                     # [L, nlat, nlon]
    WD_p = sht.synthesize(jnp.einsum("kj,j...->k...",
                                     vc.W.astype(prev.div.dtype), prev.div,
                                     precision=_P))
    bD_p = sht.synthesize(jnp.einsum("j,j...->...",
                                     vc.b.astype(prev.div.dtype), prev.div,
                                     precision=_P))
    e3, n3 = slg.e[:, None], slg.n[:, None]
    r3 = slg.r[:, None]
    # Coriolis parameter as a grid field (traditional approximation,
    # matching the Eulerian path); treated trapezoidally: half at the
    # departure point (folded into the interpolated field below), half
    # implicitly at arrival (_coriolis_inverse)
    fcor = 2.0 * c.omega * slg.r[2][None]                # [1, nlat, nlon]
    V3_p = gp.u[None] * e3 + gp.v[None] * n3             # [3, L, ...]
    grad_gamma_p3 = dgx_p[None] * e3 + dgy_p[None] * n3
    # Coriolis stays CENTERED (h both halves): the explicit+implicit
    # rotation pair is norm-neutral only at equal weights — off-centering
    # it damps rotational flow at ~eps (f h)^2 per step, which at the
    # poles e-folds the jets in ~2 days (observed: decentered run's umax
    # decaying 19 -> 11 m/s over 100 days). Only the gravity terms
    # (gamma/W/b) carry the ha/hd off-centering.
    V3_comb = (V3_p - h * fcor[None] * jnp.cross(r3, V3_p, axis=0)
               - hd * grad_gamma_p3)                     # + h Cor + hd L
    T_comb = gp.T + hd * WD_p
    pi_comb = gp.lnps[None] - hd * bD_p[None]            # [1, nlat, nlon]

    # ---- midpoint nonlinear terms N(t) -----------------------------------
    # momentum: N_V = -vertadv(V) - Rd T wp grad(pi) - grad(Phi)
    #                 + grad(gamma)   (Coriolis is in the trapezoid)
    if hc is None:
        phi_spec = jnp.einsum("kj,j...->k...", vc.G.astype(now.T.dtype),
                              now.T, precision=_P)
    else:
        T_last = jnp.moveaxis(g.T, 0, -1)
        phi_grid = vc.geopotential_full(
            T_last, lnr=jnp.moveaxis(hc["lnr"], 0, -1),
            alpha=jnp.moveaxis(hc["alpha"], 0, -1))
        phi_spec = sht.analyze(jnp.moveaxis(phi_grid, -1, 0)).astype(
            now.T.dtype)
    dphx, dphy = sht.grad(phi_spec)
    gamma_n = (jnp.einsum("kj,j...->k...", vc.G.astype(now.T.dtype), now.T,
                          precision=_P)
               + c.rd * vc.tref * now.lnps[None])
    dgx_n, dgy_n = sht.grad(gamma_n)
    # full PGF = -Rd T wp grad(pi) - grad(Phi); adding grad(gamma) leaves
    # the explicit residual (the Tref parts cancel exactly on sigma)
    Fx = -c.rd * g.T * wp * dpx[None] - dphx + dgx_n
    Fy = -c.rd * g.T * wp * dpy[None] - dphy + dgy_n
    adv_u = dycore._vert_advect(vc, sdot, g.u, dpt)
    adv_v = dycore._vert_advect(vc, sdot, g.v, dpt)
    N_V3 = (-(adv_u[None] * e3 + adv_v[None] * n3)
            + Fx[None] * e3 + Fy[None] * n3)

    # T: N_T = kappa T omega/p - vertadv(T) - W D
    WD_n = sht.synthesize(jnp.einsum("kj,j...->k...",
                                     vc.W.astype(now.div.dtype), now.div,
                                     precision=_P))
    N_T = (c.kappa * g.T * g.omega_p
           - dycore._vert_advect(vc, sdot, g.T, dpt) - WD_n)

    # lnps: N_pi = -sum_k dpt_k D_k + b.D  (zero on pure sigma at the
    # reference state; nonzero through the actual hybrid thicknesses)
    bD_n = sht.synthesize(jnp.einsum("j,j...->...",
                                     vc.b.astype(now.div.dtype), now.div,
                                     precision=_P))
    N_pi = (-jnp.sum(dpt_full * g.div, axis=0) + bD_n)[None]

    # tracers: only vertical advection is explicit (horizontal transport
    # IS the trajectory)
    N_q = -dycore._vert_advect(vc, sdot, g.q, dpt)
    N_ql = -dycore._vert_advect(vc, sdot, g.ql, dpt)
    N_qi = -dycore._vert_advect(vc, sdot, g.qi, dpt)
    N_a = -dycore._vert_advect(vc, sdot, g.a, dpt)

    # ---- interpolate: cubic at departure, linear at midpoint -------------
    dep_fields = jnp.concatenate([
        V3_comb,                                  # 3 x [L]
        _stack(T_comb, gp.q, gp.ql, gp.qi, gp.a).reshape(5, L, slg.nlat,
                                                         slg.nlon),
    ], axis=0)                                    # [8, L, nlat, nlon]
    dep_vals = slg.interp(dep_fields, lam_d, phi_d, cubic=True)
    mid_fields = jnp.concatenate([
        N_V3,
        _stack(N_T, N_q, N_ql, N_qi, N_a).reshape(5, L, slg.nlat, slg.nlon),
    ], axis=0)
    mid_vals = slg.interp(mid_fields, lam_m, phi_m, cubic=False)

    W3 = dep_vals[:3] + tau * mid_vals[:3]
    # tangent projection at the arrival point (removes the constraint
    # component), then the implicit arrival half of the Coriolis trapezoid
    W3 = W3 - jnp.sum(W3 * r3, axis=0, keepdims=True) * r3
    V3_t = _coriolis_inverse(W3, r3, h * fcor[None])
    u_t = jnp.sum(V3_t * e3, axis=0)
    v_t = jnp.sum(V3_t * n3, axis=0)

    arrived = dep_vals[3:] + tau * mid_vals[3:]
    T_t, q_t, ql_t, qi_t, a_t = [arrived[i] for i in range(5)]

    # pi is 2-D: fields [F=1, K=1, nlat, nlon], targets [K=1, nlat, nlon]
    pi_dep = slg.interp(pi_comb[None], lam_d2, phi_d2, cubic=True)
    pi_mid = slg.interp(N_pi[None], lam_m2, phi_m2, cubic=False)
    pi_t = (pi_dep + tau * pi_mid)[0, 0]

    # ---- spectral analysis + semi-implicit solve at arrival ---------------
    vort_new, D_tilde = sht.vort_div_from_uv(u_t, v_t)
    T_tilde = sht.analyze(T_t).astype(now.T.dtype)
    pi_tilde = sht.analyze(pi_t).astype(now.lnps.dtype)

    Minv = vc.implicit_inverse(ha, sht.trunc)
    lam_op = (-sht.laplacian)[..., None]                 # +n(n+1)/a^2
    rhs = D_tilde + ha * lam_op[None] * (
        jnp.einsum("kj,j...->k...", vc.G.astype(T_tilde.dtype), T_tilde,
                   precision=_P)
        + c.rd * vc.tref * pi_tilde[None])
    div_new = jnp.einsum("nlj,jmnc->lmnc", Minv.astype(rhs.dtype), rhs,
                         precision=_P)
    T_new = T_tilde + ha * jnp.einsum("kj,j...->k...",
                                      vc.W.astype(div_new.dtype), div_new,
                                      precision=_P)
    pi_new = pi_tilde - ha * jnp.einsum("j,j...->...",
                                        vc.b.astype(div_new.dtype), div_new,
                                        precision=_P)

    mask = sht.mask[..., None]
    return dycore.SpectralState(
        vort=vort_new * mask, div=div_new * mask, T=T_new * mask,
        lnps=pi_new * mask,
        q=sht.analyze(q_t).astype(now.q.dtype),
        ql=sht.analyze(ql_t).astype(now.ql.dtype),
        qi=sht.analyze(qi_t).astype(now.qi.dtype),
        a=sht.analyze(a_t).astype(now.a.dtype))
