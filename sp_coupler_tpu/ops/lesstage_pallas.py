"""Pallas TPU mega-kernel: one full LES RK stage in a single pass.

Fuses EVERYTHING between two pressure projections — saturation
adjustment, Deardorff TKE closure (strain, stability, eddy viscosities),
5th-order scalar advection + diffusion, momentum advection + subgrid
stress, surface drag & prescribed fluxes, buoyancy, TKE sources, rain
microphysics, coupler forcings, sponge layer, and the Wicker-Skamarock
axpy update — into ONE kernel over z-slabs of the plane-flattened
[nz, P = ny*nx] layout shared with ops/lesflat_pallas.py.

Motivation (measured, v5e, 2x 64x64x160): the split pipeline (XLA
closure ~1.0 ms + Pallas scalar kernel 1.2 ms + Pallas momentum 1.0 ms +
XLA micro 0.9 ms + XLA axpy update) re-reads the state ~6x from HBM at
~245 GB/s effective. This kernel reads each prognostic field once
(+1.5x z-halo amplification at bz=32) and writes the updated state once:
~55 MB per instance per stage vs ~350 MB — the HBM roofline for the
whole stage.

Numerical semantics replicate models/les/step.py tendencies() + the
stage update exactly (same stencils as the DALES-equivalent XLA path;
boundary one-sided differences reproduced with global-z-index masks over
edge-padded halos). Slab means (sponge, N^2, qt-forcing modes) are
per-z-plane lane reductions, available because each sublane row holds a
full horizontal plane. Reference semantics: DALES iadv=52 advection,
lsmagorinsky=.false. TKE scheme, warm-rain micro, as consumed through
the coupling surface of /root/reference/splib/spcpl.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as c
from ..models.les import subgrid as sg
from .lesflat_pallas import ZP, LANE, _rollx, _face5

E = 3  # z extension for in-kernel closure halos (Km needed at +-2,
#        velocity gradients at +-3); must be <= ZP

# profile-pack lane indices; lanes 8-11 carry the z-independent run
# scalars (dt, surface fluxes, z0m) replicated along z — TPU block shapes
# must tile to (8, 128), so a separate tiny scalar operand cannot lower
(P_PBF, P_RHOF, P_RHL, P_RHH, P_FU, P_FV, P_FTHL, P_FQT,
 P_SDT, P_SWTHL, P_SWQT, P_SZ0M) = range(12)


def _sat_adjust(thl, qt, p, n_iter):
    """Inline of utils/thermo.sat_adjust (elementwise, VPU)."""
    ex = (p / c.pref0) ** (c.rd / c.cp)
    T = thl * ex
    ql = jnp.zeros_like(qt)
    for _ in range(n_iter):
        es = c.es0 * jnp.exp(c.at_liq * (T - c.tmelt) / (T - c.bt_liq))
        es = jnp.minimum(es, 0.9 * p)
        qs = (c.rd / c.rv) * es / (p - (1.0 - c.rd / c.rv) * es)
        dqsdt = qs * c.rlv / (c.rv * T * T)
        ql = jnp.maximum((qt - qs + dqsdt * (T - thl * ex)) /
                         (1.0 + c.rlv / c.cp * dqsdt), 0.0)
        T = thl * ex + c.rlv * ql / c.cp
    es = c.es0 * jnp.exp(c.at_liq * (T - c.tmelt) / (T - c.bt_liq))
    es = jnp.minimum(es, 0.9 * p)
    qs = (c.rd / c.rv) * es / (p - (1.0 - c.rd / c.rv) * es)
    return T, ql, qs


def _fetch(u_hbm, v_hbm, w_hbm, s_hbm, p_hbm,
           u_sl, v_sl, w_sl, s_sl, p_sl, sems,
           slot, b, zz, *, bz, nz, start):
    """Issue (start=True) or reconstruct-and-wait (start=False) the 5 slab
    copies for block (b, zz) into double-buffer `slot`.

    Sources are UNPADDED [.., nz(+1), ..] arrays; the z-halo is fetched by
    clamping the source range and edge-replicating the missing rows in
    VMEM afterwards (_edge_fixup) — this removes the 7 full-field
    jnp.pad round-trips through HBM that the padded layout cost."""
    nblk = nz // bz
    HW = bz + 2 * ZP

    def copies(gl, nu, nw, dst):
        # gl = zz*bz - ZP with bz, ZP multiples of 8: provably sublane-
        # tile aligned, but Mosaic needs the hint for the dynamic start
        if not isinstance(gl, int):
            gl = pl.multiple_of(gl, ZP)
        return [
            pltpu.make_async_copy(u_hbm.at[b, pl.ds(gl, nu)],
                                  u_sl.at[slot, pl.ds(dst, nu)],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, pl.ds(gl, nu)],
                                  v_sl.at[slot, pl.ds(dst, nu)],
                                  sems.at[slot, 1]),
            pltpu.make_async_copy(w_hbm.at[b, pl.ds(gl, nw)],
                                  w_sl.at[slot, pl.ds(dst, nw)],
                                  sems.at[slot, 2]),
            pltpu.make_async_copy(s_hbm.at[b, :, pl.ds(gl, nu)],
                                  s_sl.at[slot, :, pl.ds(dst, nu)],
                                  sems.at[slot, 3]),
            pltpu.make_async_copy(p_hbm.at[b, pl.ds(gl, nu)],
                                  p_sl.at[slot, pl.ds(dst, nu)],
                                  sems.at[slot, 4]),
        ]

    def act(cps):
        for cp in cps:
            if start:
                cp.start()
            else:
                cp.wait()

    # w's top face (index nz) is never fetched: HBM slice sizes must be
    # 8-row aligned, and that face is identically zero anyway (rigid lid —
    # a state invariant maintained by the projection). _edge_fixup zeroes
    # the rows at and above it.
    if nblk == 1:
        act(copies(0, nz, nz, ZP))
        return

    @pl.when(zz == 0)
    def _():
        act(copies(0, bz + ZP, bz + ZP, ZP))

    @pl.when(jnp.logical_and(zz > 0, zz < nblk - 1))
    def _():
        act(copies(zz * bz - ZP, HW, HW, 0))

    @pl.when(zz == nblk - 1)
    def _():
        act(copies(zz * bz - ZP, bz + ZP, bz + ZP, 0))


def _edge_fixup(u_sl, v_sl, w_sl, s_sl, p_sl, slot, zz, *, bz, nz):
    """Edge-replicate the halo rows the clamped fetch could not read
    (pad-mode="edge" semantics of the former padded layout)."""
    nblk = nz // bz
    first = (zz == 0) if nblk > 1 else True
    last = (zz == nblk - 1) if nblk > 1 else True
    P = u_sl.shape[-1]
    S = s_sl.shape[1]
    LN = p_sl.shape[-1]

    @pl.when(first)
    def _():
        for ref in (u_sl, v_sl, w_sl):
            ref[slot, 0:ZP] = jnp.broadcast_to(ref[slot, ZP:ZP + 1],
                                               (ZP, P))
        s_sl[slot, :, 0:ZP] = jnp.broadcast_to(s_sl[slot, :, ZP:ZP + 1],
                                               (S, ZP, P))
        p_sl[slot, 0:ZP] = jnp.broadcast_to(p_sl[slot, ZP:ZP + 1], (ZP, LN))

    @pl.when(last)
    def _():
        lo = ZP + bz
        for ref in (u_sl, v_sl):
            ref[slot, lo:lo + ZP] = jnp.broadcast_to(
                ref[slot, lo - 1:lo], (ZP, P))
        # w rows at and above face nz: that face is identically zero
        # (rigid lid), and edge replication of it is therefore zero too
        w_sl[slot, lo:lo + ZP] = jnp.zeros((ZP, P), jnp.float32)
        s_sl[slot, :, lo:lo + ZP] = jnp.broadcast_to(
            s_sl[slot, :, lo - 1:lo], (S, ZP, P))
        p_sl[slot, lo:lo + ZP] = jnp.broadcast_to(
            p_sl[slot, lo - 1:lo], (ZP, LN))


def _kernel(up_hbm, vp_hbm, wp_hbm, sp_hbm, prof_hbm,
            ub_ref, vb_ref, wb_ref, sb_ref,
            un_ref, vn_ref, wn_ref, sn_ref,
            kmax_ref, ustar2_ref, rain_ref,
            u_sl, v_sl, w_sl, s_sl, p_sl, sems,
            *, bz, nx, dx, dy, dz, nz, scheme, qt_mode, f_cor,
            sponge_depth, sponge_tau, n_sat_iter, fdt,
            nc0, auto_k, accr_k, evap_tau, sed_a, sed_b,
            ice_tau, ice_qi0, sed_ai, sed_bi):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    z0 = zi * bz
    nblk = nz // bz
    n_inst = pl.num_programs(0)
    lin = b * nblk + zi
    slot = jax.lax.rem(lin, 2)

    fetch = functools.partial(
        _fetch, up_hbm, vp_hbm, wp_hbm, sp_hbm, prof_hbm,
        u_sl, v_sl, w_sl, s_sl, p_sl, sems, bz=bz, nz=nz)

    # double-buffered pipeline over the sequential (b, zi) grid: program
    # `lin` waits on the fetch started by program lin-1 (or by itself for
    # lin==0) while the fetch for lin+1 is already in flight
    @pl.when(lin == 0)
    def _():
        fetch(slot, b, zi, start=True)
    nxt_b = jnp.where(zi + 1 < nblk, b, b + 1)
    nxt_z = jnp.where(zi + 1 < nblk, zi + 1, 0)

    @pl.when(lin + 1 < n_inst * nblk)
    def _():
        fetch(1 - slot, nxt_b, nxt_z, start=True)
    fetch(slot, b, zi, start=False)
    _edge_fixup(u_sl, v_sl, w_sl, s_sl, p_sl, slot, zi, bz=bz, nz=nz)

    ct = ZP
    dtv = p_sl[slot, ct, P_SDT]
    wthl_s = p_sl[slot, ct, P_SWTHL]
    wqt_s = p_sl[slot, ct, P_SWQT]
    z0m_s = p_sl[slot, ct, P_SZ0M]

    # --- window helpers: rows [ct+lo, ct+bz+hi) of a [*, P] slab ---
    def W(ref, lo=0, hi=0):
        return ref[slot, ct + lo:ct + bz + hi]

    def WS(si, lo=0, hi=0):                    # scalar stack member
        return s_sl[slot, si, ct + lo:ct + bz + hi]

    def prof(lane, lo=0, hi=0):                # [bz+hi-lo, 1] profile column
        return p_sl[slot, ct + lo:ct + bz + hi, lane:lane + 1]

    def giota(lo=0, hi=0):                     # global z index per row
        L = bz + hi - lo
        i = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        return i + (z0 + lo)

    shx = functools.partial(_rollx, nx=nx)
    shy = lambda a, k: jnp.roll(a, k * nx, -1)
    f32 = jnp.float32

    # ---- thermodynamics on the extended range [-E, bz+E) ----
    thl_e = WS(0, -E, E)
    qt_e = WS(1, -E, E)
    qr_e = WS(2, -E, E)
    pbf_e = prof(P_PBF, -E, E)
    T_e, ql_e, qs_e = _sat_adjust(thl_e, qt_e, pbf_e, n_sat_iter)
    iex_e = (pbf_e / c.pref0) ** (-c.rd / c.cp)
    thv_e = T_e * iex_e * (1.0 + c.eps_i * (qt_e - ql_e) - ql_e - qr_e)
    thv_m_e = jnp.mean(thv_e, axis=-1, keepdims=True)          # [bz+2E, 1]

    # ---- TKE closure on [-2, bz+2) (Km consumed at +-2 by w-diffusion) --
    # boundary factor: edge-padded centered z-diffs are half the one-sided
    # value at the global ends
    g2 = giota(-2, 2)
    bmask2 = jnp.where((g2 == 0) | (g2 == nz - 1), f32(2.0), f32(1.0))
    u_2 = W(u_sl, -2, 2)
    v_2 = W(v_sl, -2, 2)
    w_2lo = W(w_sl, -2, 2)          # face g
    w_2hi = W(w_sl, -1, 3)          # face g+1
    dudx = (shx(u_2, -1) - u_2) / dx
    dvdy = (shy(v_2, -1) - v_2) / dy
    dwdz = (w_2hi - w_2lo) / dz
    uc_2 = 0.5 * (u_2 + shx(u_2, -1))
    vc_2 = 0.5 * (v_2 + shy(v_2, -1))
    wc_2 = 0.5 * (w_2lo + w_2hi)
    uc_p = 0.5 * (W(u_sl, -1, 3) + shx(W(u_sl, -1, 3), -1))
    uc_m = 0.5 * (W(u_sl, -3, 1) + shx(W(u_sl, -3, 1), -1))
    vc_p = 0.5 * (W(v_sl, -1, 3) + shy(W(v_sl, -1, 3), -1))
    vc_m = 0.5 * (W(v_sl, -3, 1) + shy(W(v_sl, -3, 1), -1))
    dudy = (shy(uc_2, -1) - shy(uc_2, 1)) / (2 * dy)
    dudz = bmask2 * (uc_p - uc_m) / (2 * dz)
    dvdx = (shx(vc_2, -1) - shx(vc_2, 1)) / (2 * dx)
    dvdz = bmask2 * (vc_p - vc_m) / (2 * dz)
    dwdx = (shx(wc_2, -1) - shx(wc_2, 1)) / (2 * dx)
    dwdy = (shy(wc_2, -1) - shy(wc_2, 1)) / (2 * dy)
    S2 = (2.0 * (dudx ** 2 + dvdy ** 2 + dwdz ** 2)
          + (dudy + dvdx) ** 2 + (dudz + dwdx) ** 2 + (dvdz + dwdy) ** 2)
    thvm_p = thv_m_e[E - 1:E + bz + 3]         # mean at g+1  (rows -1..bz+2)
    thvm_0 = thv_m_e[E - 2:E + bz + 2]         # mean at g    (rows -2..bz+1)
    thvm_m = thv_m_e[E - 3:E + bz + 1]         # mean at g-1
    dthv = bmask2 * (thvm_p - thvm_m) / (2.0 * dz)
    N2 = c.grav / jnp.maximum(thvm_0, 1.0) * dthv              # [bz+4, 1]
    e12_2 = jnp.maximum(WS(3, -2, 2), sg.E12_MIN)
    delta = (dx * dy * dz) ** (1.0 / 3.0)
    lam_stable = sg.CN * e12_2 / jnp.sqrt(jnp.maximum(N2, 1e-10))
    lam = jnp.where(N2 > 1e-10, jnp.minimum(f32(delta), lam_stable),
                    f32(delta))
    Km2 = sg.CM * lam * e12_2                                  # [bz+4, P]
    Kh2 = (sg.CH1 + sg.CH2 * lam / delta) * Km2

    # interior views (rows 2..bz+2 of the [-2, +2) arrays)
    Km0 = Km2[2:2 + bz]
    Kmm = Km2[1:1 + bz]
    Kmp = Km2[3:3 + bz]
    Kmmm = Km2[0:bz]
    Kh0 = Kh2[2:2 + bz]
    Khm = Kh2[1:1 + bz]
    Khp = Kh2[3:3 + bz]

    # ---- coefficients from the profile pack ----
    rf = prof(P_RHOF)                       # rhobf[g]
    rf_m1 = prof(P_RHOF, -1, -1)            # rhobf[g-1] (edge pad at g=0)
    rf_p1 = prof(P_RHOF, 1, 1)
    rh_lo = prof(P_RHL)                     # rhobh[g]
    rh_hi = prof(P_RHH)                     # rhobh[g+1]
    irf = 1.0 / (rf * dz)
    irh = 1.0 / (rh_lo * dz)
    g0 = giota()
    is0 = (g0 == 0)
    m0 = jnp.where(is0, f32(0.0), f32(1.0))
    fmv = jnp.where(is0 | (g0 == nz - 1), f32(0.0), f32(1.0))
    gm1 = g0 - 1
    fm_m1 = jnp.where((gm1 == 0) | (gm1 == nz - 1) | (gm1 < 0),
                      f32(0.0), f32(1.0))
    rf_m1 = rf_m1 * m0                      # rhobf[k-1] -> 0 at k=0

    # ---- state views, interior ----
    u0 = W(u_sl)
    um = W(u_sl, -1, -1)
    up = W(u_sl, 1, 1)
    v0 = W(v_sl)
    vm = W(v_sl, -1, -1)
    vp = W(v_sl, 1, 1)
    w_k = W(w_sl)                           # face g
    w_km1 = W(w_sl, -1, -1)
    w_k1 = W(w_sl, 1, 1)

    # ---- surface drag (plane g=0; rows of this slab are masked) ----
    u0p = u_sl[slot, ct:ct + 1]             # local plane z0 [1, P]
    v0p = v_sl[slot, ct:ct + 1]
    u1c = 0.5 * (u0p + shx(u0p, -1))
    v1c = 0.5 * (v0p + shy(v0p, -1))
    U1 = jnp.sqrt(u1c ** 2 + v1c ** 2 + 1e-4)
    cd = (sg.KAPPA / jnp.log(0.5 * dz / jnp.maximum(z0m_s, 1e-6))) ** 2
    ustar2 = cd * U1 ** 2
    fluxu_c = -ustar2 * u1c / U1
    fluxv_c = -ustar2 * v1c / U1
    fu_pl = 0.5 * (shx(fluxu_c, 1) + fluxu_c)
    fv_pl = 0.5 * (shy(fluxv_c, 1) + fluxv_c)
    # aux outputs are (8, 128) accumulator blocks revisited across the zi
    # grid dimension (written back to HBM once per instance b); the
    # surface quantities are only valid in the zi=0 slab
    @pl.when(zi == 0)
    def _():
        ustar2_ref[0] = jnp.full((8, LANE), jnp.mean(ustar2), f32)

    # ---- scalar tendencies (thl, qt, qr share Kh; e12 uses 2 Km) ----
    wr_lo = w_k * rh_lo
    wr_hi = w_k1 * rh_hi
    Khx = 0.5 * (shx(Kh0, 1) + Kh0)
    Khy = 0.5 * (shy(Kh0, 1) + Kh0)
    Kex = 0.5 * (shx(Km0, 1) + Km0) * 2.0
    Key = 0.5 * (shy(Km0, 1) + Km0) * 2.0

    def scal_tend(si, K0, Km_, Kp_, Kx, Ky):
        s0 = WS(si)
        sm_ = WS(si, -1, -1)
        sp_ = WS(si, 1, 1)
        Fx = u0 * _face5(s0, u0, shx)
        Fy = v0 * _face5(s0, v0, shy)
        tend = -(shx(Fx, -1) - Fx) / dx - (shy(Fy, -1) - Fy) / dy
        tend = tend - (wr_hi * 0.5 * (s0 + sp_)
                       - wr_lo * 0.5 * (sm_ + s0)) * irf
        Fdx = -Kx * (s0 - shx(s0, 1)) / dx
        tend = tend - (shx(Fdx, -1) - Fdx) / dx
        Fdy = -Ky * (s0 - shy(s0, 1)) / dy
        tend = tend - (shy(Fdy, -1) - Fdy) / dy
        Fz_lo = -rh_lo * 0.5 * (Km_ + K0) * (s0 - sm_) / dz
        Fz_hi = -rh_hi * 0.5 * (K0 + Kp_) * (sp_ - s0) / dz
        return tend - (Fz_hi - Fz_lo) * irf

    dthl = scal_tend(0, Kh0, Khm, Khp, Khx, Khy)
    dqt = scal_tend(1, Kh0, Khm, Khp, Khx, Khy)
    dqr = scal_tend(2, Kh0, Khm, Khp, Khx, Khy)
    de12 = scal_tend(3, 2.0 * Km0, 2.0 * Kmm, 2.0 * Kmp, Kex, Key)
    # prescribed surface fluxes: bottom-face flux on plane g=0
    sfc = jnp.where(is0, rh_lo * irf, f32(0.0))
    dthl = dthl + sfc * wthl_s
    dqt = dqt + sfc * wqt_s

    # ---- momentum tendencies (2nd-order advection + diffusion) ----
    uc = 0.5 * (u0 + shx(u0, -1))
    Fx = uc * uc
    du = -(Fx - shx(Fx, 1)) / dx
    vbx = 0.5 * (shx(v0, 1) + v0)
    uby = 0.5 * (shy(u0, 1) + u0)
    Fy = vbx * uby
    du = du - (shy(Fy, -1) - Fy) / dy
    wbx_k = 0.5 * (shx(w_k, 1) + w_k)
    wbx_k1 = 0.5 * (shx(w_k1, 1) + w_k1)
    Flo = rh_lo * wbx_k * 0.5 * (um + u0)
    Fhi = rh_hi * wbx_k1 * 0.5 * (u0 + up)
    du = du - (Fhi - Flo) * irf
    Kx = 0.5 * (shx(Km0, 1) + Km0)
    Ky = 0.5 * (shy(Km0, 1) + Km0)
    Fdx = -Kx * (u0 - shx(u0, 1)) / dx
    du = du - (shx(Fdx, -1) - Fdx) / dx
    Fdy = -Ky * (u0 - shy(u0, 1)) / dy
    du = du - (shy(Fdy, -1) - Fdy) / dy
    Fz_lo = -rh_lo * 0.5 * (Kmm + Km0) * (u0 - um) / dz
    Fz_hi = -rh_hi * 0.5 * (Km0 + Kmp) * (up - u0) / dz
    du = du - (Fz_hi - Fz_lo) * irf
    du = du + jnp.where(is0, rh_lo * irf, f32(0.0)) * fu_pl

    vc = 0.5 * (v0 + shy(v0, -1))
    Fyv = vc * vc
    dv = -(Fyv - shy(Fyv, 1)) / dy
    ub2 = 0.5 * (shy(u0, 1) + u0)
    vb2 = 0.5 * (shx(v0, 1) + v0)
    Fxv = ub2 * vb2
    dv = dv - (shx(Fxv, -1) - Fxv) / dx
    wby_k = 0.5 * (shy(w_k, 1) + w_k)
    wby_k1 = 0.5 * (shy(w_k1, 1) + w_k1)
    Flo = rh_lo * wby_k * 0.5 * (vm + v0)
    Fhi = rh_hi * wby_k1 * 0.5 * (v0 + vp)
    dv = dv - (Fhi - Flo) * irf
    Fdx = -Kx * (v0 - shx(v0, 1)) / dx
    dv = dv - (shx(Fdx, -1) - Fdx) / dx
    Fdy = -Ky * (v0 - shy(v0, 1)) / dy
    dv = dv - (shy(Fdy, -1) - Fdy) / dy
    Fz_lo = -rh_lo * 0.5 * (Kmm + Km0) * (v0 - vm) / dz
    Fz_hi = -rh_hi * 0.5 * (Km0 + Kmp) * (vp - v0) / dz
    dv = dv - (Fz_hi - Fz_lo) * irf
    dv = dv + jnp.where(is0, rh_lo * irf, f32(0.0)) * fv_pl

    u_zf = 0.5 * (um + u0)
    v_zf = 0.5 * (vm + v0)
    Fxw = u_zf * 0.5 * (shx(w_k, 1) + w_k)
    dw = -(shx(Fxw, -1) - Fxw) / dx
    Fyw = v_zf * 0.5 * (shy(w_k, 1) + w_k)
    dw = dw - (shy(Fyw, -1) - Fyw) / dy
    wc_k = 0.5 * (w_k + w_k1)
    wc_km1 = 0.5 * (w_km1 + w_k)
    dw = dw - (rf * wc_k * wc_k - rf_m1 * wc_km1 * wc_km1) * irh
    Kf = 0.5 * (Kmm + Km0)
    Kfx = 0.5 * (shx(Kf, 1) + Kf)
    Fdx = -Kfx * (w_k - shx(w_k, 1)) / dx
    dw = dw - (shx(Fdx, -1) - Fdx) / dx
    Kfy = 0.5 * (shy(Kf, 1) + Kf)
    Fdy = -Kfy * (w_k - shy(w_k, 1)) / dy
    dw = dw - (shy(Fdy, -1) - Fdy) / dy
    Fd_k = -fmv * rf * (0.25 * Kmm + 0.5 * Km0 + 0.25 * Kmp) \
        * (w_k1 - w_k) / dz
    Fd_km1 = -fm_m1 * rf_m1 * (0.25 * Kmmm + 0.5 * Kmm + 0.25 * Km0) \
        * (w_k - w_km1) / dz
    dw = dw - (Fd_k - Fd_km1) * irh

    # buoyancy on interior faces: 0.5 * (b[g] + b[g-1]), b at centers
    thv_0 = thv_e[E:E + bz]
    thv_m1 = thv_e[E - 1:E + bz - 1]
    thvm_c = thv_m_e[E:E + bz]
    thvm_c_m1 = thv_m_e[E - 1:E + bz - 1]
    b_0 = c.grav * (thv_0 - thvm_c) / jnp.maximum(thvm_c, 1.0)
    b_m1 = c.grav * (thv_m1 - thvm_c_m1) / jnp.maximum(thvm_c_m1, 1.0)
    dw = dw + 0.5 * (b_0 + b_m1) * m0
    dw = m0 * dw

    # ---- TKE sources ----
    e12_0 = jnp.maximum(WS(3), sg.E12_MIN)
    lam0 = lam[2:2 + bz]
    S2_0 = S2[2:2 + bz]
    N2_0 = N2[2:2 + bz]
    shear = Km0 * S2_0
    buoy = -Kh0 * N2_0
    diss = (sg.CE1 + sg.CE2 * lam0 / delta) * e12_0 ** 3 / lam0
    de12 = de12 + (shear + buoy - diss) / (2.0 * e12_0)

    # ---- coriolis (static; off in the reference case) ----
    if f_cor != 0.0:
        vc_at_u = 0.25 * (v0 + shy(v0, -1) + shx(v0, 1)
                          + shy(shx(v0, 1), -1))
        uc_at_v = 0.25 * (u0 + shx(u0, -1) + shy(u0, 1)
                          + shx(shy(u0, 1), -1))
        du = du + f_cor * vc_at_u
        dv = dv - f_cor * uc_at_v

    # ---- coupler forcings ----
    du = du + prof(P_FU)
    dv = dv + prof(P_FV)
    dthl = dthl + prof(P_FTHL)
    fqt = prof(P_FQT)
    qt_0 = WS(1)
    if qt_mode in (0, 1):                       # GLOBAL / VARIANCE
        dqt = dqt + fqt
    else:
        qt_m = jnp.mean(qt_0, axis=-1, keepdims=True)
        scale = qt_0 / jnp.maximum(qt_m, 1e-10)
        if qt_mode == 2:                        # LOCAL
            dqt = dqt + fqt * scale
        else:                                   # STRONG
            dqt = dqt + jnp.where(fqt < 0, fqt * scale,
                                  jnp.broadcast_to(fqt, qt_0.shape))

    # ---- microphysics: simpleice — liquid part KK2000 warm rain, ice
    # part threshold/timescale snow source, phase-blended fall speeds
    # (needs +1 plane for the sedimentation flux; mirrors micro.py) ----
    nc_cm3 = nc0 * 1e-6
    ql_0 = ql_e[E:E + bz]
    T_0 = T_e[E:E + bz]
    qr_0 = WS(2)
    fi_0 = jnp.clip((c.tmelt - T_0) / (c.tmelt - 250.0), 0.0, 1.0)
    ql_pos = jnp.maximum(ql_0, 0.0)
    auto = (auto_k * (ql_pos * (1.0 - fi_0)) ** 2.47 * nc_cm3 ** (-1.79)
            + jnp.maximum(ql_pos * fi_0 - ice_qi0, 0.0) / ice_tau)
    accr = accr_k * (ql_pos * jnp.maximum(qr_0, 0.0)) ** 1.15
    to_rain = jnp.minimum(auto + accr, ql_pos / dtv)
    qv_0 = qt_0 - ql_0
    qs_0 = qs_e[E:E + bz]
    subsat = jnp.clip((qs_0 - qv_0) / jnp.maximum(qs_0, 1e-8), 0.0, 1.0)
    evap = jnp.minimum(subsat * qr_0 / evap_tau,
                       jnp.maximum(qr_0, 0.0) / dtv)
    mdqr = to_rain - evap
    dqt = dqt - to_rain + evap
    iex_0 = iex_e[E:E + bz]
    lheat = (1.0 - fi_0) * c.rlv + fi_0 * c.rls
    dthl = dthl - lheat / c.cp * iex_0 * evap
    # sedimentation flux at cells g and g+1 (flux = rho vt qr, downward).
    # vt is evaluated ONCE on the union range [g, g+bz] and sliced for the
    # g / g+1 views: the two power laws are the most expensive VPU ops in
    # the stage, and the separate vt_0 / vt_p1 evaluations of r03
    # duplicated all 4 pows on bz-1 of bz+1 planes (same expressions,
    # bitwise-identical results)
    qr_u = qr_e[E:E + bz + 1]               # rows g .. g+bz
    T_u = T_e[E:E + bz + 1]
    rf_u = prof(P_RHOF, 0, 1)               # rhobf[g] .. rhobf[g+bz]
    fi_u = jnp.clip((c.tmelt - T_u) / (c.tmelt - 250.0), 0.0, 1.0)
    rq_u = jnp.maximum(rf_u * qr_u, 0.0)
    # the two phase fall-speed power laws share the base rq_u: evaluate
    # log(rq) once and reuse it in both exp's (pow lowers to exp(b*log x)
    # on the VPU, so this saves one full [bz+1, P] transcendental);
    # rq == 0 gives exp(b * -inf) == 0, the same value the pow form has
    # (sed_b, sed_bi > 0)
    lrq_u = jnp.log(rq_u)
    vt_u = ((1.0 - fi_u) * sed_a * jnp.exp(sed_b * lrq_u)
            + fi_u * sed_ai * jnp.exp(sed_bi * lrq_u))
    flux_u = rf_u * vt_u * jnp.maximum(qr_u, 0.0)
    flux_0 = flux_u[:bz]
    flux_p1 = flux_u[1:]
    flux_p1 = jnp.where(g0 == nz - 1, f32(0.0), flux_p1)
    dqr_sed = (flux_p1 - flux_0) * irf
    mdqr = jnp.maximum(mdqr + dqr_sed, -jnp.maximum(qr_0, 0.0) / dtv)
    dqr = dqr + mdqr

    @pl.when(zi == 0)
    def _():                                   # surface rain flux (slab 0)
        rain_ref[0] = jnp.full((8, LANE), jnp.mean(flux_0[0:1]), f32)

    # ---- sponge layer ----
    zf = (g0.astype(f32) + 0.5) * dz
    zs = nz * dz - sponge_depth
    rate = jnp.clip((zf - zs) / sponge_depth, 0.0, 1.0) / sponge_tau
    thl_0 = WS(0)
    thlm = thv_m_e  # placeholder name guard
    thl_m = jnp.mean(thl_0, axis=-1, keepdims=True)
    qt_mm = jnp.mean(qt_0, axis=-1, keepdims=True)
    u_m = jnp.mean(u0, axis=-1, keepdims=True)
    v_m = jnp.mean(v0, axis=-1, keepdims=True)
    du = du - rate * (u0 - u_m)
    dv = dv - rate * (v0 - v_m)
    dthl = dthl - rate * (thl_0 - thl_m)
    dqt = dqt - rate * (qt_0 - qt_mm)
    zh = g0.astype(f32) * dz
    rate_h = jnp.clip((zh - zs) / sponge_depth, 0.0, 1.0) / sponge_tau
    dw = dw - rate_h * w_k

    # ---- RK axpy update + clips ----
    un_ref[0] = ub_ref[0] + fdt * dtv * du
    vn_ref[0] = vb_ref[0] + fdt * dtv * dv
    wn_ref[0] = wb_ref[0] + fdt * dtv * dw
    sn_ref[0, 0] = sb_ref[0, 0] + fdt * dtv * dthl
    sn_ref[0, 1] = jnp.maximum(sb_ref[0, 1] + fdt * dtv * dqt, 0.0)
    sn_ref[0, 2] = jnp.maximum(sb_ref[0, 2] + fdt * dtv * dqr, 0.0)
    sn_ref[0, 3] = jnp.maximum(sb_ref[0, 3] + fdt * dtv * de12, sg.E12_MIN)

    @pl.when(zi == 0)
    def _():
        kmax_ref[0] = jnp.zeros((8, LANE), f32)
    kmax_ref[0] = jnp.maximum(kmax_ref[0], jnp.max(Km0))


def _vmem_estimate(bz, P, S=4):
    """Kernel VMEM footprint: 7 field slabs with 2*ZP halo rows of
    scratch (x2: double-buffered across grid steps), double-buffered
    in/out blocks for 7 fields, plus the kernel body's live [bz, P]
    temporaries (shifted copies, fluxes, closure fields). The temporaries
    dominate: calibrated against the compiler's scoped-vmem report
    (121.3 MB at bz=16, P=128*128 => ~76 planes)."""
    per_plane = P * 4
    scratch = 2 * (3 + S) * (bz + 2 * ZP) * per_plane
    io = 2 * 2 * (3 + S) * bz * per_plane
    temps = 76 * bz * per_plane
    return scratch + io + temps


_VMEM_BUDGET = 90 * 1024 * 1024   # of the 100 MB limit we request


def _pick_bz(nz, P=64 * 64):
    """Largest slab depth that divides nz and fits the VMEM budget
    (128x128 planes need shallower slabs than 64x64)."""
    for bz in (32, 16, 8):
        if nz % bz == 0 and _vmem_estimate(bz, P) <= _VMEM_BUDGET:
            return bz
    return None


@functools.partial(
    jax.jit, static_argnames=("nx", "dx", "dy", "dz", "bz", "interpret",
                              "scheme", "qt_mode", "f_cor", "sponge_depth",
                              "sponge_tau", "n_sat_iter", "fdt", "mp"))
def _batched_call(u, v, w, scal, prof, ub, vb, wb, sb,
                  nx, dx, dy, dz, bz, interpret, scheme, qt_mode, f_cor,
                  sponge_depth, sponge_tau, n_sat_iter, fdt, mp):
    n, S, nz, P = scal.shape
    assert nz % bz == 0 and bz % ZP == 0 and E <= ZP
    assert P % nx == 0 and P % LANE == 0, (P, nx)
    nblk = nz // bz
    # unpadded operands: the kernel fetches clamped slabs and
    # edge-replicates the z-halo in VMEM (_fetch/_edge_fixup)

    kern = functools.partial(
        _kernel, bz=bz, nx=nx, dx=float(dx), dy=float(dy), dz=float(dz),
        nz=nz, scheme=scheme, qt_mode=qt_mode, f_cor=f_cor,
        sponge_depth=sponge_depth, sponge_tau=sponge_tau,
        n_sat_iter=n_sat_iter, fdt=fdt,
        nc0=mp[0], auto_k=mp[1], accr_k=mp[2], evap_tau=mp[3],
        sed_a=mp[4], sed_b=mp[5], ice_tau=mp[6], ice_qi0=mp[7],
        sed_ai=mp[8], sed_bi=mp[9])
    fld = pl.BlockSpec((1, bz, P), lambda b, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    sfld = pl.BlockSpec((1, S, bz, P), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)
    # aux outputs: one (8, 128) tile per instance, revisited by every zi
    # program (the zi grid dim must stay sequential for the accumulation)
    aux = pl.BlockSpec((1, 8, LANE), lambda b, i: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, nz, P), u.dtype)
    aux_shape = jax.ShapeDtypeStruct((n, 8, LANE), u.dtype)
    return pl.pallas_call(
        kern,
        grid=(n, nblk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
            fld, fld, fld, sfld,
        ],
        out_specs=[fld, fld, fld, sfld, aux, aux, aux],
        out_shape=[shape, shape, shape,
                   jax.ShapeDtypeStruct((n, S, nz, P), u.dtype),
                   aux_shape, aux_shape, aux_shape],
        scratch_shapes=[
            pltpu.VMEM((2, bz + 2 * ZP, P), u.dtype),     # u slab (x2 buf)
            pltpu.VMEM((2, bz + 2 * ZP, P), u.dtype),     # v slab
            pltpu.VMEM((2, bz + 2 * ZP, P), u.dtype),     # w slab
            pltpu.VMEM((2, S, bz + 2 * ZP, P), u.dtype),  # scalar slab
            pltpu.VMEM((2, bz + 2 * ZP, LANE), u.dtype),  # profile pack
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(u, v, w, scal, prof, ub, vb, wb, sb)


@functools.lru_cache(maxsize=None)
def _make_op(ny, nx, dx, dy, dz, bz, interpret, scheme, qt_mode, f_cor,
             sponge_depth, sponge_tau, n_sat_iter, fdt, mp):
    """Unbatched stage op with a custom vmap rule (fleet batching)."""

    def call(args, n):
        (u, v, w, scal, prof, ub, vb, wb, sb) = args
        S, nz = scal.shape[-4], scal.shape[-3]
        P = ny * nx
        outs = _batched_call(
            u.reshape(n, nz, P), v.reshape(n, nz, P),
            w.reshape(n, nz + 1, P)[:, :, :],
            scal.reshape(n, S, nz, P), prof.reshape(n, nz, LANE),
            ub.reshape(n, nz, P), vb.reshape(n, nz, P),
            wb.reshape(n, nz, P), sb.reshape(n, S, nz, P),
            nx, dx, dy, dz, bz, interpret, scheme, qt_mode, f_cor,
            sponge_depth, sponge_tau, n_sat_iter, fdt, mp)
        un, vn, wn, sn, kmax, ustar2, rain = outs
        return (un.reshape(n, nz, ny, nx), vn.reshape(n, nz, ny, nx),
                wn.reshape(n, nz, ny, nx), sn.reshape(n, S, nz, ny, nx),
                kmax[:, 0, 0], ustar2[:, 0, 0], rain[:, 0, 0])

    @jax.custom_batching.custom_vmap
    def op(u, v, w, scal, prof, ub, vb, wb, sb):
        outs = call(tuple(x[None] for x in
                          (u, v, w, scal, prof, ub, vb, wb, sb)), 1)
        return tuple(o[0] for o in outs)

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = tuple(
            x if bt else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, bt in zip(args, in_batched))
        return call(full, axis_size), tuple([True] * 7)

    return op


def stage_fused(grid, phys, cur, base, forcing, frac_dt, dt):
    """One fused RK stage: tendencies(cur) -> base + frac_dt*dt*tend.

    cur, base: LESState (single instance; vmap for fleets). frac_dt is
    the static RK fraction; dt the (traced) substep length. Returns
    (u, v, w[nz faces 0..nz-1], thl, qt, qr, e12, kmax, ustar2_mean,
    surf_rain_flux) — velocities PRE-projection; the caller projects and
    appends w face nz (= 0).
    """
    nz, ny, nx = cur.thl.shape
    bz = _pick_bz(nz, ny * nx)
    interpret = jax.default_backend() != "tpu"
    mp = (float(phys.mphys.nc0), float(phys.mphys.auto_k),
          float(phys.mphys.accr_k), float(phys.mphys.evap_tau),
          float(phys.mphys.sed_a), float(phys.mphys.sed_b),
          float(phys.mphys.ice_tau), float(phys.mphys.ice_qi0),
          float(phys.mphys.sed_ai), float(phys.mphys.sed_bi))
    op = _make_op(int(ny), int(nx), float(grid.dx), float(grid.dy),
                  float(grid.dz), int(bz), bool(interpret),
                  phys.scheme, int(phys.qt_forcing),
                  float(phys.f_coriolis), float(phys.sponge_depth),
                  float(phys.sponge_tau), int(phys.n_sat_iter),
                  float(frac_dt), mp)
    scal = jnp.stack([cur.thl, cur.qt, cur.qr, cur.e12])
    sb = jnp.stack([base.thl, base.qt, base.qr, base.e12])
    # profile pack: [nz, LANE]; lanes 0-7 z-profiles, lanes 8-11 the
    # z-independent run scalars replicated along z
    prof = jnp.zeros((nz, LANE), cur.thl.dtype)
    prof = prof.at[:, P_PBF].set(cur.pbf)
    prof = prof.at[:, P_RHOF].set(cur.rhobf)
    prof = prof.at[:, P_RHL].set(cur.rhobh[:-1])
    prof = prof.at[:, P_RHH].set(cur.rhobh[1:])
    prof = prof.at[:, P_FU].set(forcing.f_u)
    prof = prof.at[:, P_FV].set(forcing.f_v)
    prof = prof.at[:, P_FTHL].set(forcing.f_thl)
    prof = prof.at[:, P_FQT].set(forcing.f_qt)
    prof = prof.at[:, P_SDT].set(dt)
    prof = prof.at[:, P_SWTHL].set(forcing.wthl)
    prof = prof.at[:, P_SWQT].set(forcing.wqt)
    prof = prof.at[:, P_SZ0M].set(forcing.z0m)
    un, vn, wn, sn, kmax, ustar2, rain = op(
        cur.u, cur.v, cur.w, scal, prof,
        base.u, base.v, base.w[:-1], sb)
    return un, vn, wn, sn[0], sn[1], sn[2], sn[3], kmax, ustar2, rain


def supported(grid, phys):
    """Whether the fused stage kernel supports this configuration."""
    return ((grid.ny * grid.nx) % LANE == 0
            and _pick_bz(grid.nz, grid.ny * grid.nx) is not None
            and phys.subgrid == "tke"
            and phys.scheme == "hybrid52")
