"""Parity tests for the fused Pallas scalar-tendency kernel (interpret mode).

The kernel must reproduce the XLA reference path (models/les/advect.py
advect_scalar + models/les/subgrid.py diffuse_scalar) exactly up to f32
round-off, for both the unbatched op and the fleet's vmapped use.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sp_coupler_tpu.models.les import grid as lgrid, advect, subgrid
from sp_coupler_tpu.ops import advect_pallas as ap


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    nz, ny, nx, S = 32, 16, 16, 4
    g = lgrid.LESGrid(nx=nx, ny=ny, nz=nz, dz=25.0)
    u = jnp.asarray(rng.normal(0, 3, (nz, ny, nx)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 3, (nz, ny, nx)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (nz + 1, ny, nx)), jnp.float32)
    w = w.at[0].set(0.0).at[-1].set(0.0)
    scal = jnp.asarray(rng.normal(300, 5, (S, nz, ny, nx)), jnp.float32)
    Ks = jnp.asarray(rng.uniform(0.1, 20.0, (S, nz, ny, nx)), jnp.float32)
    rhobf = jnp.asarray(np.linspace(1.2, 0.7, nz), jnp.float32)
    rhobh = jnp.asarray(np.linspace(1.21, 0.69, nz + 1), jnp.float32)
    ref = jax.vmap(
        lambda s, K: advect.advect_scalar(g, rhobf, rhobh, u, v, w, s,
                                          "hybrid52")
        + subgrid.diffuse_scalar(g, rhobf, rhobh, K, s))(scal, Ks)
    return g, u, v, w, Ks, scal, rhobf, rhobh, ref


def test_fused_kernel_matches_xla(case):
    g, u, v, w, Ks, scal, rhobf, rhobh, ref = case
    got = ap.advect_diffuse_scalars(u, v, w, Ks, scal, rhobf, rhobh,
                                    g.dx, g.dy, g.dz, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_fused_kernel_vmapped(case):
    g, u, v, w, Ks, scal, rhobf, rhobh, ref = case
    n = 3
    ub = jnp.stack([u + 0.1 * i for i in range(n)])
    sb = jnp.stack([scal + 0.01 * i for i in range(n)])
    ref_b = jax.vmap(lambda u_, s_: jax.vmap(
        lambda s, K: advect.advect_scalar(g, rhobf, rhobh, u_, v, w, s,
                                          "hybrid52")
        + subgrid.diffuse_scalar(g, rhobf, rhobh, K, s))(s_, Ks))(ub, sb)
    got_b = jax.vmap(
        lambda u_, s_: ap.advect_diffuse_scalars(
            u_, v, w, Ks, s_, rhobf, rhobh, g.dx, g.dy, g.dz,
            interpret=True))(ub, sb)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=2e-4, rtol=1e-4)


def test_pick_bz():
    assert ap.pick_bz(160) == 16
    assert ap.pick_bz(96) == 16
    assert ap.pick_bz(100) == 10
    assert ap.pick_bz(7) == 7


def test_flat_kernel_matches_xla(case):
    from sp_coupler_tpu.ops import lesflat_pallas as lf
    g, u, v, w, Ks, scal, rhobf, rhobh, ref = case
    got = lf.advect_diffuse_scalars(u, v, w, Ks, scal, rhobf, rhobh,
                                    g.dx, g.dy, g.dz, bz=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_flat_kernel_vmapped(case):
    from sp_coupler_tpu.ops import lesflat_pallas as lf
    g, u, v, w, Ks, scal, rhobf, rhobh, ref = case
    n = 3
    ub = jnp.stack([u + 0.1 * i for i in range(n)])
    sb = jnp.stack([scal + 0.01 * i for i in range(n)])
    ref_b = jax.vmap(lambda u_, s_: jax.vmap(
        lambda s, K: advect.advect_scalar(g, rhobf, rhobh, u_, v, w, s,
                                          "hybrid52")
        + subgrid.diffuse_scalar(g, rhobf, rhobh, K, s))(s_, Ks))(ub, sb)
    got_b = jax.vmap(
        lambda u_, s_: lf.advect_diffuse_scalars(
            u_, v, w, Ks, s_, rhobf, rhobh, g.dx, g.dy, g.dz, bz=16,
            interpret=True))(ub, sb)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               atol=2e-4, rtol=1e-4)


def test_flat_supported():
    from sp_coupler_tpu.ops import lesflat_pallas as lf
    assert lf.supported(lgrid.LESGrid())                       # 64x64x160
    assert lf.supported(lgrid.LESGrid(nx=128, ny=128))
    assert not lf.supported(lgrid.LESGrid(nx=10, ny=10))


def test_tendencies_pallas_path_matches_xla_path():
    """tendencies() with use_pallas=True (interpret off-TPU) == XLA path."""
    from sp_coupler_tpu.models.les import state as lstate, step as lstep
    rng = np.random.default_rng(3)
    g = lgrid.LESGrid(nx=16, ny=16, nz=32, dz=25.0)
    nz = g.nz
    key = jax.random.PRNGKey(0)
    st = lstate.init_state(
        g, jnp.asarray(np.linspace(-5, 5, nz), jnp.float32),
        jnp.zeros(nz, jnp.float32),
        jnp.asarray(np.linspace(298, 312, nz), jnp.float32),
        jnp.asarray(np.linspace(0.016, 0.002, nz), jnp.float32),
        101300.0, key)
    st = st._replace(w=st.w.at[1:-1].set(
        jnp.asarray(rng.normal(0, 0.1, (nz - 1, g.ny, g.nx)), jnp.float32)))
    frc = lstate.LESForcing.zeros(nz)._replace(
        wthl=jnp.asarray(0.01), wqt=jnp.asarray(1e-5))
    t_x = lstep.tendencies(g, lstep.LESPhysics(use_pallas=False), st, frc,
                           1.0)
    t_p = lstep.tendencies(g, lstep.LESPhysics(use_pallas=True), st, frc,
                           1.0)
    for k in ("thl", "qt", "qr", "e12", "u", "v", "w"):
        np.testing.assert_allclose(np.asarray(t_p[k]), np.asarray(t_x[k]),
                                   atol=5e-5, rtol=1e-4, err_msg=k)


def test_stage_fused_matches_xla_stage():
    """ops/lesstage_pallas.stage_fused == tendencies() + RK axpy update."""
    from sp_coupler_tpu.models.les import state as lstate, step as lstep
    from sp_coupler_tpu.ops import lesstage_pallas as ls
    rng = np.random.default_rng(7)
    g = lgrid.LESGrid(nx=16, ny=16, nz=32, dz=25.0)
    nz = g.nz
    phys = lstep.LESPhysics()
    assert ls.supported(g, phys)
    key = jax.random.PRNGKey(1)
    base = lstate.init_state(
        g, jnp.asarray(np.linspace(-5, 5, nz), jnp.float32),
        jnp.zeros(nz, jnp.float32),
        jnp.asarray(np.linspace(298, 312, nz), jnp.float32),
        jnp.asarray(np.linspace(0.016, 0.002, nz), jnp.float32),
        101300.0, key)
    base = base._replace(
        w=base.w.at[1:-1].set(jnp.asarray(
            rng.normal(0, 0.1, (nz - 1, g.ny, g.nx)), jnp.float32)),
        qr=jnp.asarray(rng.uniform(0, 1e-4, (nz, g.ny, g.nx)), jnp.float32))
    cur = base._replace(thl=base.thl + 0.05, u=base.u * 1.01)
    frc = lstate.LESForcing.zeros(nz)._replace(
        wthl=jnp.asarray(0.01), wqt=jnp.asarray(1e-5),
        f_thl=jnp.full(nz, 1e-5), f_qt=jnp.full(nz, -1e-9),
        f_u=jnp.full(nz, 1e-5), f_v=jnp.full(nz, -1e-5),
        z0m=jnp.asarray(0.1))
    dt, frac = 2.0, 0.5

    t = lstep.tendencies(g, lstep.LESPhysics(use_pallas=False), cur, frc,
                         dt)
    import sp_coupler_tpu.models.les.subgrid as sgr
    ref = dict(
        u=base.u + frac * dt * t["u"], v=base.v + frac * dt * t["v"],
        w=(base.w + frac * dt * t["w"])[:-1],
        thl=base.thl + frac * dt * t["thl"],
        qt=jnp.maximum(base.qt + frac * dt * t["qt"], 0.0),
        qr=jnp.maximum(base.qr + frac * dt * t["qr"], 0.0),
        e12=jnp.maximum(base.e12 + frac * dt * t["e12"], sgr.E12_MIN))

    un, vn, wn, thl, qt, qr, e12, kmax, ustar2, rain = ls.stage_fused(
        g, phys, cur, base, frc, frac, dt)
    got = dict(u=un, v=vn, w=wn, thl=thl, qt=qt, qr=qr, e12=e12)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=5e-4, rtol=1e-4, err_msg=k)
    np.testing.assert_allclose(float(kmax), float(t["kmax"]), rtol=1e-4)
    np.testing.assert_allclose(float(rain), float(t["surf_rain"]),
                               rtol=1e-3, atol=1e-10)
    np.testing.assert_allclose(float(ustar2),
                               float(jnp.mean(t["ustar"] ** 2)), rtol=1e-3)


def test_stage_fused_vmapped():
    """Fleet batching of stage_fused via its custom vmap rule."""
    from sp_coupler_tpu.models.les import state as lstate, step as lstep
    from sp_coupler_tpu.ops import lesstage_pallas as ls
    g = lgrid.LESGrid(nx=16, ny=16, nz=32, dz=25.0)
    nz = g.nz
    phys = lstep.LESPhysics()
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    st = jax.vmap(lambda k: lstate.init_state(
        g, jnp.full(nz, 4.0), jnp.full(nz, -2.0),
        jnp.asarray(np.linspace(298, 312, nz), jnp.float32),
        jnp.asarray(np.linspace(0.016, 0.002, nz), jnp.float32),
        jnp.asarray(101300.0), k))(keys)
    frc = jax.vmap(lambda _: lstate.LESForcing.zeros(nz)._replace(
        wthl=jnp.asarray(0.01), wqt=jnp.asarray(1e-5),
        z0m=jnp.asarray(0.1)))(jnp.arange(2))
    dt, frac = 2.0, 1.0 / 3.0
    outs = jax.vmap(lambda s, f: ls.stage_fused(g, phys, s, s, f, frac,
                                                dt))(st, frc)
    ref0 = ls.stage_fused(
        g, phys, jax.tree.map(lambda x: x[0], st),
        jax.tree.map(lambda x: x[0], st),
        jax.tree.map(lambda x: x[0], frc), frac, dt)
    for a, b in zip(outs, ref0):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_substep_fused_matches_split():
    """substep() with the fused stage kernel == the split XLA path
    (covers the wiring: w-face append, projection, rain/ustar bookkeeping)."""
    from sp_coupler_tpu.models.les import state as lstate, step as lstep
    g = lgrid.LESGrid(nx=16, ny=16, nz=32, dz=25.0)
    nz = g.nz
    st = lstate.init_state(
        g, jnp.full(nz, 4.0), jnp.full(nz, -2.0),
        jnp.asarray(np.linspace(298, 312, nz), jnp.float32),
        jnp.asarray(np.linspace(0.016, 0.002, nz), jnp.float32),
        101300.0, jax.random.PRNGKey(3))
    frc = lstate.LESForcing.zeros(nz)._replace(
        wthl=jnp.asarray(0.01), wqt=jnp.asarray(1e-5),
        z0m=jnp.asarray(0.1), z0h=jnp.asarray(0.02))
    dt = 2.0
    s_f, k_f = lstep.substep(g, lstep.LESPhysics(use_pallas=True), st, frc,
                             dt)
    s_x, k_x = lstep.substep(g, lstep.LESPhysics(use_pallas=False), st, frc,
                             dt)
    for f in ("u", "v", "w", "thl", "qt", "qr", "e12", "rain", "ustar"):
        a, b = np.asarray(getattr(s_f, f)), np.asarray(getattr(s_x, f))
        scale = max(np.max(np.abs(b)), 1e-12)
        np.testing.assert_allclose(a, b, atol=2e-3 * scale, rtol=2e-3,
                                   err_msg=f)
    np.testing.assert_allclose(float(k_f), float(k_x), rtol=1e-3)
