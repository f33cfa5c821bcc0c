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
