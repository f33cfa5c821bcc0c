#!/usr/bin/env python
"""On-TPU: projection residual and speed vs matmul precision.

The eigenbasis solve uses f32 matmuls; on TPU these are emulated on the
bf16 MXU (HIGHEST = 6 passes, HIGH = 3). Residual quality must stay at or
below the f32 Thomas reference (~8e-8 for the standard test problem)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sp_coupler_tpu.models.les import grid as lgrid, state as lstate, poisson
from sp_coupler_tpu.models.les.advect import divergence


def main():
    g = lgrid.LESGrid()
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    zf = g.zf()
    nz = g.nz
    st = lstate.init_state(g, jnp.full(nz, 5.0), jnp.full(nz, -3.0),
                           298.0 + 6e-3 * zf, 16e-3 * jnp.exp(-zf / 2500.0),
                           jnp.asarray(101500.0), key)
    ku, kv, kw = jax.random.split(key, 3)
    u = st.u + 0.5 * jax.random.normal(ku, st.u.shape)
    v = st.v + 0.5 * jax.random.normal(kv, st.v.shape)
    w = st.w.at[1:-1].add(0.2 * jax.random.normal(kw, st.w[1:-1].shape))
    dt = 3.0

    for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
        prec = getattr(jax.lax.Precision, prec_name)
        for refine in (0, 1):
            @jax.jit
            def go(u, v, w):
                with jax.default_matmul_precision(prec_name.lower()
                                                  if prec_name != "HIGHEST"
                                                  else "highest"):
                    sol = poisson.build_solver(g, st.rhobf, st.rhobh)
                    d0 = divergence(g, st.rhobf, st.rhobh, u, v, w)
                    phi = poisson.solve_pressure(g, st.rhobf, st.rhobh,
                                                 d0 / dt, solver=sol,
                                                 refine=refine)
                    u2 = u - dt * (phi - jnp.roll(phi, 1, 2)) / g.dx
                    v2 = v - dt * (phi - jnp.roll(phi, 1, 1)) / g.dy
                    dphidz = (phi[1:] - phi[:-1]) / g.dz
                    zero = jnp.zeros_like(w[:1])
                    w2 = w - dt * jnp.concatenate([zero, dphidz, zero], 0)
                    d = divergence(g, st.rhobf, st.rhobh, u2, v2, w2)
                return jnp.max(jnp.abs(d))
            r = float(go(u, v, w))
            print("prec=%-8s refine=%d  max|div| %.3e"
                  % (prec_name, refine, r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
