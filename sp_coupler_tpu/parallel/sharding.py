"""Sharding constraints inside the jitted coupled step.

The fused step is written for `jax.jit` over a mesh: sharding is declared
with `with_sharding_constraint` at the phase boundaries (scaling-book
recipe: pick a mesh, annotate, let XLA insert the collectives).

- LES fleet arrays carry P('les', ...) so every instance's substeps run
  where its state lives; slab reductions stay device-local.
- The per-column coupling arrays [n_les, L] are also P('les'): the GCM ->
  LES gather and LES -> GCM scatter become small all-to-all/all-gathers
  inserted by XLA at the spectral/grid boundary.
- GCM spectral state is replicated by default (T21-T255 state is tiny
  compared to one LES instance); a lat-sharded GCM kicks in at TL639 scale.
"""

import jax
from jax.sharding import PartitionSpec as P


def constrain_fleet(state, mesh):
    """Constrain an LES fleet pytree to P('les') on its batch axis."""
    if mesh is None:
        return state

    def con(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == mesh.shape["les"] * (
                x.shape[0] // max(mesh.shape["les"], 1)):
            return jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(mesh, P("les")))
        return x

    return jax.tree.map(con, state)


def constrain_columns(tree, mesh):
    """Constrain per-column dicts/[n, L] arrays to the les axis."""
    if mesh is None:
        return tree
    nd = jax.sharding.NamedSharding(mesh, P("les"))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, nd)
        if getattr(x, "ndim", 0) >= 1 else x, tree)


def replicated(tree, mesh):
    if mesh is None:
        return tree
    nd = jax.sharding.NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, nd), tree)
