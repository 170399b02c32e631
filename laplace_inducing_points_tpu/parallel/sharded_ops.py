"""Mesh-sharded curvature operators via SPMD partitioning.

The per-example structure of the GGN (``Σ_i J_iᵀ H_i J_i``) makes it
embarrassingly data-parallel. These helpers express that by **sharding
annotations only**: the point set ``Z`` is laid out over the mesh's data
axis, the same batched operator code from ``core.operators`` runs under
``jit``, and XLA's SPMD partitioner splits the per-example jvp/vjp work and
inserts the ICI all-reduce for the example-sum — the "annotate shardings,
let XLA insert collectives" recipe.

Why not ``shard_map``: the curvature ops differentiate the network w.r.t.
parameters that are *replicated* across the mesh. Under ``shard_map``, AD's
replication rule inserts an extra cross-device ``psum`` on the cotangents of
replicated values, silently multiplying per-example Jacobians by the mesh
size. jit-level SPMD reasons about the partitioned XLA graph instead and
has no such hazard. (Found the hard way; see tests/test_sharding.py.)

The reference has no equivalent — it is single-device by construction
(``/root/reference/src/data.py:86-117``, SURVEY.md §2.12).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.parallel.mesh import DATA_AXIS


def _data_sharded(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_ggn_matmat(state: Any, Z: jnp.ndarray, V: jnp.ndarray,
                       mesh: Mesh, full_set_size: Optional[int] = None,
                       axis: str = DATA_AXIS) -> jnp.ndarray:
    """``(P, D) -> (P, D)`` GGN probe sweep, example axis over the mesh."""
    Z = jax.device_put(Z, _data_sharded(mesh, axis))
    V = jax.device_put(V, _replicated(mesh))

    @partial(jax.jit, out_shardings=_replicated(mesh))
    def sweep(Z, V):
        ggn = ops.make_ggn_operator(state, Z, full_set_size=full_set_size)
        return ggn.matmat(V)

    return sweep(Z, V)


def sharded_curvature_matmat(state: Any, Z: jnp.ndarray, V: jnp.ndarray,
                             mesh: Mesh, alpha,
                             full_set_size: Optional[int] = None,
                             axis: str = DATA_AXIS) -> jnp.ndarray:
    """(GGN + αI) probe sweep, example-sharded."""
    return sharded_ggn_matmat(state, Z, V, mesh, full_set_size, axis) \
        + alpha * V


def sharded_dense_wt(state: Any, Z: jnp.ndarray, mesh: Mesh,
                     axis: str = DATA_AXIS,
                     scale: float = 1.0) -> jnp.ndarray:
    """Materialize ``Wᵀ`` rows with the example axis sharded.

    Output rows stay sharded over the mesh (each device holds the rows of
    its examples); downstream matmuls consume the distributed layout.
    """
    Z = jax.device_put(Z, _data_sharded(mesh, axis))

    @partial(jax.jit, out_shardings=_data_sharded(mesh, axis))
    def build(Z):
        return ops.dense_wt(state, Z, scale=scale)

    return build(Z)


def sharded_gram(state: Any, Z: jnp.ndarray, mesh: Mesh,
                 axis: str = DATA_AXIS) -> jnp.ndarray:
    """Dense ``WᵀW`` from row-sharded ``Wᵀ``; XLA turns the contraction
    over the replicated parameter axis into per-device strips + collective."""
    Z = jax.device_put(Z, _data_sharded(mesh, axis))

    @partial(jax.jit, out_shardings=_replicated(mesh))
    def build(Z):
        R = ops.dense_wt(state, Z)
        R = jax.lax.with_sharding_constraint(R, _data_sharded(mesh, axis))
        return ops.pdot(R, R.T)

    return build(Z)


def shard_probes(probes: jnp.ndarray, mesh: Mesh,
                 axis: str = DATA_AXIS) -> jnp.ndarray:
    """Lay the probe axis across the mesh; vmapped operator sweeps then
    partition along it automatically under jit."""
    return jax.device_put(probes, _data_sharded(mesh, axis))
