"""shard_map'd curvature operators: example/probe axes across the mesh.

The per-example structure of the GGN (``Σ_i J_iᵀ H_i J_i``) makes it
embarrassingly data-parallel: each device linearizes the network over its
shard of the point set, applies the batched jvp/H/vjp locally, and a single
``psum`` over the data axis completes the sum. The reference's equivalent is
a *sequential* ``fori_loop`` on one device
(``/root/reference/src/ggn.py:133-144``).

Gram builds shard the same way: each device materializes its block of rows
``R_local = (LᵀJ)_local`` and contributes a strip ``R_local @ R_fullᵀ`` of
the Gram; the all-gather of ``R`` rides ICI.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.parallel.mesh import DATA_AXIS


def sharded_ggn_matmat(state: Any, Z: jnp.ndarray, V: jnp.ndarray,
                       mesh: Mesh, full_set_size: Optional[int] = None,
                       axis: str = DATA_AXIS) -> jnp.ndarray:
    """``(P, D) -> (P, D)`` GGN probe sweep with Z sharded over the mesh.

    Requires ``Z.shape[0]`` divisible by the mesh axis size (pad upstream
    with ``parallel.mesh.pad_to_multiple`` — padded rows contribute zero
    only if masked; prefer exact multiples).
    """
    M = Z.shape[0]
    N = full_set_size or M
    scale = N / M

    def local(z_shard, v):
        ggn = ops.make_ggn_operator(state, z_shard, full_set_size=None)
        out = ggn.matmat(v)                      # unscaled local sum
        return jax.lax.psum(out, axis)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P()),
                       out_specs=P())
    return scale * fn(Z, V)


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

    Output is a global array sharded on its row axis: each device holds the
    ``(m_local·K, D)`` rows of its examples — no communication at all.
    """
    def local(z_shard):
        return ops.dense_wt(state, z_shard, scale=scale)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=P(axis))
    return fn(Z)


def sharded_gram(state: Any, Z: jnp.ndarray, mesh: Mesh,
                 axis: str = DATA_AXIS) -> jnp.ndarray:
    """Dense ``WᵀW`` with per-device row strips + ICI all-gather.

    Each device computes its strip ``R_local @ R_fullᵀ`` (1/n of the matmul
    FLOPs); the result is row-sharded and consumed by replicated small
    solves downstream (XLA inserts the final gather lazily).
    """
    def local(z_shard):
        R_local = ops.dense_wt(state, z_shard)               # (d_l, D)
        R_full = jax.lax.all_gather(R_local, axis, tiled=True)
        return ops.pdot(R_local, R_full.T)                   # (d_l, d)

    fn = jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=P(axis))
    return fn(Z)


def shard_probes(probes: jnp.ndarray, mesh: Mesh,
                 axis: str = DATA_AXIS) -> jnp.ndarray:
    """Lay the probe axis across the mesh; vmapped operator sweeps then
    partition automatically under jit (SPMD, no shard_map needed)."""
    return jax.device_put(probes, NamedSharding(mesh, P(axis)))
