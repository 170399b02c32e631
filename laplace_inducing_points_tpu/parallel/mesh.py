"""Device-mesh construction and sharding helpers.

The reference is single-device by construction (its prefetcher pins
``jax.devices()[0]`` and "does not shard", ``/root/reference/src/data.py:86-117``;
no collective appears anywhere — SURVEY.md §2.12). This framework is
mesh-native: one ``Mesh`` object threads through data loading, MAP training,
and the operator layer, and XLA inserts the ICI collectives.

Axis conventions:
* ``data``  — batch / example axis (data parallelism; GGN example sums ride
  a ``psum``),
* ``probe`` — estimator probe axis (Hutch++/SLQ sweeps; optional, folded
  into ``data`` on 1-D meshes),
* ``model`` — reserved for tensor parallelism of very large models.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Tuple[str, ...] = (DATA_AXIS,),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the available devices (1-D data mesh by default)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis of an array across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a (x, y) batch with the leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` so its size divides the mesh axis.

    Returns (padded, original_size). Static shapes only.
    """
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jax.numpy.pad(x, widths), n
