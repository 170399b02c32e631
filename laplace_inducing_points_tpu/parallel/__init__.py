"""Parallel: device meshes and SPMD-sharded operator variants."""

from laplace_inducing_points_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                                       batch_sharding,
                                                       make_mesh,
                                                       pad_to_multiple,
                                                       replicated, shard_batch)
from laplace_inducing_points_tpu.parallel.sharded_ops import (
    shard_probes, sharded_curvature_matmat, sharded_dense_wt, sharded_ggn_matmat,
    sharded_gram)
