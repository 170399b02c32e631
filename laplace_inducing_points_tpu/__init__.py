"""laplace_inducing_points_tpu — TPU-native Laplace approximations with learned inducing points.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``nrholm1/Laplace-Inducing-Points`` (Python/torch-dataloader research code),
re-designed TPU-first:

* matrix-free curvature (GGN) linear operators built from **batched**
  jvp/vjp linearizations of the network (one JVP per probe, not one per
  example — the reference loops ``fori_loop`` over data points,
  ``/root/reference/src/ggn.py:133-144``),
* dense Gram algebra on small ``d_z × d_z`` matrices via MXU matmuls with a
  Pallas SYRK (symmetric rank-k) kernel for the hot Gram builds,
* AD-differentiable randomized estimators (Hutchinson, Hutch++, stochastic
  Lanczos quadrature) with the probe axis vmapped/sharded,
* data/example/probe axes sharded over a ``jax.sharding.Mesh`` with XLA
  collectives — no per-device Python loops.

Subpackages
-----------
``core``        parameter flattening, loss Hessians, linear-operator layer
``ops``         stochastic trace, Lanczos/SLQ, CG, Pallas kernels, Gram builds
``parallel``    mesh construction and shard_map'd operator variants
``models``      toy + scale Flax model zoo and TrainState
``data``        pure-numpy data pipeline (toy generators + image datasets)
``training``    MAP, inducing-point (KL), alpha-hyperparameter training
``inference``   linearized-Laplace predictive + posterior weight sampler
``evaluation``  NLL / accuracy / Brier / ECE / OOD-AUROC metrics and harness
``utils``       checkpointing, config, profiling
``viz``         plotting parity with the reference's figures
"""

__version__ = "0.1.0"
