"""Inference: LLA predictives and the posterior weight sampler."""

from laplace_inducing_points_tpu.inference.lla import (Gaussian,
                                                       ScalableLLAPredictor,
                                                       materialize_covariance,
                                                       posterior_lla_dense,
                                                       predict_la_samples_dense,
                                                       predict_lla_dense,
                                                       predict_lla_scalable)
from laplace_inducing_points_tpu.inference.sample import (inv_matsqrt_dense,
                                                          make_inv_matsqrt,
                                                          make_inv_matsqrt_lanczos)
# exported under a distinct name: the bare function would shadow the
# ``inference.sample`` submodule in ``import ... as`` resolution
from laplace_inducing_points_tpu.inference.sample import sample as sample_weights  # noqa: E501

# restore the submodule binding clobbered by the function imports above
from laplace_inducing_points_tpu.inference import sample  # noqa: E402,F401
