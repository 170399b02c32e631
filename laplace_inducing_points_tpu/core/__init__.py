"""Core: parameter utilities, loss Hessians, batched curvature operators."""

from laplace_inducing_points_tpu.core.loss_hessians import (h_apply, h_dense,
                                                            sqrt_h_apply,
                                                            sqrt_h_t_apply)
from laplace_inducing_points_tpu.core.operators import (GGNOperator, WFactor,
                                                        curvature_dense,
                                                        dense_wt,
                                                        ensure_symmetry,
                                                        linearize_model,
                                                        make_curvature_operator,
                                                        make_ggn_operator,
                                                        make_w_factor,
                                                        model_outputs, pdot)
from laplace_inducing_points_tpu.core.params import (count_params,
                                                     flatten_nn_params,
                                                     num_curvature_params,
                                                     split_nn_params)
