"""Training: MAP, inducing-point KL, alpha hyperparameter optimization."""

from laplace_inducing_points_tpu.training.alpha import (log_marginal_likelihood,
                                                        train_map_then_alpha,
                                                        update_alpha)
from laplace_inducing_points_tpu.training.grid_search import grid_search_alpha
from laplace_inducing_points_tpu.training.inducing import (kl_objective_dense,
                                                           kl_objective_gram,
                                                           kl_objective_stochastic,
                                                           optimize_step,
                                                           train_inducing_points)
from laplace_inducing_points_tpu.training.map import (cosine_lr, map_step,
                                                      train_map)
