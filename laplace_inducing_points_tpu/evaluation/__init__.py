"""Evaluation: metrics and the dataset harness."""

from laplace_inducing_points_tpu.evaluation.harness import (auroc_ood,
                                                            eval_dataset,
                                                            eval_dataset_extended,
                                                            make_batch_sampler)
from laplace_inducing_points_tpu.evaluation.metrics import (brier_score, ece,
                                                            mc_gaussian_nll,
                                                            mc_predictive_nll_acc,
                                                            roc_auc)
