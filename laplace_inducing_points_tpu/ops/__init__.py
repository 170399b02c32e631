"""Ops: randomized estimators, Krylov decompositions, Pallas kernels."""

from laplace_inducing_points_tpu.ops.lanczos import (funm_lanczos_sym,
                                                     funm_sym_dense,
                                                     golub_kahan_bidiag,
                                                     lanczos_sym)
from laplace_inducing_points_tpu.ops.nystrom import nystrom_preconditioner
from laplace_inducing_points_tpu.ops.pallas.syrk import syrk
from laplace_inducing_points_tpu.ops.slq import (slq_logdet_product,
                                                 slq_logdet_sym)
from laplace_inducing_points_tpu.ops.stochtrace import (hutchinson, hutchpp,
                                                        na_hutchpp,
                                                        normal_probes,
                                                        rademacher_probes,
                                                        trace_of_inverse)
