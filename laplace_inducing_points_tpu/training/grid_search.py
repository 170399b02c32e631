"""Validation-NLL grid search for the prior precision α.

Parity: ``/root/reference/src/grid_search.py`` — coarse log₁₀ grid plus one
bisection refinement pass. The reference's wiring is broken as written (it
imports ``evaluate`` off ``sys.path`` and omits the required ``rng`` arg,
``/root/reference/src/grid_search.py:6,28-35``); here the evaluation hook is
a proper dependency and the rng is threaded.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import numpy as np


def grid_search_alpha(state, Z0, val_loader: Iterable, *,
                      full_set_size: Optional[int],
                      num_mc_samples: int = 30,
                      log10_min: float = -3.0, log10_max: float = 2.0,
                      n_coarse: int = 7, refine: bool = True,
                      rng_key: int = 0, verbose: bool = True,
                      eval_fn: Optional[Callable] = None,
                      range_clip_min: Optional[float] = None,
                      predictive: str = "weight",
                      jac_block: Optional[int] = None) -> float:
    """Return the α minimizing validation NLL of the IP-LLA predictive.

    ``eval_fn(state, loader, Z, alpha, full_set_size, num_mc_samples, rng)
    -> (nll, acc)`` defaults to the framework's evaluation harness.
    ``predictive="cov"`` additionally reuses the α-independent per-image
    Jacobian statistics across EVERY grid point (the whole sweep then costs
    one statistics pass plus trivial per-α sampling).
    """
    if eval_fn is None:
        from laplace_inducing_points_tpu.evaluation.harness import eval_dataset
        from laplace_inducing_points_tpu.inference.lla import (
            ScalableLLAPredictor)

        # the posterior factor depends on (state, Z) but NOT on alpha:
        # build it once, sweep every candidate alpha against it (alpha is
        # traced inside the predictor's jitted step — one executable total)
        predictor = ScalableLLAPredictor(state, Z0,
                                         full_set_size=full_set_size,
                                         range_clip_min=range_clip_min,
                                         method=predictive,
                                         jac_block=jac_block)

        def eval_fn(state, loader, Z, alpha, full_set_size, num_mc_samples,
                    rng):
            return eval_dataset(state, loader, Z, alpha=alpha,
                                full_set_size=full_set_size,
                                num_mc_samples=num_mc_samples, rng=rng,
                                predictor=predictor)

    alphas = np.logspace(log10_min, log10_max, n_coarse)
    rng = jax.random.PRNGKey(rng_key)

    def val_nll(a):
        nll, _ = eval_fn(state, val_loader, Z0, float(a), full_set_size,
                         num_mc_samples, rng)
        return float(nll)

    nlls = []
    for a in alphas:
        nlls.append(val_nll(a))
        if verbose:
            print(f"alpha={a:9.3e}  NLL={nlls[-1]:.4f}")
    best = int(np.argmin(nlls))

    if refine:
        lo = alphas[max(best - 1, 0)]
        hi = alphas[min(best + 1, len(alphas) - 1)]
        llo, lhi = np.log10(lo), np.log10(hi)
        refine_alphas = 10.0 ** np.array(
            [(3 * llo + lhi) / 4, (llo + lhi) / 2, (llo + 3 * lhi) / 4])
        refine_nlls = [val_nll(a) for a in refine_alphas]
        if verbose:
            for a, v in zip(refine_alphas, refine_nlls):
                print(f"alpha={a:9.3e}  NLL={v:.4f} (refine)")
        alphas = np.concatenate([alphas, refine_alphas])
        nlls = nlls + refine_nlls
        best = int(np.argmin(nlls))

    alpha_best = float(alphas[best])
    if verbose:
        print(f">>> selected alpha* = {alpha_best:9.3e} "
              f"(val NLL = {nlls[best]:.4f})")
    return alpha_best
