"""YAML config loading with schema defaults.

Parity: ``load_yaml`` (``/root/reference/src/utils.py:78-81``) and the nested
``model:`` / ``optimization:{alpha, full_set_size, map:{...}, ip:{...}}``
(+ optional ``sampling:``) schema of ``/root/reference/config/**``. Defaults
are applied here once so downstream code never calls ``.get`` with inline
fallbacks (the reference scatters these, e.g. ``main.py:134-136``).
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml

IP_DEFAULTS = {
    "m": 50,
    "batch_size": 128,
    "epochs": 200,
    "lr": 0.01,
    "mc_samples": 100,
    "seed": 0,
    "st_samples": 256,
    "slq_samples": 2,
    "slq_num_matvecs": None,
    "objective": "gram",        # framework default: exact Gram objective
    "example_block": None,      # chunk example axis of W-row builds (memory cap)
    "restarts": 1,              # k-restart Z training, selected by full-set
                                # KL (RESULTS.md r4)
    "alpha_train": None,        # train Z at this prior precision instead of
                                # the pipeline alpha (landscape smoothing —
                                # evaluation still uses the pipeline alpha).
                                # RESULTS.md "Banana round 4": alpha_train=1
                                # tightens the fresh-rerun OOD-AUROC band
                                # from 75.7-88.0 to 80.9-84.8 on banana.
    # stochastic_matfree (d_z-unbounded CG-Woodbury) knobs — ignored by
    # the other objectives. Defaults follow the round-4 accuracy contract
    # (inference/sample.py::make_matheron_sampler): deflation ON, a tol the
    # preconditioned iteration actually reaches at GGN spectra.
    "cg_tol": 1e-3,
    "cg_maxiter": None,
    "precond_rank": 64,         # Nyström deflation rank (ops/nystrom.py)
    "precond_power": 0,         # sketch subspace-iteration passes
    "cg_example_block": None,   # blocked HIGHEST CG operator: bound the
                                # remote-compile graph to this many examples
                                # (core.operators.BlockedWFactor)
}

MAP_DEFAULTS = {
    "batch_size": 32,
    "epochs": 100,
    "lr": 1e-3,
    "seed": 0,
    "schedule": "constant",     # or "cosine"
}

SAMPLING_DEFAULTS = {
    "mc_samples": 100,
    "method": "gram_eigh",      # or "lanczos" / "matheron" (exact, no eigh)
    "invsqrt_num_matvecs": None,
    "predictive": "weight",     # or "cov" / "matfree" (d_z-unbounded)
    "sample_block": None,       # chunk the MC-sample axis (HBM cap)
    "jac_block": None,          # chunk the cov path's Jacobian build
    # matfree predictive CG knobs (accuracy contract:
    # inference/sample.py::make_matheron_sampler):
    "cg_tol": 1e-4,
    "cg_maxiter": None,
    "precond_rank": 64,
    "precond_power": 0,         # sketch subspace-iteration passes
    "cg_example_block": None,   # blocked HIGHEST CG operator (see IP_DEFAULTS)
}


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_experiment_config(path: str) -> Dict[str, Any]:
    """Load and normalize an experiment config."""
    cfg = load_yaml(path)
    opt = cfg.setdefault("optimization", {})
    for section, defaults in (("map", MAP_DEFAULTS), ("ip", IP_DEFAULTS)):
        merged = copy.deepcopy(defaults)
        merged.update(opt.get(section, {}))
        opt[section] = merged
    sampling = copy.deepcopy(SAMPLING_DEFAULTS)
    sampling.update(cfg.get("sampling", {}))
    cfg["sampling"] = sampling
    opt.setdefault("alpha", 1.0)
    opt.setdefault("full_set_size", None)
    return cfg
