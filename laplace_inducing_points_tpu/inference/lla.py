"""Linearized-Laplace (LLA) predictive distributions.

Parity: ``/root/reference/src/lla.py``. The dense path (small models) forms
the weight posterior ``N(θ_MAP, S⁻¹)`` and pushes it through per-datum
Jacobians; the scalable path draws posterior weight samples (inference.sample)
and pushes each through one **batched** jvp of the network at ``θ_MAP`` —
vmapped over the sample axis, not ``lax.map``-serial
(reference ``/root/reference/src/lla.py:155``).

A tiny in-house Gaussian container replaces the reference's
tensorflow-probability dependency (``/root/reference/src/lla.py:4``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.core import operators as ops
from laplace_inducing_points_tpu.core.params import flatten_nn_params, split_nn_params
from laplace_inducing_points_tpu.inference.sample import (_g_weights,
                                                          sample as sample_weights)
from laplace_inducing_points_tpu.ops.pallas.syrk import syrk


class Gaussian(NamedTuple):
    """Mean + full covariance, with the handful of ops the pipeline needs."""
    mean: jnp.ndarray           # (..., K)
    cov: jnp.ndarray            # (..., K, K)

    def stddev(self) -> jnp.ndarray:
        return jnp.sqrt(jnp.clip(
            jnp.diagonal(self.cov, axis1=-2, axis2=-1), 0.0))

    def sample(self, key: jax.Array, num_samples: int) -> jnp.ndarray:
        """(num_samples, ..., K) samples via Cholesky with jitter."""
        k = self.cov.shape[-1]
        jitter = 1e-8 * jnp.eye(k, dtype=self.cov.dtype)
        chol = jnp.linalg.cholesky(self.cov + jitter)
        eps = jax.random.normal(key, (num_samples,) + self.mean.shape,
                                dtype=self.mean.dtype)
        return self.mean + jnp.einsum("...ij,s...j->s...i", chol, eps)


def posterior_lla_dense(state: Any, X: jnp.ndarray, alpha,
                        full_set_size: Optional[int] = None) -> Gaussian:
    """Dense weight posterior ``N(θ_MAP, (GGN+αI)⁻¹)``.

    Parity: ``posterior_lla_dense`` (``/root/reference/src/lla.py:37-48``).
    """
    S_prec = ops.curvature_dense(state, X, alpha, full_set_size)
    cov = jnp.linalg.solve(S_prec, jnp.eye(S_prec.shape[0]))
    flat, _ = flatten_nn_params(state.params)
    return Gaussian(mean=flat, cov=cov)


def _per_datum_jacobians(state: Any, Xnew: jnp.ndarray) -> jnp.ndarray:
    lin = ops.linearize_model(state, Xnew)
    flat = lin.flat_params

    def jac_one(xi):
        return jax.jacrev(lambda p: lin.f_single(p, xi))(flat)   # (K, D)

    return jax.vmap(jac_one)(Xnew), lin.f0


def predict_lla_dense(state: Any, Xnew: jnp.ndarray, Z: jnp.ndarray, alpha,
                      full_set_size: Optional[int] = None) -> Gaussian:
    """Dense LLA predictive ``N(f(x*), J* S⁻¹ J*ᵀ)`` per datum.

    Parity: ``predict_lla_dense`` (``/root/reference/src/lla.py:51-82``).
    """
    S_prec = ops.curvature_dense(state, Z, alpha, full_set_size)
    S = jnp.linalg.solve(S_prec, jnp.eye(S_prec.shape[0]))
    J, f_mean = _per_datum_jacobians(state, Xnew)                # (N, K, D)
    f_cov = jnp.einsum("nkd,de,nle->nkl", J, S, J,
                       precision=jax.lax.Precision.HIGHEST)
    return Gaussian(mean=f_mean, cov=f_cov)


def predict_la_samples_dense(state: Any, Xnew: jnp.ndarray, Z: jnp.ndarray,
                             alpha, key: jax.Array,
                             full_set_size: Optional[int] = None,
                             num_mc_samples: int = 100) -> jnp.ndarray:
    """Non-linearized Laplace MC baseline: sample weights from the dense
    posterior, push each through the *full nonlinear* network.

    Parity: ``predict_la_samples_dense`` (``/root/reference/src/lla.py:84-129``).
    """
    S_prec = ops.curvature_dense(state, Z, alpha, full_set_size)
    cov = jnp.linalg.solve(S_prec, jnp.eye(S_prec.shape[0]))
    flat, unravel = flatten_nn_params(state.params)
    _, aux = split_nn_params(state.params)
    flat_samples = jax.random.multivariate_normal(
        key, mean=flat, cov=cov, shape=(num_mc_samples,),
        method="svd")

    def apply_flat(fp):
        return ops.model_outputs(state, {**unravel(fp), **aux}, Xnew)

    return jax.vmap(apply_flat)(flat_samples)                    # (S, N, K)


def predict_lla_scalable(state: Any, Xnew: jnp.ndarray, Z: jnp.ndarray,
                         alpha, key: Optional[jax.Array] = None,
                         full_set_size: Optional[int] = None,
                         num_samples: int = 1,
                         sample_method: str = "gram_eigh",
                         **sample_kwargs) -> jnp.ndarray:
    """Scalable LLA: logit samples ``f(x*) + J* δθ_s`` with matrix-free
    posterior draws.

    Parity: ``predict_lla_scalable`` (``/root/reference/src/lla.py:133-156``)
    — returns ``(num_samples, N, K)`` logit samples. The push-forward is a
    vmapped jvp of one stored linearization at ``Xnew``.
    """
    key = key if key is not None else jax.random.PRNGKey(123)
    w_samples = sample_weights(state, Z, alpha, key,
                               num_samples=num_samples,
                               full_set_size=full_set_size,
                               method=sample_method, **sample_kwargs)
    lin = ops.linearize_model(state, Xnew)
    dys = jax.vmap(lin.jvp)(w_samples)                           # (S, N, K)
    return lin.f0[None] + dys


@partial(jax.jit,
         static_argnames=("num_samples", "rank_tol", "range_clip_min",
                          "sample_block", "sample_sharding"))
def _amortized_logit_samples(state, R, lam, V, alpha, beta, x, key,
                             num_samples: int, rank_tol: float,
                             range_clip_min, sample_block=None,
                             sample_sharding=None):
    """One jitted eval step: posterior weight draws through the PREBUILT
    spectral factor + linearized push-forward at ``x``.

    ``alpha`` is traced, so an alpha grid search reuses this executable.
    ``sample_block`` bounds peak memory: the vmapped jvp push-forward holds
    (S, B, activation) temps — at ResNet1M/batch 256/S=200 that is >25 GB
    of HBM (observed OOM); chunking the sample axis through ``lax.map``
    caps it at (sample_block, B, activation) per step.
    ``sample_sharding`` (a ``NamedSharding`` over the sample axis) lays the
    MC draws across a device mesh: each device draws and pushes forward its
    own sample shard — no collectives in the hot loop, since ``R``/``V``
    and the linearization are replicated."""
    g = _g_weights(lam, alpha, beta, rank_tol, range_clip_min)
    lin = ops.linearize_model(state, x)

    def draw(k, n: int):
        eps = jax.random.normal(k, (n, R.shape[1]))
        if sample_sharding is not None:
            eps = jax.lax.with_sharding_constraint(eps, sample_sharding)
        # HIGHEST everywhere: the correction CANCELS the prior draw along
        # high-curvature directions, and any relative error δ in these
        # contractions re-enters the logits amplified by ~√λ_max (the jvp
        # sensitivity along stiff directions). bf16-mul contractions
        # (δ≈1e-2) were tried and flipped flagship CIFAR accuracy
        # 100%→84% at λ_max≈2e5; exact f32 is mandatory here, unlike the
        # trace-estimator sweeps where errors enter linearly.
        U = ops.pdot(eps, R.T)                             # (n, d)
        mixed = ops.pdot(U, V) * g                         # (n, d) · diag(g)
        w = eps / jnp.sqrt(alpha) + ops.pdot(ops.pdot(mixed, V.T), R)
        return jax.vmap(lin.jvp)(w)                        # (n, B, K)

    if not sample_block or sample_block >= num_samples:
        return lin.f0[None] + draw(key, num_samples)
    n_chunks = -(-num_samples // sample_block)
    keys = jax.random.split(key, n_chunks)
    dys = jax.lax.map(lambda k: draw(k, sample_block), keys)
    dys = dys.reshape((n_chunks * sample_block,) + dys.shape[2:])
    return lin.f0[None] + dys[:num_samples]


@partial(jax.jit, static_argnames=("jac_block",))
def _jitted_jac_stats(state, x, R, jac_block):
    return ops.predictive_jac_stats(state, x, R, jac_block=jac_block)


@partial(jax.jit, static_argnames=("rank", "power", "example_block"))
def _jitted_nystrom_sketch(state, Z, beta, rank: int, key, power: int = 0,
                           example_block: Optional[int] = None):
    """Nyström sketch of ``β·Gzz`` for the matfree predictor, amortized per
    ``(state, Z)`` — the ``rank`` Gram matvecs are the expensive part; the
    α-dependent tail is O(rank) inside the per-batch step."""
    from laplace_inducing_points_tpu.ops.nystrom import (
        nystrom_sketch, sketch_probe_block)
    # HIGHEST precision: this sketch preconditions the eval CG whose
    # operator runs at HIGHEST (bf16 matvecs floor the CG residual at
    # ~ε·λ_max/α — see training/inducing.py's matfree branch).
    # ``example_block``: blocked factor so the HIGHEST graph stays within
    # the remote compile helper's memory at M ≥ 1024 (BlockedWFactor).
    if example_block:
        w = ops.make_w_factor_blocked(state, Z, example_block,
                                      full_set_size=None,
                                      matmul_precision="highest")
    else:
        w = ops.make_w_factor(state, Z, full_set_size=None,
                              matmul_precision="highest")
    M_, K_ = w.inner_shape
    d = M_ * K_
    blk = sketch_probe_block(M_, rank)

    def gram_mm(V):
        return beta * w.gram_matmat(V, block=blk)

    return nystrom_sketch(gram_mm, d, rank, key, power=power)


@partial(jax.jit, static_argnames=("num_samples", "cg_tol", "cg_maxiter",
                                   "sample_block", "sample_sharding",
                                   "example_block"))
def _matfree_logit_samples(state, Z, nys_U, nys_lam, nys_good, alpha, beta,
                           x, key, num_samples: int, cg_tol: float,
                           cg_maxiter, sample_block=None,
                           sample_sharding=None, example_block=None):
    """One jitted eval step of the ``d_z``-UNBOUNDED predictive: Matheron
    posterior draws by preconditioned CG against the matrix-free Gram
    operator + the linearized push-forward at ``x``. Nothing of size
    ``d_z × D`` or ``d_z × d_z`` is ever materialized — this is the
    evaluation path for checkpoints whose inducing set exceeds the
    eigh/HBM range of :func:`_amortized_logit_samples` (VERDICT r3 item 3).

    RNG contract: ``key`` splits into (ε, η) exactly like
    ``inference.sample.sample(method="matheron")``, so at equal CG
    configuration the draws match that path bit-for-bit (pinned by
    ``tests/test_predictor.py``). Returns ``(logit samples, worst CG
    relative residual)`` — a residual ≫ ``cg_tol`` means maxiter exits
    (the caller warns; see ``make_matheron_sampler``'s accuracy contract).
    """
    from laplace_inducing_points_tpu.inference.sample import (
        _batch_rel_residual)
    from laplace_inducing_points_tpu.ops.nystrom import precond_from_sketch

    # HIGHEST-precision factor throughout: (a) the CG operator — bf16
    # matvecs floor the residual at ~ε·λ_max/α no matter the
    # preconditioner (round-5 root cause, training/inducing.py); (b) the
    # Matheron cancellation ``eps − √β·W X`` — a posterior-SAMPLE
    # contraction, where bf16 error re-enters the draws amplified ~√λ_max
    # (core.operators.pdot postmortem).
    if example_block:
        wz = ops.make_w_factor_blocked(state, Z, example_block,
                                       full_set_size=None,
                                       matmul_precision="highest")
    else:
        wz = ops.make_w_factor(state, Z, full_set_size=None,
                               matmul_precision="highest")
    M_, K_ = wz.inner_shape
    d = M_ * K_
    D = wz.num_params
    sqrt_alpha = jnp.sqrt(alpha)
    sqrt_beta = jnp.sqrt(beta)
    precond = (precond_from_sketch(nys_U, nys_lam, nys_good, alpha)
               if nys_U is not None else None)
    maxiter = cg_maxiter or 10 * d
    lin = ops.linearize_model(state, x)

    def draw(k, n: int):
        from laplace_inducing_points_tpu.ops import cg as cg_mod
        from laplace_inducing_points_tpu.ops.nystrom import sketch_probe_block
        k1, k2 = jax.random.split(k)
        eps = jax.random.normal(k1, (n, D))
        eta = jax.random.normal(k2, (n, d))
        if sample_sharding is not None:
            eps = jax.lax.with_sharding_constraint(eps, sample_sharding)
            eta = jax.lax.with_sharding_constraint(eta, sample_sharding)
        U = sqrt_beta * wz.t_matmat(eps).reshape(n, d) + sqrt_alpha * eta
        # batched CG, draws as loop state — vmap-of-cg over the HIGHEST
        # operator OOM-SIGKILLs the remote compile helper (round 5;
        # ops/cg.py module docstring)
        cgblk = sketch_probe_block(M_, n)

        def c_matmat(Xm):                                        # (n, d)
            return beta * wz.gram_matmat(Xm, block=cgblk) + alpha * Xm

        X = cg_mod.cg_batched(
            c_matmat, U, tol=cg_tol, maxiter=maxiter,
            precond=cg_mod.rowwise(precond) if precond is not None else None)
        res = _batch_rel_residual(c_matmat(X), U)
        w_draws = (eps - sqrt_beta
                   * wz.matmat(X.reshape(-1, M_, K_))) / sqrt_alpha
        return jax.vmap(lin.jvp)(w_draws), res                   # (n, B, K)

    if not sample_block or sample_block >= num_samples:
        dys, res = draw(key, num_samples)
        return lin.f0[None] + dys, res
    n_chunks = -(-num_samples // sample_block)
    keys = jax.random.split(key, n_chunks)
    dys, res = jax.lax.map(lambda k: draw(k, sample_block), keys)
    dys = dys.reshape((n_chunks * sample_block,) + dys.shape[2:])
    return lin.f0[None] + dys[:num_samples], jnp.max(res)


@partial(jax.jit, static_argnames=("num_samples", "rank_tol",
                                   "range_clip_min"))
def _joint_logit_samples(f0, JJt, A, gram, lam, V, alpha, beta, key,
                         num_samples: int, rank_tol: float,
                         range_clip_min):
    """Logit samples from the per-image predictive statistics.

    Per image the predictive is the K-dim Gaussian ``N(f0, Σ)`` with
    ``Σ = J S⁻¹ Jᵀ``, assembled from ``A = J Rᵀ`` by expanding EXACTLY
    what the (oracle-validated) weight-space draw computes, marginalized
    per image: with the g-form factor ``S^{-1/2} = I/√α + Rᵀ H R``,
    ``H = V diag(g) Vᵀ``,

        Σ = JJᵀ/α + A·[ (2/√α)·H + H·Gzz·H ]·Aᵀ

    Every operator here is BOUNDED (g is bounded in λ, clip included) and
    the quadratic uses the true ``Gzz``, not its eigh reconstruction.
    That matters: three numerically-naive assemblies were tried and
    rejected with measured failures —

    * spectral q-form ``A V diag(q) Vᵀ Aᵀ``: relies on ``Vᵀ Gzz V = Λ``,
      but at a 5-decade f32 spectrum (LeNet: 764/1000 eigenvalues below
      tolerance) the eigh residual, weighted by q, produced predictive
      variances down to −170 where a CG oracle gives ~10 — silently
      shrinking the predictive (ACC 95.5%→98.5%);
    * Woodbury Cholesky solve of ``αI + βGzz``: exact where it factors,
      but κ = 1 + βλ_max/α ≈ 2e7 at the flagship CIFAR point exceeds
      f32 Cholesky's range → NaN;
    * a 2K×2K joint of (prior, correction) draws (near-singular → NaN)
      and a range/null split (1/λ round-off amplification, ACC −15%).

    Σ is symmetrized and sampled through a per-image K×K eigh with
    eigenvalues clipped at 0. Images draw independently, which leaves
    every per-image marginal — hence NLL/ACC/Brier/ECE/AUROC — identical
    in distribution to the shared-ε weight-space path (tested against the
    dense twin, the weight path, and a matrix-free CG oracle)."""
    B, K = f0.shape
    g = _g_weights(lam, alpha, beta, rank_tol, range_clip_min)
    H = ops.pdot(V * g, V.T)                                  # (d_z, d_z)
    Hp = (2.0 / jnp.sqrt(alpha)) * H + ops.pdot(ops.pdot(H, gram), H)
    Sigma = JJt / alpha + jnp.einsum(
        "bkd,de,ble->bkl", A, Hp, A,
        precision=jax.lax.Precision.HIGHEST)

    Sigma = 0.5 * (Sigma + jnp.swapaxes(Sigma, -1, -2))
    ev, Q = jnp.linalg.eigh(Sigma)
    L = Q * jnp.sqrt(jnp.maximum(ev, 0.0))[..., None, :]      # (B, K, K)

    eta = jax.random.normal(key, (num_samples, B, K))
    return f0[None] + jnp.einsum("bkj,sbj->sbk", L, eta)      # (S, B, K)


class ScalableLLAPredictor:
    """Amortized IP-LLA predictive for a fixed ``(state, Z)``.

    ``predict_lla_scalable`` rebuilds the ``(d×D)`` row factor, its SYRK
    Gram, and the ``d×d`` eigendecomposition for EVERY call — at ResNet1M
    scale that factor build dominates evaluation (reference eval loop:
    ``/root/reference/scale_experiments/evaluate.py:316-337``). This class
    builds the factor ONCE; each batch then costs two MXU matmuls plus one
    batched jvp, all inside a single jitted step. ``alpha`` stays traced,
    so alpha grid searches also share the factor and the executable.

    ``mesh`` scales evaluation across chips: the posterior factor and the
    linearization are replicated over the mesh and the MC-sample axis is
    sharded along ``mesh_axis`` — each device draws and pushes forward
    ``S / n_devices`` samples with no collectives in the per-batch step
    (the natural data-parallel decomposition of MC prediction). Values are
    identical to the single-device path (sharding changes layout, not
    math); pinned by ``tests/test_sharding.py``.

    ``method="cov"`` replaces the per-sample jvp push-forward (95% of
    flagship eval time, RESULTS.md) with the per-image predictive
    sufficient statistics ``(f0, JJᵀ, (J Rᵀ)V)`` — K backward passes per
    image instead of one jvp per MC sample, then samples come from a
    per-image 2K×2K Gaussian with the SAME distribution as the
    weight-space draw (``_joint_logit_samples``). The statistics are
    α-independent; pass ``cache_key`` (e.g. the batch index) to reuse them
    across repetitions and α grid points at zero marginal Jacobian cost.
    The reference computes this covariance form only in its dense D×D path
    (``/root/reference/src/lla.py:51-82``); here the Gram spectral factor
    makes it the scalable one.

    ``method="matfree"`` (round 4) is the ``d_z``-UNBOUNDED evaluation
    path: Matheron posterior draws by Nyström-preconditioned CG against
    the matrix-free Gram operator + the same batched jvp push-forward —
    nothing of size ``d_z × D`` or ``d_z × d_z`` is built, so checkpoints
    trained with the ``stochastic_matfree`` objective at inducing counts
    beyond the eigh/HBM range evaluate end-to-end (the reference's
    ``predict_lla_scalable``, ``/root/reference/src/lla.py:133-156``, has
    no analog — its sampler materializes the Gram). ``range_clip_min`` is
    ignored here (exact sampler); CG accuracy contract + the
    maxiter-exit warning: ``make_matheron_sampler``. The amortized state
    is only the ``(d_z, precond_rank)`` sketch.
    """

    def __init__(self, state: Any, Z: jnp.ndarray, *,
                 full_set_size: Optional[int] = None,
                 example_block: Optional[int] = None,
                 rank_tol: float = 1e-7,
                 range_clip_min: Optional[float] = None,
                 sample_block: Optional[int] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 mesh_axis: str = "data",
                 method: str = "weight",
                 jac_block: Optional[int] = None,
                 cg_tol: float = 1e-4,
                 cg_maxiter: Optional[int] = None,
                 precond_rank: Optional[int] = 64,
                 precond_power: int = 0,
                 precond_key: Optional[jax.Array] = None,
                 cg_example_block: Optional[int] = None,
                 eigh_host: Optional[bool] = None):
        M = Z.shape[0]
        if method not in ("weight", "cov", "matfree"):
            raise ValueError(f"unknown predictive method {method!r}")
        self.state = state
        self.beta = float(full_set_size or M) / M
        self.rank_tol = rank_tol
        self.range_clip_min = range_clip_min
        self.sample_block = sample_block
        self.method = method
        self.jac_block = jac_block
        self._stats_cache: dict = {}
        self.sample_sharding = None
        repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            self.state = jax.device_put(self.state, repl)
            self.sample_sharding = NamedSharding(mesh, P(mesh_axis))

        if method == "matfree":
            # d_z-unbounded: NO (d_z × D) row factor, NO d_z×d_z Gram/eigh —
            # only the (d_z, rank) Nyström sketch is stored. range_clip_min
            # is a spectral-sampler feature and is ignored here (Matheron
            # draws are exact); the CG accuracy contract lives in
            # ``make_matheron_sampler``'s docstring.
            self.Z = (jax.device_put(Z, repl) if repl is not None
                      else jnp.asarray(Z))
            self.cg_tol = cg_tol
            self.cg_maxiter = cg_maxiter
            self.cg_example_block = cg_example_block
            self._cg_warned = False
            if sample_block is None:
                # each CG iteration of a draw chunk keeps chunk·M examples'
                # tangent activations live — bound it like the sketch sweep
                from laplace_inducing_points_tpu.ops.nystrom import (
                    sketch_probe_block)
                self.sample_block = sketch_probe_block(M, 1 << 30)
            self.nys = None
            if precond_rank:
                K_out = int(ops.model_outputs(
                    state, state.params, Z[:1]).shape[-1])
                d_z = M * K_out
                self.nys = _jitted_nystrom_sketch(
                    self.state, self.Z, self.beta,
                    min(precond_rank, d_z),
                    precond_key if precond_key is not None
                    else jax.random.PRNGKey(0x4E59),
                    power=precond_power,
                    example_block=cg_example_block)
                if repl is not None:
                    self.nys = jax.device_put(self.nys, repl)
            return

        self.R = ops.dense_wt(state, Z, example_block=example_block)
        self.gram = syrk(self.R)
        sym = ops.ensure_symmetry(self.gram, jitter=0.0)
        if eigh_host is None:
            # XLA:TPU's eigh (QDWH-eig) allocates tens of d_z×d_z HBM
            # temps inside its polar while-loop; with the (d_z, D) row
            # factor resident this OOMs a 16 GiB v5e at d_z = 10,240
            # (measured round 5: M=1024 LeNet5 eval, qdwh triangular_solve
            # temps of ~330 MiB each). The one-time factor build is not a
            # hot path, so past that point pull the d_z² Gram to the host
            # and run LAPACK ssyevd there (f32 throughout — no f64 enters
            # the computation), then ship the factor back. Device eigh
            # stays the default everywhere the workspace fits.
            eigh_host = (sym.shape[0] >= 8192
                         and jax.default_backend() == "tpu")
        if eigh_host:
            import numpy as np
            lam_h, v_h = np.linalg.eigh(np.asarray(jax.device_get(sym)))
            self.lam = jnp.asarray(lam_h)
            self.V = jnp.asarray(v_h)
        else:
            self.lam, self.V = jnp.linalg.eigh(sym)
        if repl is not None:
            self.R = jax.device_put(self.R, repl)
            self.gram = jax.device_put(self.gram, repl)
            self.lam = jax.device_put(self.lam, repl)
            self.V = jax.device_put(self.V, repl)

    def _cov_self_check(self, x, alpha, cov_draws, n_check: int = 64):
        """One-time f32-regime guard for ``method="cov"``.

        The covariance pushdown must resolve Σ = J S⁻¹ Jᵀ from terms
        ~JJᵀ/α — a cancellation by the posterior's contraction ratio in
        VARIANCE space. Past ~1e4 (flagship CIFAR: α·Σ/JJᵀ ≈ 1e-5) that
        exceeds f32 and Σ comes out wrong even in exact-arithmetic-correct
        assemblies (measured against a CG oracle; docs/DESIGN.md §4b).
        The weight-space draw only pays the ratio's SQUARE ROOT, so on the
        first batch we draw a small weight-path sample and compare
        per-image variances; a >2× median mismatch prints a loud warning
        to switch ``method="weight"`` for this operating point.
        """
        if getattr(self, "_cov_checked", False):
            return
        self._cov_checked = True
        del cov_draws  # may hold too few samples for a variance estimate
        xs = jnp.asarray(x, dtype=jnp.float32)
        w_draws = _amortized_logit_samples(
            self.state, self.R, self.lam, self.V, alpha, self.beta,
            xs, jax.random.PRNGKey(0), n_check, self.rank_tol,
            self.range_clip_min, self.sample_block, self.sample_sharding)
        f0, JJt, A = self.batch_stats(xs)
        c_draws = _joint_logit_samples(
            f0, JJt, A, self.gram, self.lam, self.V, alpha, self.beta,
            jax.random.PRNGKey(1), n_check, self.rank_tol,
            self.range_clip_min)
        v_w = jnp.var(w_draws, axis=0)
        v_c = jnp.var(c_draws, axis=0)
        ratio = v_w / jnp.maximum(v_c, 1e-12)
        # regime failure clips a MINORITY of entries to near-zero variance
        # (measured at the flagship: median ratio ~1 but ~half the classes
        # of some images off by >>3x), so test the TAIL, not the median:
        # with ~±25% MC noise per side at n_check=64, legitimate entries
        # exceed 3x only in the extreme tails
        frac_bad = float(jnp.mean((ratio < 1.0 / 3) | (ratio > 3.0)))
        # per-entry false-positive prob at 3x is ~5e-6 (4.4 sigma of the
        # log-ratio noise), so >2% of entries outside the band is signal
        if frac_bad > 0.02:
            import warnings
            warnings.warn(
                f"ScalableLLAPredictor(method='cov'): "
                f"{100 * frac_bad:.0f}% of per-image logit variances "
                f"disagree with a weight-path draw by >3x — the "
                f"posterior's contraction ratio at this operating point "
                f"likely exceeds the f32 covariance-assembly range. Use "
                f"method='weight' (--predictive weight) here; see "
                f"docs/DESIGN.md 4b.", stacklevel=3)

    def batch_stats(self, x: jnp.ndarray, cache_key=None):
        """α-independent per-image stats for ``method="cov"`` (cached).

        ``cache_key`` must uniquely identify the batch CONTENT among all
        callers sharing this predictor — the evaluation harness namespaces
        its keys by loader identity and batch index. A shape guard catches
        accidental key collisions between differently-shaped batches;
        same-shape collisions are the caller's contract to avoid.
        """
        if cache_key is not None and cache_key in self._stats_cache:
            shape, stats = self._stats_cache[cache_key]
            if shape == x.shape:
                return stats
        stats = _jitted_jac_stats(self.state, jnp.asarray(x, jnp.float32),
                                  self.R, self.jac_block)
        if cache_key is not None:
            self._stats_cache[cache_key] = (tuple(x.shape), stats)
        return stats

    def logit_samples(self, x: jnp.ndarray, alpha, key: jax.Array,
                      num_samples: int, cache_key=None) -> jnp.ndarray:
        """(num_samples, B, K) predictive logit samples for one batch."""
        if self.method == "matfree":
            out, res = _matfree_logit_samples(
                self.state, self.Z,
                *(self.nys if self.nys is not None else (None, None, None)),
                alpha, self.beta, jnp.asarray(x, dtype=jnp.float32), key,
                num_samples, self.cg_tol, self.cg_maxiter,
                self.sample_block, self.sample_sharding,
                self.cg_example_block)
            # threshold floored at the f32-attainable residual (~1e-5):
            # a cg_tol below round-off is a fully-converged solve, not a
            # maxiter stall
            if (not self._cg_warned
                    and float(res) > max(5 * self.cg_tol, 1e-5)):
                self._cg_warned = True
                import warnings
                warnings.warn(
                    f"ScalableLLAPredictor(method='matfree'): worst CG "
                    f"relative residual {float(res):.2e} exceeds "
                    f"5x cg_tol={self.cg_tol:g} — CG is exiting on maxiter, "
                    f"not tolerance. Draw error is bounded by the residual; "
                    f"raise precond_rank and/or cg_maxiter (accuracy "
                    f"contract: inference/sample.py::make_matheron_sampler).",
                    stacklevel=2)
            return out
        if self.method == "cov":
            f0, JJt, A = self.batch_stats(x, cache_key)
            out = _joint_logit_samples(
                f0, JJt, A, self.gram, self.lam, self.V, alpha, self.beta,
                key, num_samples, self.rank_tol, self.range_clip_min)
            self._cov_self_check(x, alpha, out)
            return out
        return _amortized_logit_samples(
            self.state, self.R, self.lam, self.V, alpha, self.beta,
            jnp.asarray(x, dtype=jnp.float32), key, num_samples,
            self.rank_tol, self.range_clip_min, self.sample_block,
            self.sample_sharding)


def materialize_covariance(f_cov_vp, n: int, out_dim: int,
                           mode: str = "diag") -> jnp.ndarray:
    """Probe a covariance operator into its diagonal or full matrix.

    Parity: ``materialize_covariance`` (``/root/reference/src/lla.py:160-217``)
    — but the basis probes are vmapped, not a ``fori_loop``.
    """
    k = n * out_dim
    eye = jnp.eye(k)
    cols = jax.vmap(lambda e: f_cov_vp(e).reshape(k))(eye)       # (k, k)
    if mode == "diag":
        return jnp.diagonal(cols).reshape(n, out_dim)
    if mode == "full":
        return cols.T
    raise ValueError("mode must be 'diag' or 'full'")
