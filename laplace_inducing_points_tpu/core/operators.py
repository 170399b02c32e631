"""Matrix-free PSD linear-operator algebra over network curvature.

This is the framework's L1: the reference buries the same algebra in ad-hoc
closures with **per-example** ``fori_loop``/``vmap`` jvp+vjp pairs
(``/root/reference/src/ggn.py:9-144``). TPU-first redesign:

* The network is applied **batched** over the point set ``Z`` once and
  linearized once (``jax.linearize`` / ``jax.vjp``). A GGN or W-factor
  matvec then costs ONE jvp (or vjp) of the batched function — the example
  axis rides the MXU as matmul batch dimensions instead of a sequential loop.
* Probe batches (``matmat``) are ``vmap``-ed over the stored linearization,
  so Hutch++/SLQ probe sweeps are a single fused XLA computation.
* Dense Gram matrices ``WᵀW`` (``d_z × d_z``, small) are built from the
  materialized per-example Jacobian (one vmapped ``jacrev``) followed by a
  single MXU rank-k update — not ``d_z`` sequential one-hot probes
  (reference ``/root/reference/src/ggn.py:198-272``). A memory-bounded
  blocked fallback is provided for large ``M·K·D``.

Operator glossary (D = #params, M = #points, K = #outputs, d = M·K):

* ``W : R^{M×K} -> R^D``, ``W U = c · Σ_i J_iᵀ L_i U_i`` — the GGN factor,
  ``GGN = W Wᵀ``; ``c = sqrt(N/M)`` recalibration.
* ``Wᵀ : R^D -> R^{M×K}``, ``(Wᵀ v)_i = c · L_iᵀ J_i v``.
* ``GGN v = c² Σ_i J_iᵀ H_i J_i v`` with ``H_i = L_i L_iᵀ``.
* ``Curvature = GGN + αI`` (PSD by construction).

All operators are differentiable w.r.t. the point set ``Z`` (closed over by
the linearization), which the inducing-point KL objective requires.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from laplace_inducing_points_tpu.core import loss_hessians as lh
from laplace_inducing_points_tpu.core.params import flatten_nn_params, split_nn_params


def pdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul for Gram/posterior algebra AND every
    posterior-SAMPLE contraction.

    JAX's default matmul precision may run reduced-precision passes (bf16
    on the TPU MXU). Grams and posterior solves feed Cholesky/eigh; sample
    contractions cancel the prior draw along high-curvature directions, so
    any relative contraction error re-enters the pushed-forward samples
    amplified by ~√λ_max (bf16's ~1e-2 flipped flagship CIFAR accuracy
    100%→84% — postmortem in ``inference/lla.py``). Only TRACE-ESTIMATOR
    sweeps, where error enters linearly and sits far below 1/√P
    statistical noise, may run at DEFAULT precision — that path lives in
    ``ops.pallas.matmul.ggn_sweep``.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def model_outputs(state: Any, params: Any, x: jnp.ndarray,
                  batch_stats: Any = None) -> jnp.ndarray:
    """Batched network outputs ``(M, K)`` with frozen aux collections.

    Uniform eval-mode apply for all model kinds. BatchNorm runs with running
    statistics (reference freezes ``batch_stats`` inside jvp/vjp,
    ``/root/reference/src/ggn.py:47-52``); the regressor's ``(mu, logvar)``
    tuple is reduced to ``mu``.
    """
    variables = {"params": params}
    bs = state.batch_stats if batch_stats is None else batch_stats
    if bs:
        variables["batch_stats"] = bs
    out = state.apply_fn(variables, x, train=False)
    if isinstance(out, tuple):
        out = out[0]
    return out


@dataclass(frozen=True)
class Linearization:
    """Batched first-order model expansion at the current parameters.

    Holds the primal outputs plus jvp/vjp closures of the *batched* apply,
    created once per (state, Z) pair and reused across all probes.
    """
    model_kind: str
    flat_params: jnp.ndarray          # (D,)
    f0: jnp.ndarray                   # (M, K) primal outputs
    jvp: Callable[[jnp.ndarray], jnp.ndarray]      # (D,) -> (M, K)
    vjp: Callable[[jnp.ndarray], jnp.ndarray]      # (M, K) -> (D,)
    logvar: jnp.ndarray | float       # scalar for regressors, 0 otherwise
    f_of_flat: Callable[[jnp.ndarray], jnp.ndarray] = field(repr=False, default=None)
    f_single: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = field(repr=False, default=None)
    inputs: jnp.ndarray = field(repr=False, default=None)   # (M, ...) points

    @property
    def num_points(self) -> int:
        return self.f0.shape[0]

    @property
    def out_dim(self) -> int:
        return self.f0.shape[-1]

    @property
    def num_params(self) -> int:
        return self.flat_params.shape[0]


def linearize_model(state: Any, Z: jnp.ndarray,
                    matmul_precision: Optional[str] = None) -> Linearization:
    """Linearize the batched network apply at the state's parameters.

    Replaces the reference's per-example ``model_fun``/``fzi`` closures
    (``/root/reference/src/ggn.py:41-52``) with one batched linearization.

    ``matmul_precision``: when set (e.g. ``"highest"``), every matmul/conv
    bound inside the linearized apply — and therefore inside every jvp/vjp
    this linearization serves — runs at that precision. Needed wherever a
    W/GGN matvec is the OPERATOR of an iterative solve: on the TPU MXU the
    default is bf16 passes (relative error ~4e-3), and a Krylov solve on
    ``G + ρI`` cannot push its relative residual below ~ε·λ_max/ρ no
    matter how well preconditioned — at the trained-MAP flagship Gram
    (λ_max≈2.1e6, ρ≈25) that floor is ≫1, i.e. CG makes NO progress
    (measured, round 5; see ``training/inducing.py``). Estimator probe
    sweeps, where error enters linearly and sits far below 1/√P noise,
    keep the ~6× cheaper default (None).
    """
    flat, unravel = flatten_nn_params(state.params)
    _, aux = split_nn_params(state.params)
    kind = state.model_kind

    if matmul_precision is None:
        def _prec_ctx():
            import contextlib
            return contextlib.nullcontext()
    else:
        def _prec_ctx():
            return jax.default_matmul_precision(matmul_precision)

    def f(flat_p: jnp.ndarray) -> jnp.ndarray:
        params = {**unravel(flat_p), **aux}
        with _prec_ctx():
            return model_outputs(state, params, Z)

    def f_single(flat_p: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
        params = {**unravel(flat_p), **aux}
        with _prec_ctx():
            return model_outputs(state, params, zi[None])[0]

    f0, jvp_fn = jax.linearize(f, flat)
    _, vjp_raw = jax.vjp(f, flat)
    vjp_fn = lambda ct: vjp_raw(ct)[0]

    logvar = 0.0
    if kind == lh.REGRESSOR and "logvar" in state.params:
        logvar = state.params["logvar"]
        # tolerate either a raw leaf or a nested {'logvar': leaf} collection
        if isinstance(logvar, dict):
            logvar = logvar["logvar"]

    return Linearization(model_kind=kind, flat_params=flat, f0=f0,
                         jvp=jvp_fn, vjp=vjp_fn, logvar=logvar,
                         f_of_flat=f, f_single=f_single, inputs=Z)


# ---------------------------------------------------------------------------
# W factor
# ---------------------------------------------------------------------------

def _probe_blocked(batched_fn, V: jnp.ndarray,
                   block: Optional[int]) -> jnp.ndarray:
    """Apply a vmapped per-probe fn over ``V``'s leading axis in sequential
    ``lax.map`` chunks of ``block`` rows (pad-and-trim keeps one compiled
    chunk shape). ``block=None`` (or ≥ P) is the plain one-shot vmap."""
    P = V.shape[0]
    if block is None or block >= P:
        return batched_fn(V)
    pad = (-P) % block
    Vp = jnp.concatenate([V, V[:pad]]) if pad else V
    out = jax.lax.map(batched_fn, Vp.reshape(-1, block, *V.shape[1:]))
    return out.reshape(-1, *out.shape[2:])[:P]


@dataclass(frozen=True)
class WFactor:
    """The GGN square-root factor ``W`` as a matrix-free operator.

    Parity: ``compute_W_vps`` (``/root/reference/src/ggn.py:9-94``) — but
    batched: ``t_matvec`` is one jvp of the batched network, not ``M``
    per-example jvps, and ``matmat``/``t_matmat`` vmap the probe axis.
    """
    lin: Linearization
    scale: jnp.ndarray | float      # sqrt(N/M) recalibration

    # -- matrix-free actions -------------------------------------------------
    def t_matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        """``Wᵀ v``: ``(D,) -> (M, K)``."""
        jv = self.lin.jvp(v)
        return self.scale * lh.sqrt_h_t_apply(self.lin.model_kind, self.lin.f0,
                                              jv, self.lin.logvar)

    def matvec(self, U: jnp.ndarray) -> jnp.ndarray:
        """``W U``: ``(M, K) -> (D,)``."""
        lU = lh.sqrt_h_apply(self.lin.model_kind, self.lin.f0, U, self.lin.logvar)
        return self.scale * self.lin.vjp(lU)

    def t_matmat(self, V: jnp.ndarray,
                 block: Optional[int] = None) -> jnp.ndarray:
        """Batched ``Wᵀ`` over probes: ``(P, D) -> (P, M, K)``.

        ``block``: sweep probes in sequential ``lax.map`` chunks of this
        size. The full vmap keeps P·M examples' tangent activations live
        at once — at M=4096 LeNet5 a rank-64 preconditioner sweep needs
        >16 GB and OOMs the 15.75 GB chip (measured, round 4); chunking
        bounds it to ``block``·M.
        """
        return _probe_blocked(jax.vmap(self.t_matvec), V, block)

    def matmat(self, U: jnp.ndarray,
               block: Optional[int] = None) -> jnp.ndarray:
        """Batched ``W`` over probes: ``(P, M, K) -> (P, D)``.

        ``block``: as in :meth:`t_matmat`.
        """
        return _probe_blocked(jax.vmap(self.matvec), U, block)

    def gram_matmat(self, V: jnp.ndarray,
                    block: Optional[int] = None) -> jnp.ndarray:
        """Blocked Gram action ``Wᵀ(W ·)``: ``(P, d) -> (P, d)`` on FLAT
        probe rows (``d = M·K``), unscaled by β.

        One fused probe sweep (jvp+vjp per chunk) instead of two, so a
        ``block`` bounds the live tangent activations of BOTH legs. This is
        the memory-critical inner op of every Nyström preconditioner
        sketch (``ops.nystrom``).
        """
        Mk, Kk = self.inner_shape
        d = Mk * Kk

        def one(v):
            return self.t_matvec(self.matvec(v.reshape(Mk, Kk))).reshape(d)

        return _probe_blocked(jax.vmap(one), V, block)

    # -- shapes ---------------------------------------------------------------
    @property
    def d(self) -> int:
        """Columns of W (= M·K)."""
        return self.lin.num_points * self.lin.out_dim

    @property
    def inner_shape(self) -> Tuple[int, int]:
        return (self.lin.num_points, self.lin.out_dim)

    @property
    def num_params(self) -> int:
        return self.lin.num_params

    # -- dense materializations ----------------------------------------------
    def gram(self, block: Optional[int] = None) -> jnp.ndarray:
        """Dense ``WᵀW`` (``d × d``) from example-blocked row factors.

        Cost model (round-3 redesign). Probing the Gram with one-hot /
        identity columns through ``matvec``/``t_matvec`` — the reference's
        construction (``/root/reference/src/ggn.py:198-230``) and this
        method's pre-round-3 form — pays a FULL-BATCH jvp+vjp per probe
        column even though each column touches a single example:
        ``2·M²K`` single-example passes total. Building per-example row
        factors ``R_p = LᵀJ`` instead costs ``K`` backward passes per
        example, and ``G[p,q] = R_p R_qᵀ`` assembles the Gram on the MXU:

        * ``block=None`` — all rows in one vmapped sweep + one SYRK:
          ``M·K`` passes, peak extra memory ``d × D`` (the same order the
          old identity sweep's probe intermediates already held).
        * ``block=b`` — pairwise example blocks of ``b//K`` examples,
          lower triangle only, under a double ``lax.map``: two row-factor
          blocks of ``block`` Gram rows each are live at once, so peak
          extra memory is ``2·block × D`` floats, total ``~M²K²/2·block``
          passes (measured: 4.4× faster than the identity-probe build at
          d=1280/block=128 on CPU, 8.7× unblocked; RESULTS.md).

        ``block`` counts Gram COLUMNS per chunk (memory bound ``block×D``
        per live factor), matching the pre-round-3 call-site semantics; it
        is rounded down to a whole number of examples.
        """
        assert self.lin.inputs is not None and self.lin.f_single is not None, (
            "WFactor.gram() needs a Linearization carrying its inputs and "
            "per-example apply — construct it via linearize_model(), not "
            "by hand")
        d = self.d
        M, K = self.inner_shape
        R_rows = _example_rows_fn(self.lin, self.scale)

        if block is None or block >= d:
            R = jax.vmap(R_rows)(jnp.arange(M)).reshape(d, -1)
            G = pdot(R, R.T)
            return 0.5 * (G + G.T)

        b = max(1, block // K)                       # examples per block
        pad = (-M) % b
        idx = jnp.concatenate([jnp.arange(M), jnp.zeros((pad,), jnp.int32)]) \
            if pad else jnp.arange(M)
        blocks = idx.reshape(-1, b)                  # (nb, b)
        nb = blocks.shape[0]
        build = jax.remat(lambda ib: jax.vmap(R_rows)(ib).reshape(b * K, -1))

        # lower-triangle-only pairwise sweep: the q > p blocks are mirrors,
        # and under lax.map the lax.cond skip is real (sequential), so only
        # nb(nb+1)/2 row-factor builds happen — the diagonal (q == p) reuses
        # the outer Rp instead of rebuilding it; diagonal blocks carry weight
        # 1/2 so the final X + Xᵀ mirror restores them exactly once.
        def outer(args):
            ib, p = args
            Rp = build(ib)                           # (bK, D)

            def inner(args2):
                jb, q = args2
                return jax.lax.cond(
                    q < p,
                    lambda: pdot(Rp, build(jb).T),
                    lambda: jax.lax.cond(
                        q == p,
                        lambda: 0.5 * pdot(Rp, Rp.T),
                        lambda: jnp.zeros((b * K, b * K), Rp.dtype)))

            return jax.lax.map(inner, (blocks, jnp.arange(nb)))

        Gb = jax.lax.map(outer, (blocks, jnp.arange(nb)))   # (nb, nb, bK, bK)
        X = Gb.transpose(0, 2, 1, 3).reshape(nb * b * K, nb * b * K)[:d, :d]
        return X + X.T


def _example_rows_fn(lin: Linearization, scale) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """``i ↦`` the scaled ``LᵀJ`` row block ``(K, D)`` of example ``i``.

    One single-example ``jacrev`` (K backward passes) — the unit of work
    for blocked Gram builds; indexes the linearization's stored points.
    """
    flat = lin.flat_params

    def rows(i: jnp.ndarray) -> jnp.ndarray:
        zi = lin.inputs[i]
        J = jax.jacrev(lambda p: lin.f_single(p, zi))(flat)        # (K, D)
        LtJ = lh.sqrt_h_t_apply(lin.model_kind, lin.f0[i][None, :], J.T,
                                lin.logvar)                        # (D, K)
        return scale * LtJ.T                                       # (K, D)

    return rows


@dataclass(frozen=True)
class BlockedWFactor:
    """``W`` as a matrix-free operator whose model jvp/vjp runs in
    sequential EXAMPLE blocks (``lax.map`` forward / ``lax.scan`` reverse).

    Same operator semantics as :class:`WFactor` (dense-twin tested), but
    the compiled unit holds one *block-sized* linearized apply instead of
    the full-``M`` one. Two independent resource walls motivate it:

    * **Remote-compile memory.** At ``matmul_precision="highest"`` every
      conv/dot in the jvp/vjp lowers to multi-pass f32 MXU emulation, and
      the chipless remote compile helper OOMs (SIGKILL) on the monolithic
      LeNet5 factor at M ≥ 1024 (measured, round 5 — the DEFAULT-precision
      monolith compiled fine at M=4096). Blocking makes HLO size
      independent of M, the same cure :func:`dense_wt`'s ``example_block``
      applies to the row build.
    * **Activation memory.** The monolithic factor's jvp keeps all M
      examples' tangent activations live; blocks bound that to ``b``.

    Cost: the primal forward is recomputed per matvec (per CG iteration) —
    ``jax.linearize``'s stored residuals for all blocks are exactly the
    memory being avoided — and blocks run sequentially. Both taxes are
    inherent to the memory bound, not overheads to tune away.

    Padding contract: when ``b ∤ M`` the example axis is padded with
    ``Z[:pad]`` duplicates; ``t_matvec`` trims their rows (zero cotangent,
    so no phantom dZ contribution) and ``matvec`` feeds them zero
    coefficients (the vjp is linear in them, so they add nothing to either
    the value or dZ).
    """
    inner_shape: Tuple[int, int]          # (M, K)
    num_params: int                       # D
    scale: float
    _t_matvec: Callable[[jnp.ndarray], jnp.ndarray] = field(repr=False, default=None)
    _matvec: Callable[[jnp.ndarray], jnp.ndarray] = field(repr=False, default=None)

    @property
    def d(self) -> int:
        M, K = self.inner_shape
        return M * K

    def t_matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        """``Wᵀ v``: ``(D,) -> (M, K)``, blockwise."""
        return self._t_matvec(v)

    def matvec(self, U: jnp.ndarray) -> jnp.ndarray:
        """``W U``: ``(M, K) -> (D,)``, blockwise-accumulated."""
        return self._matvec(U)

    def t_matmat(self, V: jnp.ndarray,
                 block: Optional[int] = None) -> jnp.ndarray:
        """Batched ``Wᵀ`` over probes: ``(P, D) -> (P, M, K)``."""
        return _probe_blocked(jax.vmap(self.t_matvec), V, block)

    def matmat(self, U: jnp.ndarray,
               block: Optional[int] = None) -> jnp.ndarray:
        """Batched ``W`` over probes: ``(P, M, K) -> (P, D)``."""
        return _probe_blocked(jax.vmap(self.matvec), U, block)

    def gram_matmat(self, V: jnp.ndarray,
                    block: Optional[int] = None) -> jnp.ndarray:
        """Blocked Gram action ``Wᵀ(W ·)`` on flat probe rows, as in
        :meth:`WFactor.gram_matmat`."""
        Mk, Kk = self.inner_shape
        d = Mk * Kk

        def one(v):
            return self.t_matvec(self.matvec(v.reshape(Mk, Kk))).reshape(d)

        return _probe_blocked(jax.vmap(one), V, block)


def make_w_factor_blocked(state: Any, Z: jnp.ndarray, example_block: int,
                          full_set_size: Optional[int] = None,
                          matmul_precision: Optional[str] = None
                          ) -> BlockedWFactor:
    """Build a :class:`BlockedWFactor` over ``Z`` in blocks of
    ``example_block`` examples (see the class docstring for when).

    Dense twin: equal to :func:`make_w_factor`'s operator in value AND
    dZ-gradient (``tests/test_ggn.py``); the per-block jvp/vjp is the same
    batched-apply construction, just over ``Z[s:s+b]`` slices.
    """
    M = Z.shape[0]
    b = int(min(example_block, M))
    pad = (-M) % b
    Zp = jnp.concatenate([Z, Z[:pad]], axis=0) if pad else Z
    nb = Zp.shape[0] // b
    Zb = Zp.reshape((nb, b) + Z.shape[1:])

    flat, unravel = flatten_nn_params(state.params)
    _, aux = split_nn_params(state.params)
    kind = state.model_kind
    D = flat.shape[0]

    if matmul_precision is None:
        def _prec_ctx():
            import contextlib
            return contextlib.nullcontext()
    else:
        def _prec_ctx():
            return jax.default_matmul_precision(matmul_precision)

    logvar = 0.0
    if kind == lh.REGRESSOR and "logvar" in state.params:
        logvar = state.params["logvar"]
        if isinstance(logvar, dict):
            logvar = logvar["logvar"]

    def f_at(z_blk):
        def f(flat_p):
            params = {**unravel(flat_p), **aux}
            with _prec_ctx():
                return model_outputs(state, params, z_blk)
        return f

    K = jax.eval_shape(f_at(Zb[0]), flat).shape[-1]
    scale = math.sqrt((full_set_size or M) / M)

    def t_matvec(v):
        def body(z_blk):
            f0, jv = jax.jvp(f_at(z_blk), (flat,), (v,))
            return lh.sqrt_h_t_apply(kind, f0, jv, logvar)       # (b, K)
        out = jax.lax.map(body, Zb)                              # (nb, b, K)
        return scale * out.reshape(nb * b, K)[:M]

    def matvec(U):
        Up = (jnp.concatenate([U, jnp.zeros((pad, K), U.dtype)])
              if pad else U)
        Ub = Up.reshape(nb, b, K)

        def body(carry, inp):
            z_blk, u_blk = inp
            f0, vjp_fn = jax.vjp(f_at(z_blk), flat)
            lU = lh.sqrt_h_apply(kind, f0, u_blk, logvar)
            return carry + vjp_fn(lU)[0], None

        out, _ = jax.lax.scan(body, jnp.zeros((D,), flat.dtype), (Zb, Ub))
        return scale * out

    return BlockedWFactor(inner_shape=(M, K), num_params=D, scale=scale,
                          _t_matvec=t_matvec, _matvec=matvec)


def dense_wt(state: Any, Z: jnp.ndarray, *, scale: jnp.ndarray | float = 1.0,
             lin: Optional[Linearization] = None,
             example_block: Optional[int] = None) -> jnp.ndarray:
    """Materialize ``Wᵀ ∈ R^{(M·K) × D}`` for a point set ``Z``.

    Strategy: vmapped per-example ``jacrev`` (so each of the M·K rows costs
    one single-example backward pass, all batched by XLA), then the loss
    factor ``Lᵀ`` is applied along the class axis in one einsum-like sweep.

    ``example_block``: process examples in ``lax.map`` chunks of this size,
    bounding peak extra memory to ``block·K·D`` + one chunk's activations
    (for ResNet-scale D where the full ``(M, K, D)`` jacobian would crowd
    HBM alongside the model's activations). ``None`` = one sweep.
    """
    lin = lin or linearize_model(state, Z)
    flat = lin.flat_params
    M = Z.shape[0]

    def per_example_rows(zi, f0i):
        J = jax.jacrev(lambda p: lin.f_single(p, zi))(flat)       # (K, D)
        LtJ = lh.sqrt_h_t_apply(lin.model_kind, f0i[None, :], J.T,
                                lin.logvar)                       # (D, K)
        return LtJ.T                                              # (K, D)

    if example_block is None or example_block >= M:
        R = jax.vmap(per_example_rows)(Z, lin.f0)                 # (M, K, D)
    else:
        pad = (-M) % example_block
        Zp = jnp.concatenate([Z, Z[:pad]]) if pad else Z
        f0p = jnp.concatenate([lin.f0, lin.f0[:pad]]) if pad else lin.f0
        chunks_z = Zp.reshape(-1, example_block, *Z.shape[1:])
        chunks_f = f0p.reshape(-1, example_block, f0p.shape[-1])
        R = jax.lax.map(
            lambda args: jax.vmap(per_example_rows)(*args),
            (chunks_z, chunks_f))
        R = R.reshape(-1, *R.shape[2:])[:M]                       # (M, K, D)
    return scale * R.reshape(-1, flat.shape[0])


def predictive_jac_stats(state: Any, x: jnp.ndarray, R: jnp.ndarray, *,
                         jac_block: Optional[int] = None,
                         lin: Optional[Linearization] = None):
    """Per-image predictive sufficient statistics ``(f0, JJᵀ, J Rᵀ)``.

    The IP-LLA predictive at one input depends on its Jacobian ``J (K, D)``
    only through the two small projections ``J Jᵀ (K, K)`` and
    ``A = J Rᵀ (K, d_z)`` — everything else in ``Σ = J S⁻¹ Jᵀ`` lives in
    the ``d_z``-dim Gram algebra. Building them costs K backward passes per
    image (vs one jvp per MC sample in the weight-space push-forward: for
    K ≪ S this is the cheap side of the predictive), and both are
    α-INDEPENDENT, so α grid searches and repeated evaluations reuse them
    for free.

    ``jac_block`` chunks the image axis through ``lax.map`` so only
    ``(block, K, D)`` Jacobian rows are alive at once (ResNet-scale D).
    Returns ``(f0 (B, K), JJt (B, K, K), A (B, K, d_z))``.
    """
    lin = lin or linearize_model(state, x)
    flat = lin.flat_params
    B = x.shape[0]

    def per_image(xi):
        J = jax.jacrev(lambda p: lin.f_single(p, xi))(flat)   # (K, D)
        return pdot(J, J.T), pdot(J, R.T)                     # (K,K) (K,d_z)

    if jac_block is None or jac_block >= B:
        JJt, A = jax.vmap(per_image)(x)
    else:
        pad = (-B) % jac_block
        xp = jnp.concatenate([x, x[:pad]]) if pad else x
        chunks = xp.reshape(-1, jac_block, *x.shape[1:])
        JJt, A = jax.lax.map(lambda c: jax.vmap(per_image)(c), chunks)
        JJt = JJt.reshape(-1, *JJt.shape[2:])[:B]
        A = A.reshape(-1, *A.shape[2:])[:B]
    return lin.f0, JJt, A


# ---------------------------------------------------------------------------
# GGN / curvature operators
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GGNOperator:
    """``v ↦ c² Σ_i J_iᵀ H_i J_i v`` — matrix-free, batched.

    Parity: ``compute_ggn_vp`` (``/root/reference/src/ggn.py:97-146``), which
    runs a sequential ``fori_loop`` over examples; here one jvp + one H-apply
    + one vjp of the batched network.
    """
    lin: Linearization
    scale: jnp.ndarray | float        # N/M recalibration (c²)

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        jv = self.lin.jvp(v)
        hv = lh.h_apply(self.lin.model_kind, self.lin.f0, jv, self.lin.logvar)
        return self.scale * self.lin.vjp(hv)

    def matmat(self, V: jnp.ndarray) -> jnp.ndarray:
        """Batched probes: ``(P, D) -> (P, D)``."""
        return jax.vmap(self.matvec)(V)

    @property
    def num_params(self) -> int:
        return self.lin.num_params

    def dense(self) -> jnp.ndarray:
        """Materialize the ``D × D`` GGN (test/dense-twin path only).

        Parity: ``compute_ggn_dense`` (``/root/reference/src/ggn.py:149-195``).
        """
        R = dense_wt_from_lin(self.lin)                       # (M·K, D)
        return self.scale * pdot(R.T, R)


def dense_wt_from_lin(lin: Linearization) -> jnp.ndarray:
    """Unscaled ``Lᵀ J`` rows ``(M·K, D)`` from an existing linearization."""
    flat = lin.flat_params
    D = flat.shape[0]

    def row(idx):
        e = jnp.zeros((D,), flat.dtype).at[idx].set(1.0)
        jv = lin.jvp(e)
        return lh.sqrt_h_t_apply(lin.model_kind, lin.f0, jv, lin.logvar)

    # jacfwd-style: D probes through the stored linearization, vmapped.
    rows = jax.vmap(row)(jnp.arange(D))                       # (D, M, K)
    return jnp.moveaxis(rows, 0, -1).reshape(-1, D)           # (M·K, D)


def ggn_matmat_materialized(state: Any, Z: jnp.ndarray, V: jnp.ndarray,
                            full_set_size: Optional[int] = None,
                            R: Optional[jnp.ndarray] = None,
                            example_block: Optional[int] = None
                            ) -> jnp.ndarray:
    """GGN probe sweep through the materialized row factor: two matmuls.

    ``GGN V = c² · (V Rᵀ) R`` with ``R = LᵀJ`` rows. Building ``R`` costs
    ``M·K`` single-example backward passes ONCE; each probe afterwards is
    pure MXU matmul work — for realistic probe counts (Hutch++ uses
    hundreds) this beats the per-probe jvp/vjp sweep by an order of
    magnitude. Use when ``M·K·D`` fits memory; pass a prebuilt ``R`` to
    amortize across sweeps.
    """
    from laplace_inducing_points_tpu.ops.pallas.matmul import ggn_sweep
    M = Z.shape[0]
    N = full_set_size or M
    if R is None:
        R = dense_wt(state, Z, example_block=example_block)    # (M·K, D)
    return ggn_sweep(V, R, N / M)


def make_w_factor(state: Any, Z: jnp.ndarray,
                  full_set_size: Optional[int] = None,
                  lin: Optional[Linearization] = None,
                  matmul_precision: Optional[str] = None) -> WFactor:
    """Build the ``W`` factor with ``sqrt(N/M)`` recalibration.

    Parity: ``compute_W_vps`` (``/root/reference/src/ggn.py:9-13``).
    ``matmul_precision``: see :func:`linearize_model` — pass ``"highest"``
    when this factor is the operator of an iterative solve or feeds a
    prior/correction cancellation.
    """
    lin = lin or linearize_model(state, Z, matmul_precision=matmul_precision)
    M = lin.num_points
    N = full_set_size or M
    return WFactor(lin=lin, scale=math.sqrt(N / M))


def make_ggn_operator(state: Any, Z: jnp.ndarray,
                      full_set_size: Optional[int] = None,
                      lin: Optional[Linearization] = None) -> GGNOperator:
    """Build the GGN operator with ``N/M`` recalibration."""
    lin = lin or linearize_model(state, Z)
    M = lin.num_points
    N = full_set_size or M
    return GGNOperator(lin=lin, scale=N / M)


def make_curvature_operator(state: Any, Z: jnp.ndarray, alpha: float,
                            full_set_size: Optional[int] = None,
                            lin: Optional[Linearization] = None
                            ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """``v ↦ (GGN + αI) v`` — the PSD curvature ``S``.

    Parity: ``compute_curvature_approx`` (``/root/reference/src/lla.py:11-23``).
    """
    ggn = make_ggn_operator(state, Z, full_set_size, lin=lin)

    def s_matvec(v: jnp.ndarray) -> jnp.ndarray:
        return ggn.matvec(v) + alpha * v

    return s_matvec


def curvature_dense(state: Any, Z: jnp.ndarray, alpha: float,
                    full_set_size: Optional[int] = None) -> jnp.ndarray:
    """Dense ``S = GGN + αI`` (test/dense-twin path).

    Parity: ``compute_curvature_approx_dense``
    (``/root/reference/src/lla.py:26-34``).
    """
    ggn = make_ggn_operator(state, Z, full_set_size)
    G = ggn.dense()
    return G + alpha * jnp.eye(G.shape[0], dtype=G.dtype)


def ensure_symmetry(A: jnp.ndarray, jitter: float = 1e-8) -> jnp.ndarray:
    """Symmetrize + jitter a theoretically-symmetric matrix.

    Parity: ``/root/reference/src/ggn.py:277``.
    """
    return 0.5 * (A + A.T) + jitter * jnp.eye(A.shape[0], dtype=A.dtype)
