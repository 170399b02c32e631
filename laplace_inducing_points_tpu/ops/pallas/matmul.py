"""Long-contraction matmuls for the probe sweep: XLA default + study kernels.

The curvature algebra is dominated by contractions over the parameter axis
``D`` (tens of thousands to millions) with short output dims (probe count P,
Gram dim d_z = M·K):

* ``matmul_nt``: ``C = A Bᵀ`` with A (m, D), B (n, D) — the probe-sweep
  front half ``T = V Rᵀ`` and the cross-Gram ``G_xz = R_x R_zᵀ``
  (reference builds the latter with one-hot probe loops,
  ``/root/reference/src/ggn.py:233-272``).
* ``matmul_nn``: ``C = A B`` with A (m, n) small, B (n, D) — the sweep back
  half ``Y = T R``.

**Measured verdict (v5e, chained-scan device timing — see RESULTS.md
"Timing methodology"):** XLA's stock lowering is at the HBM roofline for
the full sweep — P=256, d_z=1280, D=61706 runs at 0.40 ms/sweep
(~97% of the bf16 bandwidth floor; XLA hoists the f32→bf16 operand convert
of the loop-invariant R) at default precision, and 2.6 ms at HIGHEST
(the 6-pass compute floor). The Pallas kernels below measure 4.0 ms —
slower than even XLA HIGHEST, because a per-tile-pair schedule re-fetches
R strips per output tile on a bandwidth-bound op. Round 1 recorded the
kernels as a win; that was a per-call timing artifact of the remote-execute
tunnel's ~38 ms dispatch latency. ``matmul_nt``/``matmul_nn`` therefore
lower to XLA unless ``force_pallas=True``; the kernels stay as tested,
differentiable scheduling studies.

Precision policy: these helpers take a ``precision`` argument
(default HIGHEST — Gram/posterior algebra); estimator-facing probe sweeps
(``ggn_sweep``) default to DEFAULT precision (bf16-multiply/f32-accumulate,
6.6× faster, rel err ~3e-4 — far below Hutch++'s own statistical noise).
On CPU every path is bit-exact f32, so dense-twin tests are unaffected.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl


def _pad2(x: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    pr = rows - x.shape[0]
    pc = cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


def _nt_kernel(a_ref, b_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # HIGHEST in-kernel: measured faster than the default lowering for f32
    # on v5e (see syrk.py) and keeps the Gram/posterior algebra exact.
    out_ref[:] += jnp.dot(a_ref[:], b_ref[:].T,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _matmul_nt_pallas(A: jnp.ndarray, B: jnp.ndarray,
                      bm: int, bn: int, bk: int) -> jnp.ndarray:
    m, D = A.shape
    n, D2 = B.shape
    assert D == D2, (A.shape, B.shape)
    nm, nn, nk = -(-m // bm), -(-n // bn), -(-D // bk)
    Ap = _pad2(A, nm * bm, nk * bk)
    Bp = _pad2(B, nn * bn, nk * bk)

    out = pl.pallas_call(
        _nt_kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nm * bm, nn * bn), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nm * bm * nn * bn * nk * bk,
            bytes_accessed=(nm * bm + nn * bn) * nk * bk * 4
            + nm * bm * nn * bn * 4,
            transcendentals=0,
        ),
    )(Ap, Bp)
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matmul_nt_diff(A, B, bm, bn, bk):
    return _matmul_nt_pallas(A, B, bm, bn, bk)


def _matmul_nt_fwd(A, B, bm, bn, bk):
    return _matmul_nt_pallas(A, B, bm, bn, bk), (A, B)


def _matmul_nt_bwd(bm, bn, bk, res, ct):
    A, B = res
    # C = A Bᵀ ⇒ dA = Ĉ B, dB = Ĉᵀ A — both short-by-long, HIGHEST
    dA = jnp.matmul(ct, B, precision=jax.lax.Precision.HIGHEST)
    dB = jnp.matmul(ct.T, A, precision=jax.lax.Precision.HIGHEST)
    return dA, dB


_matmul_nt_diff.defvjp(_matmul_nt_fwd, _matmul_nt_bwd)


def matmul_nt(A: jnp.ndarray, B: jnp.ndarray, *, bm: int = 256,
              bn: int = 256, bk: int = 512,
              force_pallas: Optional[bool] = None,
              precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """``A Bᵀ`` for (m, D) x (n, D), D long. Differentiable.

    Lowers to XLA (at the roofline for these shapes — module docstring);
    ``force_pallas=True`` selects the study kernel (always HIGHEST).
    """
    if not force_pallas:
        # dot_general over the shared D axis — no explicit Bᵀ, so XLA never
        # materializes a transposed copy of the long operand
        return jax.lax.dot_general(A, B, (((1,), (1,)), ((), ())),
                                   precision=precision,
                                   preferred_element_type=jnp.float32)
    bm = min(bm, _round_up(A.shape[0]))
    bn = min(bn, _round_up(B.shape[0]))
    return _matmul_nt_diff(A, B, bm, bn, bk)


def _round_up(x: int, m: int = 128) -> int:
    return -(-x // m) * m


def _nn_kernel(a_ref, b_ref, out_ref):
    z = pl.program_id(2)

    @pl.when(z == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("bm", "bd", "bz"))
def _matmul_nn_pallas(A: jnp.ndarray, B: jnp.ndarray,
                      bm: int, bd: int, bz: int) -> jnp.ndarray:
    m, z = A.shape
    z2, D = B.shape
    assert z == z2, (A.shape, B.shape)
    nm, nd, nz = -(-m // bm), -(-D // bd), -(-z // bz)
    Ap = _pad2(A, nm * bm, nz * bz)
    Bp = _pad2(B, nz * bz, nd * bd)

    out = pl.pallas_call(
        _nn_kernel,
        grid=(nm, nd, nz),
        in_specs=[
            pl.BlockSpec((bm, bz), lambda i, j, k: (i, k)),
            pl.BlockSpec((bz, bd), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bd), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nm * bm, nd * bd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nm * bm * nd * bd * nz * bz,
            bytes_accessed=(nm * bm * nz * bz + nz * bz * nd * bd
                            + nm * bm * nd * bd) * 4,
            transcendentals=0,
        ),
    )(Ap, Bp)
    return out[:m, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _matmul_nn_diff(A, B, bm, bd, bz):
    return _matmul_nn_pallas(A, B, bm, bd, bz)


def _matmul_nn_fwd(A, B, bm, bd, bz):
    return _matmul_nn_pallas(A, B, bm, bd, bz), (A, B)


def _matmul_nn_bwd(bm, bd, bz, res, ct):
    A, B = res
    dA = jnp.matmul(ct, B.T, precision=jax.lax.Precision.HIGHEST)
    dB = jnp.matmul(A.T, ct, precision=jax.lax.Precision.HIGHEST)
    return dA, dB


_matmul_nn_diff.defvjp(_matmul_nn_fwd, _matmul_nn_bwd)


def matmul_nn(A: jnp.ndarray, B: jnp.ndarray, *, bm: int = 256,
              bd: int = 512, bz: int = 256,
              force_pallas: Optional[bool] = None,
              precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """``A B`` for (m, z) x (z, D), D long — the sweep's push-back half."""
    if not force_pallas:
        return jnp.matmul(A, B, precision=precision,
                          preferred_element_type=jnp.float32)
    bm = min(bm, _round_up(A.shape[0]))
    bz = min(bz, _round_up(A.shape[1]))
    return _matmul_nn_diff(A, B, bm, bd, bz)


def ggn_sweep(V: jnp.ndarray, R: jnp.ndarray,
              scale: jnp.ndarray | float = 1.0, *,
              force_pallas: Optional[bool] = None,
              precision=None) -> jnp.ndarray:
    """GGN probe sweep ``scale * (V Rᵀ) R``.

    V: (P, D) probes; R: (d_z, D) materialized row factor. Estimator-facing,
    so the matmuls default to DEFAULT precision (bf16-mul/f32-acc — at the
    HBM roofline on v5e, ~3e-4 rel err, negligible next to the estimator's
    statistical noise; bit-exact f32 on CPU). Pass
    ``precision=lax.Precision.HIGHEST`` for exact-f32 sweeps.
    """
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    T = matmul_nt(V, R, force_pallas=force_pallas, precision=precision)
    return scale * matmul_nn(T, R, force_pallas=force_pallas,
                             precision=precision)
