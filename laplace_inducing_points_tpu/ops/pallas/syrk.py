"""SYRK ``C = A Aᵀ``: XLA HIGHEST matmul by default + a Pallas study kernel.

The Gram matrices at the heart of every objective in this framework
(``WᵀW``, ``WᵀW_z`` — see training.inducing, inference.sample) are symmetric
products ``A Aᵀ`` with a short output dim (d = M·K, a few hundred) and a
long contraction dim (D = #params, up to millions).

**Measured verdict (v5e, chained-scan device timing — see RESULTS.md
"Timing methodology"):** XLA's stock HIGHEST-precision matmul is already at
speed-of-light for these shapes — d=1280, D=61706 runs at ~180 TF/s
(~92% of chip peak) with true-f32 accuracy (7e-7 vs an f64 oracle), and the
lower-triangle Pallas kernel below is 4–7× SLOWER (2.0 ms vs 0.53 ms at
d=512; 8.4 ms vs 1.16 ms at d=1280). Round 1 recorded the opposite
("8.9× kernel win"); that measurement was an artifact of per-call timing
through the remote-execute tunnel, whose ~38 ms dispatch latency swamps
sub-40 ms kernels and is pipelined away unevenly across variants. ``syrk``
therefore lowers to the XLA matmul unless ``force_pallas=True``.

The kernel is kept (tested, differentiable) as the scheduling study it is:
grid = (lower-triangle tile list via scalar prefetch, k-strips), f32 VMEM
accumulation, upper triangle restored by a cheap transpose add. Its loss
shows why hand-tiling loses here: XLA's lowering streams A through VMEM
once per output macro-tile with deep DMA pipelining across the whole grid,
while a per-tile-pair schedule re-fetches A strips (i, k) and (j, k) per
lower tile — ~(t+1)/2× the HBM traffic at t row tiles, on a
bandwidth-bound op.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lower_tile_coords(t: int) -> np.ndarray:
    """Flattened (i, j) tile coordinates of the lower triangle, i >= j."""
    coords = [(i, j) for i in range(t) for j in range(i + 1)]
    return np.asarray(coords, dtype=np.int32)


def _syrk_kernel(coords_ref, a_i_ref, a_j_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # HIGHEST precision: the Gram feeds Cholesky/eigh solves, so the
    # accuracy requirement holds on the kernel path too.
    out_ref[:] += jnp.dot(a_i_ref[:], a_j_ref[:].T,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _pad_to(x: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    pr = rows - x.shape[0]
    pc = cols - x.shape[1]
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


@functools.partial(jax.jit, static_argnames=("block_d", "block_k"))
def _syrk_pallas(A: jnp.ndarray, block_d: int, block_k: int) -> jnp.ndarray:
    d, D = A.shape
    t = -(-d // block_d)
    nk = -(-D // block_k)
    dp = t * block_d
    Dp = nk * block_k
    Ap = _pad_to(A, dp, Dp)

    coords = jnp.asarray(_lower_tile_coords(t))          # (T, 2)
    num_tiles = coords.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles, nk),
        in_specs=[
            pl.BlockSpec((block_d, block_k),
                         lambda g, k, coords: (coords[g, 0], k)),
            pl.BlockSpec((block_d, block_k),
                         lambda g, k, coords: (coords[g, 1], k)),
        ],
        out_specs=pl.BlockSpec((block_d, block_d),
                               lambda g, k, coords: (coords[g, 0],
                                                     coords[g, 1])),
    )

    flops = 2 * dp * (dp + block_d) // 2 * Dp
    lower = pl.pallas_call(
        _syrk_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dp, dp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * dp * Dp * 4 + dp * dp * 4,
            transcendentals=0,
        ),
    )(coords, Ap, Ap)

    # restore the upper triangle: C = L + Lᵀ − diag(L)
    full = jnp.tril(lower) + jnp.tril(lower, -1).T
    return full[:d, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _syrk_diff(A: jnp.ndarray, block_d: int, block_k: int) -> jnp.ndarray:
    return _syrk_pallas(A, block_d, block_k)


def _syrk_diff_fwd(A, block_d, block_k):
    return _syrk_pallas(A, block_d, block_k), A


def _syrk_diff_bwd(block_d, block_k, A, ct):
    # C = A Aᵀ  ⇒  dA = (Ĉ + Ĉᵀ) A   (two small-by-long matmuls)
    sym_ct = ct + ct.T
    return (jnp.matmul(sym_ct, A, precision=jax.lax.Precision.HIGHEST),)


_syrk_diff.defvjp(_syrk_diff_fwd, _syrk_diff_bwd)


def syrk(A: jnp.ndarray, *, block_d: int = 128, block_k: int = 512,
         force_pallas: Optional[bool] = None) -> jnp.ndarray:
    """``A Aᵀ`` Gram build at HIGHEST precision (feeds Cholesky/eigh).

    ``A``: (d, D). Lowers to XLA's HIGHEST matmul, which is at
    speed-of-light for the framework's d ≪ D Gram shapes (~92% of v5e peak
    at d=1280, D=61706 — see module docstring); ``force_pallas=True``
    selects the lower-triangle Pallas study kernel instead. Differentiable
    either way (the kernel path carries a custom VJP — Gram builds sit
    inside ``grad`` w.r.t. the inducing points in the KL objective).
    """
    if not force_pallas:
        return jnp.matmul(A, A.T, precision=jax.lax.Precision.HIGHEST)
    return _syrk_diff(A, block_d, block_k)
