"""Standalone illustrative figures (thesis-figure parity).

Parity: ``/root/reference/vis-laplace.py`` (1-D Laplace approximation of a
skewed density) and ``/root/reference/vis-kl.py`` (forward/reverse KL
asymmetry between a bimodal target and a unimodal fit). Regenerated from
the underlying math rather than the reference's hard-coded plotting code.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def laplace_1d_figure(save_path: str = "fig/laplace_example.png"):
    """Laplace approximation of a skewed 1-D density around its mode.

    A Gamma-like unnormalized log-density is matched at its mode by the
    quadratic (Gaussian) Laplace approximation — visualizing both the fit
    near the mode and the mismatch in the tails.
    """
    k, theta = 3.0, 1.0

    def log_p(x):
        return (k - 1) * np.log(x) - x / theta

    mode = (k - 1) * theta
    # curvature at the mode: d²/dx² log p = -(k-1)/x²
    var = mode ** 2 / (k - 1)

    xs = np.linspace(1e-2, 10, 400)
    p = np.exp(log_p(xs))
    p /= np.trapezoid(p, xs)
    q = np.exp(-0.5 * (xs - mode) ** 2 / var) / np.sqrt(2 * np.pi * var)

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(xs, p, label="true density $p$", color="#345", lw=2)
    ax.plot(xs, q, label="Laplace approx $q$", color="#d62", lw=2, ls="--")
    ax.axvline(mode, color="gray", lw=0.8, ls=":")
    ax.annotate("mode", (mode, 0), textcoords="offset points",
                xytext=(4, 6), color="gray")
    ax.set_title("Laplace approximation matches curvature at the mode")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path


def kl_asymmetry_figure(save_path: str = "fig/kl_example.png"):
    """Forward vs reverse KL fits of a Gaussian to a bimodal mixture.

    Reverse KL (the variational direction used by the inducing-point
    objective) is mode-seeking; forward KL is mass-covering.
    """
    xs = np.linspace(-6, 6, 601)
    dx = xs[1] - xs[0]

    def normal(x, mu, sig):
        return np.exp(-0.5 * ((x - mu) / sig) ** 2) / (
            np.sqrt(2 * np.pi) * sig)

    p = 0.55 * normal(xs, -2.0, 0.7) + 0.45 * normal(xs, 2.2, 0.9)
    p /= p.sum() * dx

    def kl(a, b):
        mask = a > 1e-12
        return float(np.sum(a[mask] * np.log(a[mask] / b[mask])) * dx)

    # grid-search the Gaussian family under each divergence
    best_fwd, best_rev = None, None
    for mu in np.linspace(-4, 4, 81):
        for sig in np.linspace(0.3, 4.0, 75):
            q = normal(xs, mu, sig)
            q = q / (q.sum() * dx)
            f = kl(p, q)     # forward  KL(p||q): mass-covering
            r = kl(q, p)     # reverse  KL(q||p): mode-seeking
            if best_fwd is None or f < best_fwd[0]:
                best_fwd = (f, mu, sig)
            if best_rev is None or r < best_rev[0]:
                best_rev = (r, mu, sig)

    fig, axs = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    for ax, (val, mu, sig), name in (
            (axs[0], best_fwd, r"forward $KL(p\|q)$ — mass-covering"),
            (axs[1], best_rev, r"reverse $KL(q\|p)$ — mode-seeking")):
        ax.plot(xs, p, color="#345", lw=2, label="target $p$")
        ax.plot(xs, normal(xs, mu, sig), color="#d62", lw=2, ls="--",
                label="best Gaussian $q$")
        ax.set_title(name)
        ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path


if __name__ == "__main__":
    print(laplace_1d_figure())
    print(kl_asymmetry_figure())
