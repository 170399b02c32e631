"""Plotting parity with the reference's figure library.

Parity: ``/root/reference/src/nplot.py`` — 2-panel LLA mean/variance heatmaps
over a 2-D grid, MAP decision surfaces, 1-D credible intervals, inducing-point
overlays, and grayscale/color grids for image-space inducing points. Uses a
non-interactive Agg backend so it runs headless.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _heat_cmap():
    """Diverging heatmap colormap: matplotlib's ``RdBu`` by default, the
    reference's ``icefire`` palette (``/root/reference/src/nplot.py:43-45``)
    once :func:`viz.style.use_thesis_style` is active."""
    from laplace_inducing_points_tpu.viz import style
    return style.get_palette() if style.is_active() else "RdBu"


def plot_regression_data(ax, x, y, **kw):
    ax.scatter(np.asarray(x).ravel(), np.asarray(y).ravel(), s=12,
               alpha=0.8, **kw)


def plot_binary_classification_data(ax, x, y, c0="#d66", c1="#68c"):
    x = np.asarray(x)
    y = np.asarray(y).ravel()
    ax.scatter(*x[y == 0].T, s=12, color=c0, label="class 0", zorder=2)
    ax.scatter(*x[y == 1].T, s=12, color=c1, label="class 1", zorder=2)


def plot_inducing_points(ax, Z, **kw):
    Z = np.asarray(Z)
    kw.setdefault("marker", "X")
    kw.setdefault("color", "yellow")
    kw.setdefault("zorder", 8)
    kw.setdefault("label", "Inducing points")
    ax.scatter(Z[:, 0], Z[:, 1], **kw)


def plot_cinterval(ax, x, mu, sigma, color="orange", text=None, zorder=1):
    """1-D mean ± 2σ credible band (parity: ``nplot.py:426-441``)."""
    x = np.asarray(x).ravel()
    mu = np.asarray(mu).ravel()
    sigma = np.asarray(sigma).ravel()
    label = f"{text} mean" if text else "mean"
    ax.plot(x, mu, color=color, zorder=zorder + 1, label=label)
    ax.fill_between(x, mu - 2 * sigma, mu + 2 * sigma, color=color,
                    alpha=0.25, zorder=zorder,
                    label=f"{text} ±2σ" if text else "±2σ")


def _grid(xtrain, pad=1.5, num=150):
    x = np.asarray(xtrain)
    lo, hi = x.min() - pad, x.max() + pad
    g = np.linspace(lo, hi, num)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1).astype(np.float32)
    return xx, yy, pts


def plot_lla_2d_classification(state, xtrain, ytrain, Z, alpha, *,
                               key, num_mc_samples: int = 500,
                               full_set_size: Optional[int] = None,
                               scalable: bool = True, plot_Z: bool = True,
                               plot_X: bool = False, grid_num: int = 150,
                               save_path: Optional[str] = None):
    """2-panel predictive mean / std heatmap over the input plane.

    Parity: ``plot_lla_2D_classification`` (``nplot.py:55-177``).
    """
    import jax
    import jax.numpy as jnp

    from laplace_inducing_points_tpu.evaluation.harness import batch_logit_samples

    xx, yy, pts = _grid(xtrain, num=grid_num)
    logits = batch_logit_samples(
        state, jnp.asarray(pts), jnp.asarray(Z), alpha=alpha,
        full_set_size=full_set_size, num_mc_samples=num_mc_samples,
        rng=key, scalable=scalable)                       # (S, G², K)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    mean_p1 = probs.mean(0)[:, 1].reshape(xx.shape)
    std_p1 = probs.std(0)[:, 1].reshape(xx.shape)

    fig, axs = plt.subplots(1, 2, figsize=(13, 5))
    im0 = axs[0].contourf(xx, yy, mean_p1, levels=30, cmap=_heat_cmap())
    axs[0].set_title("predictive mean p(class 1)")
    fig.colorbar(im0, ax=axs[0])
    im1 = axs[1].contourf(xx, yy, std_p1, levels=30, cmap="viridis")
    axs[1].set_title("predictive std")
    fig.colorbar(im1, ax=axs[1])
    for ax in axs:
        if plot_X:
            plot_binary_classification_data(ax, xtrain, ytrain)
        if plot_Z:
            plot_inducing_points(ax, Z)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, axs


def plot_map_2d_classification(state, xtrain, ytrain, *,
                               grid_num: int = 150,
                               save_path: Optional[str] = None):
    """MAP decision surface (parity: ``plot_map_2D_classification``,
    ``nplot.py:180-195``)."""
    import jax
    import jax.numpy as jnp

    from laplace_inducing_points_tpu.core.operators import model_outputs

    xx, yy, pts = _grid(xtrain, num=grid_num)
    logits = model_outputs(state, state.params, jnp.asarray(pts))
    p1 = np.asarray(jax.nn.softmax(logits, axis=-1))[:, 1].reshape(xx.shape)
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.contourf(xx, yy, p1, levels=30, cmap=_heat_cmap())
    fig.colorbar(im, ax=ax)
    plot_binary_classification_data(ax, xtrain, ytrain)
    ax.set_title("MAP estimator")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, ax


def plot_regression_lla_1d(state, xtrain, ytrain, Z, alpha, *,
                           full_set_size=None, num: int = 100,
                           save_path: Optional[str] = None):
    """1-D regression credible-interval figure (parity: ``main.py:plot_map`` /
    ``plot_inducing_dense``)."""
    import jax.numpy as jnp

    from laplace_inducing_points_tpu.inference.lla import predict_lla_dense

    x = np.asarray(xtrain)
    xlin = np.linspace(x.min(), x.max(), num)[:, None].astype(np.float32)
    dist_full = predict_lla_dense(state, jnp.asarray(xlin), jnp.asarray(xtrain),
                                  alpha)
    dist_ip = predict_lla_dense(state, jnp.asarray(xlin), jnp.asarray(Z),
                                alpha, full_set_size=full_set_size or
                                x.shape[0])
    fig, ax = plt.subplots(figsize=(8, 5))
    plot_cinterval(ax, xlin, np.asarray(dist_full.mean).squeeze(),
                   np.asarray(dist_full.stddev()).squeeze(),
                   color="orange", text="full", zorder=5)
    plot_cinterval(ax, xlin, np.asarray(dist_ip.mean).squeeze(),
                   np.asarray(dist_ip.stddev()).squeeze(),
                   color="limegreen", text="inducing", zorder=4)
    plot_regression_data(ax, xtrain, ytrain)
    zs = np.asarray(Z).ravel()
    ax.plot(zs, np.full_like(zs, ax.get_ylim()[0]), "^", color="limegreen",
            markersize=7, label="Z", zorder=6)
    ax.legend(loc="lower right")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, ax


def make_predictive_mean_figure(state, xtrain, ytrain, alpha, *,
                                key=None, num_mc_samples: int = 100,
                                grid_num: int = 120,
                                save_path: Optional[str] = None):
    """1×3 qualitative headline figure: [MAP] [LA-MC] [LLA] predictive means.

    Parity: ``make_predictive_mean_figure`` + ``plot_la_sampled_mean``
    (``/root/reference/src/nplot.py:255-337``) — the thesis's side-by-side of
    the sampled (non-linearized) Laplace predictive vs the linearized one,
    with a shared probability colorbar.
    """
    import jax
    import jax.numpy as jnp
    import matplotlib as mpl

    from laplace_inducing_points_tpu.core.operators import model_outputs
    from laplace_inducing_points_tpu.inference.lla import (
        predict_la_samples_dense, predict_lla_scalable)

    key = key if key is not None else __import__("jax").random.PRNGKey(42)
    xx, yy, pts = _grid(xtrain, pad=1.0, num=grid_num)
    pts_j = jnp.asarray(pts)
    Z = jnp.asarray(xtrain)

    # panel 1: MAP point estimate
    logits_map = model_outputs(state, state.params, pts_j)
    p_map = np.asarray(jax.nn.softmax(logits_map, -1))[:, 1].reshape(xx.shape)

    # panel 2: sampled (non-linearized) Laplace — weights from the dense
    # posterior pushed through the full network
    k1, k2 = jax.random.split(key)
    logits_la = predict_la_samples_dense(state, pts_j, Z, alpha, k1,
                                         full_set_size=Z.shape[0],
                                         num_mc_samples=num_mc_samples)
    p_la = np.asarray(jax.nn.softmax(logits_la, -1)).mean(0)[:, 1] \
        .reshape(xx.shape)

    # panel 3: linearized Laplace (LLA)
    logits_lla = predict_lla_scalable(state, pts_j, Z, alpha, key=k2,
                                      full_set_size=Z.shape[0],
                                      num_samples=num_mc_samples)
    p_lla = np.asarray(jax.nn.softmax(logits_lla, -1)).mean(0)[:, 1] \
        .reshape(xx.shape)

    norm = mpl.colors.Normalize(0, 1)
    fig, axs = plt.subplots(1, 3, figsize=(13, 4), sharex=True,
                            constrained_layout=True)
    for ax, surf, title in zip(
            axs, (p_map, p_la, p_lla),
            ("NN MAP", "Without Linearization", "With Linearization")):
        ax.pcolormesh(xx, yy, surf, cmap=_heat_cmap(), norm=norm, rasterized=True)
        plot_binary_classification_data(ax, xtrain, ytrain)
        ax.set_title(title)
        ax.set_xlabel(r"$x_1$")
        ax.set_xticks([])
        ax.set_yticks([])
    axs[0].set_ylabel(r"$x_2$")
    fig.colorbar(mpl.cm.ScalarMappable(norm=norm, cmap=_heat_cmap()), ax=axs,
                 location="left",
                 label=r"$\mathrm{E}[y^* \mid x^*, \mathcal{D}]$")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, axs


def make_comparison_figure(state, xtrain, ytrain, Z, alpha, *,
                           key=None, num_mc_samples: int = 100,
                           scalable: bool = True,
                           full_set_size: Optional[int] = None,
                           grid_num: int = 120,
                           save_path: Optional[str] = None):
    """2×1 IP-LLA figure: predictive mean over predictive std.

    Parity: ``make_comparison_figure``
    (``/root/reference/src/nplot.py:340-394``).
    """
    import jax
    import jax.numpy as jnp

    from laplace_inducing_points_tpu.evaluation.harness import (
        batch_logit_samples)

    key = key if key is not None else jax.random.PRNGKey(42)
    xx, yy, pts = _grid(xtrain, pad=1.0, num=grid_num)
    logits = batch_logit_samples(
        state, jnp.asarray(pts), jnp.asarray(Z), alpha=alpha,
        full_set_size=full_set_size, num_mc_samples=num_mc_samples,
        rng=key, scalable=scalable)
    probs = np.asarray(jax.nn.softmax(logits, -1))
    mean_p = probs.mean(0)[:, 1].reshape(xx.shape)
    std_p = probs.std(0)[:, 1].reshape(xx.shape)

    fig, axs = plt.subplots(2, 1, figsize=(7, 11), sharex=True, sharey=True,
                            constrained_layout=True)
    im0 = axs[0].pcolormesh(xx, yy, mean_p, cmap=_heat_cmap(), rasterized=True)
    fig.colorbar(im0, ax=axs[0])
    im1 = axs[1].pcolormesh(xx, yy, std_p, cmap="viridis", rasterized=True)
    fig.colorbar(im1, ax=axs[1])
    for ax in axs:
        plot_binary_classification_data(ax, xtrain, ytrain)
        plot_inducing_points(ax, Z)
        ax.set_xticks([])
        ax.set_yticks([])
    axs[1].set_xlabel(r"$x_1$")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, axs


def plot_image_grid(batch, *, color: bool = False, step="", name="",
                    save_path: Optional[str] = None):
    """Grayscale/color grids for image-space inducing points.

    Parity: ``plot_grayscale``/``plot_color`` (``nplot.py:443-493``).
    """
    imgs = np.asarray(batch)
    n = min(len(imgs), 32)
    cols = 8
    rows = -(-n // cols)
    fig, axs = plt.subplots(rows, cols, figsize=(cols * 1.4, rows * 1.4))
    axs = np.atleast_2d(axs)
    for i in range(rows * cols):
        ax = axs[i // cols, i % cols]
        ax.axis("off")
        if i < n:
            img = imgs[i]
            if color:
                ax.imshow(np.clip(img, 0, 1))
            else:
                ax.imshow(img.squeeze(), cmap="gray")
    fig.suptitle(f"{name} inducing points {step}")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return save_path
    return fig, axs


def make_inducing_callback(plot_type: Optional[str], xtrain=None, ytrain=None,
                           every: int = 4, fig_dir: str = "fig",
                           max_snapshots: int = 3):
    """Live inducing-point plotting callback for ``train_inducing_points``.

    Parity: the reference's inline plotting in its inducing loop
    (``/root/reference/src/train_inducing.py:256-321``): 2-D toys get a
    trajectory overlay on the training data; image datasets get grayscale /
    color grids of the current Z every ``every`` steps.
    """
    if plot_type is None:
        return None

    trajectory: list = []

    def callback(step: int, Z, loss: float):
        if step % every != 0:
            return
        z_np = np.asarray(Z)
        os.makedirs(fig_dir, exist_ok=True)
        if plot_type in ("mnist", "fmnist"):
            plot_image_grid(z_np[:32], color=False, step=step, name=plot_type,
                            save_path=os.path.join(fig_dir,
                                                   f"ips_{plot_type}.png"))
        elif plot_type == "cifar10":
            plot_image_grid(z_np[:32], color=True, step=step, name=plot_type,
                            save_path=os.path.join(fig_dir,
                                                   f"ips_{plot_type}.png"))
        elif plot_type in ("spiral", "xor", "banana"):
            trajectory.append(z_np)
            del trajectory[:-max_snapshots]
            traj = np.stack(trajectory)
            fig, ax = plt.subplots(figsize=(8, 6))
            ax.plot(traj[:, :, 0], traj[:, :, 1], "-o", color="black",
                    markersize=2, zorder=7)
            if xtrain is not None:
                plot_binary_classification_data(ax, xtrain, ytrain)
            plot_inducing_points(ax, z_np)
            ax.set_title(f"Inducing point trajectory after {step} steps "
                         f"(loss {loss:.2f})")
            fig.savefig(os.path.join(fig_dir, "ips_trajectory.png"), dpi=120,
                        bbox_inches="tight")
            plt.close(fig)

    return callback
