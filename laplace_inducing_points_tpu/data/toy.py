"""Toy dataset generators (by formula) + npz persistence and splits.

Parity: ``/root/reference/src/toydata.py:23-178,242-257`` — each generator
reproduces the same distributions (sine wave with optional domain gap, XOR
blobs, two-armed spirals, annulus ring, banana arches) so figures and
metrics are comparable. Implemented fresh on ``jax.random``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def sine_fn(x: Array) -> Array:
    return jnp.sin(2 * x) + x * jnp.cos(5 * x)


def sine_dataset(n: int, key: jax.Array, noise: float = 0.5,
                 split_in_middle: bool = False) -> Tuple[Array, Array]:
    kx, kn = jax.random.split(key)
    if split_in_middle:
        x1 = jax.random.uniform(kx, (n // 2, 1), minval=-4.0, maxval=-1.0)
        x2 = jax.random.uniform(jax.random.fold_in(kx, 1), (n - n // 2, 1),
                                minval=0.0, maxval=3.0)
        x = jnp.concatenate([x1, x2], axis=0)
        x = jax.random.permutation(kx, x)
    else:
        x = jax.random.uniform(kx, (n, 1), minval=-4.0, maxval=3.0)
    y = sine_fn(x) + noise * jax.random.normal(kn, (n, 1))
    return x, y


def xor_dataset(n: int, key: jax.Array, noise: float = 0.05
                ) -> Tuple[Array, Array]:
    kz, kn = jax.random.split(key)
    z = jax.random.uniform(kz, (n, 2))
    x = (z > 0.5).astype(jnp.float32)
    y = (x.sum(axis=1) == 1).astype(jnp.int32)
    x = x + noise * jax.random.normal(kn, (n, 2))
    return x, y


def noisy_spiral_dataset(n: int, key: jax.Array, noise: float = 0.05
                         ) -> Tuple[Array, Array]:
    """Unshuffled two-arm spiral (class 0 first half, class 1 second).

    Randomness-order-faithful to the reference's ``noisy_spiral_dataset``
    (``/root/reference/src/toydata.py:75-89``) — the variant its
    ``create_dataset('spiral')`` actually calls (NOT the shuffled
    ``spiral_dataset`` at ``:46``) — so a given (n, key, noise) reproduces
    the reference instance bit-identically (golden-pinned in
    ``tests/test_data.py``).
    """
    assert n % 2 == 0
    half = n // 2
    k1, k2, k3 = jax.random.split(key, 3)
    r = jax.random.uniform(k1, (half, 1))
    theta = r * 3.0 * jnp.pi
    arm0 = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
    arm1 = jnp.concatenate([r * jnp.cos(theta + jnp.pi),
                            r * jnp.sin(theta + jnp.pi)], axis=1)
    arm0 = arm0 + noise * jax.random.normal(k2, arm0.shape)
    arm1 = arm1 + noise * jax.random.normal(k3, arm1.shape)
    x = jnp.concatenate([arm0, arm1]).astype(jnp.float32)
    y = jnp.concatenate([jnp.zeros(half), jnp.ones(half)]).astype(jnp.int32)
    return x, y


def spiral_dataset(n: int, key: jax.Array, noise: float = 0.05,
                   ring_val_frac: float = 0.0,
                   shuffle: bool = False) -> Tuple[Array, Array]:
    """Spiral with the reference's ring-validation-mix mechanism.

    Parity: ``create_dataset('spiral')``
    (``/root/reference/src/toydata.py:209-226``): split the key in two,
    generate an UNSHUFFLED spiral for the first ``n - n_val`` points and a
    radius-1.05 ring for the last ``n_val``, concatenated without shuffling
    so the tail of the sequential 80/10/10 split (the validation set) is
    ring points. NOTE the reference's comment says "reserve 10% of n for
    the ring" but its shipped code sets ``n_val = int(0.00 * n)`` (``:211``)
    — zero ring points; ``ring_val_frac`` defaults to the code-faithful 0.0
    and exposes the commented-intent mechanism (0.10) as an option. At the
    defaults the output is bit-identical to the reference's spiral instance
    for a given (n, key, noise).

    ``shuffle`` (default reference-faithful False) permutes the SPIRAL
    portion only — the ring tail stays last so the sequential 80/10/10
    split still lands it in the validation set. The reference leaves the
    spiral unshuffled (class 0 first half, class 1 second), which makes its
    sequential split degenerate (test split = pure class 1); our shipped
    spiral config enables ``shuffle: true`` as a documented deviation so
    the experiment's metrics are meaningful.
    """
    n_val = int(ring_val_frac * n)
    if n_val > 0 and (n - n_val) % 2:
        # the spiral generator needs an even count (two equal arms); absorb
        # the odd remainder into the ring tail rather than crashing
        n_val += 1
    n_spiral = n - n_val
    k1, k2 = jax.random.split(key, 2)
    x_sp, y_sp = noisy_spiral_dataset(n_spiral, k1, noise)
    if shuffle:
        perm = jax.random.permutation(jax.random.fold_in(key, 7331),
                                      n_spiral)
        x_sp, y_sp = x_sp[perm], y_sp[perm]
    if n_val == 0:
        return x_sp, y_sp
    x_rg, y_rg = ring_dataset(n_val, k2, radius=1.05, width=0.15,
                              noise=noise)
    return (jnp.concatenate([x_sp, x_rg], axis=0),
            jnp.concatenate([y_sp, y_rg], axis=0))


def ring_dataset(n: int, key: jax.Array, radius: float = 1.05,
                 width: float = 0.15, noise: float = 0.02
                 ) -> Tuple[Array, Array]:
    """Annulus ``[radius, radius+width]`` with random labels (OOD set).

    Randomness-order-faithful to the reference (``/root/reference/src/
    toydata.py:91-102`` — note its ``k3`` is reused for BOTH the coordinate
    noise and the Bernoulli labels), so a given (n, key, radius, width,
    noise) reproduces the reference instance bit-identically. The default
    radius follows the reference *function* default 1.05 (``:91``) — flush
    against the banana/spiral support, a non-trivial OOD set. The
    reference's standalone data-gen path (``create_dataset('ring')``,
    ``:227-233``) overrides radius to 2.0; :data:`CREATE_OVERRIDES` keeps
    that parity for the named-dataset factory, and RESULTS.md reports the
    banana OOD row at BOTH radii.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    r = radius + jax.random.uniform(k1, (n, 1)) * width
    theta = jax.random.uniform(k2, (n, 1)) * 2.0 * jnp.pi
    x = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
    x = x + noise * jax.random.normal(k3, x.shape)
    y = jax.random.bernoulli(k3, 0.5, (n,)).astype(jnp.int32)
    return x, y


def banana_dataset(n: int, key: jax.Array, noise: float = 0.05
                   ) -> Tuple[Array, Array]:
    """Two interleaved cosine arches + a line/blob per class ('banana').

    The randomness-consumption order follows the reference generator
    (``/root/reference/src/toydata.py:112-160``) EXACTLY, so with the
    reference's published generation params (n=500, noise=0.090,
    seed=584848 — ``/root/reference/Makefile:125-131``) this produces the
    bit-identical benchmark instance the reference's recorded metrics were
    measured on (JAX's threefry PRNG is deterministic across platforms).
    """
    k_arch1, k_arch0, k_noise = jax.random.split(key, 3)
    half = n // 2

    # class 1: cosine arch shifted down ...
    arch_n = int(half * 0.8)
    ax = jax.random.uniform(k_arch1, (arch_n, 1), minval=-1.0, maxval=1.0)
    arch = jnp.concatenate([ax, jnp.cos(1.5 * ax) - 0.7], axis=1)
    arch = arch + noise * jax.random.normal(k_noise, (arch_n, 2))
    # ... + short slanted line (fresh fold of both keys)
    k_arch1 = jax.random.fold_in(k_arch1, 1)
    k_noise = jax.random.fold_in(k_noise, 1)
    line_n = half - arch_n
    lx = jax.random.uniform(k_arch1, (line_n, 1), minval=0.0, maxval=1.0)
    line = jnp.concatenate([lx, 1.5 - 0.2 * lx], axis=1)
    line = line + noise * jax.random.normal(k_noise, (line_n, 2))
    y1 = jnp.ones(half)

    # class 0: wider cosine arch (reuses the folded noise key) ...
    arch_n = int(half * 0.6)
    bx = jax.random.uniform(k_arch0, (arch_n, 1), minval=-1.0, maxval=1.1)
    barch = jnp.concatenate([bx, jnp.cos(1.6 * bx)], axis=1)
    barch = barch + noise * jax.random.normal(k_noise, (arch_n, 2))
    # ... + a blob underneath
    k_arch0 = jax.random.fold_in(k_arch0, 1)
    kn1, kn2 = jax.random.split(k_noise, 2)
    blob_n = half - arch_n
    cx = jax.random.uniform(k_arch0, (blob_n, 1), minval=-0.4, maxval=0.5)
    cy = noise * 1.5 * jax.random.normal(kn1, (blob_n, 1)) - 0.5
    blob = jnp.concatenate([cx, cy], axis=1)
    blob = blob + noise * jax.random.normal(kn2, (blob_n, 2))
    y0 = jnp.zeros(half)

    x = jnp.concatenate([arch, line, barch, blob], axis=0)
    y = jnp.concatenate([y1, y0]).astype(jnp.int32)
    perm = jax.random.permutation(jax.random.fold_in(key, 1337), n)
    return x[perm], y[perm]


GENERATORS = {
    "sine": sine_dataset,
    "xor": xor_dataset,
    "spiral": spiral_dataset,
    "ring": ring_dataset,
    "banana": banana_dataset,
}

# kwargs the reference's data-gen CLI hard-codes per dataset name
# (``create_dataset``, /root/reference/src/toydata.py:227-233: the
# standalone 'ring' dataset is generated at radius 2.0 even though the
# generator's own default is 1.05). Explicit caller kwargs still win.
CREATE_OVERRIDES = {"ring": {"radius": 2.0}}

# Bump when any generator's randomness consumption changes: participates in
# the npz freshness check so stale caches from older generator code cannot
# silently win (round 3 changed ring/spiral to the reference's exact order).
GENERATOR_VERSION = 2


def create_dataset(name: str, n: int, key: jax.Array, noise: float = 0.05,
                   **kwargs) -> Tuple[Array, Array]:
    if name not in GENERATORS:
        raise ValueError(f"unknown toy dataset: {name}")
    merged = {**CREATE_OVERRIDES.get(name, {}), **kwargs}
    return GENERATORS[name](n, key, noise=noise, **merged)


def save_dataset(x: Array, y: Array, path: str, **meta) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, x=np.asarray(x), y=np.asarray(y),
             **{k: np.asarray(v) for k, v in meta.items()})


def load_dataset(path: str) -> Tuple[Array, Array]:
    data = np.load(path)
    return jnp.asarray(data["x"]), jnp.asarray(data["y"])


def train_test_val_split(x: Array, y: Array,
                         fractions=(0.8, 0.10, 0.10)):
    """80/10/10 split (reference ``src/toydata.py:247-257``)."""
    n = x.shape[0]
    n_train = int(fractions[0] * n)
    n_test = n_train + int(fractions[1] * n)
    return ((x[:n_train], y[:n_train]),
            (x[n_train:n_test], y[n_train:n_test]),
            (x[n_test:], y[n_test:]))


def ring_cache_fname(radius: float) -> str:
    """Canonical cache filename for a parameterized OOD ring.

    One derivation for ALL call sites (cli.evaluate, the golden tests):
    two spellings of the same radius previously produced two cache files
    of identical content, inviting drift if the freshness key ever missed
    a param. Dots become 'p' so the name stays filesystem-plain.
    """
    return f"ring_r{radius:g}".replace(".", "p")


def ensure_toy_npz(name: str, data_dir: str = "data", n: int = 512,
                   noise: float = 0.05, seed: int = 42,
                   fname: Optional[str] = None, **kwargs) -> str:
    """Generate-and-cache a toy dataset npz (hermetic: no torch downloads).

    The cache embeds its generation params (incl. the generator-code
    version) and regenerates on mismatch — otherwise a stale file from an
    older config or older generator code would silently win forever.
    ``fname`` names the cache file when one dataset is needed at several
    parameterizations (e.g. the OOD ring at both radii).
    """
    path = os.path.join(data_dir, f"{fname or name}.npz")
    # generator kwargs (e.g. split_in_middle) are part of the dataset's
    # identity and must participate in the freshness check; they are stored
    # as a single canonical string because npz holds arrays, not dicts
    kwargs_repr = repr(sorted(kwargs.items()))
    if os.path.exists(path):
        d = np.load(path)
        fresh = all(k in d and float(d[k]) == float(v)
                    for k, v in dict(n=n, noise=noise, seed=seed,
                                     gen_version=GENERATOR_VERSION).items())
        fresh = fresh and "gen_kwargs" in d \
            and str(d["gen_kwargs"]) == kwargs_repr
        if fresh:
            return path
        print(f"[data] {path} has different generation params — regenerating "
              f"(n={n}, noise={noise}, seed={seed}, kwargs={kwargs_repr})")
    x, y = create_dataset(name, n, jax.random.PRNGKey(seed), noise=noise,
                          **kwargs)
    save_dataset(x, y, path, n=n, noise=noise, seed=seed,
                 gen_version=GENERATOR_VERSION,
                 gen_kwargs=np.asarray(kwargs_repr))
    return path


def mnist_pca_subset(classes=(8, 9), n_components: int = 2,
                     data_dir: str = "data", max_per_class: int = 1000,
                     seed: int = 0) -> Tuple[Array, Array]:
    """Binary MNIST subset projected onto its top principal components.

    Parity: ``data_mnist_subset_89`` (``/root/reference/src/toydata.py:166-178``)
    — the reference loads a pre-baked npz; here the projection is computed
    from the image dataset directly (synthetic surrogate when MNIST is
    unavailable offline), making the pipeline hermetic.
    """
    from laplace_inducing_points_tpu.data.scale import load_arrays

    x_img, y_img = load_arrays("mnist", train=True, root=data_dir)
    mask = np.isin(y_img, classes)
    x_img, y_img = x_img[mask], y_img[mask]
    rng = np.random.default_rng(seed)
    keep = []
    for ci, c in enumerate(classes):
        idx = np.nonzero(y_img == c)[0]
        rng.shuffle(idx)
        keep.append(idx[:max_per_class])
    keep = np.concatenate(keep)
    rng.shuffle(keep)
    flat = x_img[keep].reshape(len(keep), -1)
    labels = np.searchsorted(np.sort(classes), y_img[keep]).astype(np.int32)

    flat = flat - flat.mean(axis=0, keepdims=True)
    # top components via SVD of the (n, d) matrix
    _, _, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:n_components].T
    proj = proj / (proj.std(axis=0, keepdims=True) + 1e-8)
    return jnp.asarray(proj, jnp.float32), jnp.asarray(labels)
