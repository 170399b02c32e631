"""Image datasets: MNIST / FashionMNIST / CIFAR-10, numpy end-to-end.

Parity: ``/root/reference/src/scaledata.py`` (eager materialization to numpy,
98/2 train/val split, CIFAR train-time RandomCrop(32, pad=4) + horizontal
flip). Differences:

* loads from on-disk IDX/npz caches and only *attempts* a torchvision
  download when the cache is missing (this build environment has no network
  egress — in that case a deterministic synthetic surrogate with the right
  shapes is generated and clearly flagged, so every pipeline stays runnable),
* augmentation is a pure-numpy per-epoch transform on the loader, not a
  torch transform pipeline.
"""

from __future__ import annotations

import gzip
import os
import struct
import numpy as np

from laplace_inducing_points_tpu.data import native
from laplace_inducing_points_tpu.data.loader import ArrayDataset, DataLoader

DATASET_SHAPES = {
    "mnist": ((28, 28, 1), 10),
    "fmnist": ((28, 28, 1), 10),
    "cifar10": ((32, 32, 3), 10),
}


def _read_idx_images(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad IDX image magic in {path}"
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(n, rows, cols, 1).astype(np.float32) / 255.0


def _read_idx_labels(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad IDX label magic in {path}"
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.astype(np.int32)


def _try_idx(root: str, prefix: str, train: bool):
    base = "train" if train else "t10k"
    for ext in ("", ".gz"):
        imgs = os.path.join(root, prefix, f"{base}-images-idx3-ubyte{ext}")
        labs = os.path.join(root, prefix, f"{base}-labels-idx1-ubyte{ext}")
        if os.path.exists(imgs) and os.path.exists(labs):
            return _read_idx_images(imgs), _read_idx_labels(labs)
    return None


def _try_npz(root: str, name: str, train: bool):
    path = os.path.join(root, f"{name}_{'train' if train else 'test'}.npz")
    if os.path.exists(path):
        d = np.load(path)
        return d["x"].astype(np.float32), d["y"].astype(np.int32)
    return None


def _try_torchvision(root: str, name: str, train: bool):
    try:
        import torchvision.datasets as tvd
        cls = {"mnist": tvd.MNIST, "fmnist": tvd.FashionMNIST,
               "cifar10": tvd.CIFAR10}[name]
        ds = cls(root=root, train=train, download=True)
        x = np.asarray(ds.data, dtype=np.float32) / 255.0
        if x.ndim == 3:
            x = x[..., None]
        y = np.asarray(ds.targets, dtype=np.int32)
        return x, y
    except Exception:
        return None


def _synthetic(name: str, train: bool, seed: int = 0):
    """Deterministic class-structured surrogate (offline fallback).

    Each class is a distinct smooth spatial pattern + noise, so models can
    actually fit it and the full pipeline (MAP -> inducing -> eval) exercises
    real learning dynamics even without the true datasets.
    """
    shape, num_classes = DATASET_SHAPES[name]
    n = 8192 if train else 2048
    rng = np.random.default_rng(seed + (0 if train else 1))
    y = rng.integers(0, num_classes, size=n).astype(np.int32)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    x = np.empty((n, h, w, c), dtype=np.float32)
    for k in range(num_classes):
        mask = y == k
        freq = 0.2 + 0.15 * k
        phase = 0.7 * k
        pattern = 0.5 + 0.5 * np.sin(freq * xx + phase) * np.cos(
            freq * yy - phase)
        x[mask] = pattern[None, :, :, None]
    x += 0.15 * rng.standard_normal(x.shape).astype(np.float32)
    return np.clip(x, 0.0, 1.0), y


def load_arrays(name: str, train: bool, root: str = "data",
                allow_synthetic: bool = True):
    if name not in DATASET_SHAPES:
        raise ValueError(f"unknown dataset: {name}")
    idx_prefix = {"mnist": "MNIST/raw", "fmnist": "FashionMNIST/raw"}.get(name)
    if idx_prefix:
        out = _try_idx(root, idx_prefix, train)
        if out is not None:
            return out
    out = _try_npz(root, name, train)
    if out is not None:
        return out
    out = _try_torchvision(root, name, train)
    if out is not None:
        return out
    if allow_synthetic:
        print(f"[data] '{name}' not found under {root} and no network — "
              "using deterministic synthetic surrogate")
        return _synthetic(name, train)
    raise FileNotFoundError(f"dataset {name} unavailable offline")


class AugmentedDataset(ArrayDataset):
    """CIFAR train-time augmentation: RandomCrop(32, pad=4) + HFlip.

    Applied lazily per-batch in numpy (reference uses torchvision transforms
    at materialization time, ``/root/reference/src/scaledata.py:34-49``).
    """

    def __init__(self, x, y, pad: int = 4, seed: int = 0):
        super().__init__(x, y)
        self.pad = pad
        self._rng = np.random.default_rng(seed)
        self._padded = np.ascontiguousarray(np.pad(
            self.x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            mode="constant").astype(np.float32))

    def take(self, idx: np.ndarray):
        h, w = self.x.shape[1], self.x.shape[2]
        out = native.crop_flip_f32(
            self._padded, np.asarray(idx), h, w, self.pad,
            int(self._rng.integers(0, 2**63 - 1)))
        return out, self.y[idx]


class AugmentedLoader(DataLoader):
    def __iter__(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield self.dataset.take(idx[s:s + self.batch_size])


def get_dataloaders(name: str, batch_size: int, *, aug: bool = True,
                    root: str = "data", val_fraction: float = 0.02,
                    seed: int = 0):
    """train/test/val loaders with the reference's 98/2 train/val split."""
    x_all, y_all = load_arrays(name, train=True, root=root)
    x_test, y_test = load_arrays(name, train=False, root=root)

    n_total = x_all.shape[0]
    n_val = int(val_fraction * n_total)
    n_train = n_total - n_val
    x_train, y_train = x_all[:n_train], y_all[:n_train]
    x_val, y_val = x_all[n_train:], y_all[n_train:]

    if name == "cifar10" and aug:
        train_ds = AugmentedDataset(x_train, y_train, seed=seed)
        train_loader = AugmentedLoader(train_ds, batch_size, shuffle=True,
                                       seed=seed)
    else:
        train_loader = DataLoader(ArrayDataset(x_train, y_train), batch_size,
                                  shuffle=True, seed=seed)
    # eval loaders keep the tail batch (matching loader.make_dataloaders):
    # dropping it silently skews metrics and a val split smaller than
    # batch_size would otherwise yield ZERO batches
    test_loader = DataLoader(ArrayDataset(x_test, y_test), batch_size,
                             drop_last=False)
    val_loader = DataLoader(ArrayDataset(x_val, y_val), batch_size,
                            drop_last=False)
    print(f"[data] loaded '{name}'  train={n_train} val={n_val} "
          f"test={len(x_test)}")
    return train_loader, test_loader, val_loader
