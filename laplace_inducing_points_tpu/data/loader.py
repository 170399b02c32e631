"""Pure-numpy data pipeline with device prefetch and sharded placement.

Replaces the reference's torch ``DataLoader`` + single-device FIFO prefetch
(``/root/reference/src/data.py:59-117`` — whose docstring concedes it "does
not shard"). Here:

* batching/shuffling is numpy index math (no torch dependency on the data
  path),
* a background thread keeps ``prefetch`` batches in flight,
* batches are placed with ``jax.device_put`` under an optional
  ``NamedSharding`` so the leading batch axis lands sharded across the mesh
  (data parallelism starts in the input pipeline, not inside the step
  function).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from laplace_inducing_points_tpu.data import native


class ArrayDataset:
    """In-memory (x, y) dataset."""

    def __init__(self, x, y):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        assert len(self.x) == len(self.y)

    def __len__(self):
        return len(self.x)


class DataLoader:
    """Minibatch iterator over an ArrayDataset.

    ``drop_last=True`` keeps batch shapes static (one XLA compilation per
    batch size — non-negotiable for TPU).
    """

    def __init__(self, dataset: ArrayDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = True,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        if self.shuffle:
            # native Fisher-Yates (C++); falls back to numpy without the .so
            idx = native.shuffle_indices(
                n, int(self._rng.integers(0, 2**63 - 1)))
        else:
            idx = np.arange(n, dtype=np.int64)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            b = idx[s:s + self.batch_size]
            yield native.gather_f32(self.dataset.x, b), self.dataset.y[b]


def make_dataloaders(train: ArrayDataset, test: ArrayDataset,
                     val: Optional[ArrayDataset], batch_size: int,
                     seed: int = 0):
    """Parity: ``get_dataloaders`` (``/root/reference/src/data.py:59-81``).

    Train keeps ``drop_last=True`` (static shapes in the hot loop); eval
    loaders keep the tail batch — a small eval set must never round down to
    zero batches (the reference drops tails everywhere and silently loses
    eval data).
    """
    train_loader = DataLoader(train, batch_size, shuffle=True, seed=seed,
                              drop_last=len(train) >= batch_size)
    test_loader = DataLoader(test, batch_size, shuffle=False, drop_last=False)
    if val is None:
        return train_loader, test_loader
    val_loader = DataLoader(val, batch_size, shuffle=False, drop_last=False)
    return train_loader, test_loader, val_loader


_SENTINEL = object()


def _threading_safe() -> bool:
    """Background-thread device_put is standard on real TPU/CPU backends but
    deadlocks over the axon loopback relay (single-client tunnel); fall back
    to synchronous placement there."""
    try:
        return jax.default_backend() != "axon"
    except Exception:
        return True


def device_iter(loader: Iterable, *, prefetch: int = 2,
                sharding: Optional[jax.sharding.Sharding] = None,
                dtype=jnp.float32,
                threaded: Optional[bool] = None) -> Iterator:
    """Iterate device-resident batches with background prefetch.

    Parity: ``make_iter`` (``/root/reference/src/data.py:111-117``), extended
    with sharded placement: pass a ``NamedSharding`` whose first axis is the
    mesh's data axis and every batch is laid out across devices before the
    step function runs.
    """
    if threaded is None:
        threaded = _threading_safe()

    def put(batch):
        x, y = batch
        x = jnp.asarray(x, dtype=dtype)
        y = jnp.asarray(y)
        if sharding is not None:
            x = jax.device_put(x, sharding)
            y = jax.device_put(y, sharding)
        else:
            x = jax.device_put(x)
            y = jax.device_put(y)
        return x, y

    if not threaded:
        for batch in loader:
            yield put(batch)
        return

    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))

    def worker():
        try:
            for batch in loader:
                q.put(put(batch))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item


def cycling_batches(loader: Iterable, *, num_batches: int = 1,
                    sharding: Optional[jax.sharding.Sharding] = None):
    """Endless iterator yielding ``num_batches`` concatenated batches.

    Parity: the inducing-point trainer's ``get_next_sample`` dataloader
    cycling (``/root/reference/src/train_inducing.py:242-254``).
    """
    it = iter(device_iter(loader, sharding=sharding))
    while True:
        xs, ys = [], []
        for _ in range(num_batches):
            try:
                x, y = next(it)
            except StopIteration:
                it = iter(device_iter(loader, sharding=sharding))
                x, y = next(it)
            xs.append(x)
            ys.append(y)
        if num_batches == 1:
            yield xs[0], ys[0]
        else:
            yield jnp.concatenate(xs, axis=0), jnp.concatenate(ys, axis=0)
