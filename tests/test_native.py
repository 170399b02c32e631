"""Native C++ data-engine tests (ctypes bindings vs numpy semantics)."""

import numpy as np
import pytest

from laplace_inducing_points_tpu.data import native


def test_shuffle_is_permutation_and_deterministic():
    a = native.shuffle_indices(100, seed=7)
    b = native.shuffle_indices(100, seed=7)
    c = native.shuffle_indices(100, seed=8)
    assert sorted(a) == list(range(100))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gather_matches_fancy_indexing():
    src = np.random.default_rng(0).random((20, 5, 3)).astype(np.float32)
    idx = np.array([3, 3, 0, 19, 7], dtype=np.int64)
    assert np.array_equal(native.gather_f32(src, idx), src[idx])


def test_gather_non_f32_fallback():
    src = np.random.default_rng(1).random((10, 4))    # float64
    idx = np.array([1, 2], dtype=np.int64)
    assert np.array_equal(native.gather_f32(src, idx), src[idx])


def test_crop_flip_windows_come_from_source():
    """Every output must be a (possibly flipped) crop window of its image."""
    rng = np.random.default_rng(2)
    h = w = 8
    pad = 2
    imgs = rng.random((4, h, w, 3)).astype(np.float32)
    padded = np.ascontiguousarray(
        np.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0))))
    idx = np.array([0, 1, 2, 3], dtype=np.int64)
    out = native.crop_flip_f32(padded, idx, h, w, pad, seed=5)
    assert out.shape == (4, h, w, 3)
    for b in range(4):
        found = False
        for dy in range(2 * pad + 1):
            for dx in range(2 * pad + 1):
                win = padded[idx[b], dy:dy + h, dx:dx + w]
                if np.array_equal(out[b], win) or \
                        np.array_equal(out[b], win[:, ::-1]):
                    found = True
                    break
            if found:
                break
        assert found, f"output {b} is not a crop/flip of its source"


def test_crop_flip_deterministic():
    rng = np.random.default_rng(3)
    padded = np.ascontiguousarray(rng.random((2, 12, 12, 1)).astype(np.float32))
    idx = np.array([0, 1], dtype=np.int64)
    a = native.crop_flip_f32(padded, idx, 8, 8, 2, seed=11)
    b = native.crop_flip_f32(padded, idx, 8, 8, 2, seed=11)
    assert np.array_equal(a, b)


def test_normalize_inplace():
    data = np.ones((2, 4, 4, 3), dtype=np.float32)
    out = native.normalize_f32_inplace(data.copy(), [0.5, 0.5, 1.0],
                                       [0.5, 1.0, 2.0])
    assert np.allclose(out[..., 0], 1.0)
    assert np.allclose(out[..., 1], 0.5)
    assert np.allclose(out[..., 2], 0.0)


def test_native_library_builds():
    """The image ships g++; the .so should build and load."""
    assert native.have_native()
