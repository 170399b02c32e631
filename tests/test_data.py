"""Bit-parity of the toy OOD/val generators with the reference.

The golden arrays below were produced by EXECUTING the reference's own
generators (``/root/reference/src/toydata.py``: ``ring_dataset`` :91-102,
``noisy_spiral_dataset`` :75-89) in-process on this machine (JAX threefry is
deterministic across platforms), NOT by copying code — our implementations
consume randomness in the reference's documented order and must reproduce
the instances bit-identically (the banana analog is pinned by
``tests/test_golden_banana.py``).
"""

import jax
import numpy as np
import pytest

from laplace_inducing_points_tpu.data.toy import (CREATE_OVERRIDES,
                                                  create_dataset,
                                                  ensure_toy_npz,
                                                  load_dataset,
                                                  noisy_spiral_dataset,
                                                  ring_dataset,
                                                  spiral_dataset)

# reference ring_dataset(8, PRNGKey(42), radius=1.05, width=0.15, noise=0.02)
REF_RING_105_X = np.array(
    [[-0.14935336, -1.1066886],
     [0.23571984, -1.0735757],
     [0.48921928, 1.0431969],
     [-0.1282032, 1.141882],
     [0.8764868, 0.69686997],
     [0.36358124, 1.096184],
     [-0.45719478, 1.0489385],
     [0.8347432, 0.6470795]], np.float32)
REF_RING_105_Y = np.array([0, 0, 1, 1, 1, 1, 1, 1], np.int32)

# reference ring_dataset(6, PRNGKey(9), radius=2.0, width=0.15, noise=0.05)
REF_RING_20_X = np.array(
    [[1.3869222, 1.5847912],
     [0.2450305, 2.1104136],
     [-1.6999469, -1.2231102],
     [0.92521983, 1.8731778],
     [-2.1186287, -0.5647595],
     [0.9535848, -1.7453628]], np.float32)

# reference noisy_spiral_dataset(8, PRNGKey(7), noise=0.05)
REF_SPIRAL_X = np.array(
    [[-0.2507915, 0.8700804],
     [0.26814833, -0.4893235],
     [-0.32694516, 0.0940018],
     [-0.2905094, 0.0423871],
     [0.23247914, -0.8555301],
     [-0.37156487, 0.581707],
     [0.2414005, -0.09195683],
     [0.30070543, 0.05457513]], np.float32)
REF_SPIRAL_Y = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)


def test_ring_bit_parity_radius_105():
    x, y = ring_dataset(8, jax.random.PRNGKey(42), radius=1.05,
                        width=0.15, noise=0.02)
    np.testing.assert_array_equal(np.asarray(x), REF_RING_105_X)
    np.testing.assert_array_equal(np.asarray(y), REF_RING_105_Y)


def test_ring_default_radius_is_reference_function_default():
    x, _ = ring_dataset(8, jax.random.PRNGKey(42), width=0.15, noise=0.02)
    np.testing.assert_array_equal(np.asarray(x), REF_RING_105_X)


def test_ring_create_path_matches_reference_data_gen_cli():
    # the reference's standalone `create_dataset('ring')` hard-codes
    # radius=2.0 (toydata.py:227-233); the named factory must reproduce it
    assert CREATE_OVERRIDES["ring"] == {"radius": 2.0}
    x, _ = create_dataset("ring", 6, jax.random.PRNGKey(9), noise=0.05)
    np.testing.assert_array_equal(np.asarray(x), REF_RING_20_X)
    # an explicit caller kwarg still wins over the override
    x105, _ = create_dataset("ring", 8, jax.random.PRNGKey(42), noise=0.02,
                             radius=1.05)
    np.testing.assert_array_equal(np.asarray(x105), REF_RING_105_X)


def test_spiral_bit_parity_unshuffled():
    x, y = noisy_spiral_dataset(8, jax.random.PRNGKey(7), noise=0.05)
    # x equal to 1 ulp (same slack as the banana instance — XLA fuses the
    # eager noise multiply-add differently across expression forms)
    np.testing.assert_allclose(np.asarray(x), REF_SPIRAL_X, rtol=0,
                               atol=4e-9)
    np.testing.assert_array_equal(np.asarray(y), REF_SPIRAL_Y)
    # create_dataset('spiral') consumes key -> split(2)[0] for the spiral
    # (reference toydata.py:213-216); at ring_val_frac=0 the instance equals
    # noisy_spiral_dataset under that sub-key
    k1, _ = jax.random.split(jax.random.PRNGKey(7), 2)
    x2, _ = spiral_dataset(8, jax.random.PRNGKey(7), noise=0.05)
    xk, _ = noisy_spiral_dataset(8, k1, noise=0.05)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(xk))


def test_spiral_ring_val_mix_mechanism():
    # the commented-intent 10% mechanism (reference toydata.py:210-223):
    # last n_val points are ring points at radius 1.05, unshuffled
    n = 40
    x, y = spiral_dataset(n, jax.random.PRNGKey(3), noise=0.05,
                          ring_val_frac=0.10)
    n_val = 4
    radii = np.linalg.norm(np.asarray(x[-n_val:]), axis=1)
    assert (radii > 0.9).all() and (radii < 1.4).all()
    # spiral part bit-equal to the pure-spiral prefix
    x0, _ = spiral_dataset(n, jax.random.PRNGKey(3), noise=0.05)
    # same sub-key, fewer points: radii vector differs in shape, so just
    # check the ring tail is appended to an (n - n_val)-point spiral
    k1, k2 = jax.random.split(jax.random.PRNGKey(3), 2)
    xs, _ = noisy_spiral_dataset(n - n_val, k1, noise=0.05)
    np.testing.assert_array_equal(np.asarray(x[:n - n_val]), np.asarray(xs))
    xr, _ = ring_dataset(n_val, k2, radius=1.05, width=0.15, noise=0.05)
    np.testing.assert_array_equal(np.asarray(x[-n_val:]), np.asarray(xr))


def test_spiral_ring_val_mix_odd_remainder():
    # regression: n=512, frac=0.10 gives n_val=51 -> spiral remainder 461
    # (odd) used to trip noisy_spiral's even-arms assert; the odd point is
    # absorbed into the ring tail instead
    n = 512
    x, y = spiral_dataset(n, jax.random.PRNGKey(11), noise=0.05,
                          ring_val_frac=0.10)
    assert x.shape == (n, 2) and y.shape == (n,)
    n_val = 52                                   # 51 rounded up to even rest
    radii = np.linalg.norm(np.asarray(x[-n_val:]), axis=1)
    assert (radii > 0.9).all() and (radii < 1.4).all()


def test_ensure_toy_npz_versioned_cache(tmp_path):
    d = str(tmp_path)
    p1 = ensure_toy_npz("ring", data_dir=d, n=16, noise=0.02, seed=1)
    x1, _ = load_dataset(p1)
    # same params -> cache hit (same bits)
    p2 = ensure_toy_npz("ring", data_dir=d, n=16, noise=0.02, seed=1)
    x2, _ = load_dataset(p2)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # distinct parameterization under its own fname coexists
    p3 = ensure_toy_npz("ring", data_dir=d, n=16, noise=0.02, seed=1,
                        fname="ring_r105", radius=1.05)
    assert p3 != p1
    x3, _ = load_dataset(p3)
    assert np.linalg.norm(np.asarray(x3), axis=1).mean() < \
        np.linalg.norm(np.asarray(x1), axis=1).mean()
    # stale generator version forces regeneration
    import numpy as _np
    data = dict(_np.load(p1))
    data["gen_version"] = _np.asarray(1)
    _np.savez(p1, **data)
    ensure_toy_npz("ring", data_dir=d, n=16, noise=0.02, seed=1)
    assert int(_np.load(p1)["gen_version"]) >= 2
