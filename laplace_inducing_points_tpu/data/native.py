"""ctypes bindings for the native C++ data engine (``native/lip_data.cpp``).

Builds the shared library on first use (g++ is baked into the image) and
caches it next to the source. Every entry point has a numpy fallback so the
package works without a compiler; ``HAVE_NATIVE`` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "lip_data.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "liblip_data.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            if not (os.path.exists(_SRC) and _build()):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        i64 = ctypes.c_int64
        u64 = ctypes.c_uint64
        pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.lip_shuffle_indices.argtypes = [pi, i64, u64]
        lib.lip_gather_f32.argtypes = [pf, pi, pf, i64, i64]
        lib.lip_gather_i32.argtypes = [p32, pi, p32, i64]
        lib.lip_crop_flip_f32.argtypes = [pf, pi, pf, i64, i64, i64, i64,
                                          i64, u64]
        lib.lip_normalize_f32.argtypes = [pf, i64, i64, i64, pf, pf]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        idx = np.arange(n, dtype=np.int64)
        rng.shuffle(idx)
        return idx
    out = np.empty(n, dtype=np.int64)
    lib.lip_shuffle_indices(out, n, seed & 0xFFFFFFFFFFFFFFFF)
    return out


def gather_f32(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """dst[b] = src[idx[b]] over the leading axis (float32 source)."""
    lib = _load()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        return src[idx]
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    item = int(np.prod(src.shape[1:], dtype=np.int64)) if src.ndim > 1 else 1
    dst = np.empty((len(idx),) + src.shape[1:], dtype=np.float32)
    lib.lip_gather_f32(src, idx, dst, len(idx), item)
    return dst


def crop_flip_f32(padded: np.ndarray, idx: np.ndarray, h: int, w: int,
                  pad: int, seed: int) -> np.ndarray:
    """Batched RandomCrop + HFlip out of a pre-padded (N,H+2p,W+2p,C) array."""
    c = padded.shape[-1]
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None or padded.dtype != np.float32 \
            or not padded.flags.c_contiguous:
        # numpy fallback (same distribution, different stream)
        rng = np.random.default_rng(seed)
        out = np.empty((len(idx), h, w, c), dtype=padded.dtype)
        offs = rng.integers(0, 2 * pad + 1, size=(len(idx), 2))
        flips = rng.random(len(idx)) < 0.5
        for j, (i, (dy, dx), fl) in enumerate(zip(idx, offs, flips)):
            img = padded[i, dy:dy + h, dx:dx + w]
            out[j] = img[:, ::-1] if fl else img
        return out
    dst = np.empty((len(idx), h, w, c), dtype=np.float32)
    lib.lip_crop_flip_f32(padded, idx, dst, len(idx), h, w, c, pad,
                          seed & 0xFFFFFFFFFFFFFFFF)
    return dst


def normalize_f32_inplace(data: np.ndarray, mean, std) -> np.ndarray:
    lib = _load()
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    if lib is None or data.dtype != np.float32 or not data.flags.c_contiguous:
        return (data - mean) / std
    n = data.shape[0]
    c = data.shape[-1]
    hw = int(np.prod(data.shape[1:-1], dtype=np.int64))
    lib.lip_normalize_f32(data, n, hw, c, mean, std)
    return data
