"""ctypes bindings for the native host runtime (csrc/nvrhost.cpp).

Auto-builds ``libnvrhost.so`` with g++ on first use (no pybind11 in this
environment); every entry point has a pure-numpy fallback so the framework
runs even without a compiler.  See csrc/nvrhost.cpp for what lives natively
and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_CSRC, "libnvrhost.so"))
    src = os.path.abspath(os.path.join(_CSRC, "nvrhost.cpp"))
    try:
        if not os.path.exists(so) or (os.path.exists(src) and
                                      os.path.getmtime(src) > os.path.getmtime(so)):
            subprocess.run(["sh", os.path.join(_CSRC, "build.sh")],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError):
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.ray_dirs.argtypes = [f64p, f64p, f64p, i64p, i64, f32p, f32p]
    lib.near_far.restype = i64
    lib.near_far.argtypes = [f32p, f32p, f32p, i64, f32p, f32p, u8p, ctypes.c_int]
    lib.sample_pixels.restype = i64
    lib.sample_pixels.argtypes = [u8p, u8p, i64, i64, i64, i64, i64,
                                  ctypes.c_uint64, i64p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def ray_dirs(K: np.ndarray, R: np.ndarray, T: np.ndarray,
             coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rays for (row, col) pixel coords -> (origins (n,3), unit dirs (n,3))."""
    lib = _load()
    n = len(coords)
    if lib is None:
        from ..ops.ray import rays_for_coords_np
        return rays_for_coords_np(K, R, T, coords)
    out_o = np.empty((n, 3), np.float32)
    out_d = np.empty((n, 3), np.float32)
    lib.ray_dirs(np.ascontiguousarray(K, np.float64),
                 np.ascontiguousarray(R, np.float64),
                 np.ascontiguousarray(T, np.float64).reshape(-1),
                 np.ascontiguousarray(coords, np.int64), n, out_o, out_d)
    return out_o, out_d


def near_far(bounds: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray,
             compact: bool = True):
    """(near, far, hit_mask) — reference ``get_near_far`` contract."""
    lib = _load()
    if lib is None:
        from ..ops.ray import get_near_far_np
        return get_near_far_np(bounds, ray_o, ray_d)
    n = len(ray_o)
    near = np.empty(n, np.float32)
    far = np.empty(n, np.float32)
    hit = np.empty(n, np.uint8)
    n_hit = lib.near_far(np.ascontiguousarray(bounds, np.float32),
                         np.ascontiguousarray(ray_o, np.float32),
                         np.ascontiguousarray(ray_d, np.float32),
                         n, near, far, hit, 1 if compact else 0)
    mask = hit.astype(bool)
    if compact:
        return near[:n_hit].copy(), far[:n_hit].copy(), mask
    return near, far, mask


def sample_pixels(msk: np.ndarray, bound_mask: np.ndarray, n_body: int,
                  n_face: int, n_rand: int, seed: int) -> np.ndarray:
    """Weighted (row, col) pixel draw; numpy fallback mirrors semantics."""
    lib = _load()
    H, W = msk.shape
    if lib is None:
        rng = np.random.default_rng(seed)
        from ..datasets.sampling import _weighted_pick
        return _weighted_pick(msk, bound_mask, n_body, n_face, n_rand, rng)
    out = np.empty((n_body + n_face + n_rand, 2), np.int64)
    n = lib.sample_pixels(np.ascontiguousarray(msk, np.uint8),
                          np.ascontiguousarray(bound_mask, np.uint8),
                          H, W, n_body, n_face, n_rand, seed, out)
    return out[:n]


# erode_edge and searchsorted C twins were removed (round 3): cv2's SIMD
# morphology is exact and GIL-free (the C twin differed at image borders),
# and the host never batch-searchsorts (ops/searchsorted.py's jnp kernel is
# the torchsearchsorted equivalent on the device path).
