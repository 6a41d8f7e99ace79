"""ctypes binding for the native coarse2fine optical flow
(native/pyflow/coarse2fine.cpp) — the pyflow.so equivalent.

Builds on first use via the module's Makefile if the shared library is
missing (g++ is part of the baked-in toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "pyflow",
)
_LIB_PATH = os.path.join(_SRC_DIR, "libcoarse2fine.so")


def _load():
    # Always invoke make: it is a no-op when the .so is current and rebuilds
    # after source edits (a mere existence check would run stale binaries).
    subprocess.run(["make", "-C", _SRC_DIR], check=True,
                   stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.coarse2fine_flow.restype = ctypes.c_int
    lib.coarse2fine_flow.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


_LIB = _load()


def coarse2fine_flow(im1: np.ndarray, im2: np.ndarray, alpha: float = 0.012,
                     ratio: float = 0.75, min_width: int = 20,
                     n_outer_fp_iterations: int = 7,
                     n_inner_fp_iterations: int = 1,
                     n_sor_iterations: int = 30, col_type: int = 0):
    """Dense flow from im1's grid into im2 (reference pyflow API:
    coarse2fine_flow(I2, I1, ...) maps I2 coordinates into I1).

    Args:
        im1, im2: (H, W, 3) or (H, W, 1)/(H, W) float images in [0, 1].
    Returns:
        (u, v, warped_im2): x/y displacement fields and im2 warped onto im1.
    """
    def prep(im):
        im = np.asarray(im, dtype=np.float64)
        if im.ndim == 2:
            im = im[..., None]
        return np.ascontiguousarray(im)

    im1 = prep(im1)
    im2 = prep(im2)
    assert im1.shape == im2.shape, (im1.shape, im2.shape)
    h, w, c = im1.shape

    u = np.zeros((h, w), np.float64)
    v = np.zeros((h, w), np.float64)
    warped = np.zeros((h, w, c), np.float64)

    dp = ctypes.POINTER(ctypes.c_double)
    ret = _LIB.coarse2fine_flow(
        im1.ctypes.data_as(dp), im2.ctypes.data_as(dp),
        h, w, c,
        alpha, ratio, min_width,
        n_outer_fp_iterations, n_inner_fp_iterations, n_sor_iterations,
        col_type,
        u.ctypes.data_as(dp), v.ctypes.data_as(dp), warped.ctypes.data_as(dp),
    )
    if ret != 0:
        raise RuntimeError(f"coarse2fine_flow failed with code {ret}")
    return u, v, warped
