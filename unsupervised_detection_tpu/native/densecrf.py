"""ctypes binding for the native dense-CRF mean-field solver
(native/densecrf/densecrf.cpp). Builds on first use."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "densecrf",
)
_LIB_PATH = os.path.join(_SRC_DIR, "libdensecrf.so")


def _load():
    # Always invoke make: it is a no-op when the .so is current and rebuilds
    # after source edits (a mere existence check would run stale binaries).
    subprocess.run(["make", "-C", _SRC_DIR], check=True,
                   stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dense_crf_binary.restype = ctypes.c_int
    lib.dense_crf_binary.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


_LIB = _load()


def dense_crf_binary(unary: np.ndarray, image: np.ndarray, sxy: float,
                     srgb: float, compat: float, n_iterations: int = 50):
    """2-label mean-field dense CRF (same contract as
    postproc.crf.dense_crf_binary).

    Args:
        unary: (2, H, W) negative log probabilities.
        image: (H, W, 3) uint8 RGB.
    Returns:
        (2, H, W) marginals.
    """
    h, w = image.shape[:2]
    unary_f = np.ascontiguousarray(unary.reshape(2, h * w), dtype=np.float32)
    image_u = np.ascontiguousarray(image, dtype=np.uint8)
    q = np.zeros((2, h * w), np.float32)
    ret = _LIB.dense_crf_binary(
        unary_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        image_u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, sxy, srgb, compat, n_iterations,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ret != 0:
        raise RuntimeError(f"dense_crf_binary failed with code {ret}")
    return q.reshape(2, h, w)
