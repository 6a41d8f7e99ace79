"""Cross-validate native/pyflow against the reference's ACTUAL binary.

`/root/reference/post_processing/pyflow.so` is a Python **2.7** Cython
extension (exports `initpyflow`, links `Py_InitModule4_64`), so it cannot be
imported by any Python 3. But the underlying C++ solver entry point IS
exported:

    _Z22Coarse2FineFlowWrapperPdS_S_PKdS1_ddiiiiiiii
    == Coarse2FineFlowWrapper(double* vx, double* vy, double* warpI2,
                              const double* Im1, const double* Im2,
                              double alpha, double ratio, int minWidth,
                              int nOuterFPIterations, int nInnerFPIterations,
                              int nSORIterations, int colType,
                              int h, int w, int c)

The only blockers to dlopen are unresolved CPython-2.7 data/function symbols;
we satisfy them with a generated dummy shim library (they are only touched by
`initpyflow`, which we never call) and then drive the solver directly via
ctypes — the reference's exact compiled numerics, no reimplementation.

Compared against our native C++ port (native/pyflow/coarse2fine.cpp) with
the reference pipeline's exact parameters
(generate_soft_score_from_buffer.py:130-138,165-167).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

REF_SO = "/root/reference/post_processing/pyflow.so"
MANGLED = "_Z22Coarse2FineFlowWrapperPdS_S_PKdS1_ddiiiiiiii"

# Reference pipeline flow options (generate_soft_score_from_buffer.py:130-138)
ALPHA, RATIO, MIN_WIDTH = 0.012, 0.75, 20
N_OUTER, N_INNER, N_SOR, COL_TYPE = 7, 1, 30, 0


def _dummy_symbols():
    out = subprocess.run(
        ["nm", "-D", "-u", REF_SO], check=True, capture_output=True, text=True
    )
    syms = []
    for line in out.stdout.splitlines():
        name = line.split()[-1]
        if name.startswith(("Py", "_Py")):
            syms.append(name.split("@")[0])
    return sorted(set(syms))


@pytest.fixture(scope="module")
def reference_solver(tmp_path_factory):
    if not os.path.exists(REF_SO):
        pytest.skip("reference pyflow.so not present")
    tmp = tmp_path_factory.mktemp("pyflow_shim")
    src = tmp / "py2shim.c"
    # Data symbols must exist for eager relocation; sizes are generous.
    # Function symbols can be data too — dlopen only needs the addresses.
    lines = [f"char {s}[4096];" for s in _dummy_symbols()]
    src.write_text("\n".join(lines) + "\n")
    shim = tmp / "py2shim.so"
    subprocess.run(
        ["cc", "-shared", "-fPIC", "-o", str(shim), str(src)], check=True
    )
    ctypes.CDLL(str(shim), mode=ctypes.RTLD_GLOBAL)
    try:
        lib = ctypes.CDLL(REF_SO, mode=ctypes.RTLD_GLOBAL)
    except OSError as e:
        pytest.skip(f"reference pyflow.so not loadable even with shim: {e}")
    fn = getattr(lib, MANGLED)
    dp = ctypes.POINTER(ctypes.c_double)
    fn.restype = None
    fn.argtypes = [dp, dp, dp, dp, dp,
                   ctypes.c_double, ctypes.c_double, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_int]

    def solve(im1, im2):
        im1 = np.ascontiguousarray(im1, np.float64)
        im2 = np.ascontiguousarray(im2, np.float64)
        h, w, c = im1.shape
        u = np.zeros((h, w), np.float64)
        v = np.zeros((h, w), np.float64)
        warped = np.zeros((h, w, c), np.float64)
        fn(u.ctypes.data_as(dp), v.ctypes.data_as(dp),
           warped.ctypes.data_as(dp),
           im1.ctypes.data_as(dp), im2.ctypes.data_as(dp),
           ALPHA, RATIO, MIN_WIDTH, N_OUTER, N_INNER, N_SOR, COL_TYPE,
           h, w, c)
        return u, v, warped

    return solve


def _image_pair(hw=(64, 96), shift=(1.5, -2.0)):
    """Smooth random texture and a subpixel-shifted copy."""
    rs = np.random.RandomState(3)
    h, w = hw
    base = rs.rand(h // 4 + 4, w // 4 + 4, 3)
    import cv2

    big = cv2.resize(base, (w + 16, h + 16), interpolation=cv2.INTER_CUBIC)
    m = np.float32([[1, 0, -shift[0]], [0, 1, -shift[1]]])
    shifted = cv2.warpAffine(big, m, (w + 16, h + 16))
    im1 = np.clip(big[8:8 + h, 8:8 + w], 0, 1)
    im2 = np.clip(shifted[8:8 + h, 8:8 + w], 0, 1)
    return im1, im2


def test_reference_binary_solves_known_motion(reference_solver):
    im1, im2 = _image_pair()
    u, v, _ = reference_solver(im1, im2)
    inner = np.s_[8:-8, 8:-8]
    # im2 = im1 shifted by (+1.5, -2.0); the solver's convention (measured,
    # and matched by our native port) is im1(x) ~= im2 warped by (u, v), i.e.
    # it returns the NEGATED first->second motion. The reference call site
    # passes (I2, I1) and remaps the previous frame's mask accordingly
    # (generate_soft_score_from_buffer.py:165-181).
    assert abs(np.median(u[inner]) + 1.5) < 0.25, np.median(u[inner])
    assert abs(np.median(v[inner]) - 2.0) < 0.25, np.median(v[inner])


def test_native_port_matches_reference_binary(reference_solver):
    from unsupervised_detection_tpu.native import pyflow as native

    im1, im2 = _image_pair()
    u_ref, v_ref, w_ref = reference_solver(im1, im2)
    u_got, v_got, w_got = native.coarse2fine_flow(
        im1, im2, alpha=ALPHA, ratio=RATIO, min_width=MIN_WIDTH,
        n_outer_fp_iterations=N_OUTER, n_inner_fp_iterations=N_INNER,
        n_sor_iterations=N_SOR, col_type=COL_TYPE)

    epe = np.hypot(u_got - u_ref, v_got - v_ref)
    flow_mag = np.hypot(u_ref, v_ref).mean() + 1e-9
    # Measured parity after aligning the solver details (channel-mean
    # collapse, +3k SOR iterations per coarser level): mean EPE ~0.02 px on
    # ~2.5 px flows (<1% relative), max ~0.84 px at isolated pixels.
    assert epe.mean() < 0.04, (epe.mean(), epe.max(), flow_mag)
    assert epe.mean() / flow_mag < 0.02, (epe.mean(), flow_mag)
    assert epe.max() < 1.5, (epe.mean(), epe.max())
    np.testing.assert_allclose(w_got, w_ref, atol=0.1)
