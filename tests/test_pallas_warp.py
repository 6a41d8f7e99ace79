"""Windowed gather-free Pallas warp vs the XLA warp oracle (interpret mode).

The kernel (ops/pallas/warp_kernel.py) replaces the 4-tap bilinear gather
(reference core_warp.py:131-148) with a dynamic-slice window DMA + VPU
shift-enumeration + one-hot MXU matmul. Exact (up to fp reassociation)
whenever each 8-row block's floor_y spread fits the 32-row window —
`window_overflow_blocks` counts violations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.ops.pallas.warp_kernel import (
    BLOCK_H, WINDOW_K, warp_window_pallas, window_overflow_blocks)
from unsupervised_detection_tpu.ops.warp import dense_image_warp


def _smooth_flow(rng, b, h, w, amp):
    coarse = rng.randn(b, max(h // 8, 1), max(w // 8, 1), 2).astype(np.float32)
    return np.asarray(jax.image.resize(coarse, (b, h, w, 2), "linear")) * amp


@pytest.mark.parametrize("shape,amp", [
    ((2, 16, 128, 32), 3.0),    # in-window smooth flow
    ((1, 32, 160, 32), 6.0),    # PWC-L2-like channels
    ((2, 16, 128, 32), 40.0),   # large but smooth: taps clamp at edges
    ((2, 16, 128, 8), 3.0),     # c=8: alignment slack > K-2 -> quad fallback
    ((2, 16, 128, 12), 3.0),    # K*C % 128 != 0 -> quad fallback
])
def test_window_warp_matches_xla(shape, amp):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    image = rng.randn(b, h, w, c).astype(np.float32)
    flow = _smooth_flow(rng, b, h, w, amp)
    # Smooth flows keep every block inside the window.
    assert int(window_overflow_blocks(image.shape, flow)) == 0

    got = np.asarray(warp_window_pallas(image, flow, True))
    want = np.asarray(dense_image_warp(image, flow, method="flat"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_window_warp_bf16():
    rng = np.random.RandomState(1)
    image = rng.randn(1, 16, 128, 32).astype(np.float32)
    flow = _smooth_flow(rng, 1, 16, 128, 2.5)
    got = np.asarray(
        warp_window_pallas(image.astype(jnp.bfloat16),
                           flow.astype(jnp.bfloat16), True).astype(np.float32))
    want = np.asarray(
        dense_image_warp(jnp.asarray(image, jnp.bfloat16),
                         jnp.asarray(flow, jnp.bfloat16),
                         method="flat").astype(np.float32))
    # Same bf16 operands; the only divergence is tap-product reassociation.
    assert np.abs(got - want).max() < 0.08


def test_overflow_detection():
    # H must exceed the window for an overflow to be possible (floor_y is
    # clamped to [0, H-2]). Alternate +-2K vertical flow within one block:
    # the clamped taps span the full image, far beyond the window.
    # c=32: a kernel-path shape (the quad fallback would report 0).
    b, h, w = 1, WINDOW_K * 2, 128
    flow = np.zeros((b, h, w, 2), np.float32)
    flow[:, ::2, :, 0] = float(2 * WINDOW_K)
    flow[:, 1::2, :, 0] = -float(2 * WINDOW_K)
    n = int(window_overflow_blocks((b, h, w, 32), flow))
    assert n > 0


def test_indivisible_height_adaptive_blocking():
    # H=12 is not divisible by BLOCK_H=8; the kernel must adapt its row
    # blocking (whole-height block, Mosaic's "equal to the array dim"
    # escape hatch) and still be exact.
    rng = np.random.RandomState(2)
    image = rng.randn(1, 12, 64, 128).astype(np.float32)
    flow = _smooth_flow(rng, 1, 12, 64, 2.0)
    got = np.asarray(warp_window_pallas(image, flow, True))
    want = np.asarray(dense_image_warp(image, flow, method="flat"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_pwc_incontext_flow_fits_window():
    # PWC warps with x2-bilinear-upsampled coarse flow (model_pwcnet.py:616).
    # A smooth coarse field of realistic magnitude (coarse predictions are
    # themselves smooth motion fields, up to tens of px) stays within the
    # window after upsampling, even at large absolute displacement.
    rng = np.random.RandomState(3)
    b, h, w = 2, 96, 160
    # amp 3 gives |flow| up to ~20 feature px (~80 px at full res) with
    # vertical gradients already well above real coarse predictions' (the
    # white-noise construction is harsher per-px than network flow fields;
    # the production contract is additionally asserted in-context on the
    # TPU by tools/bench_warp_window.py against real PWC intermediates).
    coarse = _smooth_flow(rng, b, h // 2, w // 2, 3.0)
    up = np.asarray(jax.image.resize(coarse, (b, h, w, 2), "linear")) * 2.0
    assert float(np.abs(up).max()) > 10.0  # large displacements present
    assert int(window_overflow_blocks((b, h, w, 32), up)) == 0


def test_window_method_runtime_guard():
    # dense_image_warp(method="window") is runtime-guarded: when the flow
    # violates the window contract, lax.cond dispatches to the quad gather
    # and the result is TAP-EXACT (bit-identical to quad), not clamped.
    b, h, w, c = 1, 96, 160, 32
    rng = np.random.RandomState(4)
    image = rng.randn(b, h, w, c).astype(np.float32)
    flow = np.zeros((b, h, w, 2), np.float32)
    flow[:, ::2, :, 0] = 80.0   # alternating +-80 px vertical: overflows
    flow[:, 1::2, :, 0] = -80.0
    assert int(window_overflow_blocks((b, h, w, c), flow)) > 0
    got = np.asarray(dense_image_warp(image, flow, method="window"))
    want = np.asarray(dense_image_warp(image, flow, method="quad"))
    np.testing.assert_array_equal(got, want)


def test_window_method_small_level_static_gate():
    # Small PWC levels (h*w below the measured win threshold) dispatch
    # straight to quad — again bit-identical.
    rng = np.random.RandomState(5)
    image = rng.randn(2, 24, 40, 96).astype(np.float32)
    flow = _smooth_flow(rng, 2, 24, 40, 3.0)
    got = np.asarray(dense_image_warp(image, flow, method="window"))
    want = np.asarray(dense_image_warp(image, flow, method="quad"))
    np.testing.assert_array_equal(got, want)


def test_window_method_gradients_match_quad():
    # method="window" carries a custom VJP that differentiates through the
    # quad gather (the same bilinear-tap function), so PWC pretraining can
    # train THROUGH the warp with the kernel in the forward pass.
    rng = np.random.RandomState(6)
    image = jnp.asarray(rng.randn(1, 96, 160, 32), jnp.float32)
    flow = jnp.asarray(_smooth_flow(rng, 1, 96, 160, 2.0))

    def loss(method):
        def f(im, fl):
            out = dense_image_warp(im, fl, method=method)
            return jnp.sum(out * out)
        return f

    gw_i, gw_f = jax.grad(loss("window"), argnums=(0, 1))(image, flow)
    gq_i, gq_f = jax.grad(loss("quad"), argnums=(0, 1))(image, flow)
    np.testing.assert_allclose(np.asarray(gw_i), np.asarray(gq_i),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gq_f),
                               rtol=1e-3, atol=1e-3)
