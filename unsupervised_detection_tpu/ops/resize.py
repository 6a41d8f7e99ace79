"""Image resizing with TF1 "legacy" sampling semantics, as MXU matmuls.

The reference pipeline resizes constantly (reader resize to 640x384, the
192x384 working resolution, per-level decoder upsampling, crop-and-resize
augmentation; reference call sites: models/utils/convolution_utils.py:4-24,
models/adversarial_learner.py:87-97, data/davis2016_data_utils.py:86-133).
It uses TF1's *legacy* resize kernels (align_corners=False, no half-pixel
centers), whose source coordinate for output index ``i`` is ``i * in/out``.

On TPU, per-pixel gathers are slow but separable interpolation is just two
matrix multiplications: ``Y = Wh @ X @ Ww^T`` per channel, which the MXU eats
for free and XLA fuses with surrounding element-wise work. Since all shapes
in the framework are static, the interpolation matrices are compile-time
constants. The same machinery expresses central cropping and continuous
random crop-and-resize (a crop is merely a scale+offset of the source
coordinates), so augmentation runs on device with static shapes — no dynamic
shapes, no host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _legacy_scale(in_size: int, out_size: int, align_corners: bool) -> np.float32:
    """TF1 CalculateResizeScale (evaluated in float32, as the TF kernel does)."""
    if align_corners and out_size > 1:
        return np.float32(in_size - 1) / np.float32(out_size - 1)
    return np.float32(in_size) / np.float32(out_size)


def _source_positions(in_size, out_size, align_corners, scale=None, offset=0.0):
    """Source sampling positions for each output index.

    Evaluated in float32 (`i * scale`) to match the TF kernel's rounding
    exactly — float64 positions shift interpolation weights by up to
    out_size * eps_f32, which breaks bit-parity at 640-wide images.
    """
    if scale is None:
        scale = _legacy_scale(in_size, out_size, align_corners)
    src = np.arange(out_size, dtype=np.float32) * np.float32(scale)
    return src.astype(np.float64) + offset


@functools.lru_cache(maxsize=None)
def bilinear_resize_weights_np(in_size: int, out_size: int, align_corners: bool = False,
                               scale: float | None = None, offset: float = 0.0,
                               clamp: tuple[float, float] | None = None) -> np.ndarray:
    """Numpy variant of bilinear_resize_matrix (host-side TF-parity resize)."""
    lo, hi = clamp if clamp is not None else (0.0, in_size - 1)
    src = np.clip(_source_positions(in_size, out_size, align_corners, scale, offset), lo, hi)
    k = np.arange(in_size, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(src[:, None] - k[None, :]))
    return w.astype(np.float32)


def bilinear_resize_matrix(in_size: int, out_size: int, align_corners: bool = False,
                           scale: float | None = None, offset: float = 0.0,
                           clamp: tuple[float, float] | None = None):
    """(out_size, in_size) bilinear interpolation matrix, TF1 legacy semantics.

    Bilinear interpolation with edge clamping is the tent kernel evaluated at
    integer taps after clamping the source position into the valid window;
    this reproduces TF1's `lower=floor(src), upper=min(lower+1, in-1)`
    exactly. For fused crop+resize, `clamp` restricts sampling to the crop
    window (TF resizes the cropped tensor, so its edge replication happens at
    the crop boundary, not the image boundary).
    """
    return jnp.asarray(
        bilinear_resize_weights_np(in_size, out_size, align_corners, scale, offset, clamp)
    )


@functools.lru_cache(maxsize=None)
def nearest_resize_index_np(in_size: int, out_size: int, align_corners: bool = False,
                            scale: float | None = None, offset: float = 0.0,
                            clamp: tuple[float, float] | None = None) -> np.ndarray:
    """Source index per output index for TF1-legacy nearest-neighbor resize:
    floor(src) (round(src) with align_corners), clamped to the valid range."""
    lo, hi = clamp if clamp is not None else (0.0, in_size - 1)
    src = _source_positions(in_size, out_size, align_corners, scale, offset)
    idx = np.rint(src) if align_corners else np.floor(src)
    return np.clip(idx, lo, hi).astype(np.int64)


def nearest_resize_matrix(in_size: int, out_size: int, align_corners: bool = False,
                          scale: float | None = None, offset: float = 0.0,
                          clamp: tuple[float, float] | None = None):
    """(out_size, in_size) one-hot nearest-neighbor matrix, TF1 legacy
    semantics (see nearest_resize_index_np)."""
    idx = nearest_resize_index_np(in_size, out_size, align_corners, scale, offset, clamp)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), idx] = 1.0
    return jnp.asarray(w)


def _apply_separable(x, wh, ww):
    """Apply per-axis interpolation matrices to NHWC (or HWC) input."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    compute_dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    x = x.astype(compute_dtype)
    wh = wh.astype(compute_dtype)
    ww = ww.astype(compute_dtype)
    # fp32 inputs demand full-precision interpolation for TF bit-parity;
    # bf16 inputs keep the fast MXU path.
    precision = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    # Two MXU matmuls; XLA fuses the transposes.
    y = jnp.einsum("oh,bhwc->bowc", wh, x, precision=precision)
    y = jnp.einsum("pw,bowc->bopc", ww, y, precision=precision)
    return y[0] if squeeze else y


def resize_bilinear(x, size, align_corners: bool = False):
    """TF1-compatible bilinear resize of NHWC/HWC images to (height, width).

    Matches tf.image.resize_images(..., method=BILINEAR) bit-for-bit in fp32
    (reference use: models/adversarial_learner.py:87-97 among many).
    """
    h, w = size
    in_h, in_w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    return _apply_separable(x, bilinear_resize_matrix(in_h, h, align_corners),
                            bilinear_resize_matrix(in_w, w, align_corners))


def resize_nearest(x, size, align_corners: bool = False):
    """TF1-compatible nearest-neighbor resize (used for GT masks and the
    generator's x2 decoder upsampling; reference:
    models/utils/convolution_utils.py:55-75, adversarial_learner.py:92-94)."""
    h, w = size
    in_h, in_w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    return _apply_separable(x, nearest_resize_matrix(in_h, h, align_corners),
                            nearest_resize_matrix(in_w, w, align_corners))


def central_crop_fraction_box(in_size: int, fraction: float) -> tuple[int, int]:
    """(start, length) of TF1 tf.image.central_crop along one axis.

    TF computes `start = int((size - size * fraction) / 2)` in float64 (the
    exact expression matters: `(1 - fraction) / 2 * size` rounds differently
    at fraction=0.9, size=640) and `length = size - 2 * start`.
    """
    if fraction == 1.0:
        return 0, in_size
    d = float(in_size)
    start = int((d - d * fraction) / 2.0)
    length = in_size - 2 * start
    return start, length


def _central_crop_resize_matrix(in_size: int, fraction: float, method: str):
    """Matrix performing central_crop(fraction) followed by legacy resize back
    to `in_size` (the reference's `central_cropping`,
    data/davis2016_data_utils.py:129-133), fused into a single matmul."""
    start, length = central_crop_fraction_box(in_size, fraction)
    scale = np.float32(length) / np.float32(in_size)
    clamp = (float(start), float(start + length - 1))
    if method == "bilinear":
        return bilinear_resize_matrix(in_size, in_size, False, scale=scale,
                                      offset=float(start), clamp=clamp)
    return nearest_resize_matrix(in_size, in_size, False, scale=scale,
                                 offset=float(start), clamp=clamp)


def central_crop_resize(x, fraction: float, method: str = "bilinear"):
    """Central-crop by `fraction` and resize back to the original size.

    Fused formulation of the reference's test-time cropping: the source
    position for output i is `start + i * cropped/out`, so crop+resize is one
    interpolation matrix per axis — no intermediate cropped tensor.
    """
    if fraction == 1.0:
        return x
    in_h, in_w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    return _apply_separable(x, _central_crop_resize_matrix(in_h, fraction, method),
                            _central_crop_resize_matrix(in_w, fraction, method))


@functools.lru_cache(maxsize=None)
def _composed_bilinear_weights_np(in_size: int, mid_size: int, out_size: int):
    """Weights of resize(in->mid) followed by resize(mid->out), composed into
    one (out, in) matrix. Both stages are linear, so the composition is the
    matrix product — the result is EXACTLY the two-stage computation up to
    fp32 summation order."""
    w1 = bilinear_resize_weights_np(in_size, mid_size)
    w2 = bilinear_resize_weights_np(mid_size, out_size)
    return (w2.astype(np.float64) @ w1.astype(np.float64)).astype(np.float32)


def resize_bilinear_composed(x, mid_hw, out_hw):
    """Fused double resize: resize to mid_hw then to out_hw in one matmul
    pair. Used to fuse PWC's x4 flow upsample with the working-resolution
    downsample (adversarial_learner.py:87-97) without materializing the
    full-resolution intermediate."""
    mh, mw = mid_hw
    oh, ow = out_hw
    in_h, in_w = (x.shape[1], x.shape[2]) if x.ndim == 4 else (x.shape[0], x.shape[1])
    wh = jnp.asarray(_composed_bilinear_weights_np(in_h, mh, oh))
    ww = jnp.asarray(_composed_bilinear_weights_np(in_w, mw, ow))
    return _apply_separable(x, wh, ww)


def crop_resize_matrices(in_size: int, out_size: int, scale, offset,
                         clamp_lo=None, clamp_hi=None):
    """Traced-parameter bilinear crop+resize matrix (for random augmentation).

    Unlike the cached static builders above, `scale`/`offset` may be traced
    scalars: the matrix is built with jnp arithmetic so a single compiled
    train step can apply a freshly sampled random crop every step — the
    TPU-native replacement for the reference's dynamic-shape
    tf.random_crop + resize (data/davis2016_data_utils.py:101-127).
    `clamp_lo`/`clamp_hi` bound edge replication to the crop window.
    """
    lo = 0.0 if clamp_lo is None else clamp_lo
    hi = in_size - 1.0 if clamp_hi is None else clamp_hi
    src = jnp.arange(out_size, dtype=jnp.float32) * scale + offset
    src = jnp.clip(src, lo, hi)
    k = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - k[None, :]))
