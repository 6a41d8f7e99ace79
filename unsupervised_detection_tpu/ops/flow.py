"""Flow preprocessing and Middlebury flow colorization, fully on device.

`standardize_flow` reproduces the reference's per-image zero-mean /
unit-variance normalization of the generator's flow input
(models/utils/flow_utils.py:5-12). `flow_to_image` reproduces the Middlebury
color-wheel visualization (flow_utils.py:14-100) — but as pure JAX instead of
a CPU-pinned tf.py_func, so TensorBoard image summaries never leave the
device.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def standardize_flow(flow, epsilon: float = 0.0):
    """Per-image zero-mean unit-variance flow over the spatial axes.

    Args:
        flow: (B, H, W, 2).
    Returns:
        (B, H, W, 2) standardized flow (per image, per channel — matching
        tf.nn.moments over axes [1, 2]).
    """
    mean = jnp.mean(flow, axis=(1, 2), keepdims=True)
    var = jnp.var(flow, axis=(1, 2), keepdims=True)
    return (flow - mean) / jnp.sqrt(var + epsilon)


@functools.lru_cache(maxsize=1)
def _color_wheel_np():
    """55x3 Middlebury color wheel (flow_utils.py:14-42), host array.
    (Only the numpy array is cached: caching a jnp array would leak tracers
    across jit traces.)"""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel.astype(np.float32)


def _color_wheel():
    return jnp.asarray(_color_wheel_np())


def flow_to_image(flow):
    """Colorize a batch of flows with the Middlebury wheel.

    Matches the reference numpy pipeline (flow_utils.py:46-100): the
    radius normalizer is the max over the *whole batch*, colors are
    interpolated on the wheel, saturated radii are dimmed by 0.75.

    Args:
        flow: (B, H, W, 2) float flow.
    Returns:
        (B, H, W, 3) float image in [0, 255] (uint8-quantized values).
    """
    wheel = _color_wheel()
    ncols = wheel.shape[0]

    u = flow[..., 0]
    v = flow[..., 1]
    known = (jnp.abs(u) <= 1e7) & (jnp.abs(v) <= 1e7)
    u = jnp.where(known, u, 0.0)
    v = jnp.where(known, v, 0.0)

    rad = jnp.sqrt(u * u + v * v)
    maxrad = jnp.max(rad)  # batch-global normalizer, as in the reference
    eps = jnp.asarray(np.finfo(np.float64).eps, dtype=flow.dtype)
    u = u / (maxrad + eps)
    v = v / (maxrad + eps)

    rad = jnp.sqrt(u * u + v * v)
    angle = jnp.arctan2(-v, -u) / jnp.pi
    fk = (angle + 1.0) / 2.0 * (ncols - 1) + 1.0
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = jnp.where(k0 + 1 == ncols + 1, 1, k0 + 1)
    f = (fk - k0)[..., None]

    col0 = jnp.take(wheel, k0 - 1, axis=0) / 255.0
    col1 = jnp.take(wheel, k1 - 1, axis=0) / 255.0
    col = (1.0 - f) * col0 + f * col1

    in_range = (rad <= 1.0)[..., None]
    col = jnp.where(in_range, 1.0 - rad[..., None] * (1.0 - col), col * 0.75)
    return jnp.floor(255.0 * col)


def flow_to_image_summary(flow):
    """Colorized flow rescaled to [-0.5, 0.5] for image summaries
    (flow_utils.py:102-109)."""
    return flow_to_image(flow) / 255.0 - 0.5
