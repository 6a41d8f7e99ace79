"""Dense backward image warping (bilinear).

Semantics match the reference's `dense_image_warp`
(models/PWCNet/core_warp.py:42-202): output(b, y, x) = image(b, y - flow_y,
x - flow_x) with bilinear interpolation; floors are clamped to [0, size-2]
and interpolation weights to [0, 1] (edge-clamp behavior), and the lerp is
evaluated in the exact same order (x first, then y) for bit parity.

The gather-based formulation below is what XLA lowers best on TPU today for
fully dynamic per-pixel offsets: a single flattened gather of the 4 corner
taps. The flattened row-major index keeps the gather 1-D which maps onto the
TPU's vector gather path; everything around it fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_image_warp(image, flow):
    """Backward-warp `image` by `flow`.

    Args:
        image: (B, H, W, C) float array.
        flow: (B, H, W, 2) float array; channel 0 is the y displacement,
            channel 1 the x displacement (reference convention: the output at
            (y, x) samples the input at (y - flow_y, x - flow_x)).

    Returns:
        (B, H, W, C) warped image, same dtype as `image`.
    """
    b, h, w, c = image.shape
    dtype = image.dtype

    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    query_y = grid_y[None] - flow[..., 0].astype(jnp.float32)
    query_x = grid_x[None] - flow[..., 1].astype(jnp.float32)

    # TF clamps floor into [0, size-2] so floor+1 is always valid, and the
    # fractional weight into [0, 1]; this yields edge-clamped extrapolation.
    floor_y = jnp.clip(jnp.floor(query_y), 0.0, h - 2)
    floor_x = jnp.clip(jnp.floor(query_x), 0.0, w - 2)
    alpha_y = jnp.clip(query_y - floor_y, 0.0, 1.0).astype(dtype)[..., None]
    alpha_x = jnp.clip(query_x - floor_x, 0.0, 1.0).astype(dtype)[..., None]
    iy = floor_y.astype(jnp.int32)
    ix = floor_x.astype(jnp.int32)

    # One flattened take over (B*H*W) rows per tap: measured fastest of the
    # XLA gather formulations on TPU (tools/bench_warp_variants.py) — the
    # whole-array linear index avoids the batched-gather slow path.
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    flat = image.reshape(b * h * w, c)
    lin = boff + iy * w + ix

    def gather(offset):
        return jnp.take(flat, (lin + offset).reshape(-1), axis=0).reshape(b, h, w, c)

    top_left = gather(0)
    top_right = gather(1)
    bottom_left = gather(w)
    bottom_right = gather(w + 1)

    interp_top = alpha_x * (top_right - top_left) + top_left
    interp_bottom = alpha_x * (bottom_right - bottom_left) + bottom_left
    return alpha_y * (interp_bottom - interp_top) + interp_top
