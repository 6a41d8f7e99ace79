"""Dense backward image warping (bilinear).

Semantics match the reference's `dense_image_warp`
(models/PWCNet/core_warp.py:42-202): output(b, y, x) = image(b, y - flow_y,
x - flow_x) with bilinear interpolation; floors are clamped to [0, size-2]
and interpolation weights to [0, 1] (edge-clamp behavior), and the lerp is
evaluated in the exact same order (x first, then y) for bit parity.

TPU gathers are row-issue-bound (~57M rows/s on v5e regardless of row width
32..128ch and even for contiguous indices — tools/bench_warp_v3.py). Fewer
gathered rows is the only lever: the quad/dup2 variants below pre-replicate
the operand so one gathered row carries several taps (exact; taps are
bit-identical). ISOLATED they win big (PWC L2 shapes, batch 32:
26.9 -> 10.8 ms quad). IN CONTEXT the winner depends on what else competes
for HBM/copy slots: against the round-1 concat-heavy estimator, flat won
(tools/bench_pwc_warpmode.py: 149.9 ms vs 155-160); once the estimator went
concat-free, quad wins (tools/bench_split_conv.py: 131.6 ms vs 138.2 at
batch 32). `dense_image_warp(method=...)` selects the formulation; PWCNet
defaults to "quad", standalone callers to "flat".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_coords(image, flow):
    """Clamped corner indices + lerp weights (core_warp.py:94-119 semantics:
    floor clamped to [0, size-2], weights to [0, 1] => edge-clamp)."""
    b, h, w, _ = image.shape
    dtype = image.dtype
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    query_y = grid_y[None] - flow[..., 0].astype(jnp.float32)
    query_x = grid_x[None] - flow[..., 1].astype(jnp.float32)
    floor_y = jnp.clip(jnp.floor(query_y), 0.0, h - 2)
    floor_x = jnp.clip(jnp.floor(query_x), 0.0, w - 2)
    alpha_y = jnp.clip(query_y - floor_y, 0.0, 1.0).astype(dtype)[..., None]
    alpha_x = jnp.clip(query_x - floor_x, 0.0, 1.0).astype(dtype)[..., None]
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    lin = boff + floor_y.astype(jnp.int32) * w + floor_x.astype(jnp.int32)
    return lin, alpha_y, alpha_x


def _lerp(tl, tr, bl, br, ay, ax):
    # Exact TF lerp order (core_warp.py:145-150): x first, then y.
    interp_top = ax * (tr - tl) + tl
    interp_bottom = ax * (br - bl) + bl
    return ay * (interp_bottom - interp_top) + interp_top


def _warp_flat(image, flow):
    """4 gathers of C-wide rows — best for wide features (C > 64)."""
    b, h, w, c = image.shape
    lin, ay, ax = _tap_coords(image, flow)
    flat = image.reshape(b * h * w, c)

    def gather(offset):
        return jnp.take(flat, (lin + offset).reshape(-1), axis=0).reshape(b, h, w, c)

    return _lerp(gather(0), gather(1), gather(w), gather(w + 1), ay, ax)


def _warp_dup2(image, flow):
    """2 gathers of 2C rows: operand row (y, x) also carries (y+1, x).

    The duplicated last row is never read: floor_y <= h-2, so the y+1 tap
    exists in-image for every gathered row.
    """
    b, h, w, c = image.shape
    lin, ay, ax = _tap_coords(image, flow)
    nxt = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    dup = jnp.concatenate([image, nxt], axis=3)
    flat = dup.reshape(b * h * w, 2 * c)

    def gather(offset):
        return jnp.take(flat, (lin + offset).reshape(-1), axis=0).reshape(b, h, w, 2 * c)

    left = gather(0)    # [(y0,x0) | (y1,x0)]
    right = gather(1)   # [(y0,x1) | (y1,x1)]
    return _lerp(left[..., :c], right[..., :c], left[..., c:], right[..., c:], ay, ax)


def _warp_quad(image, flow):
    """1 gather of 4C rows: operand row (y, x) carries the full 2x2 patch.

    The duplicated last row/column are never read (floor clamps to size-2).
    """
    b, h, w, c = image.shape
    lin, ay, ax = _tap_coords(image, flow)
    right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
    row0 = jnp.concatenate([image, right], axis=3)
    quad = jnp.concatenate(
        [row0, jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)], axis=3
    )
    taps = jnp.take(
        quad.reshape(b * h * w, 4 * c), lin.reshape(-1), axis=0
    ).reshape(b, h, w, 4 * c)
    return _lerp(taps[..., :c], taps[..., c:2 * c],
                 taps[..., 2 * c:3 * c], taps[..., 3 * c:], ay, ax)


# Below this many output pixels per image the window kernel's per-block
# overheads lose to the quad gather (measured, tools/bench_warp_window.py:
# L4 24x40 is 0.3x, L3 48x80 is 1.0-1.7x, L2 96x160 is 1.7-2.0x).
_WINDOW_MIN_PIXELS = 48 * 80


@jax.custom_vjp
def _warp_window(image, flow):
    """Gather-free windowed Pallas kernel (ops/pallas/warp_kernel.py),
    runtime-guarded: equal to the gather formulations up to fp
    reassociation when each 8-row block's vertical source spread fits the
    32-row window (true for PWC's smooth upsampled flows). The guard
    evaluates `window_overflow_blocks` on the ACTUAL flow and lax.cond's
    to the quad gather when any block overflows, so this method is always
    tap-exact — the window branch only ever executes when it is exact.

    Static gating: shapes where the kernel measured slower than the gather
    (small levels) or where it would fall back anyway dispatch straight to
    quad (tools/bench_warp_window.py for the numbers).

    Differentiable: pallas_call has no VJP, so the custom backward
    re-derives gradients through the quad gather formulation — the same
    bilinear-tap function, so the gradients are exact for it (PWC
    pretraining differentiates through the warp; train/pretrain_pwc.py)."""
    from .pallas.warp_kernel import (_would_fallback, warp_window_pallas,
                                     window_overflow_blocks)

    b, h, w, c = image.shape
    if (h * w < _WINDOW_MIN_PIXELS
            or _would_fallback(image.shape, image.dtype.itemsize)):
        return _warp_quad(image, flow)
    # Mosaic kernels only lower on TPU; elsewhere (CPU test suite) run the
    # kernel through the Pallas interpreter so the method works everywhere.
    interpret = jax.default_backend() != "tpu"
    overflow = window_overflow_blocks(image.shape, flow)
    return jax.lax.cond(
        overflow > 0,
        lambda im, fl: _warp_quad(im, fl),
        lambda im, fl: warp_window_pallas(im, fl, interpret),
        image, flow)


def _warp_window_fwd(image, flow):
    return _warp_window(image, flow), (image, flow)


def _warp_window_bwd(res, g):
    image, flow = res
    _, vjp = jax.vjp(_warp_quad, image, flow)
    return vjp(g)


_warp_window.defvjp(_warp_window_fwd, _warp_window_bwd)


_WARP_METHODS = {"flat": _warp_flat, "dup2": _warp_dup2, "quad": _warp_quad,
                 "window": _warp_window}


def dense_image_warp(image, flow, method: str = "flat"):
    """Backward-warp `image` by `flow`.

    Semantics match the reference's dense_image_warp (core_warp.py:42-202):
    output(b, y, x) = image(b, y - flow_y, x - flow_x), bilinear, edge-clamped.

    Args:
        image: (B, H, W, C) float array.
        flow: (B, H, W, 2) float array; channel 0 is the y displacement,
            channel 1 the x displacement.
        method: gather formulation — "flat" (4 gathers of C-wide rows),
            "dup2" (2 gathers of 2C rows), or "quad" (1 gather of 4C rows).
            All three produce bit-identical taps; the fastest choice is
            context-dependent (see module docstring). "window" dispatches
            large levels to the gather-free Pallas kernel with a runtime
            exactness guard (_warp_window; same taps, fp-reassociated;
            1.2x whole-PWC at batch 64 — tools/bench_warp_window.py).

    Returns:
        (B, H, W, C) warped image, same dtype as `image`.
    """
    return _WARP_METHODS[method](image, flow)
