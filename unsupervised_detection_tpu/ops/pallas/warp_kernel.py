"""Gather-free Pallas TPU kernel for dense backward warping.

XLA lowers the bilinear warp's 4 taps as gathers, which are row-issue-bound
on TPU (~94M rows/s regardless of row width — the quad formulation in
ops/warp.py already packs all 4 taps into one gathered row and still costs
~10.5 ms for PWC L2 at batch 64). Mosaic cannot lower per-element gathers at
all, so a Pallas warp needs a gather-free formulation (SURVEY §7 hard-part 1,
reference semantics models/PWCNet/core_warp.py:131-148).

This kernel uses a *windowed separable* formulation. Bilinear warping is a
per-pixel 2-tap selection along each axis; the x-axis selection is exact
over the full width, while the y-axis reads only a K-row window whose start
is the per-block min of floor(y - flow_y) (smooth flow => small spread).
Per (batch, BH-row output block):

  1. prologue (XLA, fused): floor/frac of the source coordinates,
     per-block window start = clip(min floor_y, 0, H-K);
  2. DMA the window into VMEM at a dynamic offset — image is pre-arranged
     as (B, W, H*C) so the K consecutive source rows are ONE contiguous
     lane-axis slice (W, K*C); a dynamic-slice copy, not a gather;
  3. x-pass (MXU), per output row: Q = Wx @ win, where Wx[x, xs] folds both
     horizontal taps ((1-ax)*[xs==x0] + ax*[xs==x0+1]) — a one-hot-weighted
     (W x W) @ (W x K*C) matmul producing every window row resampled at
     this output row's x-coordinates;
  4. y-pass (VPU): out[x, c] = sum_k wy_k(x) * Q[x, k*C:(k+1)*C], a K-step
     shift-enumeration where wy_k folds BOTH vertical taps:
     wy_k = (1-ay)*[ky==k] + ay*[ky==k-1].

Exactness contract: identical to ops/warp.py up to fp reassociation
(separable tap-product instead of the reference's x-then-y lerp order)
PROVIDED every block's floor_y spread fits the window:
max(floor_y) - min(floor_y) <= K-2 within each BH-row block. Out-of-window
taps clamp to the window edge; `window_overflow_blocks` reports violations
so callers can assert the contract on their flow distribution. PWC's warp
inputs are x2-bilinear upsamplings of the previous level's flow, so their
within-block vertical variation is small by construction; checked
in-context by tests/test_pallas_warp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window rows kept in VMEM (K) and output rows per grid step (BH).
WINDOW_K = 32
BLOCK_H = 8

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _coords(image_shape, flow):
    """Clamped corner indices + lerp weights, identical clamping to
    ops/warp.py:_tap_coords (core_warp.py:94-119 semantics)."""
    _, h, w, _ = image_shape
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    query_y = grid_y[None] - flow[..., 0].astype(jnp.float32)
    query_x = grid_x[None] - flow[..., 1].astype(jnp.float32)
    floor_y = jnp.clip(jnp.floor(query_y), 0.0, h - 2)
    floor_x = jnp.clip(jnp.floor(query_x), 0.0, w - 2)
    alpha_y = jnp.clip(query_y - floor_y, 0.0, 1.0)
    alpha_x = jnp.clip(query_x - floor_x, 0.0, 1.0)
    return (floor_y.astype(jnp.int32), alpha_y,
            floor_x.astype(jnp.int32), alpha_x)


def _window_starts(floor_y, h: int, k: int, block_h: int):
    """(B, H/BH) int32 window starts + per-block floor_y spreads."""
    b, hh, w = floor_y.shape
    blocks = floor_y.reshape(b, hh // block_h, block_h, w)
    lo = jnp.min(blocks, axis=(2, 3))
    hi = jnp.max(blocks, axis=(2, 3))
    starts = jnp.clip(lo, 0, max(h - k, 0))
    return starts, hi - lo


def window_overflow_blocks(image_shape, flow, k: int = WINDOW_K,
                           block_h: int = BLOCK_H) -> jnp.ndarray:
    """Number of (batch, row-block) cells whose floor_y spread exceeds the
    K-row window — 0 means warp_window is exact for this flow."""
    block_h = min(block_h, image_shape[1])
    k = min(k, image_shape[1])
    floor_y, _, _, _ = _coords(image_shape, flow)
    _, spread = _window_starts(floor_y, image_shape[1], k, block_h)
    return jnp.sum(spread > k - 2)


def _kernel(starts_ref, img_ref, ky_ref, ay_ref, x0_ref, ax_ref, out_ref,
            win_ref, sem, *, k: int, block_h: int, c: int, w: int):
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    start = starts_ref[bi * pl.num_programs(1) + gi]

    # Source window HBM -> VMEM: rows [start, start+K) of this batch image,
    # one contiguous (W, K*C) slice of the (B, W, H*C) layout.
    dma = pltpu.make_async_copy(
        img_ref.at[bi, :, pl.ds(start * c, k * c)], win_ref, sem)
    dma.start()

    ky = jnp.clip(ky_ref[0] - start, 0, k - 2)        # (BH, W) int32
    ay = ay_ref[0].astype(jnp.float32)                 # (BH, W)
    x0 = x0_ref[0]                                     # (BH, W) int32
    ax = ax_ref[0].astype(jnp.float32)                 # (BH, W)

    xs_iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)  # [x, xs]

    dma.wait()
    win = win_ref[:]                                   # (W, K*C)

    for y in range(block_h):
        # x-pass (MXU): both horizontal taps folded into one one-hot row mix.
        x0_row = x0[y][:, None]                        # (W, 1)
        ax_row = ax[y][:, None]
        wx = (jnp.where(xs_iota == x0_row, 1.0 - ax_row, 0.0)
              + jnp.where(xs_iota == x0_row + 1, ax_row, 0.0))
        q = jnp.dot(wx.astype(win.dtype), win,
                    preferred_element_type=jnp.float32)  # (W, K*C)

        # y-pass (VPU): fold both vertical taps into one weight per window
        # row and accumulate the K resampled rows.
        ky_row = ky[y][:, None]                        # (W, 1)
        ay_row = ay[y][:, None]
        acc = jnp.zeros((w, c), jnp.float32)
        for kk in range(k):
            wy = (jnp.where(ky_row == kk, 1.0 - ay_row, 0.0)
                  + jnp.where(ky_row == kk - 1, ay_row, 0.0))
            acc = acc + wy * q[:, kk * c:(kk + 1) * c]
        out_ref[0, y] = acc.astype(out_ref.dtype)


def _vmem_estimate(k, block_h, c, w, itemsize):
    win = w * k * c * itemsize
    q = w * k * c * 4
    wx = w * w * 4
    aux = 4 * block_h * w * 4
    out = block_h * w * c * itemsize
    return win + q + 2 * wx + aux + out


@functools.partial(jax.jit, static_argnums=(2,))
def warp_window_pallas(image, flow, interpret: bool = False):
    """Windowed gather-free warp; semantics of ops.warp.dense_image_warp up
    to fp reassociation, exact when window_overflow_blocks(...) == 0.

    Falls back to the XLA quad formulation when shapes don't fit the
    kernel's blocking (H not divisible by BLOCK_H after window shrink, or
    VMEM budget exceeded)."""
    b, h, w, c = image.shape
    k = min(WINDOW_K, h)
    block_h = min(BLOCK_H, h)
    if (h % block_h != 0 or w < 2 or h < 2
            or _vmem_estimate(k, block_h, c, w, image.dtype.itemsize)
            > VMEM_BUDGET_BYTES):
        from ..warp import dense_image_warp

        return dense_image_warp(image, flow, method="quad")

    floor_y, ay, floor_x, ax = _coords(image.shape, flow)
    starts, _ = _window_starts(floor_y, h, k, block_h)
    n_blocks = h // block_h

    # (B, W, H*C): K consecutive source rows = one contiguous minor slice.
    img_flat = jnp.transpose(image, (0, 2, 1, 3)).reshape(b, w, h * c)
    wdtype = image.dtype
    ay = ay.astype(jnp.float32)
    ax = ax.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # image stays in HBM
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s: (bi, gi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, w, c), lambda bi, gi, s: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((w, k * c), wdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, k=k, block_h=block_h, c=c, w=w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), image.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * w * k * c,
            bytes_accessed=image.dtype.itemsize * b * h * w * c
            * (k // block_h + 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts.reshape(-1), img_flat, floor_y, ay, floor_x, ax)
    return out
