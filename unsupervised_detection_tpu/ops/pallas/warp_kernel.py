"""Gather-free Pallas TPU kernel for dense backward warping.

XLA lowers the bilinear warp's 4 taps as gathers, which are row-issue-bound
on TPU (~94M rows/s regardless of row width — the quad formulation in
ops/warp.py already packs all 4 taps into one gathered row and still costs
~10-18 ms for PWC L2 at batch 64). Mosaic cannot lower per-element gathers
at all, so a Pallas warp needs a gather-free formulation (SURVEY §7
hard-part 1, reference semantics models/PWCNet/core_warp.py:131-148).

This kernel uses a *windowed separable* formulation. Bilinear warping is a
per-pixel 2-tap selection along each axis; the x-axis selection is exact
over the full width, while the y-axis reads only a K-row window whose start
is the per-block min of floor(y - flow_y) (smooth flow => small spread).
Per (batch, BH-row output block):

  1. prologue (XLA, fused): floor/frac of the source coordinates,
     per-block window start = clip(min floor_y, 0, H-K) floored to a
     128-lane-aligned row multiple;
  2. DMA the window into VMEM at a dynamic offset — the image is
     pre-arranged as (B, W, H*C) so the K consecutive source rows are ONE
     contiguous lane-axis slice (W, K*C); a dynamic-slice copy, not a
     gather. Mosaic's offset-divisibility prover is syntactic (`scalar *
     literal` passes iff the literal is a multiple of the 128-lane tiling
     — tools/repro_mosaic_dynamic_dma.py pins this), so the offset is
     passed as a lane-tile index and multiplied by 128 in-kernel, and
     starts are pre-aligned so start*C is always a tile multiple;
  3. x-pass (MXU), per output row: Qt[kc, x] = sum_xs win[xs, kc] *
     WxT[xs, x], where WxT folds both horizontal taps
     ((1-ax)*[xs==x0] + ax*[xs==x0+1]) — a dot_general contracting both
     dim-0s (A^T*B, native MXU) so the matmul's M dim is K*C. The
     (W x W) @ (W, K*C) orientation (M=W: 1-2 sublane tiles) measured
     only 0.8x of the XLA gather; M=K*C keeps the systolic array fed.
  4. y-pass (VPU): out[c, x] = sum_k wy_k(x) * Qt[k*C+c, x], a K-step
     shift-enumeration where wy_k folds BOTH vertical taps:
     wy_k = (1-ay)*[ky==k] + ay*[ky==k-1].

The kernel writes (B, H, C, W); the wrapper transposes back to NHWC (one
XLA relayout, ~0.2 ms at L2 batch 64).

Exactness contract: identical to ops/warp.py up to fp reassociation
(separable tap-product instead of the reference's x-then-y lerp order)
PROVIDED every block's floor_y fits the window: within each BH-row block,
max(floor_y) - window_start <= K-2, where window_start is min(floor_y)
floored to the 128-lane-aligned row multiple (alignment consumes up to
align-1 = 128/gcd(C,128) - 1 rows of slack). Out-of-window taps clamp to
the window edge; `window_overflow_blocks` reports violations so callers
can assert the contract on their flow distribution. PWC's warp inputs are
x2-bilinear upsamplings of the previous level's flow, so their
within-block vertical variation is small by construction; checked
in-context by tests/test_pallas_warp.py and tools/bench_warp_window.py.
"""

from __future__ import annotations

import functools
import math

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


def _effective_block_h(h: int) -> int:
    """Row blocking for height h, honoring Mosaic's block constraint: the
    sublane (second-minor) dim of a block must be divisible by 8 or equal
    the full array dim. So: the largest multiple of 8 that is <= BLOCK_H
    and divides h, else the whole height (one block).

    Shared by the kernel and window_overflow_blocks so the contract check
    reasons about exactly the blocking the kernel will use."""
    bh = (min(BLOCK_H, h) // 8) * 8
    while bh >= 8:
        if h % bh == 0:
            return bh
        bh -= 8
    return h


def _lane_align_rows(c: int) -> int:
    """Window starts must land on 128-lane-aligned offsets of the (W, H*C)
    layout's minor axis; this is the row granularity that guarantees it."""
    return 128 // math.gcd(c, 128)


def _would_fallback(image_shape, itemsize: int, k: int | None = None) -> bool:
    """True when warp_window_pallas would take the XLA quad fallback:
    degenerate H/W, W not sublane-aligned (Mosaic requires the DMA
    window's W dim to be a multiple of 8), window extent K*C not
    lane-tile-divisible, window slack consumed by start alignment, or
    VMEM budget exceeded."""
    _, h, w, c = image_shape
    if h < 2 or w < 2 or w % 8 != 0:
        return True
    k = min(k or WINDOW_K, h)
    if (k * c) % 128 != 0 or _lane_align_rows(c) > max(k - 2, 0):
        return True
    return _vmem_estimate(k, _effective_block_h(h), c, w,
                          itemsize) > VMEM_BUDGET_BYTES


def _window_starts(floor_y, h: int, k: int, block_h: int, align: int = 1):
    """(B, H/BH) int32 window starts (floored to `align`-row multiples so
    the DMA offset start*C is 128-lane aligned) + per-block max floor_y
    relative to the aligned start. The window is exact for a block iff
    that relative max <= K-2 (both vertical taps of every pixel fall in
    [start, start+K))."""
    b, hh, w = floor_y.shape
    blocks = floor_y.reshape(b, hh // block_h, block_h, w)
    lo = jnp.min(blocks, axis=(2, 3))
    hi = jnp.max(blocks, axis=(2, 3))
    starts = (jnp.clip(lo, 0, max(h - k, 0)) // align) * align
    return starts, hi - starts


def window_overflow_blocks(image_shape, flow, k: int | None = None,
                           block_h: int = BLOCK_H) -> jnp.ndarray:
    """Number of (batch, row-block) cells whose floor_y spread exceeds the
    K-row window — 0 means warp_window is exact for this flow.

    Mirrors warp_window_pallas's blocking (and its quad fallback, which is
    always exact — itemsize 2 = the production bf16 path) so the count
    refers to the kernel as it would actually run on this shape."""
    h = image_shape[1]
    if _would_fallback(image_shape, 2, k):
        return jnp.zeros((), jnp.int32)
    block_h = _effective_block_h(h) if block_h == BLOCK_H \
        else min(block_h, h)
    k = min(k or WINDOW_K, h)
    floor_y, _, _, _ = _coords(image_shape, flow)
    _, spread = _window_starts(floor_y, image_shape[1], k, block_h,
                               _lane_align_rows(image_shape[3]))
    return jnp.sum(spread > k - 2)


def _kernel(starts_ref, lanes_ref, img_ref, ky_ref, ay_ref, x0_ref, ax_ref,
            out_ref, win_ref, sem, *, k: int, block_h: int, c: int, w: int):
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    cell = bi * pl.num_programs(1) + gi
    start = starts_ref[cell]

    # Source window HBM -> VMEM: rows [start, start+K) of this batch image,
    # one contiguous (W, K*C) slice of the (B, W, H*C) layout. The offset is
    # expressed as lane_tile * 128 (lanes_ref = starts*C/128, integral by
    # the start alignment) because Mosaic's divisibility prover is
    # syntactic (module docstring, step 2).
    dma = pltpu.make_async_copy(
        img_ref.at[bi, :, pl.ds(lanes_ref[cell] * 128, k * c)], win_ref, sem)
    dma.start()

    ky = jnp.clip(ky_ref[0] - start, 0, k - 2)        # (BH, W) int32
    ay = ay_ref[0].astype(jnp.float32)                 # (BH, W)
    x0 = x0_ref[0]                                     # (BH, W) int32
    ax = ax_ref[0].astype(jnp.float32)                 # (BH, W)

    xs_iota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)  # [xs, x]

    dma.wait()
    win = win_ref[:]                                   # (W, K*C)

    for y in range(block_h):
        # x-pass (MXU): both horizontal taps folded into one one-hot
        # column mix; contract the W(=xs) dims of win and WxT directly
        # (A^T*B) so the matmul runs at M=K*C.
        x0_row = x0[y][None, :]                        # (1, W)
        ax_row = ax[y][None, :]
        wxt = (jnp.where(xs_iota == x0_row, 1.0 - ax_row, 0.0)
               + jnp.where(xs_iota == x0_row + 1, ax_row, 0.0))
        qt = jax.lax.dot_general(
            win, wxt.astype(win.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (K*C, W)

        # y-pass (VPU): fold both vertical taps into one weight per window
        # row and accumulate the K resampled rows.
        ky_row = ky[y][None, :]                        # (1, W)
        ay_row = ay[y][None, :]
        acc = jnp.zeros((c, w), jnp.float32)
        for kk in range(k):
            wy = (jnp.where(ky_row == kk, 1.0 - ay_row, 0.0)
                  + jnp.where(ky_row == kk - 1, ay_row, 0.0))
            acc = acc + wy * qt[kk * c:(kk + 1) * c, :]
        out_ref[0, y] = acc.astype(out_ref.dtype)


def _vmem_estimate(k, block_h, c, w, itemsize):
    win = w * k * c * itemsize
    qt = k * c * w * 4
    wxt = w * w * 4
    aux = 4 * block_h * w * 4
    out = block_h * c * w * itemsize
    return win + qt + 2 * wxt + aux + out


@functools.partial(jax.jit, static_argnums=(2, 3))
def warp_window_pallas(image, flow, interpret: bool = False,
                       window_k: int | None = None):
    """Windowed gather-free warp; semantics of ops.warp.dense_image_warp up
    to fp reassociation, exact when window_overflow_blocks(...) == 0.

    Falls back to the XLA quad formulation when shapes don't fit the
    kernel's blocking (see _would_fallback). The row blocking adapts to H
    (largest 8-multiple divisor of H, else whole-height). `window_k`
    overrides the K-row window (default WINDOW_K; smaller = less compute,
    tighter contract)."""
    b, h, w, c = image.shape
    k = min(window_k or WINDOW_K, h)
    block_h = _effective_block_h(h)
    if _would_fallback(image.shape, image.dtype.itemsize, window_k):
        from ..warp import dense_image_warp

        return dense_image_warp(image, flow, method="quad")

    floor_y, ay, floor_x, ax = _coords(image.shape, flow)
    starts, _ = _window_starts(floor_y, h, k, block_h, _lane_align_rows(c))
    n_blocks = h // block_h

    # (B, W, H*C): K consecutive source rows = one contiguous minor slice.
    img_flat = jnp.transpose(image, (0, 2, 1, 3)).reshape(b, w, h * c)
    wdtype = image.dtype
    ay = ay.astype(jnp.float32)
    ax = ax.astype(jnp.float32)

    # Window starts are passed twice: as source rows (for the tap clip) and
    # as lane-tile indices starts*C/128 (for the DMA offset — see _kernel).
    lanes = (starts * c) // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # image stays in HBM
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s, t: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s, t: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s, t: (bi, gi, 0)),
            pl.BlockSpec((1, block_h, w), lambda bi, gi, s, t: (bi, gi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h, c, w), lambda bi, gi, s, t: (bi, gi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((w, k * c), wdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, k=k, block_h=block_h, c=c, w=w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), image.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * w * k * c,
            bytes_accessed=image.dtype.itemsize * b * h * w * c
            * (k // block_h + 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts.reshape(-1), lanes.reshape(-1), img_flat, floor_y, ay,
      floor_x, ax)
    return jnp.transpose(out, (0, 1, 3, 2))
