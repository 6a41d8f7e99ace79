"""Cost-volume correlation between two feature maps.

Semantics match the reference (models/PWCNet/core_costvol.py:20-40): for each
displacement (dy, dx) in a (2r+1)^2 window the per-pixel cost is the
channel-mean dot product between `c1` and the shifted `warp`, scanned in
row-major displacement order and passed through LeakyReLU(0.1).

Two implementations:
  * `cost_volume`        — pure-XLA: one padded tensor, 81 static slices,
                           fused multiply-reduce. XLA keeps this entirely in
                           registers/VMEM per tile; already decent.
  * `cost_volume_pallas` — fused Pallas kernel that reads `warp` once per
                           output tile instead of 81 times; the main
                           bandwidth lever (see ops/pallas/cost_volume_kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_volume(c1, warp, search_range: int = 4, use_pallas: bool = False,
                offset_sharding=None):
    """Correlation volume.

    Args:
        c1: (B, H, W, C) features of image 1.
        warp: (B, H, W, C) warped features of image 2.
        search_range: max displacement r; output has (2r+1)^2 channels.
        use_pallas: dispatch to the fused Pallas TPU kernel.
        offset_sharding: optional NamedSharding for the pre-transpose
            [B, n_shifts, H, W] volume, with the offset axis (dim 1)
            sharded along the mesh's "model" axis. This makes the
            (2r+1)^2 shift/reduce computation tensor-parallel: each
            model-axis device computes its shift subset (inputs are
            batch-sharded/replicated along "model", so no communication
            is needed to produce a shard) and XLA inserts the ICI
            all-gather where the estimator consumes all channels.
            (2r+1)^2 is always odd, and with_sharding_constraint requires
            divisibility, so the stack is padded with zero shift maps to
            the next model-axis multiple and the padding is sliced off
            after the transpose. The batch dim is left unconstrained —
            its sharding propagates from the inputs (constraining it
            would reject unsharded batch-1 init traces).

    Returns:
        (B, H, W, (2r+1)^2) cost volume after LeakyReLU(0.1).
    """
    if use_pallas:
        from .pallas.cost_volume_kernel import cost_volume_pallas

        return cost_volume_pallas(c1, warp, search_range)
    return _cost_volume_xla(c1, warp, search_range, offset_sharding)


def _cost_volume_xla(c1, warp, search_range: int, offset_sharding=None):
    # The 81 per-shift maps are stacked on a MAJOR axis ([B, 81, H, W]) and
    # transposed to channels-last once at the end: stacking on the channel
    # (lane) axis makes every [B,H,W,1] stack operand acquire 128x lane
    # padding through TPU layout (seen as 238 MB copies in the batch-64 OOM
    # dump); the major-axis stack keeps W in the lanes. LeakyReLU is applied
    # pre-transpose so the transpose is the last op (tools/bench_costvol_v2.py).
    r = search_range
    b, h, w, c = c1.shape
    padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
    costs = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = jax.lax.slice(
                padded, (0, dy, dx, 0), (b, dy + h, dx + w, c)
            )
            costs.append(jnp.sum(c1 * shifted, axis=3) * inv_c)
    n_shifts = len(costs)
    if offset_sharding is not None:
        axis = offset_sharding.spec[1]
        names = (axis,) if isinstance(axis, str) else tuple(axis or ())
        m = 1
        for name in names:
            m *= offset_sharding.mesh.shape[name]
        costs.extend([jnp.zeros_like(costs[0])] * ((-n_shifts) % m))
    vol = jax.nn.leaky_relu(jnp.stack(costs, axis=1), negative_slope=0.1)
    if offset_sharding is not None:
        vol = jax.lax.with_sharding_constraint(vol, offset_sharding)
    return vol.transpose(0, 2, 3, 1)[..., :n_shifts]
