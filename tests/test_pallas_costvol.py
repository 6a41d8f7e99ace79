"""The fused Pallas cost-volume kernel (ops/pallas/cost_volume_kernel.py)
matches the XLA formulation — run through the Pallas interpreter so the
kernel's semantics are covered on the CPU suite (real-TPU lowering is
exercised by the --use_pallas bench path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from unsupervised_detection_tpu.ops.cost_volume import cost_volume
from unsupervised_detection_tpu.ops.pallas.cost_volume_kernel import (
    VMEM_BUDGET_BYTES, _vmem_estimate, cost_volume_pallas)


@pytest.mark.parametrize("r", [2, 4])
def test_interpret_matches_xla(r):
    rs = np.random.RandomState(0)
    c1 = jnp.asarray(rs.randn(2, 12, 16, 8).astype(np.float32))
    warp = jnp.asarray(rs.randn(2, 12, 16, 8).astype(np.float32))
    got = cost_volume_pallas(c1, warp, r, True)
    want = cost_volume(c1, warp, search_range=r, use_pallas=False)
    assert got.shape == want.shape == (2, 12, 16, (2 * r + 1) ** 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vmem_guard_falls_back():
    """Shapes whose padded level exceeds the VMEM budget dispatch to the XLA
    path (same outputs either way; this pins the guard itself)."""
    h = w = 256
    c = 64
    assert _vmem_estimate(h, w, c, 4, 4) > VMEM_BUDGET_BYTES
    rs = np.random.RandomState(1)
    c1 = jnp.asarray(rs.randn(1, h, w, c).astype(np.float32))
    warp = jnp.asarray(rs.randn(1, h, w, c).astype(np.float32))
    got = cost_volume_pallas(c1, warp, 4, True)  # falls back before pallas_call
    want = cost_volume(c1, warp, search_range=4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
