"""Visualization parity ports (reference general_utils.py:5-87)."""

import numpy as np

from unsupervised_detection_tpu.utils.visualization import (
    generate_error_map,
    postprocess_flow,
    postprocess_image,
    postprocess_mask,
)


def test_postprocess_flow_positive_flow():
    # For non-negative flows the reference's quirky double-divide maps the
    # channel into [0, 255/max_rescaled] — monotone in the flow value.
    flow = np.zeros((8, 10, 2), np.float32)
    flow[..., 0] = np.linspace(0.0, 4.0, 10)[None, :]
    out = postprocess_flow(flow)
    assert out.shape == (8, 10, 3) and out.dtype == np.uint8
    col = out[0, :, 0].astype(np.int32)
    assert (np.diff(col) >= 0).all() and col[-1] > col[0]
    # BGR gray: all channels equal
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()


def test_postprocess_flow_negative_wraps_like_reference():
    # Reference bug kept verbatim: min is ADDED, so negative flows push the
    # normalized value past 1 and the uint8 cast wraps. Pin that it does
    # not raise and returns uint8 (the wrap itself is platform-stable).
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = np.linspace(-2.0, 1.0, 16).reshape(4, 4)
    out = postprocess_flow(flow)
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8


def test_postprocess_image_and_mask():
    img = np.full((4, 6, 3), 0.5, np.float32) - np.asarray([1.0, 0.5, 0.0])
    out = postprocess_image(img)
    # RGB -> BGR swap: channel 2 held the red value
    assert out.dtype == np.uint8
    assert (out[..., 2] == 0).all() and (out[..., 0] == 255).all()

    mask = np.full((4, 6, 1), 0.5, np.float32)
    m = postprocess_mask(mask)
    assert m.shape == (4, 6, 3)
    assert (m[..., 1] == 127).all() and (m[..., 0] == 0).all() and (m[..., 2] == 0).all()


def test_generate_error_map_overlay():
    rng = np.random.RandomState(0)
    image = rng.rand(32, 48, 3).astype(np.float32) - 0.5
    losses = list(range((32 // 8) * (48 // 8)))
    out = generate_error_map(image, losses, box_length=8)
    assert out.shape == (32, 48, 3) and out.dtype == np.uint8
    # the max-loss box (bottom-right) differs from the min-loss box overlay
    assert not np.array_equal(out[:8, :8], out[-8:, -8:])
