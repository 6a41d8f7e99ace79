"""DeviceFeeder (data/device_input.py) and the profiling utilities
(utils/profiling.py) — direct unit coverage; both are otherwise exercised
only through the train/eval integration paths."""

import numpy as np

import jax.numpy as jnp

from unsupervised_detection_tpu.data.device_input import DeviceFeeder
from unsupervised_detection_tpu.parallel.mesh import make_mesh
from unsupervised_detection_tpu.utils.profiling import StepTimer, sync


def test_device_feeder_raw_mode():
    """uint8 raw batches are cast to [-0.5, 0.5] and resized to the reader
    resolution on device (reference preprocess_image,
    davis2016_data_utils.py:86-95); masks resize NEAREST in [0, 1]."""
    mesh = make_mesh()
    feeder = DeviceFeeder(mesh, (16, 24))
    rs = np.random.RandomState(0)
    batch = {
        "img1_raw": rs.randint(0, 256, (8, 32, 48, 3), np.uint8),
        "img2_raw": rs.randint(0, 256, (8, 32, 48, 3), np.uint8),
        "gt_raw": (rs.rand(8, 32, 48, 1) > 0.5).astype(np.uint8) * 255,
    }
    img1, img2 = feeder.images(batch)
    assert img1.shape == img2.shape == (8, 16, 24, 3)
    eps = 1e-5  # bilinear-resize ulp slop around the exact [-0.5, 0.5]
    assert float(jnp.min(img1)) >= -0.5 - eps
    assert float(jnp.max(img1)) <= 0.5 + eps

    mask = feeder.mask(batch)
    assert mask.shape == (8, 16, 24, 1)
    # NEAREST on a binary mask stays exactly binary.
    vals = np.unique(np.asarray(mask))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_device_feeder_host_mode_passthrough():
    mesh = make_mesh()
    feeder = DeviceFeeder(mesh, (16, 24))
    batch = {
        "img1": np.zeros((8, 16, 24, 3), np.float32),
        "img2": np.ones((8, 16, 24, 3), np.float32) * 0.25,
        "gt": np.zeros((8, 16, 24, 1), np.float32),
    }
    img1, img2 = feeder.images(batch)
    np.testing.assert_allclose(np.asarray(img2), 0.25)
    assert feeder.mask(batch).shape == (8, 16, 24, 1)
    sync((img1, img2))  # tunnel-safe completion helper accepts pytrees


def test_step_timer_reports_throughput():
    t = StepTimer(batch_size=4, window=3)
    assert t.frames_per_second != t.frames_per_second  # NaN before 2 ticks
    import time

    t.tick()
    time.sleep(0.01)
    t.tick()
    assert t.seconds_per_step > 0
    assert t.frames_per_second > 0
    for _ in range(5):  # window caps retained samples
        t.tick()
    assert len(t._times) == 3
