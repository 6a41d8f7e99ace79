"""Data reader + pipeline tests on a synthetic DAVIS-layout dataset."""

import numpy as np
import pytest

from unsupervised_detection_tpu.data import Davis2016Reader, TestPipeline, TrainPipeline
from unsupervised_detection_tpu.data.base import train_pair_index
from unsupervised_detection_tpu.data.base import test_pair_index as make_test_pair_index

from synthetic import make_moving_square_davis


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    return make_moving_square_davis(str(root), frames=8)


def test_reader_parses_sequences(davis_root):
    ds = Davis2016Reader(davis_root, max_temporal_len=2, min_temporal_len=1).dataset("trainval")
    assert ds.sequences == ["seq_a", "seq_b"]
    assert [len(f) for f in ds.image_files] == [8, 8]
    assert ds.num_samples == 16


def test_train_pair_index(davis_root):
    ds = Davis2016Reader(davis_root).dataset("train")
    idx = train_pair_index(ds, max_temporal_len=2)
    # one sequence of 8: firsts [0..5] dir +1, lasts [2..7] dir -1
    assert len(idx) == 12
    firsts = idx.numbers[idx.directions == 1]
    lasts = idx.numbers[idx.directions == -1]
    np.testing.assert_array_equal(np.sort(firsts), np.arange(0, 6))
    np.testing.assert_array_equal(np.sort(lasts), np.arange(2, 8))


@pytest.mark.parametrize("t_len", [1, 2, -1])
def test_test_pair_index_covers_each_frame_once(davis_root, t_len):
    ds = Davis2016Reader(davis_root).dataset("trainval")
    idx = make_test_pair_index(ds, t_len)
    assert len(idx) == 16
    np.testing.assert_array_equal(np.sort(idx.numbers), np.arange(16))
    # pairs stay within sequence bounds
    partner = idx.numbers + abs(t_len) * idx.directions
    seq_of = idx.numbers // 8
    assert ((partner // 8) == seq_of).all()
    assert (partner >= 0).all() and (partner < 16).all()


def test_train_pipeline_batches(davis_root):
    ds = Davis2016Reader(davis_root).dataset("train")
    pipe = TrainPipeline(ds, batch_size=4, min_temporal_len=1, max_temporal_len=2,
                         raw_hw=(96, 160), num_threads=2)
    it = iter(pipe)
    for _ in range(3):
        batch = next(it)
        assert batch["img1_raw"].shape == (4, 96, 160, 3)
        assert batch["img1_raw"].dtype == np.uint8


def test_test_pipeline_wraps_and_labels(davis_root):
    ds = Davis2016Reader(davis_root).dataset("trainval")
    pipe = TestPipeline(ds, batch_size=5, t_len=1, raw_hw=(96, 160), num_threads=1)
    assert pipe.num_samples == 16
    assert pipe.num_steps == 4
    seen = []
    for batch in pipe:
        assert batch["img1_raw"].shape == (5, 96, 160, 3)
        assert batch["gt_raw"].shape == (5, 96, 160, 1)
        seen.extend(batch["category"])
    assert len(seen) == 20  # wrap-around fills the last batch
    assert set(seen) == {"seq_a", "seq_b"}


def test_host_mode_resizes(davis_root):
    ds = Davis2016Reader(davis_root).dataset("trainval")
    pipe = TestPipeline(ds, batch_size=2, t_len=1, reader_hw=(48, 80), num_threads=1)
    batch = next(iter(pipe))
    assert batch["img1"].shape == (2, 48, 80, 3)
    assert batch["img1"].dtype == np.float32
    assert batch["img1"].min() >= -0.5 and batch["img1"].max() <= 0.5
    assert batch["gt"].shape == (2, 48, 80, 1)
    assert set(np.unique(batch["gt"])).issubset({0.0, 1.0})
