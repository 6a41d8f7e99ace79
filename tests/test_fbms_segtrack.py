"""FBMS59 and SegTrackV2 reader tests on synthetic dataset trees."""

import os

import cv2
import numpy as np
import pytest

from unsupervised_detection_tpu.data import FBMS59Reader, SegTrackV2Reader


def _write_jpg(path, hw=(60, 80), seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, size=(*hw, 3), dtype=np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture(scope="module")
def fbms_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fbms"))
    for part in ("Trainingset", "Testset"):
        for seq, n in (("cars1", 6), ("marple7", 5)):
            d = os.path.join(root, part, seq)
            gt = os.path.join(d, "GroundTruth")
            os.makedirs(gt, exist_ok=True)
            with open(os.path.join(d, seq + ".bmf"), "w") as fh:
                fh.write("%d 1\n" % n)
                for i in range(n):
                    fh.write("frame_%02d.pgm\n" % i)
            for i in range(n):
                _write_jpg(os.path.join(d, "frame_%02d.jpg" % i), seed=i)
            # sparse GT at frames 0, 2, 4 in pgm-number layout
            for i in (0, 2, 4):
                mask = np.zeros((60, 80), np.uint8)
                mask[20:40, 30:60] = 255
                cv2.imwrite(os.path.join(gt, "frame_%02d.pgm" % i), mask)
    return root


def test_fbms_train_dataset(fbms_root):
    reader = FBMS59Reader(fbms_root, max_temporal_len=3, min_temporal_len=2)
    ds = reader.dataset("train")
    assert sorted(ds.sequences) == ["cars1", "marple7"]
    assert ds.num_samples == 11
    ds_tv = reader.dataset("trainval")
    assert ds_tv.num_samples == 22


def test_fbms_test_tuples(fbms_root):
    reader = FBMS59Reader(fbms_root)
    tuples = reader.test_tuples("val", test_temporal_t=1)
    # 3 annotated frames per sequence, 2 sequences
    assert len(tuples) == 6
    assert reader.num_categories == 2
    assert reader.samples_per_cat == {"cars1": 3, "marple7": 3}
    for f1, f2, ann, cat, n_cat in tuples:
        assert os.path.isfile(f1) and os.path.isfile(f2)
        assert os.path.isfile(ann), ann  # binarized .jpg written
        assert ann.endswith(".jpg")
        assert n_cat == 3
    # GT preprocessing is idempotent (second run keeps files)
    tuples2 = reader.test_tuples("val", test_temporal_t=1)
    assert len(tuples2) == 6


def test_fbms_offset_clamping(fbms_root):
    reader = FBMS59Reader(fbms_root)
    tuples = reader.test_tuples("val", test_temporal_t=-2)
    # first annotated frame (number 0) cannot look back -> offset flipped fwd
    first = tuples[0]
    assert first[0] != first[1]


@pytest.fixture(scope="module")
def segtrack_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("segtrack"))
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    seqs = ["birds", "worm"]
    with open(os.path.join(root, "ImageSets/all.txt"), "w") as fh:
        for s in seqs:
            fh.write("x" + s + "\n")  # reference strips the first character
    for s in seqs:
        img_d = os.path.join(root, "JPEGImages", s)
        gt_d = os.path.join(root, "GroundTruth", s)
        os.makedirs(img_d, exist_ok=True)
        os.makedirs(gt_d, exist_ok=True)
        with open(os.path.join(root, "ImageSets", s + ".txt"), "w") as fh:
            fh.write("header\n")
            for i in range(5):
                fh.write("%05d\n" % i)
        for i in range(5):
            _write_jpg(os.path.join(img_d, "%05d.png" % i), seed=i)
            mask = np.zeros((60, 80), np.uint8)
            mask[10:30, 10:40] = 255
            cv2.imwrite(os.path.join(gt_d, "%05d.png" % i), mask)
    return root


def test_segtrack_dataset(segtrack_root):
    reader = SegTrackV2Reader(segtrack_root)
    ds = reader.dataset()
    assert ds.sequences == ["birds", "worm"]
    assert ds.num_samples == 10
    for anns in ds.annotation_files:
        for a in anns:
            assert os.path.isfile(a)


def test_segtrack_missing_file_asserts(segtrack_root, tmp_path):
    # removing an image must trip the reader's existence assert
    import shutil

    broken = str(tmp_path / "broken")
    shutil.copytree(segtrack_root, broken)
    os.remove(os.path.join(broken, "JPEGImages/birds/00002.png"))
    with pytest.raises(AssertionError):
        SegTrackV2Reader(broken).dataset()
