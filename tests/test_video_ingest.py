"""Video ingestion (scripts/create_data_frvideo.py): arbitrary video ->
DAVIS2016-layout tree the reader can consume (reference C24,
scripts/create_data_frvideo.py upstream)."""

import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "scripts", "create_data_frvideo.py")


def _write_clip(path, frames=8, wh=(64, 48), fps=12):
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, wh)
    assert w.isOpened()
    for i in range(frames):
        w.write(np.random.RandomState(i).randint(
            0, 255, (wh[1], wh[0], 3), np.uint8))
    w.release()


def test_ingest_builds_davis_tree(tmp_path):
    clip = str(tmp_path / "clip.avi")
    root = str(tmp_path / "root")
    _write_clip(clip)
    r = subprocess.run(
        [sys.executable, SCRIPT, clip, "--out_root", root,
         "--fps", "12", "--width", "64", "--height", "48"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]

    imgs = sorted(os.listdir(os.path.join(root, "JPEGImages/480p/clip")))
    val = open(os.path.join(root, "ImageSets/480p/val.txt")).read().splitlines()
    assert len(imgs) == len(val) >= 7
    # Each val line: <image path> <shared fake annotation> — the layout the
    # DAVIS reader parses; the image dir must carry the VIDEO's name (the
    # upstream script hardcodes its demo video name here).
    assert val[0] == "/JPEGImages/480p/clip/{} /Annotations/480p/00000.png".format(imgs[0])
    assert os.path.exists(os.path.join(root, "Annotations/480p/00000.png"))

    # And the DAVIS reader consumes the tree.
    from unsupervised_detection_tpu.data.davis import Davis2016Reader

    ds = Davis2016Reader(root).dataset("val")
    assert ds.sequences == ["clip"]
    assert ds.num_samples == len(imgs)
    assert all(os.path.exists(p) for p in ds.flat_images())
