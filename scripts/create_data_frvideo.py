#!/usr/bin/env python3
"""Turn an arbitrary video into a DAVIS2016-layout dataset.

Reference scripts/create_data_frvideo.py: ffmpeg extraction at 24 fps to
853x480 JPEG frames, a fake all-black annotation PNG, and a synthesized
ImageSets/480p/val.txt so the DAVIS reader can consume the video.
"""

import os
import subprocess
import sys

from PIL import Image

script_dir = os.path.dirname(os.path.abspath(__file__))
default_video_fname = os.path.join(script_dir, "../download/video/todaiura_traffic.MOV")
video_fname = sys.argv[1] if len(sys.argv) > 1 else default_video_fname

out_fps = "24"  # same as DAVIS 2016
out_width = 853
out_height = 480
dataset_root = os.path.join(script_dir, "../download/video")
img_rootdir = os.path.join(dataset_root, "JPEGImages/480p")

video_rootname, _ = os.path.splitext(os.path.basename(video_fname))
outimg_dir = os.path.join(img_rootdir, video_rootname)
os.makedirs(outimg_dir, exist_ok=True)

def _extract_with_ffmpeg():
    return subprocess.call([
        "ffmpeg", "-i", video_fname, "-r", out_fps,
        "-vf", "scale={}:{}".format(out_width, out_height),
        os.path.join(outimg_dir, "%05d.jpg"),
    ])


def _extract_with_cv2():
    """Fallback when ffmpeg is not installed: decode with OpenCV and
    resample to out_fps."""
    import math

    import cv2

    # drop any partial ffmpeg output so the sequence stays consistent
    for stale in os.listdir(outimg_dir):
        if stale.endswith(".jpg"):
            os.remove(os.path.join(outimg_dir, stale))

    cap = cv2.VideoCapture(video_fname)
    if not cap.isOpened():
        raise IOError("Cannot open video {}".format(video_fname))
    src_fps = cap.get(cv2.CAP_PROP_FPS)
    if not src_fps or not math.isfinite(src_fps):
        src_fps = float(out_fps)
    step = src_fps / float(out_fps)
    emitted = 0
    next_src = 0.0
    src_idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if src_idx >= next_src:
            frame = cv2.resize(frame, (out_width, out_height),
                               interpolation=cv2.INTER_LINEAR)
            emitted += 1
            cv2.imwrite(os.path.join(outimg_dir, "%05d.jpg" % emitted), frame)
            next_src += step
        src_idx += 1
    cap.release()
    if emitted == 0:
        raise IOError("No frames decoded from {}".format(video_fname))


try:
    ret = _extract_with_ffmpeg()
except FileNotFoundError:
    ret = -1
if ret != 0:
    print("[INFO] ffmpeg unavailable or failed; extracting with OpenCV")
    _extract_with_cv2()

# Fake all-black annotation so the reader's GT path resolves.
annot_dir = os.path.join(dataset_root, "Annotations/480p")
os.makedirs(annot_dir, exist_ok=True)
Image.new("RGB", (out_width, out_height), (0, 0, 0)).save(
    os.path.join(annot_dir, "00000.png")
)

imglist_dir = os.path.join(dataset_root, "ImageSets/480p")
os.makedirs(imglist_dir, exist_ok=True)
relative_img_dir = "/JPEGImages/480p/" + video_rootname
relative_annot = "/Annotations/480p/00000.png"

with open(os.path.join(imglist_dir, "val.txt"), "w") as fh:
    for fname in sorted(os.listdir(outimg_dir)):
        fh.write(relative_img_dir + "/" + fname + " " + relative_annot + "\n")
