#!/usr/bin/env python3
"""Turn an arbitrary video into a DAVIS2016-layout dataset.

Capability parity with the reference's scripts/create_data_frvideo.py:
frames extracted at 24 fps to 853x480 JPEG, a fake all-black annotation
PNG, and a synthesized ImageSets/480p/val.txt so the DAVIS reader can
consume the video. Extensions over the reference: an OpenCV fallback when
ffmpeg is absent, tunable fps/size/output root, and the val.txt image
directory follows the actual video name (the reference hardcodes its demo
video's name there, breaking ingestion of any other file).

Usage: create_data_frvideo.py [video] [--out_root DIR] [--fps N]
                              [--width W] [--height H]
"""

import argparse
import math
import os
import subprocess

from PIL import Image

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
DEFAULT_VIDEO = os.path.join(SCRIPT_DIR, "../download/video/todaiura_traffic.MOV")
DEFAULT_ROOT = os.path.join(SCRIPT_DIR, "../download/video")


def extract_with_ffmpeg(video, out_dir, fps, width, height):
    return subprocess.call([
        "ffmpeg", "-i", video, "-r", str(fps),
        "-vf", "scale={}:{}".format(width, height),
        os.path.join(out_dir, "%05d.jpg"),
    ])


def extract_with_cv2(video, out_dir, fps, width, height):
    """Fallback when ffmpeg is not installed: decode with OpenCV and
    resample to the target fps."""
    import cv2

    # drop any partial ffmpeg output so the sequence stays consistent
    for stale in os.listdir(out_dir):
        if stale.endswith(".jpg"):
            os.remove(os.path.join(out_dir, stale))

    cap = cv2.VideoCapture(video)
    if not cap.isOpened():
        raise IOError("Cannot open video {}".format(video))
    src_fps = cap.get(cv2.CAP_PROP_FPS)
    if not src_fps or not math.isfinite(src_fps):
        src_fps = float(fps)
    step = src_fps / float(fps)
    emitted = 0
    next_src = 0.0
    src_idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if src_idx >= next_src:
            frame = cv2.resize(frame, (width, height),
                               interpolation=cv2.INTER_LINEAR)
            emitted += 1
            cv2.imwrite(os.path.join(out_dir, "%05d.jpg" % emitted), frame)
            next_src += step
        src_idx += 1
    cap.release()
    if emitted == 0:
        raise IOError("No frames decoded from {}".format(video))


def build_davis_tree(video, root, fps, width, height):
    """Extract frames and synthesize the DAVIS-layout metadata files."""
    seq = os.path.splitext(os.path.basename(video))[0]
    img_dir = os.path.join(root, "JPEGImages/480p", seq)
    os.makedirs(img_dir, exist_ok=True)

    try:
        ret = extract_with_ffmpeg(video, img_dir, fps, width, height)
    except FileNotFoundError:
        ret = -1
    if ret != 0:
        print("[INFO] ffmpeg unavailable or failed; extracting with OpenCV")
        extract_with_cv2(video, img_dir, fps, width, height)

    # Fake all-black annotation so the reader's GT path resolves.
    annot_dir = os.path.join(root, "Annotations/480p")
    os.makedirs(annot_dir, exist_ok=True)
    Image.new("RGB", (width, height), (0, 0, 0)).save(
        os.path.join(annot_dir, "00000.png"))

    # One val.txt line per frame: <image> <fake annotation>.
    sets_dir = os.path.join(root, "ImageSets/480p")
    os.makedirs(sets_dir, exist_ok=True)
    with open(os.path.join(sets_dir, "val.txt"), "w") as fh:
        for fname in sorted(os.listdir(img_dir)):
            fh.write("/JPEGImages/480p/{}/{} /Annotations/480p/00000.png\n"
                     .format(seq, fname))
    return img_dir


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("video", nargs="?", default=DEFAULT_VIDEO)
    ap.add_argument("--out_root", default=DEFAULT_ROOT,
                    help="dataset root receiving the DAVIS-layout tree")
    ap.add_argument("--fps", type=int, default=24,
                    help="output frame rate (DAVIS 2016 is 24)")
    ap.add_argument("--width", type=int, default=853)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()
    img_dir = build_davis_tree(args.video, args.out_root, args.fps,
                               args.width, args.height)
    print("frames + DAVIS metadata written under {}".format(args.out_root))
    print("images: {}".format(img_dir))


if __name__ == "__main__":
    main()
