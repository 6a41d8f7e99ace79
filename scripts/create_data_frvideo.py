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

subprocess.call([
    "ffmpeg", "-i", video_fname, "-r", out_fps,
    "-vf", "scale={}:{}".format(out_width, out_height),
    os.path.join(outimg_dir, "%05d.jpg"),
])

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
