"""Synthetic dataset fixtures: moving-square videos in DAVIS2016 layout.

Used by data-reader, training-loop, and eval tests. The optimal mask for
these clips is known (the square), so end-to-end IoU is checkable.
"""

import os

import cv2
import numpy as np


def make_moving_square_davis(root, sequences=("seq_a", "seq_b"), frames=8,
                             hw=(96, 160), square=24, seed=0):
    """Create a miniature DAVIS2016 tree with JPEG frames + PNG annotations."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "ImageSets/480p"), exist_ok=True)
    lines = {"train": [], "val": [], "trainval": []}
    h, w = hw
    for si, seq in enumerate(sequences):
        img_dir = os.path.join(root, "JPEGImages/480p", seq)
        ann_dir = os.path.join(root, "Annotations/480p", seq)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        # textured background + moving square
        bg = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        bg = cv2.GaussianBlur(bg, (7, 7), 2)
        x0, y0 = 10 + 5 * si, 20
        vx, vy = 4, 2
        for f in range(frames):
            img = bg.copy()
            x = x0 + vx * f
            y = y0 + vy * f
            img[y : y + square, x : x + square] = (255, 40, 40)
            mask = np.zeros((h, w), np.uint8)
            mask[y : y + square, x : x + square] = 255
            img_path = os.path.join(img_dir, "%05d.jpg" % f)
            ann_path = os.path.join(ann_dir, "%05d.png" % f)
            cv2.imwrite(img_path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.imwrite(ann_path, mask)
            line = "/JPEGImages/480p/{s}/{f:05d}.jpg /Annotations/480p/{s}/{f:05d}.png".format(
                s=seq, f=f
            )
            part = "train" if si == 0 else "val"
            lines[part].append(line)
            lines["trainval"].append(line)
    for part, ls in lines.items():
        with open(os.path.join(root, "ImageSets/480p", part + ".txt"), "w") as fh:
            fh.write("\n".join(ls) + "\n")
    return root
