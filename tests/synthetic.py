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


def _moving_square_frames(hw, frames, square, seed, origin=(20, 10)):
    """(frames x HWC uint8 images, frames x HW uint8 masks) of a moving square."""
    rng = np.random.RandomState(seed)
    h, w = hw
    bg = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
    bg = cv2.GaussianBlur(bg, (7, 7), 2)
    y0, x0 = origin
    imgs, masks = [], []
    for f in range(frames):
        img = bg.copy()
        y = min(y0 + 2 * f, h - square)
        x = min(x0 + 3 * f, w - square)
        img[y : y + square, x : x + square] = (255, 40, 40)
        mask = np.zeros((h, w), np.uint8)
        mask[y : y + square, x : x + square] = 255
        imgs.append(img)
        masks.append(mask)
    return imgs, masks


def make_fbms_tree(root, seqs=(("cars1", (60, 80), 6), ("marple7", (48, 96), 5)),
                   annotated=(0, 2, 4), seed=0):
    """Miniature FBMS59 tree (.bmf index, sparse pgm GT, per-sequence frame
    sizes — exercises the host-resize feed mode and the per-sequence GT
    thresholds incl. marple7's 0.05, fbms_data_utils.py:109-125)."""
    for part in ("Trainingset", "Testset"):
        for si, (seq, hw, n) in enumerate(seqs):
            d = os.path.join(root, part, seq)
            gt_dir = os.path.join(d, "GroundTruth")
            os.makedirs(gt_dir, exist_ok=True)
            with open(os.path.join(d, seq + ".bmf"), "w") as fh:
                fh.write("%d 1\n" % n)
                for i in range(n):
                    fh.write("frame_%02d.pgm\n" % i)
            imgs, masks = _moving_square_frames(hw, n, square=16,
                                                seed=seed + si, origin=(8, 8))
            for i in range(n):
                cv2.imwrite(os.path.join(d, "frame_%02d.jpg" % i),
                            cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR))
            for i in annotated:
                if i < n:
                    cv2.imwrite(os.path.join(gt_dir, "frame_%02d.pgm" % i), masks[i])
    return root


def make_segtrack_tree(root, seqs=(("birds", (60, 80), 5), ("worm", (52, 72), 5)),
                       seed=0):
    """Miniature SegTrackV2 tree (ImageSets/all.txt + per-sequence lists,
    PNG frames + dense GT, per-sequence frame sizes)."""
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    with open(os.path.join(root, "ImageSets/all.txt"), "w") as fh:
        for seq, _, _ in seqs:
            fh.write("x" + seq + "\n")  # reference strips the first character
    for si, (seq, hw, n) in enumerate(seqs):
        img_d = os.path.join(root, "JPEGImages", seq)
        gt_d = os.path.join(root, "GroundTruth", seq)
        os.makedirs(img_d, exist_ok=True)
        os.makedirs(gt_d, exist_ok=True)
        with open(os.path.join(root, "ImageSets", seq + ".txt"), "w") as fh:
            fh.write("header\n")
            for i in range(n):
                fh.write("%05d\n" % i)
        imgs, masks = _moving_square_frames(hw, n, square=16,
                                            seed=seed + 7 * si, origin=(10, 10))
        for i in range(n):
            cv2.imwrite(os.path.join(img_d, "%05d.png" % i),
                        cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(gt_d, "%05d.png" % i), masks[i])
    return root
