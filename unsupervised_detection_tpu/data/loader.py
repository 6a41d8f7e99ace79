"""Host-side data loading: decode threads + prefetch queues.

Replaces the reference's tf.data pipelines (davis2016_data_utils.py:180-291)
with a plain thread-pooled decoder. Design rule: the host ONLY decodes
compressed frames; every pixel transformation (normalization, resize to the
640x384 reader resolution, augmentation, cropping) runs on device inside the
jitted steps (ops/augment.py, train/learner.py) — the TPU-native equivalent
of the reference's num_threads=6 CPU map pipeline.

Two feed modes:
  * raw mode (datasets with a uniform raw frame size, e.g. DAVIS 854x480):
    batches are uint8 at raw size; the device casts/resizes — fastest path;
  * host mode (FBMS/SegTrack with per-sequence sizes): frames are resized on
    host to reader size with the same TF-parity bilinear weights the device
    uses (ops/resize.bilinear_resize_weights_np), so numerics stay identical.
"""

from __future__ import annotations

import collections
import concurrent.futures as futures
import functools
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np

from ..ops.resize import bilinear_resize_weights_np, nearest_resize_index_np
from .base import SequenceDataset, test_pair_index, train_pair_index


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError("Failed to decode {}".format(path))
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise IOError("Failed to decode {}".format(path))
    return img[..., None]


@functools.lru_cache(maxsize=64)
def _resize_weights(in_h: int, in_w: int, out_h: int, out_w: int):
    return (
        bilinear_resize_weights_np(in_h, out_h),
        bilinear_resize_weights_np(in_w, out_w),
    )


def host_resize_image(img_u8: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """uint8 HWC -> float32 reader-size in [-0.5, 0.5], TF-parity bilinear
    (reference preprocess_image, davis2016_data_utils.py:86-91)."""
    x = img_u8.astype(np.float32) / 255.0 - 0.5
    wh, ww = _resize_weights(x.shape[0], x.shape[1], *out_hw)
    return np.einsum("oh,hwc->owc", wh, np.einsum("pw,hwc->hpc", ww, x))


def host_resize_mask(mask_u8: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """uint8 HW1 -> float32 reader-size mask in [0, 1], NN resize
    (reference preprocess_mask, davis2016_data_utils.py:93-99)."""
    m = mask_u8.astype(np.float32) / 255.0
    ih = nearest_resize_index_np(m.shape[0], out_hw[0])
    iw = nearest_resize_index_np(m.shape[1], out_hw[1])
    return m[ih][:, iw]


class HostLoader:
    """Thread-pooled batch producer with bounded prefetch."""

    def __init__(self, num_threads: int = 6, prefetch: int = 3):
        self.pool = futures.ThreadPoolExecutor(max_workers=max(1, num_threads))
        self.prefetch = prefetch

    def prefetched(self, batch_specs: Iterator, make_batch) -> Iterator:
        """Map make_batch over batch_specs with `prefetch` batches in flight."""
        pending = collections.deque()
        specs = iter(batch_specs)
        try:
            for _ in range(self.prefetch):
                pending.append(self.pool.submit(make_batch, next(specs)))
        except StopIteration:
            pass
        while pending:
            done = pending.popleft()
            try:
                pending.append(self.pool.submit(make_batch, next(specs)))
            except StopIteration:
                pass
            yield done.result()


class TrainPipeline:
    """Infinite shuffled stream of frame pairs with random temporal shift.

    Reproduces the sampling of the reference train pipeline
    (davis2016_data_utils.py:148-229): per sample a shift
    t ~ U{min_temporal_len..max_temporal_len} applied along the row's
    direction. Yields dict batches; augmentation happens on device.
    """

    def __init__(self, dataset: SequenceDataset, batch_size: int,
                 min_temporal_len: int, max_temporal_len: int,
                 reader_hw: Tuple[int, int] = (384, 640),
                 raw_hw: Optional[Tuple[int, int]] = None,
                 num_threads: int = 6, seed: int = 8964):
        self.index = train_pair_index(dataset, max_temporal_len)
        self.batch_size = batch_size
        self.min_t = min_temporal_len
        self.max_t = max_temporal_len
        self.reader_hw = reader_hw
        self.raw_hw = raw_hw
        self.rng = np.random.RandomState(seed)
        self.loader = HostLoader(num_threads, prefetch=3)

    def _spec_stream(self):
        n = len(self.index)
        while True:
            order = self.rng.permutation(n)
            for start in range(0, n - self.batch_size + 1, self.batch_size):
                rows = order[start : start + self.batch_size]
                shifts = self.rng.randint(self.min_t, self.max_t + 1, size=len(rows))
                idx1 = self.index.numbers[rows]
                idx2 = idx1 + shifts * self.index.directions[rows]
                yield idx1, idx2

    def _make_batch(self, spec):
        idx1, idx2 = spec
        if self.raw_hw is not None:
            img1 = np.stack([_imread_rgb(self.index.images[i]) for i in idx1])
            img2 = np.stack([_imread_rgb(self.index.images[i]) for i in idx2])
            return {"img1_raw": img1, "img2_raw": img2}
        img1 = np.stack(
            [host_resize_image(_imread_rgb(self.index.images[i]), self.reader_hw) for i in idx1]
        )
        img2 = np.stack(
            [host_resize_image(_imread_rgb(self.index.images[i]), self.reader_hw) for i in idx2]
        )
        return {"img1": img1, "img2": img2}

    def __iter__(self):
        return self.loader.prefetched(self._spec_stream(), self._make_batch)


class TestPipeline:
    __test__ = False  # not a pytest class

    """Sequential (cyclically wrapped) evaluation stream with ground truth.

    Matches reference test_inputs semantics: fixed |t_len| shift with
    boundary reversal, every frame exactly once per cycle, final batch
    filled by wrap-around (the reference's repeat(None) + ceil(n/b) steps,
    test_generator.py:62-75). Yields images, GT mask, category and file name
    per sample.
    """

    def __init__(self, dataset: SequenceDataset, batch_size: int, t_len: int,
                 reader_hw: Tuple[int, int] = (384, 640),
                 raw_hw: Optional[Tuple[int, int]] = None,
                 num_threads: int = 1,
                 explicit_tuples: Optional[List] = None):
        if explicit_tuples is not None:
            # FBMS-style (img1, img2, ann, category, samples_per_cat) tuples.
            self.tuples = explicit_tuples
            self.num_samples = len(explicit_tuples)
        else:
            self.index = test_pair_index(dataset, t_len)
            self.t_len = abs(t_len)
            self.tuples = None
            self.num_samples = len(self.index)
        self.batch_size = batch_size
        self.reader_hw = reader_hw
        self.raw_hw = raw_hw
        self.loader = HostLoader(num_threads, prefetch=3)

    @property
    def num_steps(self) -> int:
        return int(np.ceil(self.num_samples / float(self.batch_size)))

    def _sample(self, i: int):
        if self.tuples is not None:
            f1, f2, ann, cat, _ = self.tuples[i]
            return f1, f2, ann, cat
        n1 = self.index.numbers[i]
        n2 = n1 + self.t_len * self.index.directions[i]
        return (
            self.index.images[n1],
            self.index.images[n2],
            self.index.annotations[n1],
            self.index.categories[n1],
        )

    def _make_batch(self, rows):
        f1s, f2s, anns, cats = zip(*[self._sample(i) for i in rows])
        if self.raw_hw is not None:
            img1 = np.stack([_imread_rgb(f) for f in f1s])
            img2 = np.stack([_imread_rgb(f) for f in f2s])
            gt = np.stack([_imread_gray(a) for a in anns])
            return {
                "img1_raw": img1, "img2_raw": img2, "gt_raw": gt,
                "category": list(cats), "fname": list(f1s),
            }
        img1 = np.stack([host_resize_image(_imread_rgb(f), self.reader_hw) for f in f1s])
        img2 = np.stack([host_resize_image(_imread_rgb(f), self.reader_hw) for f in f2s])
        gt = np.stack([host_resize_mask(_imread_gray(a), self.reader_hw) for a in anns])
        return {
            "img1": img1, "img2": img2, "gt": gt,
            "category": list(cats), "fname": list(f1s),
        }

    def _spec_stream(self):
        order = np.arange(self.num_samples)
        for step in range(self.num_steps):
            start = step * self.batch_size
            rows = [order[(start + j) % self.num_samples] for j in range(self.batch_size)]
            yield rows

    def __iter__(self):
        return self.loader.prefetched(self._spec_stream(), self._make_batch)
