"""Flow-propagated temporal moving average of soft masks.

Reproduces post_processing/generate_soft_score_from_buffer.py:127-231: for
each consecutive frame pair, dense flow (Ce Liu coarse2fine in the
reference's pyflow.so) maps the previous frame's mask and the running
average into the current frame via bilinear remap; the running average is an
EMA with w_r = 0.85, max-normalized at every step. Forward and backward
passes are stored as `running_avg_f` / `running_avg_b` in the per-frame
.mat files.

Flow backends (flow_fn(im_a, im_b) -> (u, v), pyflow argument order:
correspondences from im_a's grid into im_b):
  * "pyflow"    — the native C++ coarse2fine module (native/pyflow),
                  cross-validated against the reference's actual compiled
                  binary to <1% relative EPE (mean ~0.02 px on ~2.5 px flows;
                  tests/test_pyflow_reference_binary.py drives pyflow.so's
                  exported C++ solver directly via a py2-symbol shim);
  * "farneback" — OpenCV fallback, always available;
  * any callable — e.g. a jitted PWCNet closure for on-device flow.

`propagate_masks` also exposes the pure-array form used by the
`jax.lax.scan` on-device variant (scan_propagate) — the TPU-native
"sequence scaling" replacement for the frame-python-loop (SURVEY.md 5.7).
"""

from __future__ import annotations

import os
from typing import List, Sequence

import cv2
import numpy as np
import scipy.io as sio

W_R = 0.85

# Reference pyflow options (generate_soft_score_from_buffer.py:130-138).
PYFLOW_OPTS = dict(alpha=0.012, ratio=0.75, min_width=20,
                   n_outer_fp_iterations=7, n_inner_fp_iterations=1,
                   n_sor_iterations=30, col_type=0)


def farneback_flow(im_a: np.ndarray, im_b: np.ndarray):
    """OpenCV Farneback flow with pyflow-compatible output convention."""
    g_a = cv2.cvtColor((im_a * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    g_b = cv2.cvtColor((im_b * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(
        g_a, g_b, None, pyr_scale=0.5, levels=5, winsize=15, iterations=3,
        poly_n=5, poly_sigma=1.2, flags=0,
    )
    return flow[..., 0].astype(np.float64), flow[..., 1].astype(np.float64)


def pyflow_flow(im_a: np.ndarray, im_b: np.ndarray):
    """Native C++ coarse2fine variational flow (Ce Liu), matching the
    reference pyflow.so call (generate_soft_score_from_buffer.py:165-167)."""
    from ..native import pyflow

    return pyflow.coarse2fine_flow(im_a, im_b, **PYFLOW_OPTS)[:2]


def get_flow_fn(name_or_fn):
    if callable(name_or_fn):
        return name_or_fn
    if name_or_fn == "pyflow":
        return pyflow_flow
    if name_or_fn == "farneback":
        return farneback_flow
    raise ValueError(f"Unknown flow backend {name_or_fn!r}")


def pwc_flow_fn(ckpt_path: str, search_range: int = 4):
    """On-device flow backend: the framework's own PWC net as a propagation
    flow source (the role pyflow.so plays in the reference — frame-to-frame
    dense correspondence; SURVEY.md C20 "reuse the framework's PWCNet flow
    on-device for the propagation step").

    Returns a closure with this module's flow_fn contract: (u, v) on
    im_a's grid pointing into im_b. PWC(I1, I2) reports F with
    I2(p) = I1(p + F(p)) (train/pretrain_pwc.py data construction), so
    F = PWC(im_b, im_a) lives on im_a's grid and points into im_b —
    exactly the contract; u = F[..., 1], v = F[..., 0]. Frames are
    reflect-padded to the net's 2**pyr_lvls divisibility and the flow
    cropped back. Accepts TF1 or native pwc-scope checkpoints."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import PWCNet

    pwc = PWCNet(search_range=search_range)

    @functools.lru_cache(maxsize=4)
    def compiled(h: int, w: int):
        mult = 2**pwc.pyr_lvls
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        template = jax.jit(pwc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h + ph, w + pw, 3)),
            jnp.zeros((1, h + ph, w + pw, 3)))["params"]
        from ..train import checkpoint as ckpt
        from ..train import tf1_import

        if tf1_import.is_tf_checkpoint(ckpt_path):
            reader = tf1_import._load_reader(ckpt_path)
            params = tf1_import._fill(
                template, tf1_import.pwc_name_map(template), reader)
        else:
            # Bare pwc-scope save OR a full TrainState save (train.py's
            # model.best embeds the PWC weights) — same dual-format contract
            # as the --flow_ckpt flags of the training CLIs.
            params = ckpt.restore_params_scope(ckpt_path, template, "pwc_params")

        @jax.jit
        def run(im_a, im_b):
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            a = jnp.pad(im_a[None] - 0.5, pad, mode="reflect")
            b = jnp.pad(im_b[None] - 0.5, pad, mode="reflect")
            flow = pwc.apply({"params": params}, b, a)
            return flow[0, :h, :w]

        return run

    def flow_fn(im_a: np.ndarray, im_b: np.ndarray):
        h, w = im_a.shape[:2]
        f = np.asarray(compiled(h, w)(
            jnp.asarray(im_a, jnp.float32), jnp.asarray(im_b, jnp.float32)))
        return f[..., 1].astype(np.float64), f[..., 0].astype(np.float64)

    return flow_fn


def warp_with_flow(mask: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """cv2.remap-equivalent bilinear warp: out(x, y) = mask(x+u, y+v),
    zero outside (cv2 BORDER_CONSTANT default)."""
    h, w = mask.shape[:2]
    map_x = (np.arange(w)[None, :] + u).astype(np.float32)
    map_y = (np.arange(h)[:, None] + v).astype(np.float32)
    return cv2.remap(mask.astype(np.float32), map_x, map_y, cv2.INTER_LINEAR)


def _ema_step(prev_mask, running_avg, u, v):
    """One propagation step (generate_soft_score_from_buffer.py:174-181)."""
    warped = warp_with_flow(prev_mask, u, v)
    warped = warped / (np.max(warped) + 1e-8)
    running_avg = warp_with_flow(running_avg, u, v)
    running_avg = running_avg / (np.max(running_avg) + 1e-8)
    running_avg = (1 - W_R) * warped + W_R * running_avg
    return running_avg / (np.max(running_avg) + 1e-8)


def propagate_masks(masks: Sequence[np.ndarray], images: Sequence[np.ndarray],
                    flow_fn=None, backward: bool = False) -> List[np.ndarray]:
    """Pure-array propagation over one sequence; returns the running averages.

    Args:
        masks: per-frame soft masks (float, [0,1]).
        images: per-frame uint8 or [0,1] float RGB frames.
        backward: run the reverse-time pass.
    """
    flow_fn = get_flow_fn(flow_fn or "farneback")
    imgs = [
        (im.astype(np.float64) / 255.0 if im.dtype == np.uint8 else im)
        for im in images
    ]
    order = range(len(masks) - 1, -1, -1) if backward else range(len(masks))
    out = [None] * len(masks)
    running = None
    prev_idx = None
    for idx in order:
        if running is None:
            running = np.squeeze(masks[idx]).astype(np.float64)
        else:
            # flow from the current frame's grid into the previous frame
            u, v = flow_fn(imgs[idx], imgs[prev_idx])
            running = _ema_step(np.squeeze(masks[prev_idx]), running, u, v)
        out[idx] = running
        prev_idx = idx
    return out


def propagate_sequences(out_path: str, seq_names: Sequence[str],
                        seq_num: Sequence[int], flow_fn=None) -> None:
    """File-level propagation matching the reference driver: reads the
    soft-score result_<k>.mat files, adds running_avg_f / running_avg_b."""
    flow_fn = get_flow_fn(flow_fn or "farneback")
    for i, seq in enumerate(seq_names):
        out_dir = os.path.join(out_path, seq)
        print(out_dir)
        names = [os.path.join(out_dir, "result_%d.mat" % k)
                 for k in range(1, seq_num[i] + 1)]
        mats = [sio.loadmat(n) for n in names]
        masks = [np.squeeze(m["pred_mask"]).astype(np.float64) for m in mats]
        images = [np.squeeze(m["img1"]) for m in mats]
        forward = propagate_masks(masks, images, flow_fn, backward=False)
        backward = propagate_masks(masks, images, flow_fn, backward=True)
        for m, name, f_avg, b_avg in zip(mats, names, forward, backward):
            m["running_avg_f"] = f_avg
            m["running_avg_b"] = b_avg
            sio.savemat(name, m)


def scan_propagate(masks, flows, w_r: float = W_R):
    """On-device propagation: jax.lax.scan over the time axis with the
    framework's dense_image_warp. `flows` holds per-step (u, v) maps from
    frame t's grid into frame t-1 (same convention as above).

    Args:
        masks: (T, H, W) soft masks.
        flows: (T-1, H, W, 2) with channel 0 = u (x displacement),
            channel 1 = v (y displacement).
    Returns:
        (T, H, W) running averages (forward direction).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.warp import dense_image_warp

    def warp(m, uv):
        # dense_image_warp samples at (y - flow_y, x - flow_x); remap samples
        # at (y + v, x + u) -> negate and swap into (dy, dx) channels.
        flow_yx = jnp.stack([-uv[..., 1], -uv[..., 0]], axis=-1)
        return dense_image_warp(m[None, :, :, None], flow_yx[None])[0, :, :, 0]

    def step(carry, inp):
        prev_mask, uv = inp
        warped = warp(prev_mask, uv)
        warped = warped / (jnp.max(warped) + 1e-8)
        running = warp(carry, uv)
        running = running / (jnp.max(running) + 1e-8)
        running = (1 - w_r) * warped + w_r * running
        running = running / (jnp.max(running) + 1e-8)
        return running, running

    init = masks[0]
    _, rest = jax.lax.scan(step, init, (masks[:-1], flows))
    return jnp.concatenate([init[None], rest], axis=0)
