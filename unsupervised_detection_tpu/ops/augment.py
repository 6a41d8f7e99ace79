"""On-device, batched data augmentation.

The reference augments per-sample on host CPU threads with dynamic-shape
crops (data/aug_flips.py, data/davis2016_data_utils.py:101-146). Here the
whole batch is augmented inside the jitted train step with static shapes:

  * random flips: the reference's nested tf.cond yields {identity, rot180,
    left-right, top-down} each with probability 1/4; implemented as two
    independent per-sample axis reversals selected by `where`;
  * random crop+resize: a continuous crop fraction p ~ U(train_crop, 1] and
    continuous offsets build per-sample bilinear resampling matrices
    (ops/resize.crop_resize_matrices) applied as batched MXU matmuls — the
    static-shape TPU replacement for tf.random_crop + resize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import crop_resize_matrices


def random_flip_pair(rng, img1, img2):
    """Identical random flip applied to both frames (aug_flips.py:35-45).

    The reference draws case A ~ Bernoulli (keep/rotate vs flip), then case
    B inside each branch, giving 1/4 probability each to identity, rot180,
    left-right, top-down. rot180 = lr + td, so two independent boolean
    selections reproduce the distribution exactly.
    """
    b = img1.shape[0]
    case = jax.random.randint(rng, (b,), 0, 4)  # 0:id 1:rot180 2:lr 3:td
    flip_lr = ((case == 1) | (case == 2))[:, None, None, None]
    flip_td = ((case == 1) | (case == 3))[:, None, None, None]

    def apply(img):
        img = jnp.where(flip_lr, img[:, :, ::-1, :], img)
        img = jnp.where(flip_td, img[:, ::-1, :, :], img)
        return img

    return apply(img1), apply(img2)


def random_crop_resize_pair(rng, img1, img2, min_crop_fraction: float):
    """Random crop of both frames by a shared fraction, resized back.

    Reference semantics (davis2016_data_utils.py:101-127): p = min + u*(1-min)
    (same fraction for both axes), independent uniform offsets per axis, both
    frames get the identical crop. Offsets here are continuous rather than
    integer — same distribution family, strictly more diverse augmentation,
    and static shapes under jit.
    """
    b, h, w, _ = img1.shape
    r_p, r_y, r_x = jax.random.split(rng, 3)
    p = min_crop_fraction + jax.random.uniform(r_p, (b,)) * (1.0 - min_crop_fraction)
    crop_h = h * p
    crop_w = w * p
    y0 = jax.random.uniform(r_y, (b,)) * (h - crop_h)
    x0 = jax.random.uniform(r_x, (b,)) * (w - crop_w)

    def matrices(y0_i, x0_i, p_i):
        wh = crop_resize_matrices(h, h, p_i, y0_i,
                                  clamp_lo=y0_i, clamp_hi=y0_i + h * p_i - 1.0)
        ww = crop_resize_matrices(w, w, p_i, x0_i,
                                  clamp_lo=x0_i, clamp_hi=x0_i + w * p_i - 1.0)
        return wh, ww

    wh, ww = jax.vmap(matrices)(y0, x0, p)

    def apply(img):
        y = jnp.einsum("boh,bhwc->bowc", wh, img)
        return jnp.einsum("bpw,bowc->bopc", ww, y)

    return apply(img1), apply(img2)


def augment_pair(rng, img1, img2, min_crop_fraction: float):
    """Full train-time augmentation: random flip then random crop+resize
    (davis2016_data_utils.py:135-146)."""
    r_flip, r_crop = jax.random.split(rng)
    img1, img2 = random_flip_pair(r_flip, img1, img2)
    return random_crop_resize_pair(r_crop, img1, img2, min_crop_fraction)
