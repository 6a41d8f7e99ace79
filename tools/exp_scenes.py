#!/usr/bin/env python3
"""Scene distribution v2 for PWC flow pretraining (round 4).

Round-3's pretrain reused the game's scene generator: ONE square of side
H//4 (~4% of pixels) moving over an affine-flow background. A mean-EPE
loss on that distribution is dominated by the smooth background, and the
trained net simply never learned independent object motion —
tools/exp_flow_diag.py measured 0.36 px background EPE but 16.12 px
INSIDE the square at the net's own training resolution. This module is
the data half of the fix (the loss half is the object-upweighted EPE in
train/pretrain_pwc.py):

  * 1..max_objects rectangles per scene (painter's order), sides drawn
    from [H/8, H/2] — large objects give the coarse pyramid levels
    direct supervision, small ones train the fine levels; coverage per
    scene lands around 10-40% instead of 4%;
  * each object carries an independent affine flow (same magnitude
    family as the game scenes: constant amp 20 px, linear terms 16 px;
    background amp 12 px) — the game's distribution is a subset;
  * distinct multi-scale texture + brightness offset per object;
  * photometric asymmetry between the frames (global brightness shift
    and per-pixel Gaussian noise on frame 2) so matching can't rely on
    exact intensity equality;
  * returns the object-union mask for loss weighting and for
    region-EPE diagnostics.

Frame construction matches the rest of the framework: I2 = warp(I1, -F),
i.e. I2(p) = I1(p + F(p)) — the convention train/pretrain_pwc.py trains
PWC to recover (reference flow-units contract:
adversarial_learner.py:89-97).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def make_scenes_v2(batch: int, H: int, W: int, max_objects: int = 3,
                   noise: float = 0.02, bright: float = 0.05,
                   deform_amp: float = 0.0):
    """Jitted on-device generator: key -> (img1, img2, flow80, obj_mask).

    flow80 is flow / 80 (the /flow_normalizer convention the game uses);
    obj_mask is the union of object rectangles, [B,H,W,1] float.

    deform_amp > 0 (scenes v3, round 4) adds a low-frequency sinusoidal
    residual to each object's flow — non-rigid ("deformable") object
    motion, so the pretrained net generalizes past piecewise-affine
    fields. With deform_amp=0 the key stream and output are bit-identical
    to the original v2 distribution (earlier arms stay reproducible)."""
    from unsupervised_detection_tpu.ops.warp import dense_image_warp

    yy = jax.lax.broadcasted_iota(jnp.int32, (batch, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (batch, H, W), 2)
    yn = (yy.astype(jnp.float32) - H / 2) / H
    xn = (xx.astype(jnp.float32) - W / 2) / W

    def texture(key, scale, amp):
        base = jax.random.uniform(key, (batch, H // scale, W // scale, 3))
        up = jax.image.resize(base, (batch, H, W, 3), "linear")
        return amp * (up - 0.5)

    def affine(key, amp_a, amp_lin=16.0):
        co = jax.random.uniform(key, (batch, 2, 3), minval=-1.0, maxval=1.0)
        co = co * jnp.asarray([amp_a, amp_lin, amp_lin])
        return (co[:, None, None, :, 0]
                + co[:, None, None, :, 1] * xn[..., None]
                + co[:, None, None, :, 2] * yn[..., None])

    def sinusoid(key):
        """Per-(sample, channel) low-frequency sinusoidal field, +-deform_amp
        px: amp * sin(2pi fy y + phy) * cos(2pi fx x + phx), f in [1, 3]."""
        ka, kf, kp = jax.random.split(key, 3)
        amp = deform_amp * jax.random.uniform(ka, (batch, 1, 1, 2),
                                              minval=0.3, maxval=1.0)
        f = jax.random.uniform(kf, (batch, 1, 1, 2, 2), minval=1.0, maxval=3.0)
        ph = jax.random.uniform(kp, (batch, 1, 1, 2, 2), maxval=2 * jnp.pi)
        two_pi = 2 * jnp.pi
        return amp * (jnp.sin(two_pi * f[..., 0] * yn[..., None] + ph[..., 0])
                      * jnp.cos(two_pi * f[..., 1] * xn[..., None] + ph[..., 1]))

    def make(key):
        ks = jax.random.split(key, 5 + max_objects)
        img = jnp.clip(texture(ks[0], 8, 0.6) + texture(ks[1], 2, 0.25),
                       -0.5, 0.5)
        flow = affine(ks[2], 12.0)
        obj_mask = jnp.zeros((batch, H, W, 1))

        # Painter's order: later objects overdraw earlier ones, so the
        # (img, flow, mask) triple stays mutually consistent.
        for i in range(max_objects):
            # The 9th subkey exists only in v3 so v2 arms replay exactly.
            kk = jax.random.split(ks[3 + i], 9 if deform_amp else 8)
            side_y = jax.random.randint(kk[0], (batch, 1, 1), H // 8, H // 2 + 1)
            side_x = jax.random.randint(kk[1], (batch, 1, 1), H // 8, H // 2 + 1)
            y0 = jax.random.randint(kk[2], (batch, 1, 1), 0, H - H // 8)
            x0 = jax.random.randint(kk[3], (batch, 1, 1), 0, W - H // 8)
            side_y = jnp.minimum(side_y, H - y0)
            side_x = jnp.minimum(side_x, W - x0)
            inside = ((yy >= y0) & (yy < y0 + side_y)
                      & (xx >= x0) & (xx < x0 + side_x))
            # Object 0 always present; each later one active w.p. 1/2.
            active = (jnp.ones((batch, 1, 1), bool) if i == 0 else
                      jax.random.bernoulli(kk[4], 0.5, (batch, 1, 1)))
            m = (inside & active).astype(jnp.float32)[..., None]
            tex = (texture(kk[5], 4, 0.7)
                   + jax.random.uniform(kk[6], (batch, 1, 1, 1),
                                        minval=-0.2, maxval=0.2))
            img = jnp.clip(jnp.where(m > 0, tex, img), -0.5, 0.5)
            obj_flow = affine(kk[7], 20.0)
            if deform_amp:
                obj_flow = obj_flow + sinusoid(kk[8])
            flow = jnp.where(m > 0, obj_flow, flow)
            obj_mask = jnp.maximum(obj_mask, m)

        img2 = dense_image_warp(img, -flow)
        kb, kn = ks[3 + max_objects], ks[4 + max_objects]
        img2 = img2 + jax.random.uniform(kb, (batch, 1, 1, 1),
                                         minval=-bright, maxval=bright)
        img2 = img2 + noise * jax.random.normal(kn, img2.shape)
        img2 = jnp.clip(img2, -0.5, 0.5)
        return img, img2, flow / 80.0, obj_mask

    return jax.jit(make)


if __name__ == "__main__":
    # Smoke: render one batch and print coverage / flow stats.
    make = make_scenes_v2(4, 128, 192)
    img1, img2, flow80, mask = make(jax.random.PRNGKey(0))
    print("img1", img1.shape, "img2", img2.shape,
          "flow px mean|.|", float(jnp.mean(jnp.abs(flow80 * 80))),
          "object coverage", float(jnp.mean(mask)))
