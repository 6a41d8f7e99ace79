"""Objective forward-path variants: fused flow resize and fast-flow mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train.objective import AdversarialObjective


def _params(obj, cfg, seed=0):
    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3))
    flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2))
    mask_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 1))
    img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3))
    gen = obj.generator.init(r1, img_w, flow_w)
    rec = obj.recover.init(r2, img_w, flow_w, mask_w)
    pwc = obj.pwc.init(r3, img_r, img_r)
    return gen, rec, pwc


def _imgs(cfg, seed=0):
    rs = np.random.RandomState(seed)
    img1 = jnp.asarray(rs.rand(2, cfg.reader_height, cfg.reader_width, 3).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(2, cfg.reader_height, cfg.reader_width, 3).astype(np.float32) - 0.5)
    return img1, img2


def test_bf16_fused_path_matches_unfused():
    cfg = Config(img_height=32, img_width=64, reader_height=128,
                 reader_width=128, batch_size=2, compute_dtype="bfloat16")
    obj = AdversarialObjective(cfg)
    assert obj.fuse_flow_resize
    gen, rec, pwc = _params(obj, cfg)
    img1, img2 = _imgs(cfg)

    # fused: quarter-res flow + composed resize
    flow_q = obj.compute_flow(pwc["params"], img1, img2)
    assert flow_q.shape[1] == cfg.reader_height // 4
    _, flow_fused = obj.resize_to_working(img1, flow_q)

    # unfused: full upsample inside PWC, then plain resize
    flow_full = obj.pwc.apply({"params": pwc["params"]}, img1, img2,
                              upsample_output=True)
    from unsupervised_detection_tpu.ops.resize import resize_bilinear

    flow_ref = resize_bilinear(flow_full, (cfg.img_height, cfg.img_width)) / cfg.flow_normalizer
    np.testing.assert_allclose(
        np.asarray(flow_fused), np.asarray(flow_ref), rtol=1e-3, atol=1e-4
    )


def test_fast_flow_mode_shapes_and_scale():
    cfg = Config(img_height=32, img_width=64, reader_height=128,
                 reader_width=128, batch_size=2, compute_dtype="bfloat16",
                 flow_resolution_divisor=2)
    obj = AdversarialObjective(cfg)
    gen, rec, pwc = _params(obj, cfg)
    img1, img2 = _imgs(cfg)
    flow_q = obj.compute_flow(pwc["params"], img1, img2)
    # PWC ran at 64x64 -> quarter res 16x16
    assert flow_q.shape[1:3] == (16, 16)
    image, flow = obj.resize_to_working(img1, flow_q)
    assert image.shape[1:3] == (cfg.img_height, cfg.img_width)
    assert flow.shape[1:3] == (cfg.img_height, cfg.img_width)
    out = obj.losses_from_flow(gen["params"], gen["batch_stats"], rec["params"],
                               image, flow)
    for k, v in out.losses.items():
        assert np.isfinite(float(v)), k
