#!/usr/bin/env python3
"""In-context attribution of the PWC forward budget by ablation.

Each variant replaces one component with a near-free stand-in (NOT
numerically meaningful — timing attribution only):

  full          : baseline
  featpyr2x     : just the two feature pyramids
  featpyr-batch : pyramids computed as ONE 2B-batch call (exact rewrite cand.)
  no-warp       : warp -> identity (c2 used directly)
  no-costvol    : costvol -> broadcast of c1 channel mean to 81 channels
  no-ctxt       : context refinement nets removed (flow passthrough)
  no-estimator  : estimator heads -> 3x3 conv to (2+565ch zeros)  [approx]
  no-upconvs    : learned up_flow/up_feat transposed convs -> 2x nearest
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    import unsupervised_detection_tpu.models.pwcnet as pm
    from unsupervised_detection_tpu.models.pwcnet import PWCNet
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)

    pwc = PWCNet(dtype=jnp.bfloat16)
    pwc_vars = pwc.init(jax.random.PRNGKey(0), img, img2)

    def timeit(f, iters=10):
        out = f(pwc_vars, img, img2)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(pwc_vars, img, img2)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    orig_warp = pm.dense_image_warp
    orig_cv = pm.cost_volume
    orig_ctxt_call = pm.ContextNet.__call__
    orig_est_call = pm.FlowEstimator.__call__
    orig_deconv_call = pm.ConvTranspose2D.__call__

    def run(name):
        f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
        t = timeit(f)
        print(f"{name:14s}: {t*1e3:8.2f} ms ({batch/t:6.0f} pair/s)")

    run("full")

    # featpyr x2 (sequential, as in the model)
    fp = pm.FeaturePyramid(dtype=jnp.bfloat16)
    fp_vars = {"params": pwc_vars["params"]["featpyr"]}
    f2 = jax.jit(lambda p, a, b: (fp.apply(fp_vars, a + 0.5)[-1],
                                  fp.apply(fp_vars, b + 0.5)[-1]))
    out = f2(pwc_vars, img, img2)
    float(jnp.sum(out[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f2(pwc_vars, img, img2)
        float(jnp.sum(out[0]) + jnp.sum(out[1]))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{'featpyr2x':14s}: {best*1e3:8.2f} ms")

    fb = jax.jit(lambda p, a, b: fp.apply(fp_vars, jnp.concatenate([a, b], 0) + 0.5)[-1])
    out = fb(pwc_vars, img, img2)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fb(pwc_vars, img, img2)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{'featpyr-batch':14s}: {best*1e3:8.2f} ms")

    # no-warp
    pm.dense_image_warp = lambda image, flow: image
    run("no-warp")
    pm.dense_image_warp = orig_warp

    # no-costvol
    def fake_cv(c1, warp, search_range=4, use_pallas=False):
        m = jnp.mean(c1 * warp, axis=3, keepdims=True)
        return jnp.broadcast_to(m, c1.shape[:3] + (81,))
    pm.cost_volume = fake_cv
    run("no-costvol")
    pm.cost_volume = orig_cv

    # no-ctxt
    pm.ContextNet.__call__ = lambda self, feat, flow: flow
    run("no-ctxt")
    pm.ContextNet.__call__ = orig_ctxt_call

    # no-estimator: single cheap conv producing (upfeat_ch, 2)
    def fake_est(self, x):
        up = pm.PWCConv(8, 3, 1, dtype=self.dtype, name=f"conv{self.lvl}_0")(x)
        pad = jnp.zeros(x.shape[:3] + (x.shape[3] + 565 - 8 - x.shape[3],), x.dtype)
        upfeat = jnp.concatenate([up, pad], axis=3)[..., : x.shape[3] + 565]
        flow = up[..., :2].astype(self.dtype)
        return upfeat, flow
    # NOTE: changes param tree; re-init for this variant
    pm.FlowEstimator.__call__ = fake_est
    pwc2 = PWCNet(dtype=jnp.bfloat16)
    try:
        v2 = pwc2.init(jax.random.PRNGKey(0), img, img2)
        f = jax.jit(lambda p, a, b: pwc2.apply(p, a, b))
        out = f(v2, img, img2)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(v2, img, img2)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{'no-estimator':14s}: {best*1e3:8.2f} ms")
    except Exception as e:
        print(f"{'no-estimator':14s}: FAILED {type(e).__name__} {str(e)[:100]}")
    pm.FlowEstimator.__call__ = orig_est_call

    # no-upconvs
    def fake_deconv(self, x):
        h, w = x.shape[1], x.shape[2]
        y = jax.image.resize(x, (x.shape[0], 2 * h, 2 * w, x.shape[3]), "nearest")
        return y[..., : self.features] if x.shape[3] >= self.features else jnp.concatenate(
            [y, jnp.zeros(y.shape[:3] + (self.features - x.shape[3],), y.dtype)], 3)
    pm.ConvTranspose2D.__call__ = fake_deconv
    pwc3 = PWCNet(dtype=jnp.bfloat16)
    try:
        v3 = pwc3.init(jax.random.PRNGKey(0), img, img2)
        f = jax.jit(lambda p, a, b: pwc3.apply(p, a, b))
        out = f(v3, img, img2)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(v3, img, img2)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"{'no-upconvs':14s}: {best*1e3:8.2f} ms")
    except Exception as e:
        print(f"{'no-upconvs':14s}: FAILED {type(e).__name__} {str(e)[:100]}")
    pm.ConvTranspose2D.__call__ = orig_deconv_call


if __name__ == "__main__":
    main()
