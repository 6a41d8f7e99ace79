#!/usr/bin/env python3
"""Prototype: dense-connected estimator WITHOUT concatenation.

conv(concat(parts)) == sum_i conv(part_i, kernel[:, :, off_i:off_i+c_i, :]).
If XLA fuses the partial-conv accumulation, the estimator's five dense
concats (and their copies) disappear for free. Also tests dup2-warp + cvM.
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
    from unsupervised_detection_tpu.models.layers import leaky_relu_01
    from unsupervised_detection_tpu.models.pwcnet import PWCNet
    from unsupervised_detection_tpu.ops import warp as warp_mod
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = 32
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)

    def timeit(f, vars_, iters=10):
        out = f(vars_, img, img2)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(vars_, img, img2)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def cv_m(c1, warp, search_range=4, use_pallas=False):
        r = search_range
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        costs = []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                s = jax.lax.slice(padded, (0, dy, dx, 0), (b, dy + h, dx + w, c))
                costs.append(jnp.sum(c1 * s, axis=3))
        vol = jax.nn.leaky_relu(jnp.stack(costs, axis=1) * inv_c, negative_slope=0.1)
        return vol.transpose(0, 2, 3, 1)

    # --- parts-conv estimator prototype -----------------------------------
    class PartsConv(nn.Module):
        features: int
        kernel_size: int = 3
        activation: bool = True
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, parts):
            cs = [p.shape[-1] for p in parts]
            k = self.kernel_size
            kernel = self.param(
                "kernel", nn.initializers.he_normal(),
                (k, k, sum(cs), self.features), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = None
            off = 0
            for p, c in zip(parts, cs):
                ks = jax.lax.slice(kernel, (0, 0, off, 0),
                                   (k, k, off + c, self.features)).astype(self.dtype)
                t = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), ks, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = t if y is None else y + t
                off += c
            y = y + bias.astype(self.dtype)
            return leaky_relu_01(y) if self.activation else y

    class PartsEstimator(nn.Module):
        lvl: int
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            parts = [x]
            for i, f in enumerate((128, 128, 96, 64, 32)):
                act = PartsConv(f, dtype=self.dtype, name=f"conv{self.lvl}_{i}")(parts)
                parts = [act] + parts
            upfeat = jnp.concatenate(parts, axis=3)
            flow = PartsConv(2, activation=False, dtype=self.dtype,
                             name=f"flow{self.lvl}")(parts)
            return upfeat, flow

    orig_est = pm.FlowEstimator
    orig_warp = pm.dense_image_warp
    orig_cv = pm.cost_volume

    pwc = PWCNet(dtype=jnp.bfloat16)
    base_vars = pwc.init(jax.random.PRNGKey(0), img, img2)
    f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
    print(f"base              : {timeit(f, base_vars)*1e3:8.2f} ms")

    # dup2 + cvM
    pm.dense_image_warp = warp_mod._warp_dup2
    pm.cost_volume = cv_m
    f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
    print(f"dup2+cvM          : {timeit(f, base_vars)*1e3:8.2f} ms")
    pm.dense_image_warp = orig_warp
    pm.cost_volume = orig_cv

    # parts estimator (fresh params; timing only)
    pm.FlowEstimator = PartsEstimator
    pwc2 = PWCNet(dtype=jnp.bfloat16)
    v2 = pwc2.init(jax.random.PRNGKey(0), img, img2)
    f2 = jax.jit(lambda p, a, b: pwc2.apply(p, a, b))
    print(f"parts-est         : {timeit(f2, v2)*1e3:8.2f} ms")

    # parts estimator + quad + cvM
    pm.dense_image_warp = warp_mod._warp_quad
    pm.cost_volume = cv_m
    f2 = jax.jit(lambda p, a, b: pwc2.apply(p, a, b))
    print(f"parts+quad+cvM    : {timeit(f2, v2)*1e3:8.2f} ms")
    pm.dense_image_warp = orig_warp
    pm.cost_volume = orig_cv
    pm.FlowEstimator = orig_est


if __name__ == "__main__":
    main()
