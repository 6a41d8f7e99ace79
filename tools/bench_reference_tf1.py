#!/usr/bin/env python3
"""Measure the REFERENCE's own TF1 inference graph vs this framework on the
same host CPU — the only hardware both can run on in this environment.

bench.py's vs_baseline divides by an ASSUMED 25 fps TF1-GPU figure (the
reference publishes no throughput). This tool anchors that assumption with a
measured same-hardware ratio: it builds the reference's actual
flow(PWC 640x384) -> resize -> normalize -> generator(384x192) graph from
its verbatim modules (tests/reference_oracle.py) under tf.compat.v1, times
it on CPU, then times this framework's identical fp32 forward on the same
CPU (JAX_PLATFORMS_FORCE=cpu). Run: python tools/bench_reference_tf1.py [batch].
"""

import os
import sys
import time

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reference_oracle import load_reference_models
    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.train.objective import AdversarialObjective

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = load_reference_models()
    tf1 = ref.tf1

    H, W = 192, 384        # working res (common_flags.py:6-7)
    RH, RW = 384, 640      # reader res

    # --- reference graph (adversarial_learner.py:82-107, inference slice) ---
    g = tf1.Graph()
    with g.as_default():
        i1 = tf1.placeholder(tf1.float32, [batch, RH, RW, 3])
        i2 = tf1.placeholder(tf1.float32, [batch, RH, RW, 3])
        model = ref.pwcnet.ModelPWCNet()
        flow = model.predict_from_img_pairs(i1, i2)
        img_r = tf1.image.resize_images(i1, [H, W])
        flow_r = tf1.image.resize_images(flow, [H, W]) / tf1.constant(10.0)
        with tf1.name_scope("MaskNet") as scope:
            mask = ref.nets.generator_net(
                images=img_r, flows=ref.flow_utils.preprocess_flow_batch(flow_r),
                training=False, scope=scope, reuse=False)

    rs = np.random.RandomState(0)
    a = rs.rand(batch, RH, RW, 3).astype(np.float32) - 0.5
    b = rs.rand(batch, RH, RW, 3).astype(np.float32) - 0.5

    with g.as_default(), tf1.Session(graph=g) as sess:
        sess.run(tf1.global_variables_initializer())
        sess.run(mask, {i1: a, i2: b})  # warmup
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            sess.run(mask, {i1: a, i2: b})
        tf_time = (time.perf_counter() - t0) / iters
    tf_fps = batch / tf_time
    print(f"reference TF1 graph (CPU, fp32, batch {batch}): "
          f"{tf_time*1e3:.0f} ms/batch = {tf_fps:.2f} fps")

    # --- this framework, same math, fp32, same CPU --------------------------
    cfg = Config(batch_size=batch, compute_dtype="float32")
    obj = AdversarialObjective(cfg)
    rng = jax.random.PRNGKey(0)
    r_gen, r_pwc = jax.random.split(rng)
    img_w = jnp.zeros((1, H, W, 3), jnp.float32)
    flow_w = jnp.zeros((1, H, W, 2), jnp.float32)
    img_r0 = jnp.zeros((1, RH, RW, 3), jnp.float32)
    gen_vars = obj.generator.init(r_gen, img_w, flow_w)
    pwc_vars = obj.pwc.init(r_pwc, img_r0, img_r0)

    @jax.jit
    def forward(gp, gs, pp, x1, x2):
        fl = obj.compute_flow(pp, x1, x2)
        image, fl_n = obj.resize_to_working(x1, fl)
        return obj.generate_mask(gp, gs, image, fl_n)

    ja, jb = jnp.asarray(a), jnp.asarray(b)
    args = (gen_vars["params"], gen_vars["batch_stats"], pwc_vars["params"], ja, jb)
    forward(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(*args)
    out.block_until_ready()
    jax_time = (time.perf_counter() - t0) / iters
    jax_fps = batch / jax_time
    print(f"this framework (CPU, fp32, batch {batch}): "
          f"{jax_time*1e3:.0f} ms/batch = {jax_fps:.2f} fps")
    print(f"same-hardware ratio (framework/reference): {jax_fps/tf_fps:.2f}x")


if __name__ == "__main__":
    main()
