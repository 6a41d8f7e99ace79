#!/usr/bin/env python3
"""Windowed gather-free Pallas warp: TPU measurement + in-context contract.

VERDICT r3 item 5: the L2 warp gather is 10.5 ms of a 160 ms batch-64 PWC
forward, at XLA's row-issue ceiling. This measures the Pallas window kernel
(ops/pallas/warp_kernel.py) against the quad/flat gather formulations:

  1. isolated, at every PWC warp level's shape (levels 5..2 of the 640x384
     reader config), bf16 and f32, batch 64;
  2. in-context: full PWC forward with warp_method='window' vs 'quad';
  3. contract check: window_overflow_blocks on the REAL intermediate
     upsampled flows PWC produces on bench-style inputs (must be 0 for the
     window mode to be exact).

Usage: python tools/bench_warp_window.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=20):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def smooth_flow(rng, b, h, w, amp):
    import jax

    c = rng.randn(b, max(h // 8, 1), max(w // 8, 1), 2).astype(np.float32)
    return np.asarray(jax.image.resize(c, (b, h, w, 2), "linear")) * amp


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.ops.pallas.warp_kernel import (
        warp_window_pallas, window_overflow_blocks)
    from unsupervised_detection_tpu.ops.warp import dense_image_warp
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.RandomState(0)
    print("platform:", jax.devices()[0].platform, flush=True)

    # PWC warp shapes for the 640x384 reader (levels 5..2), amp ~ typical
    # upsampled-flow magnitude at that level.
    levels = [  # (lvl, H, W, C, amp)
        (5, 12, 20, 128, 2.0),
        (4, 24, 40, 96, 4.0),
        (3, 48, 80, 64, 6.0),
        (2, 96, 160, 32, 8.0),
    ]
    for dtype in (jnp.bfloat16, jnp.float32):
        print(f"--- isolated, batch {batch}, {dtype.__name__} ---", flush=True)
        for lvl, h, w, c, amp in levels:
            img = jnp.asarray(rng.randn(batch, h, w, c), dtype)
            flow = jnp.asarray(smooth_flow(rng, batch, h, w, amp), dtype)
            quad = jax.jit(lambda i, f: dense_image_warp(i, f, method="quad"))
            flat = jax.jit(lambda i, f: dense_image_warp(i, f, method="flat"))
            tq = timeit(quad, (img, flow)) * 1e3
            tf = timeit(flat, (img, flow)) * 1e3
            line = (f"L{lvl} {h}x{w}x{c}: quad {tq:7.2f} ms"
                    f"  flat {tf:7.2f} ms")
            # K-window sweep: compute scales linearly with K; the contract
            # (overflow=0) tightens as K shrinks.
            for kk in (32, 16, 8):
                win = jax.jit(lambda i, f, kk=kk:
                              warp_window_pallas(i, f, window_k=kk))
                ovf = int(window_overflow_blocks(img.shape, flow, k=kk))
                tw = timeit(win, (img, flow), iters=5) * 1e3
                d = float(jnp.max(jnp.abs(
                    win(img, flow).astype(jnp.float32)
                    - quad(img, flow).astype(jnp.float32))))
                line += (f"  winK{kk} {tw:7.2f} ms ({tq / tw:4.1f}x,"
                         f" maxdiff {d:.3f}, ovf {ovf})")
            print(line, flush=True)

    # --- in-context: full PWC forward, window vs quad --------------------
    from unsupervised_detection_tpu.models.pwcnet import PWCNet

    H, W = 384, 640
    img1 = jnp.asarray(rng.rand(batch, H, W, 3) - 0.5, jnp.bfloat16)
    img2 = jnp.asarray(rng.rand(batch, H, W, 3) - 0.5, jnp.bfloat16)
    results = {}
    for method in ("quad", "window"):
        net = PWCNet(dtype=jnp.bfloat16, warp_method=method)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), img1[:1], img2[:1])
        fwd = jax.jit(lambda p, a, b: net.apply(p, a, b))
        t = timeit(fwd, (params, img1, img2), iters=5) * 1e3
        results[method] = t
        print(f"in-context PWC fwd ({method}): {t:.1f} ms", flush=True)
    print(f"in-context speedup: {results['quad'] / results['window']:.3f}x",
          flush=True)

    # --- contract check on REAL intermediate flows -----------------------
    # Re-run the pyramid manually to extract each level's upsampled flow
    # (the warp input, model_pwcnet.py nn:606-647 semantics) and count
    # window overflows. Uses the same module internals as PWCNet.apply.
    net = PWCNet(dtype=jnp.bfloat16, warp_method="quad")
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img1[:1], img2[:1])

    def warp_inputs(p, a, b):
        # The spy captures tracers during jit tracing; returning them makes
        # them function outputs, so one compiled run yields every level's
        # warp-input flow (the eager variant cost ~10 min of tunnel
        # round-trips).
        flows = {}

        def spy(image, flow, method="quad"):
            flows[image.shape[1:3]] = flow
            return dense_image_warp(image, flow, method=method)

        import unsupervised_detection_tpu.models.pwcnet as m

        orig = m.dense_image_warp
        m.dense_image_warp = spy
        try:
            net.apply(p, a, b)
        finally:
            m.dense_image_warp = orig
        return flows

    flows = jax.jit(warp_inputs)(params, img1[:8], img2[:8])
    # Channel counts at each warp level (c2[lvl] features) — the overflow
    # contract depends on C through the lane-alignment slack.
    level_c = {(12, 20): 128, (24, 40): 96, (48, 80): 64, (96, 160): 32}
    totals = {}
    for hw, fl in sorted(flows.items()):
        c = level_c.get(tuple(hw), 32)
        counts = {}
        for kk in (32, 16, 8):
            counts[kk] = int(window_overflow_blocks(
                (fl.shape[0], hw[0], hw[1], c),
                np.asarray(fl, np.float32), k=kk))
            totals[kk] = totals.get(kk, 0) + counts[kk]
        print(f"warp level {hw} (C={c}): overflow blocks "
              + "  ".join(f"K{kk}={v}" for kk, v in counts.items()),
              flush=True)
    print("in-context overflow totals (random-init net, 8 frames):",
          " ".join(f"K{kk}={v}" for kk, v in sorted(totals.items())),
          flush=True)


if __name__ == "__main__":
    main()
