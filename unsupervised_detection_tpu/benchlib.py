"""Shared builder + timing helpers for the flagship inference program.

One place for the pieces that bench.py, __graft_entry__.entry, and
tools/bench_batch_sweep.py all need, so the TPU/tunnel workarounds live in
exactly one spot:

* flax inits are wrapped in jax.jit — eager init dispatches op-by-op, which
  costs ~6 minutes of round-trips for the PWC net through the remote-TPU
  tunnel;
* the forward returns a scalar checksum, because block_until_ready() is
  unreliable through the tunnel — fetching the scalar forces completion of
  the whole batch;
* cost_analysis() may return a list of one dict depending on backend/JAX
  version (the unwrap quirk).

The program is the reference pipeline's benchmarked configuration
(BASELINE.json "DAVIS2016 raw inference"): PWCNet flow at the reader
resolution (640x384) + generator mask at the working resolution (384x192)
per frame pair (reference composition: models/adversarial_learner.py:82-107).
"""

from __future__ import annotations

import time


def build_forward(cfg, with_checksum: bool = True):
    """Build the flagship forward (PWC flow + generator mask inference).

    Returns (forward_fn, example_args) where example_args are zero images of
    shape (cfg.batch_size, cfg.reader_height, cfg.reader_width, 3); callers
    that want non-trivial pixels replace the last two args (see
    random_images). With with_checksum the function returns (mask, sum(mask))
    so a scalar fetch synchronizes end-to-end through the tunnel.
    """
    import jax
    import jax.numpy as jnp

    from .train.objective import AdversarialObjective

    obj = AdversarialObjective(cfg)

    rng = jax.random.PRNGKey(0)
    r_gen, r_pwc = jax.random.split(rng)
    img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
    flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2), jnp.float32)
    img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3), jnp.float32)
    gen_vars = jax.jit(obj.generator.init)(r_gen, img_w, flow_w)
    pwc_vars = jax.jit(obj.pwc.init)(r_pwc, img_r, img_r)

    def forward(gen_params, gen_stats, pwc_params, img1, img2):
        flow = obj.compute_flow(pwc_params, img1, img2)
        image, flow_n = obj.resize_to_working(img1, flow)
        mask = obj.generate_mask(gen_params, gen_stats, image, flow_n)
        if with_checksum:
            return mask, jnp.sum(mask)
        return mask

    batch_img = jnp.zeros(
        (cfg.batch_size, cfg.reader_height, cfg.reader_width, 3), jnp.float32)
    example_args = (gen_vars["params"], gen_vars["batch_stats"],
                    pwc_vars["params"], batch_img, batch_img)
    return forward, example_args


def random_images(cfg, seed: int = 0):
    """Deterministic random [-0.5, 0.5) frame pair at the reader resolution."""
    import jax.numpy as jnp
    import numpy as np

    rs = np.random.RandomState(seed)
    shape = (cfg.batch_size, cfg.reader_height, cfg.reader_width, 3)
    img1 = jnp.asarray(rs.rand(*shape).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(*shape).astype(np.float32) - 0.5)
    return img1, img2


def cost_flops(compiled):
    """Total FLOPs of a compiled program per XLA's cost analysis, or None."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # backend-dependent wrapping
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def time_compiled(compiled, args, iters: int = 20, repeats: int = 3) -> float:
    """Best-of-`repeats` mean seconds per call of a compiled checksum-forward.

    Synchronizes by fetching the scalar checksum (the device executes calls
    in order, so the last checksum's arrival means all iters completed).
    """
    float(compiled(*args)[1])  # warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        checksum = None
        for _ in range(iters):
            checksum = compiled(*args)[1]
        float(checksum)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
