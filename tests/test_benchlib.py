"""benchlib: the shared flagship-forward builder used by bench.py,
__graft_entry__.entry, and tools/bench_batch_sweep.py."""

import jax
import numpy as np

from unsupervised_detection_tpu import benchlib
from unsupervised_detection_tpu.config import Config


def _tiny_cfg(**kw):
    return Config(batch_size=2, reader_height=64, reader_width=64,
                  img_height=32, img_width=32, **kw)


def test_build_forward_compiles_and_times():
    cfg = _tiny_cfg()
    forward, example_args = benchlib.build_forward(cfg)
    args = example_args[:3] + benchlib.random_images(cfg)
    compiled = jax.jit(forward).lower(*args).compile()

    mask, checksum = compiled(*args)
    assert mask.shape == (2, cfg.img_height, cfg.img_width, 1)
    assert np.isfinite(float(checksum))

    flops = benchlib.cost_flops(compiled)
    assert flops is None or flops > 0

    secs = benchlib.time_compiled(compiled, args, iters=2, repeats=1)
    assert secs > 0


def test_entry_uses_benchlib_program():
    """__graft_entry__.entry returns the benchlib program shape (mask only,
    no checksum) — the contract the driver compile-checks."""
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    forward, example_args = benchlib.build_forward(cfg, with_checksum=False)
    out = jax.jit(forward)(*example_args)
    assert out.shape == (2, cfg.img_height, cfg.img_width, 1)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))
