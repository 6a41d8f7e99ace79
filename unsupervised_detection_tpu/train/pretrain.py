"""Recover-net pretraining: flow inpainting of random box occlusions.

The reference repo ships only the resulting checkpoint ("Recover pretrain:
flow inpainting of box occlusions on FlyingChairs", BASELINE.json configs;
README.md:83-87) — the training procedure itself is not in the repo. This
module provides it TPU-natively: given frame pairs from any reader, PWC
flow is computed on device and the recover net is trained to reconstruct
that flow inside randomly placed box masks, with the same Charbonnier loss
family as the adversarial stage. (No ground-truth .flo reading exists —
supervision is always the frozen PWC net's flow on frame pairs.)

Optimizer note: this stage uses optax.adam rather than the hand-built
TF1-exact Adam in train/optim.py. The reference ships NO pretraining code
(only the resulting checkpoint), so there is no TF1 numerics contract to
honor here; the adversarial stage keeps the TF1-exact optimizer because its
train dynamics ARE golden-tested against the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..data import TrainPipeline, get_reader
from ..ops.losses import charbonnier_loss
from ..parallel.mesh import data_sharding, make_mesh, replicate
from . import checkpoint as ckpt
from .objective import AdversarialObjective


def random_box_masks(rng, batch, height, width, min_frac=0.15, max_frac=0.45):
    """(B, H, W, 1) masks with one random box of 1s per sample."""
    r_h, r_w, r_y, r_x = jax.random.split(rng, 4)
    bh = height * (min_frac + jax.random.uniform(r_h, (batch,)) * (max_frac - min_frac))
    bw = width * (min_frac + jax.random.uniform(r_w, (batch,)) * (max_frac - min_frac))
    y0 = jax.random.uniform(r_y, (batch,)) * (height - bh)
    x0 = jax.random.uniform(r_x, (batch,)) * (width - bw)
    yy = jax.lax.broadcasted_iota(jnp.float32, (batch, height, width), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (batch, height, width), 2)
    inside = (
        (yy >= y0[:, None, None]) & (yy < (y0 + bh)[:, None, None])
        & (xx >= x0[:, None, None]) & (xx < (x0 + bw)[:, None, None])
    )
    return inside.astype(jnp.float32)[..., None]


def pretrain_recover(config: Config, steps: int, verbose: bool = True,
                     save_every: int = 1000):
    """Train the recover net on box-occlusion inpainting; returns params."""
    mesh = make_mesh(n_data=config.mesh_data or None, n_model=config.mesh_model,
                     batch_size=config.batch_size)
    obj = AdversarialObjective(config)
    optimizer = optax.adam(config.learning_rate, b1=config.beta1,
                           eps=config.adam_epsilon)

    rng = jax.random.PRNGKey(config.seed)
    r_rec, r_pwc, r_loop = jax.random.split(rng, 3)
    img_w = jnp.zeros((1, config.img_height, config.img_width, 3))
    flow_w = jnp.zeros((1, config.img_height, config.img_width, 2))
    mask_w = jnp.zeros((1, config.img_height, config.img_width, 1))
    img_r = jnp.zeros((1, config.reader_height, config.reader_width, 3))
    rec_params = obj.recover.init(r_rec, img_w, flow_w, mask_w)["params"]
    pwc_params = obj.pwc.init(r_pwc, img_r, img_r)["params"]
    if not config.flow_ckpt and not config.allow_random_flow:
        # Same contract as train/driver.py:44-50: inpainting targets from a
        # random flow net are garbage; demand an explicit opt-out.
        raise SystemExit(
            "pretrain_recover needs --flow_ckpt (TF1 or pretrain_flow.py "
            "checkpoint). Pass --allow_random_flow to pretrain against a "
            "randomly initialized flow net (tests/synthetic runs only).")
    if config.flow_ckpt:
        from . import tf1_import

        if tf1_import.is_tf_checkpoint(config.flow_ckpt):
            reader = tf1_import._load_reader(config.flow_ckpt)
            pwc_params = tf1_import._fill(
                pwc_params, tf1_import.pwc_name_map(pwc_params), reader)
        else:
            # pwc-scope checkpoint from pretrain_flow.py or a full TrainState
            # save (train.py's model.best), same dual-format contract as
            # train/driver._restore_scope.
            from . import checkpoint as _ckpt

            pwc_params = _ckpt.restore_params_scope(
                config.flow_ckpt, pwc_params, "pwc_params")

    opt_state = optimizer.init(rec_params)

    shard = data_sharding(mesh)
    repl = replicate(mesh)

    def step_fn(rec_params, opt_state, rng, img1, img2):
        rng, r_mask = jax.random.split(rng)
        flow = obj.compute_flow(pwc_params, img1, img2)
        image, flow = obj.resize_to_working(img1, flow)
        mask = random_box_masks(
            r_mask, image.shape[0], config.img_height, config.img_width)

        def loss_fn(p):
            pred = obj.recover.apply({"params": p}, image, flow * (1.0 - mask), mask)
            total = charbonnier_loss(flow, pred, jnp.ones_like(flow), config.cbn)
            per_px = jnp.sum(total) / (
                config.img_height * config.img_width * image.shape[0])
            return per_px

        loss, grads = jax.value_and_grad(loss_fn)(rec_params)
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -config.gradient_clip, config.gradient_clip), grads)
        updates, opt_state2 = optimizer.update(grads, opt_state, rec_params)
        return optax.apply_updates(rec_params, updates), opt_state2, rng, loss

    step_jit = jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, shard, shard),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )

    reader = get_reader(config.dataset, config.root_dir,
                        max_temporal_len=config.max_temporal_len,
                        min_temporal_len=config.min_temporal_len,
                        num_threads=config.num_threads)
    ds = reader.dataset(config.train_partition)
    raw_hw = ((reader.raw_height, reader.raw_width)
              if reader.raw_height is not None else None)
    pipe = TrainPipeline(
        ds, config.batch_size, config.min_temporal_len, config.max_temporal_len,
        reader_hw=(config.reader_height, config.reader_width),
        raw_hw=raw_hw, num_threads=config.num_threads, seed=config.seed,
    )

    from ..data.device_input import DeviceFeeder

    feeder = DeviceFeeder(mesh, (config.reader_height, config.reader_width))
    it = iter(pipe)
    loop_rng = jax.device_put(r_loop, repl)
    for step in range(1, steps + 1):
        batch = next(it)
        img1, img2 = feeder.images(batch)
        rec_params, opt_state, loop_rng, loss = step_jit(
            rec_params, opt_state, loop_rng, img1, img2)
        if verbose and step % 20 == 0:
            print("step %d: inpainting loss %.5f" % (step, float(loss)))
        if config.checkpoint_dir and step % save_every == 0:
            ckpt.save_checkpoint(config.checkpoint_dir, f"recover-{step}", rec_params)

    if config.checkpoint_dir:
        ckpt.save_checkpoint(config.checkpoint_dir, "recover-final", rec_params)
    return rec_params
