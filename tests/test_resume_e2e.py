"""Failure recovery: interrupt training, resume, continue — end to end.

The reference resumes via Supervisor restore of the latest model-<epoch>
save (adversarial_learner.py:345-353); here the driver path is
--resume_train -> latest_checkpoint -> full-TrainState restore (params,
optimizer moments, shared Adam step, rng). The test asserts the restored
state is EXACTLY the interrupted run's saved state and that training then
advances to the requested epoch.
"""

import os

import numpy as np

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import checkpoint as ckpt
from unsupervised_detection_tpu.train.driver import train

from synthetic import make_moving_square_davis


def _cfg(root, ckpt_dir, max_epochs):
    return Config(
        root_dir=root, checkpoint_dir=ckpt_dir,
        img_height=32, img_width=64, reader_height=64, reader_width=128,
        batch_size=8, num_samples_train=32,  # 4 sub-steps = 1 cycle/epoch
        max_epochs=max_epochs, summary_freq=100, save_freq=1,
        num_threads=2, train_crop=0.9, test_crop=0.9,
        allow_random_flow=True,
    )


def test_interrupt_and_resume(tmp_path):
    root = make_moving_square_davis(str(tmp_path / "davis"), frames=10,
                                    hw=(128, 192))
    ckpt_dir = str(tmp_path / "ck")
    os.makedirs(ckpt_dir)

    # "Interrupted" run: 1 epoch, saves model-1.
    state1 = train(_cfg(root, ckpt_dir, max_epochs=1), verbose=False)
    saved_path = ckpt.latest_checkpoint(ckpt_dir)
    assert saved_path and saved_path.endswith("model-1")

    # The save IS the interrupted state: every leaf (params, both Adam
    # moment trees, step counter, rng key) round-trips bitwise.
    template = jax.tree.map(np.asarray, state1)
    restored = ckpt.restore_checkpoint(saved_path, template)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, restored)),
                    jax.tree.leaves(template)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resume: picks up model-1 and trains max_epochs MORE epochs — the
    # reference's loop restarts its local step counter at 1 on resume and
    # terminates on local epoch == max_epochs ("This differ from the last
    # when resuming training", adversarial_learner.py:412-417), while the
    # restored global step keeps counting. Bug-for-bug parity: 1 restored
    # cycle + 2 fresh cycles -> global step 3.
    cfg2 = _cfg(root, ckpt_dir, max_epochs=2).replace(resume_train=True)
    state2 = train(cfg2, verbose=False)
    assert int(state1.step) == 1 and int(state2.step) == 3
    assert ckpt.checkpoint_exists(os.path.join(ckpt_dir, "model-2"))

    # The resumed run really continued from the save, not from scratch:
    # its shared Adam step advanced beyond the restored one and the params
    # moved from the restored values by O(lr) only.
    moved = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(state2.rec_params),
                        jax.tree.leaves(state1.rec_params))
    ]
    assert 0.0 < max(moved) < 1e-2
