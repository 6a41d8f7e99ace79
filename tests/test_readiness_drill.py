"""Real-data readiness drill: scripts/test_DAVIS2016_raw.sh end to end.

On a data-bearing machine the first command a reference user runs is
`scripts/test_DAVIS2016_raw.sh` (reference scripts/test_DAVIS2016_raw.sh:16-51:
fetch models + DAVIS, then test_generator.py with the published bundle).
This drill executes OUR script verbatim up to the download boundary by
pre-populating `DOWNLOAD_DIR` with:

  * a genuine TF1-format `model.best` bundle written by train/tf1_export.py
    (the same variable names/layout as the published rpg.ifi.uzh.ch bundle,
    incl. embedded pwcnet weights) — so the run exercises the exact
    tf1_import.restore_tf1_full path the real checkpoint takes;
  * the pwcnet-lg-6-2-multisteps-chairsthingsmix marker file (existence
    gates the gdown fetch; the raw eval restores flow from model.best);
  * a miniature synthetic DAVIS2016 tree (JPEGImages/Annotations/ImageSets).

Asserts the script exits 0 with per-category IoU output and visualization
artifacts — i.e. the first run on a machine with the real assets is
turnkey, leaving only the J-mean >= 0.592 acceptance gate to read off.
"""

import os
import subprocess

import jax
import pytest

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import tf1_export
from unsupervised_detection_tpu.train.learner import AdversarialLearner

from synthetic import make_moving_square_davis

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_raw_davis_script_turnkey(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841 (export dependency)

    download = tmp_path / "download"
    result = tmp_path / "results"

    # Assets, exactly where fetch_assets.sh resolves them.
    make_moving_square_davis(str(download / "DAVIS"), frames=8, hw=(96, 160))
    ckpt_dir = download / "unsupervised_detection_models" / "davis_best_model"
    ckpt_dir.mkdir(parents=True)
    cfg = Config(img_height=32, img_width=64,
                 reader_height=64, reader_width=128, batch_size=8)
    state = AdversarialLearner(cfg).init_state(jax.random.PRNGKey(0))
    tf1_export.export_tf1_checkpoint(state, str(ckpt_dir / "model.best"))
    assert os.path.isfile(str(ckpt_dir / "model.best") + ".index")
    pwc_dir = download / "pwcnet-lg-6-2-multisteps-chairsthingsmix"
    pwc_dir.mkdir()
    (pwc_dir / "pwcnet.ckpt-595000.data-00000-of-00001").write_bytes(b"")

    env = dict(os.environ)
    env.update(
        DOWNLOAD_DIR=str(download),
        RESULT_DIR=str(result),
        EXTRA_FLAGS=("--img_height=32 --img_width=64 --reader_height=64 "
                     "--reader_width=128 --batch_size=8 --num_threads=2"),
        JAX_PLATFORMS_FORCE="cpu",
        TF_USE_LEGACY_KERAS="1",
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "test_DAVIS2016_raw.sh")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]

    # The restore went through the TF1 full-bundle path, the val split was
    # evaluated, and the acceptance gate is printed for the operator.
    assert "Resume model from checkpoint" in out
    assert "The Average over the dataset: IoU is" in out, out[-4000:]
    assert "gate: dataset-average IoU >= 0.592" in out
    # Visualization artifacts landed (--generate_visualization=True).
    written = [os.path.join(dp, f) for dp, _, fs in os.walk(result) for f in fs]
    assert any(f.endswith(".png") for f in written), written[:10]
