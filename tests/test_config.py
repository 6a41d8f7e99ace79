"""Flag-surface tests: the CLI accepts the reference's gflags syntax."""

import pytest

from unsupervised_detection_tpu.config import Config, parse_flags


def test_defaults_match_reference():
    cfg = Config()
    # common_flags.py defaults, bit-for-bit
    assert cfg.img_width == 384 and cfg.img_height == 192
    assert cfg.batch_size == 16
    assert cfg.beta1 == 0.9
    assert cfg.flow_normalizer == 80.0
    assert cfg.max_epochs == 40
    assert cfg.num_samples_train == 5000
    assert cfg.train_crop == 0.9
    assert cfg.max_temporal_len == 2 and cfg.min_temporal_len == 1
    assert cfg.cbn == 0.5
    assert cfg.epsilon == 75.0
    assert cfg.iters_rec == 1 and cfg.iters_gen == 3
    assert cfg.num_threads == 6
    assert cfg.resume_train is False
    assert cfg.train_partition == "trainval"
    assert cfg.dataset == "DAVIS2016"
    assert cfg.summary_freq == 30 and cfg.save_freq == 5
    assert cfg.generate_visualization is False
    assert cfg.test_crop == 0.9
    assert cfg.test_temporal_shift == 1
    assert cfg.test_partition == "val"


def test_parse_equals_and_space_forms():
    cfg = parse_flags([
        "--dataset=FBMS", "--batch_size", "4", "--train_crop=0.6",
        "--root_dir", "/data/FBMS",
    ])
    assert cfg.dataset == "FBMS"
    assert cfg.batch_size == 4
    assert cfg.train_crop == 0.6
    assert cfg.root_dir == "/data/FBMS"


def test_parse_booleans():
    assert parse_flags(["--resume_train"]).resume_train is True
    assert parse_flags(["--resume_train=True"]).resume_train is True
    assert parse_flags(["--resume_train=False"]).resume_train is False
    assert parse_flags(["--noresume_train"]).resume_train is False
    assert parse_flags(["--generate_visualization"]).generate_visualization is True


def test_unknown_flag_rejected():
    with pytest.raises(SystemExit):
        parse_flags(["--not_a_flag=3"])


def test_reference_train_script_flags():
    # scripts/train_DAVIS2016.sh invocation shape
    cfg = parse_flags([
        "--root_dir=/data/DAVIS", "--flow_ckpt=/ckpt/pwcnet.ckpt-595000",
        "--recover_ckpt=/ckpt/recover", "--checkpoint_dir=/tmp/exp",
        "--generate_visualization=False", "--train_crop=0.6",
        "--iters_rec=1", "--iters_gen=3",
    ])
    assert cfg.train_crop == 0.6
    assert cfg.flow_ckpt.endswith("595000")
    assert cfg.generate_visualization is False


def test_cli_error_paths():
    """The reference's hard-error contracts at the CLI boundary: a missing
    checkpoint file raises (test_generator.py:53-56 upstream restores or
    dies), an unknown dataset raises the reference's exact message
    (adversarial_learner.py:64-66)."""
    import pytest

    from unsupervised_detection_tpu.data import get_reader

    with pytest.raises(IOError, match="Dataset should be"):
        get_reader("BOGUS", "/nonexistent")

    import test_generator as tg

    with pytest.raises((IOError, SystemExit)):
        tg.main(["test_generator.py", "--ckpt_file=/nonexistent/ckpt",
                 "--root_dir=/nonexistent"])
