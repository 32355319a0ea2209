"""``TEST.TEST_MODEL_PATH`` — explicit checkpoint selection in ONLY_TEST.

The reference hard-exits when the configured test checkpoint is missing
(reference: utils/utils.py:75-77) and otherwise loads exactly that path
(reference: run/main_run.py:415-418). Here the same knob points at an orbax
checkpoint directory; a set-but-unloadable path must raise, never silently
fall through to the local 'best' checkpoint or the untrained model.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def cli_dataset(tmp_path_factory):
    from make_synthetic_dataset import make_dataset

    root = str(tmp_path_factory.mktemp("cli_tmp_ds"))
    cfg_path = make_dataset(root)
    return root, cfg_path


def _run_cli(root, cfg_path, ckdir, *opts):
    from clipspm_tpu.cli.run import main

    main(["--cfg", cfg_path, "--splits-root", root,
          "--allow-random-weights", f"CHECKPOINT.CHECKPOINT_DIR={ckdir}",
          *opts])


def test_test_model_path_loads_explicit_checkpoint(cli_dataset, tmp_path):
    root, cfg_path = cli_dataset
    train_ck = str(tmp_path / "trained")
    # VAL_FREQ=4 -> a mid-train validation saves checkpoint_best
    _run_cli(root, cfg_path, train_ck, "TRAIN.VAL_FREQ=4",
             "TEST.TEST_EPISODES=4")
    best = os.path.join(train_ck, "checkpoint_best")
    assert os.path.isdir(best)

    # evaluate from a FRESH checkpoint dir, selecting the trained weights
    # explicitly — the run must log the load, not the untrained warning
    eval_ck = str(tmp_path / "evaldir")
    _run_cli(root, cfg_path, eval_ck, "TEST.ONLY_TEST=true",
             "TEST.TEST_EPISODES=4", f"TEST.TEST_MODEL_PATH={best}")
    with open(os.path.join(eval_ck, "log.txt")) as f:
        log = f.read()
    assert f"Loaded checkpoint from {best}" in log
    assert "untrained" not in log


def test_test_model_path_missing_raises(cli_dataset, tmp_path):
    root, cfg_path = cli_dataset
    ck = str(tmp_path / "missing")
    with pytest.raises(FileNotFoundError, match="TEST_MODEL_PATH"):
        _run_cli(root, cfg_path, ck, "TEST.ONLY_TEST=true",
                 "TEST.TEST_EPISODES=4",
                 f"TEST.TEST_MODEL_PATH={tmp_path / 'nope'}")


def test_test_model_path_torch_file_message(cli_dataset, tmp_path):
    """A reference torch .pt FILE gets a clear error, not an orbax
    stack trace."""
    root, cfg_path = cli_dataset
    pt = tmp_path / "checkpoint_best.pt"
    pt.write_bytes(b"not a real torch checkpoint")
    ck = str(tmp_path / "ptdir")
    with pytest.raises(ValueError, match="torch_import"):
        _run_cli(root, cfg_path, ck, "TEST.ONLY_TEST=true",
                 "TEST.TEST_EPISODES=4", f"TEST.TEST_MODEL_PATH={pt}")
