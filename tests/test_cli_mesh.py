"""Config-driven multi-device execution through the PRODUCTION entry point.

``DEVICE.NUM_CHIPS`` / ``DEVICE.TP`` must scale the shipped CLI by a config
change alone (train/setup.py:build_device_mesh -> parallel/mesh.py ->
Learner(mesh=...)): the reference gates its DataParallel the same way on
``DEVICE.NUM_GPUS > 1`` (reference: run/main_run.py:133-134). Sharding is a
layout change, not a semantic one — a dp=4 CLI run must reproduce the dp=1
run's per-step losses on the identical seeded episode stream (up to fp
reduction order). Runs on the conftest's 8 virtual CPU devices.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def cli_dataset(tmp_path_factory):
    from make_synthetic_dataset import make_dataset

    root = str(tmp_path_factory.mktemp("cli_mesh_ds"))
    cfg_path = make_dataset(root)
    return root, cfg_path


def _run_cli(root, cfg_path, ckdir, *opts):
    from clipspm_tpu.cli.run import main

    main(["--cfg", cfg_path, "--splits-root", root,
          "--allow-random-weights", f"CHECKPOINT.CHECKPOINT_DIR={ckdir}",
          *opts])


def _train_losses(ckdir):
    out = {}
    with open(os.path.join(ckdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "loss/Train_loss[it]":
                out[rec["step"]] = rec["value"]
    return [out[k] for k in sorted(out)]


def test_cli_num_chips_train_parity(cli_dataset, tmp_path):
    """python -m clipspm_tpu.cli.run with DEVICE.NUM_CHIPS=4 must train —
    and produce the same losses as NUM_CHIPS=1 on the same stream."""
    root, cfg_path = cli_dataset
    ck1, ck4 = str(tmp_path / "ck1"), str(tmp_path / "ck4")
    _run_cli(root, cfg_path, ck1, "TRAIN.VAL_FREQ=0",
             "DEVICE.NUM_CHIPS=1")
    _run_cli(root, cfg_path, ck4, "TRAIN.VAL_FREQ=0",
             "DEVICE.NUM_CHIPS=4")

    with open(os.path.join(ck4, "log.txt")) as f:
        log4 = f.read()
    assert "device mesh: dp=4 x tp=1" in log4

    l1, l4 = _train_losses(ck1), _train_losses(ck4)
    assert len(l1) == len(l4) == 2      # 8 episodes / TASKS_PER_BATCH=4
    for a, b in zip(l1, l4):
        assert abs(a - b) <= 1e-3 * max(1.0, abs(b)), (l1, l4)


def test_cli_num_chips_eval_parity(cli_dataset, tmp_path):
    """ONLY_TEST under DEVICE.NUM_CHIPS=4 (dp-sharded batched eval) matches
    the single-device accuracy on the identical seeded eval stream."""
    root, cfg_path = cli_dataset

    def run_eval(ckdir, chips):
        _run_cli(root, cfg_path, ckdir, "TEST.ONLY_TEST=true",
                 "TEST.TEST_EPISODES=8", "TEST.EVAL_BATCH=4",
                 f"DEVICE.NUM_CHIPS={chips}")
        with open(os.path.join(ckdir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        return {r["tag"]: r["value"] for r in recs}

    m1 = run_eval(str(tmp_path / "e1"), 1)
    m4 = run_eval(str(tmp_path / "e4"), 4)
    np.testing.assert_allclose(m4["TEST/hmdb_acc"], m1["TEST/hmdb_acc"],
                               atol=1e-3)


def test_cli_cache_features_fallback_loud(cli_dataset, tmp_path,
                                          monkeypatch):
    """ONLY_TEST with TEST.CACHE_FEATURES=true on a head that can't cache
    must fall back to the uncached protocol with a WARNING — never crash,
    never silently skip the eval (CACHE_FEATURES ships default-on for the
    cacheable families, so the fallback is a production path)."""
    import clipspm_tpu.train.feature_cache as fc

    def raiser(*a, **k):
        raise ValueError("model 'x' does not support eval feature caching")

    monkeypatch.setattr(fc, "evaluate_cached", raiser)
    root, cfg_path = cli_dataset
    ck = str(tmp_path / "fb")
    _run_cli(root, cfg_path, ck, "TEST.ONLY_TEST=true",
             "TEST.TEST_EPISODES=4", "TEST.CACHE_FEATURES=true")
    with open(os.path.join(ck, "log.txt")) as f:
        log = f.read()
    assert "WARNING: TEST.CACHE_FEATURES ignored" in log
    assert "hmdb:" in log      # the uncached eval still reported a result


def test_mesh_config_errors():
    """Unsatisfiable DEVICE configs fail loudly at build time."""
    from clipspm_tpu.train.setup import build_device_mesh
    from clipspm_tpu.utils.config import ConfigNode

    base = {"TRAIN": {"TASKS_PER_BATCH": 4}, "TEST": {"ONLY_TEST": False}}
    with pytest.raises(ValueError, match="devices"):
        build_device_mesh(ConfigNode({**base,
                                      "DEVICE": {"NUM_CHIPS": 64, "TP": 1}}))
    with pytest.raises(ValueError, match="divisible"):
        build_device_mesh(ConfigNode({
            "TRAIN": {"TASKS_PER_BATCH": 3}, "TEST": {"ONLY_TEST": False},
            "DEVICE": {"NUM_CHIPS": 2, "TP": 1}}))
    # 1x1 -> no mesh machinery at all
    assert build_device_mesh(ConfigNode({**base, "DEVICE": {}})) is None
    # dp x tp both > 1 builds the 2-axis mesh
    mesh = build_device_mesh(ConfigNode({**base,
                                         "DEVICE": {"NUM_CHIPS": 2,
                                                    "TP": 2}}))
    assert mesh.shape == {"dp": 2, "tp": 2}
