"""Config system tests: merge semantics parity with the reference loader
(reference: utils/config.py:92-132)."""

import os

import pytest

from clipspm_tpu.utils import (ConfigNode, apply_opts, finalize_config,
                               load_config, merge_into_base)


def test_merge_overrides_and_recurses():
    base = {"A": 1, "B": {"C": 2, "D": 3}}
    new = {"A": 9, "B": {"C": 7}, "E": 5}
    merged = merge_into_base(base, new)
    assert merged == {"A": 9, "B": {"C": 7, "D": 3}, "E": 5}


def test_merge_skips_new_base_keys():
    # keys containing "BASE" are not introduced (reference: utils/config.py:111)
    merged = merge_into_base({"A": 1}, {"_BASE_": "x.yaml", "B": 2})
    assert "_BASE_" not in merged and merged["B"] == 2


def test_sci_notation_coercion():
    cfg = ConfigNode({"SOLVER": {"WEIGHT_DECAY": "5e-5", "NAME": "sgd"}})
    assert cfg.SOLVER.WEIGHT_DECAY == pytest.approx(5e-5)
    assert cfg.SOLVER.NAME == "sgd"


def test_attribute_and_mapping_access():
    cfg = ConfigNode({"TRAIN": {"WAY": 5}})
    assert cfg.TRAIN.WAY == 5
    assert cfg["TRAIN"]["WAY"] == 5
    with pytest.raises(AttributeError):
        _ = cfg.TRAIN.MISSING
    cfg.TRAIN.WAY = 3
    assert cfg.TRAIN.WAY == 3


def test_apply_opts_dotted_paths():
    d = {"TRAIN": {"WAY": 5}}
    apply_opts(d, ["TRAIN.WAY=3", "TRAIN.NEW=hello", "TOP=1.5"])
    assert d == {"TRAIN": {"WAY": 3, "NEW": "hello"}, "TOP": 1.5}


def test_load_config_roundtrip(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "MODEL:\n  NAME: ''\n  BACKBONE: 'resnet50'\n"
        "DATA:\n  DATASET: 'hmdb'\n  DATA_DIR: '/data'\n"
        "SOLVER:\n  LR: 0.001\n")
    override = tmp_path / "m.yaml"
    override.write_text(
        "MODEL:\n  NAME: 'clipspm'\n  BACKBONE: 'RN50'\n"
        "SOLVER:\n  WEIGHT_DECAY: 5e-5\n")
    cfg = load_config(str(override), base_path=str(base),
                      splits_root=str(tmp_path))
    assert cfg.MODEL.NAME == "clipspm"
    assert cfg.MODEL.BACKBONE == "RN50"
    assert cfg.SOLVER.LR == 0.001
    assert cfg.trans_linear_in_dim == 512
    assert cfg.path == os.path.join("/data", "hmdb_256x256q5_l8")
    assert cfg.params["alpha"] == pytest.approx(0.2)


def test_finalize_spm_params_per_dataset():
    cfg = ConfigNode({"MODEL": {"BACKBONE": "ViT-B/16"},
                      "DATA": {"DATASET": "ucf", "DATA_DIR": "/d"}})
    finalize_config(cfg, splits_root="/tmp")
    assert cfg.params["alpha"] == pytest.approx(0.228)
    assert cfg.trans_linear_in_dim == 512
