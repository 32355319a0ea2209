"""build_model chunked-encode defaults.

Full-size CLIP ViT backbones default to the VMEM-chunked eval encode and
the remat-chunked train encode (the unchunked ViT-B/16 train backward
needs ~44.9 G of residuals — more HBM than one v5e chip); BatchNorm
backbones must reject MODEL.TRAIN_ENCODE_CHUNK (per-chunk batch statistics
would change training semantics). See visual.encode_chunked.
"""

import pytest

from clipspm_tpu.models.fsar import build_model
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS


def _cfg(backbone, name="clipspm", **model_extra):
    cfg = ConfigNode({"MODEL": dict({"NAME": name, "BACKBONE": backbone},
                                    **model_extra),
                      "TRAIN": {"WAY": 2, "SHOT": 1},
                      "DATA": {"SEQ_LEN": 4, "NUM_CLASS": 8}})
    cfg.params = dict(SPM_DEFAULT_PARAMS["hmdb"])
    return cfg


def test_full_vit_defaults_on():
    m = build_model(_cfg("ViT-B/16"))
    assert m.encode_chunk == 30          # eval-measured optimum
    assert m.train_encode_chunk == 40    # train-measured optimum
    # attn_out remat: +7.7% accumulated-train throughput over "full",
    # numerics identical (test_train_encode_chunk.py)
    assert m.train_remat_policy == "attn_out"


def test_remat_policy_override_wins():
    m = build_model(_cfg("ViT-B/16", TRAIN_REMAT_POLICY="full"))
    assert m.train_remat_policy == "full"
    m = build_model(_cfg("ViT-B/16", TRAIN_REMAT_POLICY="dots"))
    assert m.train_remat_policy == "dots"


def test_rn50_defaults_off():
    m = build_model(_cfg("RN50"))
    assert m.encode_chunk == 0
    assert m.train_encode_chunk == 0


def test_test_tiny_defaults_off():
    m = build_model(_cfg("test-tiny"))
    assert m.encode_chunk == 0
    assert m.train_encode_chunk == 0


def test_explicit_override_wins():
    m = build_model(_cfg("ViT-B/16", ENCODE_CHUNK=0,
                         TRAIN_ENCODE_CHUNK=False))
    assert m.encode_chunk == 0
    assert m.train_encode_chunk == 0
    # true = reuse the eval width; int = explicit width
    m = build_model(_cfg("ViT-B/16", TRAIN_ENCODE_CHUNK=True))
    assert m.train_encode_chunk == 1
    m = build_model(_cfg("ViT-B/16", TRAIN_ENCODE_CHUNK=24))
    assert m.train_encode_chunk == 24
    # ENCODE_CHUNK: true means "enable at the default width", NOT width 1
    # (a 240-step single-frame scan)
    m = build_model(_cfg("RN50", ENCODE_CHUNK=True))
    assert m.encode_chunk == 30


def test_train_chunk_true_with_eval_chunk_off_falls_back_to_default():
    # TRAIN_ENCODE_CHUNK: true = "reuse the eval width", but ENCODE_CHUNK: 0
    # leaves nothing to reuse — the explicit train-chunk opt-in must not be
    # silently dropped (the unchunked ViT-B/16 backward OOMs a 16 G chip),
    # so it falls back to the measured 40-frame train default
    m = build_model(_cfg("ViT-B/16", ENCODE_CHUNK=0, TRAIN_ENCODE_CHUNK=True))
    assert m.encode_chunk == 0
    assert m.train_encode_chunk == 40


def test_train_chunk_rejected_for_batchnorm_backbones():
    with pytest.raises(ValueError, match="BatchNorm"):
        build_model(_cfg("RN50", TRAIN_ENCODE_CHUNK=True))
    with pytest.raises(ValueError, match="BatchNorm"):
        build_model(_cfg("resnet50", name="otam", TRAIN_ENCODE_CHUNK=True))


def test_other_clip_heads_get_the_defaults():
    for name in ("clipfsar", "sten", "cpm2c"):
        m = build_model(_cfg("ViT-B/16", name=name))
        assert m.encode_chunk == 30, name
        assert m.train_encode_chunk == 40, name
