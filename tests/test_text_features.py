"""Prompt-ensemble text tables (models/text_features.py).

The single-stream padded encode (one compiled [b, context] shape for the
train AND test tables — a remote text-tower compile costs minutes per
distinct batch shape) must be numerically identical to per-list encodes
at the natural shapes: padding rows are dropped before the template mean.
Reference behavior being matched: models/model_clipspm.py:44-70.
"""

import jax
import numpy as np

from clipspm_tpu.models.backbones.clip import build_clip, init_clip_params
from clipspm_tpu.models.text_features import (
    SINGLE_TEMPLATE, encode_class_text_features, encode_class_text_tables)

TRAIN_NAMES = ["brush hair", "cartwheel", "catch", "chew", "clap"]
TEST_NAMES = ["climb", "dive", "draw sword"]
TEMPLATES = ["a photo of action {}", "{}, an action", "The man is {}"]


def _tiny_clip():
    model = build_clip("test-tiny")
    variables = init_clip_params(model, jax.random.PRNGKey(0))
    return model, variables


def test_joint_stream_matches_per_list_encodes():
    model, variables = _tiny_clip()
    joint = encode_class_text_tables(
        model, variables, [TRAIN_NAMES, TEST_NAMES], TEMPLATES)
    assert len(joint) == 2
    assert joint[0].shape == (len(TRAIN_NAMES), model.arch.embed_dim)
    assert joint[1].shape == (len(TEST_NAMES), model.arch.embed_dim)
    for got, names in zip(joint, [TRAIN_NAMES, TEST_NAMES]):
        ref = encode_class_text_features(model, variables, names, TEMPLATES)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_padding_is_dropped_not_averaged():
    """Small batch_size forces chunking + trailing-pad: the padded rows
    must not leak into the template mean."""
    model, variables = _tiny_clip()
    ref = encode_class_text_tables(
        model, variables, [TRAIN_NAMES], TEMPLATES, batch_size=512)[0]
    chunked = encode_class_text_tables(
        model, variables, [TRAIN_NAMES], TEMPLATES, batch_size=4)[0]
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_single_template_single_class():
    model, variables = _tiny_clip()
    out = encode_class_text_features(model, variables, ["climb"],
                                     SINGLE_TEMPLATE)
    assert out.shape == (1, model.arch.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
