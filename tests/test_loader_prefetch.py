"""Loader prefetch depth must cover one full consumer batch.

The train/eval staging threads drain TASKS_PER_BATCH / TEST.EVAL_BATCH
episodes at once; a prefetch queue shallower than that serializes the
tail of every batch behind per-episode decode (see
``setup.loader_prefetch``).
"""

from clipspm_tpu.train.setup import loader_prefetch
from clipspm_tpu.utils.config import ConfigNode


def _cfg(tpb=16, eval_batch=32, prefetch=0):
    return ConfigNode({
        "TRAIN": {"TASKS_PER_BATCH": tpb},
        "TEST": {"EVAL_BATCH": eval_batch},
        "DATA": {"PREFETCH": prefetch},
    })


def test_train_prefetch_covers_tasks_per_batch():
    assert loader_prefetch(_cfg(tpb=16), train=True) == 16


def test_eval_prefetch_covers_eval_batch():
    assert loader_prefetch(_cfg(eval_batch=32), train=False) == 32


def test_floor_of_four():
    assert loader_prefetch(_cfg(tpb=1), train=True) == 4
    assert loader_prefetch(_cfg(eval_batch=1), train=False) == 4


def test_explicit_override_wins():
    assert loader_prefetch(_cfg(tpb=16, prefetch=2), train=True) == 2
    assert loader_prefetch(_cfg(eval_batch=32, prefetch=64),
                           train=False) == 64


def test_missing_eval_batch_defaults():
    cfg = ConfigNode({"TRAIN": {"TASKS_PER_BATCH": 8},
                      "TEST": {}, "DATA": {}})
    assert loader_prefetch(cfg, train=False) == 4
