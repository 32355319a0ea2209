"""Trailing-partial-batch masking (train/learner.py:_train_step_impl).

When TRAIN_EPISODES % TASKS_PER_BATCH != 0 the final batch is padded with
duplicate episodes to keep the jit shape static. The pad must carry ZERO
weight: no gradient, no batch-stats drift, no metric mass, no episode-counter
inflation. The reference silently DROPS the trailing partial accumulation
instead (reference: run/main_run.py:204-209) — here the real trailing
episodes still train.
"""

import jax
import numpy as np

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.train.learner import Learner

from test_pipelined_loop import _make


def _params_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_run_with_partial_trailing_batch():
    """TRAIN_EPISODES=7, TASKS_PER_BATCH=4: the loop takes one full step and
    one masked 3-episode step; the episode counter ends at exactly 7 and the
    parameters match a hand-stepped twin on the same stream."""
    cfg, model, variables, src, test_src, text, tf = _make(tpb=4)
    piped = Learner(cfg, model, variables, train_source=src,
                    test_source=test_src, text_train=text, text_test=text,
                    transform=tf, log_fn=lambda *_: None)
    piped.run(train_episodes=7, print_freq=100)
    assert int(piped.state.episode) == 7

    # twin: same init, same seeded stream, stepped by hand with the same
    # padding convention (duplicate the last real episode, n_valid=3)
    src2 = SyntheticEpisodeSource(way=2, shot=1, queries=2, seq_len=2,
                                  img_size=28, num_classes=4, seed=5)
    twin = Learner(cfg, model, variables, text_train=text, text_test=text,
                   transform=tf)
    it = iter(src2)
    twin.train_episodes([next(it) for _ in range(4)])
    tail = [next(it) for _ in range(3)]
    twin.train_episodes(tail + [tail[-1]], n_valid=3)
    assert int(twin.state.episode) == 7
    _params_equal(piped.state.params, twin.state.params)


def test_padding_episode_carries_zero_gradient():
    """The update from a masked batch must be INDEPENDENT of the padded
    episode's content — swap the pad for a different episode and the
    resulting parameters and metrics are identical."""
    cfg, model, variables, src, _, text, tf = _make(tpb=4)
    it = iter(src)
    real = [next(it) for _ in range(3)]
    pad_a, pad_b = next(it), next(it)

    la = Learner(cfg, model, variables, text_train=text, text_test=text,
                 transform=tf)
    ma = la.train_episodes(real + [pad_a], n_valid=3)
    lb = Learner(cfg, model, variables, text_train=text, text_test=text,
                 transform=tf)
    mb = lb.train_episodes(real + [pad_b], n_valid=3)

    _params_equal(la.state.params, lb.state.params)
    assert ma == mb
    assert int(la.state.episode) == 3

    # ... and the metric means divide by the REAL episode count: a fully
    # valid batch of the same 3 episodes (different E, fresh jit) gives the
    # same loss mean up to the optimizer-independent forward computation
    lc = Learner(cfg, model, variables, text_train=text, text_test=text,
                 transform=tf)
    mc = lc.train_episodes(real + [real[0]], n_valid=3)
    np.testing.assert_allclose(ma["loss"], mc["loss"], rtol=1e-6)


def test_partial_batch_masked_under_dp():
    """Same purity through the vmapped (parallel_episodes>1) microbatch
    path, where the mask must also gate the weighted batch-stats mean."""
    cfg, model, variables, src, _, text, tf = _make(tpb=4)
    it = iter(src)
    real = [next(it) for _ in range(3)]
    pad_a, pad_b = next(it), next(it)

    la = Learner(cfg, model, variables, text_train=text, text_test=text,
                 transform=tf, parallel_episodes=2)
    ma = la.train_episodes(real + [pad_a], n_valid=3)
    lb = Learner(cfg, model, variables, text_train=text, text_test=text,
                 transform=tf, parallel_episodes=2)
    mb = lb.train_episodes(real + [pad_b], n_valid=3)

    _params_equal(la.state.params, lb.state.params)
    assert ma == mb
    assert int(la.state.episode) == 3
