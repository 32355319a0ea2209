"""Optimizer parity: our optax chains vs. torch Adam/SGD semantics
(reference: run/main_run.py:84-101) and the MultiStep LR schedule."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from clipspm_tpu.train.optim import make_optimizer, multistep_lr  # noqa: E402


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


def _run_both(optim_method, lr, wd, momentum=0.9, steps=5):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(steps)]

    # torch
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if optim_method == "adam":
        opt = torch.optim.Adam([wt], lr=lr, betas=(0.5, 0.999),
                               weight_decay=wd)
    else:
        opt = torch.optim.SGD([wt], lr=lr, momentum=momentum,
                              weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours
    cfg = _Cfg({"SOLVER": {"LR": lr, "WEIGHT_DECAY": wd, "LR_SCH": 10 ** 9,
                           "OPTIM_METHOD": optim_method,
                           "MOMENTUM": momentum},
                "TRAIN": {"TASKS_PER_BATCH": 1}})
    tx = make_optimizer(cfg)
    wj = jnp.asarray(w0.copy())
    state = tx.init(wj)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, wj)
        wj = optax.apply_updates(wj, updates)

    return wt.detach().numpy(), np.asarray(wj)


def test_adam_parity():
    want, got = _run_both("adam", lr=1e-3, wd=5e-5)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)


def test_adam_no_decay_parity():
    want, got = _run_both("adam", lr=1e-4, wd=0.0)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)


def test_sgd_parity():
    want, got = _run_both("sgd", lr=1e-2, wd=1e-3)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)


def test_multistep_schedule_episode_units():
    # scheduler steps per episode; optimizer steps every 16 episodes
    # (reference: run/main_run.py:100,204-210)
    sched = multistep_lr(1.0, [1000], gamma=0.1, episodes_per_step=16)
    assert float(sched(0)) == 1.0
    assert float(sched(62)) == 1.0            # 62*16 = 992 < 1000
    assert float(sched(63)) == pytest.approx(0.1)  # 1008 >= 1000
