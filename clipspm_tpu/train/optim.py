"""Optimizers and schedules with torch-parity semantics.

- Adam betas (0.5, 0.999) with L2-style weight decay added to the gradient
  *before* the moment updates — torch ``Adam(weight_decay=...)`` semantics,
  not AdamW (reference: run/main_run.py:84-88).
- SGD + momentum + L2 weight decay (reference: run/main_run.py:93-97).
- MultiStep LR decayed by 0.1 at milestones counted in *episodes*: the
  reference steps the scheduler every episode while the optimizer steps every
  ``TASKS_PER_BATCH`` (reference: run/main_run.py:100,204-210), so the
  schedule here maps optimizer-step count -> episode count.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float = 0.1, episodes_per_step: int = 1):
    """LR schedule in optimizer steps, milestones in episode units."""
    import jax.numpy as jnp

    milestones = sorted(milestones)

    def schedule(count):
        episodes = count * episodes_per_step
        passed = sum(jnp.asarray(episodes >= m, jnp.float32)
                     for m in milestones)
        return base_lr * (gamma ** passed)

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    """(reference: run/main_run.py:84-101)"""
    lr = float(cfg.SOLVER.LR)
    wd = float(cfg.SOLVER.WEIGHT_DECAY)
    schedule = multistep_lr(
        lr, [int(cfg.SOLVER.LR_SCH)], gamma=0.1,
        episodes_per_step=int(cfg.TRAIN.TASKS_PER_BATCH))

    if cfg.SOLVER.OPTIM_METHOD == "adam":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    if cfg.SOLVER.OPTIM_METHOD == "sgd":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=float(cfg.SOLVER.MOMENTUM)),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"unknown optimizer {cfg.SOLVER.OPTIM_METHOD!r}")
