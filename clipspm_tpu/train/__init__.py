"""Trainer/evaluator: losses, optimizers, episodic loops, checkpoints."""

from .losses import aggregate_accuracy, episodic_ce, loss_and_acc
from .optim import make_optimizer, multistep_lr

__all__ = ["episodic_ce", "aggregate_accuracy", "loss_and_acc",
           "make_optimizer", "multistep_lr"]
