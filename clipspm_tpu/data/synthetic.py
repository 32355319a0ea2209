"""Synthetic episode sources for tests and benchmarks (no dataset needed).

The reference has no fixture/fake-data path at all (SURVEY §4); this fills
that gap: deterministic random episodes with the exact shapes and label
layout the real pipeline produces, so every head / trainer / bench runs
hermetically.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .episode import Episode


class SyntheticEpisodeSource:
    """Yields random uint8 episodes with a valid episodic label layout.

    Class-distinguishable structure: each class gets a distinct mean
    brightness so that learned heads can overfit in smoke tests.
    """

    def __init__(self, way: int = 5, shot: int = 1, queries: int = 5,
                 seq_len: int = 8, img_size: int = 224, num_classes: int = 16,
                 seed: int = 0, channels: int = 3):
        self.way, self.shot, self.queries = way, shot, queries
        self.seq_len, self.img_size = seq_len, img_size
        self.num_classes = num_classes
        self.channels = channels
        self.rng = np.random.default_rng(seed)

    def sample(self) -> Episode:
        rng = self.rng
        way, shot, q = self.way, self.shot, self.queries
        classes = rng.choice(self.num_classes, size=way, replace=False)

        def clips(n, class_ids):
            base = (class_ids[:, None, None, None, None] * 255.0
                    / self.num_classes)
            noise = rng.integers(
                0, 96, size=(n, self.seq_len, self.img_size, self.img_size,
                             self.channels))
            return np.clip(base + noise, 0, 255).astype(np.uint8)

        sup_rl = np.repeat(classes, shot)
        sup_l = np.repeat(np.arange(way), shot)
        tgt_rl = np.repeat(classes, q)
        tgt_l = np.repeat(np.arange(way), q)
        sperm = rng.permutation(way * shot)
        tperm = rng.permutation(way * q)

        return Episode(
            support_images=clips(way * shot, sup_rl)[sperm],
            support_labels=sup_l[sperm].astype(np.int32),
            target_images=clips(way * q, tgt_rl)[tperm],
            target_labels=tgt_l[tperm].astype(np.int32),
            real_support_labels=sup_rl[sperm].astype(np.int32),
            real_target_labels=tgt_rl[tperm].astype(np.int32),
            batch_class_list=classes.astype(np.int32),
        )

    def __iter__(self) -> Iterator[Episode]:
        while True:
            yield self.sample()
