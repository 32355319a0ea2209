"""Typed episode pytrees.

The reference passes episodes around as loose dicts produced by the Dataset
(reference: video_reader.py:328-329) and re-keyed by the trainer
(reference: run/main_run.py:296-318). Here an episode is a frozen pytree with
static shapes so whole training steps jit cleanly and batches of episodes are
just a leading axis (``EpisodeBatch``) that can be sharded over a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Episode:
    """One N-way K-shot episode.

    Shapes (``S = way*shot``, ``Q = way*queries``, ``T = seq_len``):
        support_images: ``[S, T, H, W, 3]`` uint8 or float
        support_labels: ``[S]`` int32 episode-relative labels in [0, way)
        target_images: ``[Q, T, H, W, 3]``
        target_labels: ``[Q]`` int32
        real_support_labels: ``[S]`` int32 dataset-level class ids
        real_target_labels: ``[Q]`` int32
        batch_class_list: ``[way]`` int32 chosen dataset-level classes
    """
    support_images: jnp.ndarray
    support_labels: jnp.ndarray
    target_images: jnp.ndarray
    target_labels: jnp.ndarray
    real_support_labels: jnp.ndarray
    real_target_labels: jnp.ndarray
    batch_class_list: jnp.ndarray

    @property
    def way(self) -> int:
        return self.batch_class_list.shape[-1]


# An EpisodeBatch is simply an Episode whose leaves carry a leading episode
# axis [E, ...]; construct with jax.tree.map(stack, episodes).
EpisodeBatch = Episode


def stack_episodes(episodes) -> EpisodeBatch:
    """Stack episodes into an ``[E, ...]`` batch.

    Host (numpy) leaves are stacked with numpy so the batch crosses to the
    device as ONE contiguous transfer; stacking them with ``jnp.stack`` would
    ship every episode to the device individually first (measured 10 s for an
    8-episode batch through the axon tunnel vs ~1.6 s host-side)."""
    import numpy as np

    def _stack(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.stack(xs)
        return jnp.stack(xs)

    return jax.tree.map(_stack, *episodes)
