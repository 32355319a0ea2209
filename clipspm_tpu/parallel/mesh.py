"""Device mesh + sharding policy for episodic training.

The reference's only parallelism is host-side ``torch.nn.DataParallel`` over
the backbone (reference: models/model_clipspm.py:103-109, SURVEY §2.6). The
TPU-native replacement: a ``jax.sharding.Mesh`` with an ``episode`` data axis
(named ``"dp"``). Episodes are independent, so the episode batch shards over
``dp`` and XLA inserts the single required collective — a gradient psum over
ICI — when the jitted train step produces replicated parameter updates.

Model sizes here (CLIP RN50 / ViT-B/16, ~100M params) never *need* tensor or
pipeline sharding (SURVEY §2.6), but the ``tp`` axis is fully wired: building
the mesh with ``n_tp > 1`` megatron-shards the backbone matmuls (see
``parallel/tensor.py``) with GSPMD inserting the row-parallel psums. Enabling
it is a mesh-shape change, not a code change.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EPISODE_AXIS = "dp"
TENSOR_AXIS = "tp"


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(dp, tp)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_tp
    if n_dp < 1 or n_dp * n_tp > len(devices):
        raise ValueError(
            f"mesh dp={n_dp} x tp={n_tp} needs {max(n_dp, 1) * n_tp} "
            f"devices, have {len(devices)}")
    devs = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, (EPISODE_AXIS, TENSOR_AXIS))


def episode_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (episode) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P(EPISODE_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_batch(batch, mesh: Mesh):
    """Place an ``[E, ...]``-batched episode pytree with E sharded over dp."""
    sharding = episode_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
