"""Mesh construction and sharding policies."""

from .mesh import (episode_sharding, make_mesh, replicate_sharding,
                   shard_episode_batch)
from .tensor import megatron_specs, shard_params, shard_train_state

__all__ = ["make_mesh", "episode_sharding", "replicate_sharding",
           "shard_episode_batch", "megatron_specs", "shard_params",
           "shard_train_state"]
