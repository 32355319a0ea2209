"""Episodic data layer: split catalogs, samplers, device-side transforms."""

from .episode import Episode, EpisodeBatch
from .splits import SplitCatalog, VideoRecord
from .sampler import EpisodePlan, EpisodeSampler, plan_frame_indices
from .transforms import (center_crop, clip_normalize, episode_device_transform,
                         horizontal_flip, random_crop, resize_short_side,
                         to_float)
from .synthetic import SyntheticEpisodeSource

__all__ = [
    "Episode", "EpisodeBatch", "SplitCatalog", "VideoRecord",
    "EpisodeSampler", "EpisodePlan", "plan_frame_indices",
    "resize_short_side", "random_crop", "center_crop", "horizontal_flip",
    "to_float", "clip_normalize", "episode_device_transform",
    "SyntheticEpisodeSource",
]
