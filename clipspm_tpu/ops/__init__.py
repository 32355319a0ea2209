"""Alignment kernels and fused distance ops."""

from .otam import (frame_distance_cos, otam_cum_dist, otam_cum_dist_unrolled,
                   otam_distance)
from .softdtw import (pairwise_cos_dist, pairwise_l2sq, softdtw,
                      softdtw_from_dists)
from .softmin import softmin3, softmin_pair, softmin_stack

__all__ = [
    "otam_cum_dist", "otam_cum_dist_unrolled", "otam_distance",
    "frame_distance_cos", "softdtw", "softdtw_from_dists",
    "pairwise_cos_dist", "pairwise_l2sq",
    "softmin_pair", "softmin3", "softmin_stack",
]
