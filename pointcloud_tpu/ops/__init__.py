"""TPU-native point-cloud compute ops.

Pure-JAX reference implementations live in `geometry`, `fps`, `chamfer`,
`emd`; fused Pallas TPU kernels in `pallas_kernels` override the hot paths
when running on TPU (they fall back to the pure-JAX path elsewhere).
"""

from pointcloud_tpu.ops.geometry import (
    pairwise_sqdist,
    index_points,
    knn,
    ball_query,
    sample_and_group,
    sample_and_group_all,
)
from pointcloud_tpu.ops.fps import farthest_point_sample, farthest_point_sample_xyz
from pointcloud_tpu.ops.chamfer import chamfer_distance, masked_chamfer
from pointcloud_tpu.ops.emd import emd_match, sinkhorn_match, auction_match

__all__ = [
    "pairwise_sqdist",
    "index_points",
    "knn",
    "ball_query",
    "sample_and_group",
    "sample_and_group_all",
    "farthest_point_sample",
    "farthest_point_sample_xyz",
    "chamfer_distance",
    "masked_chamfer",
    "emd_match",
    "sinkhorn_match",
    "auction_match",
]
