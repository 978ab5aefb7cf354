"""Host-side data pipeline: npz datasets, batching, device prefetch."""

from pointcloud_tpu.data.dataset import (
    PointCloudDataset,
    PointCloudGTDataset,
    obs_to_pc,
    BatchLoader,
)

__all__ = ["PointCloudDataset", "PointCloudGTDataset", "obs_to_pc", "BatchLoader"]
