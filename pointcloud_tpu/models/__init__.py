"""Model zoo: backbones (PointNet / PointNet++ / PointMLP) and heads.

Reference: pointcloud_vision/models/. All modules are Flax Linen,
channels-last (B, N, C), with `train: bool` driving BatchNorm mode.
"""

from pointcloud_tpu.models.architectures import (
    AE,
    MLP,
    MultiGTEncoder,
    MultiSegAE,
    PCDecoder,
    PCEncoder,
    PCEncoderDecoder,
    PCSegmenter,
    SegAE,
    GTEncoder,
    backbone_factory,
)
from pointcloud_tpu.models.pointnet import PointNetEncoder, STN
from pointcloud_tpu.models.pointnet2 import (
    PointNet2Encoder,
    PointNet2MSGEncoder,
    PointNet2SSGEncoder,
    SetAbstraction,
    SetAbstractionMsg,
)
from pointcloud_tpu.models.pointmlp import PointMLP, PointMLPElite, PointMLPModel

__all__ = [
    "AE",
    "MLP",
    "MultiGTEncoder",
    "MultiSegAE",
    "PCDecoder",
    "PCEncoder",
    "PCEncoderDecoder",
    "PCSegmenter",
    "SegAE",
    "GTEncoder",
    "backbone_factory",
    "PointNetEncoder",
    "STN",
    "PointNet2Encoder",
    "PointNet2MSGEncoder",
    "PointNet2SSGEncoder",
    "SetAbstraction",
    "SetAbstractionMsg",
    "PointMLP",
    "PointMLPElite",
    "PointMLPModel",
]
