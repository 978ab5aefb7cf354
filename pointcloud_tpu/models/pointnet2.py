"""PointNet++ encoder (reference: models/pointnet2.py:7-41 +
models/pointnet2_utils.py:167-268).

Three set-abstraction (SA) levels: FPS-downsample, ball-query group, shared
MLP over each neighborhood, max-pool per group. The grouping ops come from
pointcloud_tpu.ops (FPS / ball_query / gather are the reference's CUDA
kernels, here XLA/Pallas); the per-group MLP is a pointwise Dense stack on
(B, S, K, C) tensors — one big MXU matmul per layer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloud_tpu.models.pointnet import (
    DenseBNMaxPool,
    check_train_mask_contract,
)
from pointcloud_tpu.ops.geometry import sample_and_group, sample_and_group_all

Array = jax.Array
_NEG = -1e9


class SetAbstraction(nn.Module):
    """One SA level (reference PointNetSetAbstraction, pointnet2_utils.py:167-208).

    npoint/radius/nsample control FPS + ball query; `group_all` collapses the
    cloud into one group (final level). The shared MLP runs with BatchNorm
    over (B, S, K, C) then max-pools over K, excluding out-of-ball padding.
    """

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: tuple
    group_all: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array | None,
        train: bool = False,
        mask: Array | None = None,
    ):
        if self.dtype is not None and features is not None:
            # bf16 features ride the fused grouping kernel's fast MXU path
            # (the first Dense would cast them anyway)
            features = features.astype(self.dtype)
        if self.group_all:
            new_xyz, grouped, gmask, new_mask = sample_and_group_all(
                xyz, features, mask=mask
            )
        else:
            new_xyz, grouped, gmask, new_mask = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, features, mask=mask
            )
        x = grouped  # (B, S, K, 3+F)
        for f in self.mlp[:-1]:
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
            x = nn.relu(x)
        # final layer: Dense+BN+ReLU fuse with the per-group max-pool
        # (pooled before normalize — exact, see BNMaxPool/DenseBNMaxPool)
        new_features = DenseBNMaxPool(
            self.mlp[-1], final_relu=True, dtype=self.dtype
        )(x, train=train, mask=gmask)  # (B, S, C_out)
        return new_xyz, new_features, new_mask


class SetAbstractionMsg(nn.Module):
    """Multi-scale-grouping SA level (reference PointNetSetAbstractionMsg,
    pointnet2_utils.py:211-268): one FPS, several (radius, k, mlp) branches
    whose pooled features concatenate."""

    npoint: int
    radius_list: tuple
    nsample_list: tuple
    mlp_list: tuple  # tuple of per-branch mlp tuples
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array | None,
        train: bool = False,
        mask: Array | None = None,
    ):
        from pointcloud_tpu.ops.fps import farthest_point_sample
        from pointcloud_tpu.ops.geometry import group_neighbors, index_points

        fps_idx = farthest_point_sample(xyz, self.npoint, mask=mask)
        new_xyz = index_points(xyz, fps_idx)
        new_mask = (
            jnp.take_along_axis(mask, fps_idx, axis=1)
            if mask is not None
            else jnp.ones(fps_idx.shape, dtype=bool)
        )

        if self.dtype is not None and features is not None:
            features = features.astype(self.dtype)
        branch_feats = []
        for radius, nsample, mlp in zip(
            self.radius_list, self.nsample_list, self.mlp_list
        ):
            gxyz, gfeat, _, in_ball = group_neighbors(
                xyz, features, new_xyz, nsample, radius=radius, mask=mask
            )
            grouped_xyz = gxyz - new_xyz[:, :, None, :]
            if gfeat is not None:
                grouped = jnp.concatenate([gfeat, grouped_xyz], axis=-1)
            else:
                grouped = grouped_xyz
            h = grouped
            for f in mlp[:-1]:
                h = nn.Dense(f, dtype=self.dtype)(h)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, dtype=self.dtype
                )(h)
                h = nn.relu(h)
            branch_feats.append(
                DenseBNMaxPool(mlp[-1], final_relu=True, dtype=self.dtype)(
                    h, train=train, mask=in_ball & new_mask[..., None]
                )
            )
        return new_xyz, jnp.concatenate(branch_feats, axis=-1), new_mask


class PointNet2Encoder(nn.Module):
    """PointNet++ SSG global encoder -> (B, 1024) (reference pointnet2.py:7-41).

    Input (B, N, space_dims + feature_dims); xyz drives geometry, extra dims
    ride along as features.
    """

    ENCODING_DIM = 1024

    space_dims: int = 3
    feature_dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        check_train_mask_contract(train, mask)
        xyz = x[..., : self.space_dims]
        feats = x[..., self.space_dims :] if self.feature_dims > 0 else None

        xyz, feats, mask = SetAbstraction(
            npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128), dtype=self.dtype
        )(xyz, feats, train=train, mask=mask)
        xyz, feats, mask = SetAbstraction(
            npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256), dtype=self.dtype
        )(xyz, feats, train=train, mask=mask)
        _, feats, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, dtype=self.dtype,
        )(xyz, feats, train=train, mask=mask)
        return feats[:, 0, :]  # (B, 1024)


class PointNet2SSGEncoder(nn.Module):
    """Alternative SSG classification encoder (reference
    models/pointnet2_ssg_cls.py:6-66, built on external pointnet2_ops there;
    wider MLPs and k=64 at level 1 vs PointNet2Encoder). Present in the
    reference but commented out of backbone_factory (architectures.py:6)."""

    ENCODING_DIM = 1024

    space_dims: int = 3
    feature_dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        xyz = x[..., :3]
        feats = x[..., 3:] if x.shape[-1] > 3 else None
        xyz, feats, mask = SetAbstraction(
            npoint=512, radius=0.2, nsample=64, mlp=(64, 64, 128), dtype=self.dtype
        )(xyz, feats, train=train, mask=mask)
        xyz, feats, mask = SetAbstraction(
            npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256), dtype=self.dtype
        )(xyz, feats, train=train, mask=mask)
        _, feats, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, dtype=self.dtype,
        )(xyz, feats, train=train, mask=mask)
        return feats[:, 0, :]


class PointNet2MSGEncoder(nn.Module):
    """Multi-scale-grouping classification encoder (reference
    models/pointnet2_msg_cls.py:10-45): two MSG levels then a group-all."""

    ENCODING_DIM = 1024

    space_dims: int = 3
    feature_dims: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        xyz = x[..., :3]
        feats = x[..., 3:] if x.shape[-1] > 3 else None
        xyz, feats, mask = SetAbstractionMsg(
            npoint=512,
            radius_list=(0.1, 0.2, 0.4),
            nsample_list=(16, 32, 128),
            mlp_list=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            dtype=self.dtype,
        )(xyz, feats, train=train, mask=mask)
        xyz, feats, mask = SetAbstractionMsg(
            npoint=128,
            radius_list=(0.2, 0.4, 0.8),
            nsample_list=(32, 64, 128),
            mlp_list=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            dtype=self.dtype,
        )(xyz, feats, train=train, mask=mask)
        _, feats, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, dtype=self.dtype,
        )(xyz, feats, train=train, mask=mask)
        return feats[:, 0, :]
