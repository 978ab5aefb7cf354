"""PointMLP encoder (reference: models/pointmlp.py:125-357).

Residual point MLP: per-point embedding, then 4 stages of
{LocalGrouper (FPS + kNN + learnable affine normalization), PreExtraction
(shared residual MLP over each neighborhood, max-pool), PosExtraction
(residual MLP over groups)}, finished by a global max-pool to 1024-d.

Factory configs `PointMLP` (embed 64, res_expansion 1.0) and
`PointMLPElite` (embed 32, res_expansion 0.25) match pointmlp.py:333-349.
Like the reference, only xyz drives this backbone (the embedding consumes 3
channels); extra feature dims are sliced off.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointcloud_tpu.models.pointnet import check_train_mask_contract
from pointcloud_tpu.ops.fps import farthest_point_sample
from pointcloud_tpu.ops.geometry import group_neighbors, index_points

Array = jax.Array


class DenseBNAct(nn.Module):
    """Pointwise Dense + BatchNorm + ReLU (reference ConvBNReLU1D,
    pointmlp.py:182-194)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Residual pointwise block (reference ConvBNReLURes1D, pointmlp.py:196-224,
    groups=1 path): Dense->BN->ReLU (expand) -> Dense->BN (project) + skip."""

    channels: int
    res_expansion: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = DenseBNAct(
            int(self.channels * self.res_expansion), self.use_bias, self.dtype
        )(x, train=train)
        h = nn.Dense(self.channels, use_bias=self.use_bias, dtype=self.dtype)(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(h)
        return nn.relu(h + x)


class LocalGrouper(nn.Module):
    """FPS + kNN grouping with learnable affine normalization
    (reference pointmlp.py:125-178).

    Input xyz (B, N, 3), feats (B, N, D); output new_xyz (B, G, 3),
    grouped (B, G, K, 2D[+3...]) = [normalized neighbor feats || anchor feat].
    """

    groups: int
    kneighbors: int
    use_xyz: bool = False
    normalize: str | None = "anchor"  # 'center' | 'anchor' | None

    @nn.compact
    def __call__(self, xyz, feats, mask: Array | None = None):
        B, N, _ = xyz.shape
        fps_idx = farthest_point_sample(xyz, self.groups, mask=mask)
        new_xyz = index_points(xyz, fps_idx)  # (B, G, 3)
        new_feats = index_points(feats, fps_idx)  # (B, G, D)
        grouped_xyz, grouped, _, _ = group_neighbors(
            xyz, feats, new_xyz, self.kneighbors, radius=None, mask=mask,
            with_xyz=self.use_xyz,
        )  # (B, G, K, 3)|None, (B, G, K, D); fused dist+kNN+gather on TPU;
        # with use_xyz=False (both shipped configs) the grouped-xyz output
        # and its strided HBM writes are skipped entirely
        if self.use_xyz:
            grouped = jnp.concatenate([grouped, grouped_xyz], axis=-1)

        if self.normalize is not None:
            if self.normalize == "center":
                mean = jnp.mean(grouped, axis=2, keepdims=True)
            else:  # anchor
                mean = (
                    jnp.concatenate([new_feats, new_xyz], axis=-1)
                    if self.use_xyz
                    else new_feats
                )[:, :, None, :]
            # per-batch-element std over all groups/neighbors/channels
            # (reference pointmlp.py:174: torch.std over the flattened rest,
            # unbiased). Computed as fused fp32 sum/sum-of-squares in ONE
            # read of `centered`: the previous jnp.var-over-reshape form
            # materialized a full fp32 copy and made two sequential passes
            # (mean, then squared deviations) — ~28 ms of the B=32 full-
            # PointMLP train step. E[c^2]-E[c]^2 is safe here: c is
            # anchor-centered, so there is no catastrophic cancellation.
            centered = grouped - mean
            cf = centered.astype(jnp.float32)
            n = centered.size // B
            s1 = jnp.sum(cf, axis=(1, 2, 3))
            s2 = jnp.sum(cf * cf, axis=(1, 2, 3))
            mu = s1 / n
            var = jnp.maximum(s2 / n - mu * mu, 0.0)
            std = jnp.sqrt(var * n / max(n - 1, 1))[:, None, None, None]
            grouped = centered / (std.astype(centered.dtype) + 1e-5)
            dim = grouped.shape[-1]
            alpha = self.param("affine_alpha", nn.initializers.ones, (1, 1, 1, dim))
            beta = self.param("affine_beta", nn.initializers.zeros, (1, 1, 1, dim))
            grouped = alpha * grouped + beta

        anchor = jnp.broadcast_to(
            new_feats[:, :, None, :],
            (*grouped.shape[:3], new_feats.shape[-1]),
        )
        grouped = jnp.concatenate([grouped, anchor], axis=-1)
        if mask is not None:
            new_mask = jnp.take_along_axis(mask, fps_idx, axis=1)
        else:
            new_mask = None
        return new_xyz, grouped, new_mask


def _use_fused_preextract() -> bool:
    import os

    if os.environ.get("PCTPU_DISABLE_FUSED_PREEXTRACT"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class PreExtraction(nn.Module):
    """Per-neighborhood residual MLP + max-pool over K
    (reference pointmlp.py:227-256). (B, G, K, D) -> (B, G, C).

    For the bias-free configs (PointMLP / PointMLPElite) the module owns
    its Dense kernels + BN scale/offset/running stats directly and runs one
    of two equivalent paths:
      * train on TPU: ops/preextract_fused.preextract_pool_fused — the
        whole 1+2*blocks Dense+BN residual stack + K-pool as chained Pallas
        passes; post-BN activations never exist in HBM and BN statistics
        cost no extra pass (VERDICT r2 #1). Running averages update from
        the returned per-layer (ssum, ssq).
      * elsewhere / eval: the XLA oracle semantics (f32 normalize math,
        batch stats in train, running stats in eval).
    BN normalization runs in f32 (vs flax BatchNorm's dtype-precision
    normalize in the r2 DenseBNAct stack) — a strict accuracy improvement;
    max-pool gradients follow the deterministic lowest-index argmax
    (jnp.max tie-splitting divergence documented as in ops/dense_bn_pool).

    use_bias=True falls back to the original DenseBNAct/ResBlock submodule
    stack (different param tree; no config uses it).
    """

    out_channels: int
    blocks: int = 1
    res_expansion: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, impl: str = "auto",
                 interpret: bool = False):
        if self.use_bias:
            h = DenseBNAct(self.out_channels, True, self.dtype)(x, train=train)
            for _ in range(self.blocks):
                h = ResBlock(
                    self.out_channels, self.res_expansion, True, self.dtype
                )(h, train=train)
            return jnp.max(h, axis=2)

        from pointcloud_tpu.ops.preextract_fused import (
            EPS,
            preextract_pool_fused,
            preextract_pool_reference,
        )

        B, G, K, D = x.shape
        C = self.out_channels
        mid = int(C * self.res_expansion)
        layout = [(D, C)]
        for _ in range(self.blocks):
            layout += [(C, mid), (mid, C)]
        ws, gs, os_, ras = [], [], [], []
        for i, (ci, co) in enumerate(layout):
            ws.append(self.param(
                f"w{i}", nn.initializers.lecun_normal(), (ci, co), jnp.float32
            ))
            gs.append(self.param(
                f"scale{i}", nn.initializers.ones, (co,), jnp.float32
            ))
            os_.append(self.param(
                f"offset{i}", nn.initializers.zeros, (co,), jnp.float32
            ))
            ras.append((
                self.variable("batch_stats", f"mean{i}",
                              nn.initializers.zeros, None, (co,), jnp.float32),
                self.variable("batch_stats", f"var{i}",
                              nn.initializers.ones, None, (co,), jnp.float32),
            ))

        dt = self.dtype if self.dtype is not None else x.dtype
        xr = x.reshape(B, G * K, D).astype(dt)
        n = float(B * G * K)

        if impl == "auto":
            impl = (
                "fused"
                if train and _use_fused_preextract()
                and B * G * K * C >= int(1e7)
                else "xla"
            )

        if train:
            if impl == "fused":
                out, stats = preextract_pool_fused(
                    xr, tuple(ws), tuple(gs), tuple(os_), K, interpret
                )
            else:
                out, stats = preextract_pool_reference(
                    xr, tuple(ws), tuple(gs), tuple(os_), K
                )
            if not self.is_initializing():
                for (ram, rav), (ss, sq) in zip(ras, stats):
                    mean = ss / n
                    var = jnp.maximum(sq / n - mean * mean, 0.0)
                    ram.value = 0.9 * ram.value + 0.1 * mean
                    rav.value = 0.9 * rav.value + 0.1 * var
            return out

        # eval: same stack normalized by running statistics
        from pointcloud_tpu.ops.preextract_fused import _layer_res_cfg

        def dense(a, w):
            # dtype-native like flax Dense: f32 MXU accumulation with a
            # bf16 result, WITHOUT preferred_element_type=f32 (which would
            # materialize a 2x-sized f32 z before the cast — see
            # ops/dense_bn_pool.dense_pool_stats_reference)
            if dt == jnp.float32:
                return jax.lax.dot_general(
                    a, w, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return jax.lax.dot_general(
                a.astype(dt), w.astype(dt),
                dimension_numbers=(((2,), (0,)), ((), ())),
            ).astype(dt)

        def bn_pre(h, i):
            mean, var = ras[i][0].value, ras[i][1].value
            return (h.astype(jnp.float32) - mean) * (
                jax.lax.rsqrt(var + EPS) * gs[i]
            ) + os_[i]

        L = len(layout)
        h = dense(xr, ws[0])
        pres = [bn_pre(h, 0)]
        rs = []
        for u in range(1, L):
            res_mode, aux = _layer_res_cfg(u, L)
            pre = pres[u - 1]
            if res_mode == 1:  # RES_BNRELU
                pre = pre + jnp.maximum(pres[0], 0.0)
            elif res_mode == 2:  # RES_DENSE
                pre = pre + rs[aux - 1].astype(jnp.float32)
            a = jnp.maximum(pre, 0.0).astype(dt)
            if u % 2 == 1 and (u + 1) // 2 >= 2:
                rs.append(a)
            h = dense(a, ws[u])
            pres.append(bn_pre(h, u))
        v = pres[-1]
        if self.blocks == 1:
            v = v + jnp.maximum(pres[0], 0.0)
        else:
            v = v + rs[self.blocks - 2].astype(jnp.float32)
        v = v.reshape(B, G, K, C)
        return jnp.maximum(jnp.max(v, axis=2), 0.0).astype(dt)


class PosExtraction(nn.Module):
    """Residual MLP over groups (reference pointmlp.py:259-274)."""

    channels: int
    blocks: int = 1
    res_expansion: float = 1.0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.blocks):
            x = ResBlock(
                self.channels, self.res_expansion, self.use_bias, self.dtype
            )(x, train=train)
        return x


class PointMLPModel(nn.Module):
    """Full PointMLP backbone -> (B, 1024) (reference Model, pointmlp.py:277-331)."""

    ENCODING_DIM = 1024

    points: int = 2048
    embed_dim: int = 64
    res_expansion: float = 1.0
    use_bias: bool = False
    use_xyz: bool = False
    normalize: str = "anchor"
    dim_expansion: Sequence[int] = (2, 2, 2, 2)
    pre_blocks: Sequence[int] = (2, 2, 2, 2)
    pos_blocks: Sequence[int] = (2, 2, 2, 2)
    k_neighbors: Sequence[int] = (24, 24, 24, 24)
    reducers: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype | None = None

    @property
    def encoding_dim(self) -> int:
        """Actual output width: embed_dim * prod(dim_expansion).

        1024 for PointMLP, 256 for PointMLPElite. (The reference pins
        ENCODING_DIM=1024 on the class, pointmlp.py:279, which is wrong for
        the Elite config — heads here read the computed value.)
        """
        d = self.embed_dim
        for e in self.dim_expansion:
            d *= e
        return d

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        check_train_mask_contract(train, mask)
        xyz = x[..., :3]
        feats = DenseBNAct(self.embed_dim, self.use_bias, self.dtype)(
            xyz, train=train
        )
        anchor_points = xyz.shape[1]
        last_channel = self.embed_dim
        for i in range(len(self.pre_blocks)):
            out_channel = last_channel * self.dim_expansion[i]
            anchor_points = anchor_points // self.reducers[i]
            xyz, grouped, mask = LocalGrouper(
                groups=anchor_points,
                kneighbors=self.k_neighbors[i],
                use_xyz=self.use_xyz,
                normalize=self.normalize,
            )(xyz, feats, mask=mask)
            feats = PreExtraction(
                out_channel, self.pre_blocks[i], self.res_expansion,
                self.use_bias, self.dtype,
            )(grouped, train=train)
            feats = PosExtraction(
                out_channel, self.pos_blocks[i], self.res_expansion,
                self.use_bias, self.dtype,
            )(feats, train=train)
            last_channel = out_channel
        return jnp.max(feats, axis=1)  # (B, 1024)


def PointMLP(points: int = 2048, **kwargs) -> PointMLPModel:
    """Factory matching reference pointmlp.py:333-339."""
    kwargs.pop("space_dims", None)
    kwargs.pop("feature_dims", None)
    return PointMLPModel(
        points=points,
        embed_dim=64,
        res_expansion=1.0,
        use_bias=False,
        use_xyz=False,
        normalize="anchor",
        dim_expansion=(2, 2, 2, 2),
        pre_blocks=(2, 2, 2, 2),
        pos_blocks=(2, 2, 2, 2),
        k_neighbors=(24, 24, 24, 24),
        reducers=(2, 2, 2, 2),
        **kwargs,
    )


def PointMLPElite(points: int = 2048, **kwargs) -> PointMLPModel:
    """Factory matching reference pointmlp.py:342-349."""
    kwargs.pop("space_dims", None)
    kwargs.pop("feature_dims", None)
    return PointMLPModel(
        points=points,
        embed_dim=32,
        res_expansion=0.25,
        use_bias=False,
        use_xyz=False,
        normalize="anchor",
        dim_expansion=(2, 2, 2, 1),
        pre_blocks=(1, 1, 2, 1),
        pos_blocks=(1, 1, 2, 1),
        k_neighbors=(24, 24, 24, 24),
        reducers=(2, 2, 2, 2),
        **kwargs,
    )
