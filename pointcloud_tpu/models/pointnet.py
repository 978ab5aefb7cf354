"""PointNet encoder (reference: pointcloud_vision/models/pointnet.py:12-204).

Classic PointNet: a spatial transformer (STN) predicts a 3x3 transform for
the xyz coords (features pass through untouched), a 64-d feature STN
transforms mid-level features, then a shared MLP stack with BatchNorm and a
global max-pool produce the 1024-d encoding.

TPU-native layout: channels-last (B, N, C); the shared "Conv1d(k=1)" stacks
are pointwise Dense layers, which XLA fuses into (B*N, C) matmuls on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Large negative value for masked max-pool (valid activations are post-ReLU
# or BN outputs with magnitude << 1e9).
_NEG = -1e9


def check_train_mask_contract(train: bool, mask: Array | None) -> None:
    """Document + debug-check the BatchNorm/mask contract.

    BatchNorm batch statistics do NOT respect validity masks: in train mode
    every point (masked or not) contributes to the mean/variance. That is
    correct for the supported training pipeline — samplers re-densify clouds
    before they reach a model, and the train harness never passes masks —
    but silently wrong for a hypothetical masked training pipeline, so under
    cfg.debug a training-mode forward with a mask warns loudly.
    (Max-pools and grouping DO respect masks; only BN stats don't.)
    """
    if train and mask is not None:
        from pointcloud_tpu import cfg

        if cfg.debug:
            import warnings

            warnings.warn(
                "training-mode forward with a validity mask: BatchNorm "
                "statistics will include masked-out points (documented "
                "model contract — re-densify with a sampler before "
                "training instead)",
                stacklevel=3,
            )


def masked_max(x: Array, mask: Array | None, axis: int) -> Array:
    """Global max-pool that ignores masked-out points."""
    if mask is not None:
        x = jnp.where(jnp.expand_dims(mask, -1), x, _NEG)
    return jnp.max(x, axis=axis)


class BNMaxPool(nn.Module):
    """BatchNorm + (optional ReLU) + max-pool over axis -2, pooled FIRST.

    Exact rewrite of `max(where(mask, relu?(BatchNorm(x)), -1e9), axis=-2)`:
    BatchNorm is a per-channel monotone affine map (slope sign = sign of
    `scale`) and ReLU/bf16-rounding are monotone, so
        max_n BN(x)_nc == BN(max_n x_n)_c   where scale_c >= 0
                          BN(min_n x_n)_c   otherwise.
    Pooling the RAW pre-BN tensor first means the normalized (.., N, C)
    tensor is never materialized and — the real win — the BatchNorm backward
    runs on the pooled (.., C) values instead of the full tensor, removing
    several full-tensor HBM passes from the gradient of every pre-pool
    1024-wide layer (the dominant cost of the PointNet/PointNet2 stacks).

    Statistics/normalization match nn.BatchNorm(momentum=0.9, eps=1e-5)
    numerics: fp32 batch stats over all axes but the last, running-average
    update in train mode, normalize computed in `dtype`. Masked slots are
    excluded from the pool but (by the documented model contract,
    check_train_mask_contract) DO contribute to batch statistics. Rows whose
    mask is all-False return the -1e9 sentinel, like masked_max.
    """

    final_relu: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (C,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (C,), jnp.float32
        )

        if train:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(xf * xf, axis=red) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        if mask is not None:
            m = jnp.expand_dims(mask, -1)
            pmax = jnp.max(jnp.where(m, x, jnp.asarray(_NEG, x.dtype)), axis=-2)
            pmin = jnp.min(jnp.where(m, x, jnp.asarray(-_NEG, x.dtype)), axis=-2)
        else:
            pmax = jnp.max(x, axis=-2)
            pmin = jnp.min(x, axis=-2)
        sel = jnp.where(scale >= 0, pmax, pmin)

        # same promotion + operation order as flax _normalize
        dt = self.dtype if self.dtype is not None else sel.dtype
        y = sel.astype(dt) - mean.astype(dt)
        mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.epsilon, dt))
        y = y * (mul * scale.astype(dt)) + bias.astype(dt)
        if self.final_relu:
            y = nn.relu(y)
        if mask is not None:
            # all-masked rows keep the masked_max sentinel (pre-BN semantics)
            y = jnp.where(jnp.any(mask, axis=-1, keepdims=True), y, _NEG)
        return y


class PointwiseMLP(nn.Module):
    """Shared per-point MLP: Dense + BatchNorm (+ ReLU) per layer.

    Equivalent to the reference's Conv1d(kernel=1)+BatchNorm1d stacks.
    `final_activation=False` leaves the last layer linear (pre-max-pool
    conv3+bn3 in the reference has no ReLU, pointnet.py:159-161).
    dtype: activation/compute dtype (params and BN stats stay fp32);
    bfloat16 halves the HBM traffic that dominates BN-heavy stacks on TPU.
    """

    features: tuple
    final_activation: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
            if self.final_activation or i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class STN(nn.Module):
    """Spatial transformer predicting a k x k transform (STN3d/STNkd,
    reference pointnet.py:12-91). Input (B, N, C) -> (B, k, k)."""

    k: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None):
        h = PointwiseMLP((64, 128), dtype=self.dtype)(x, train=train)
        h = nn.Dense(1024, dtype=self.dtype)(h)
        h = BNMaxPool(final_relu=True, dtype=self.dtype)(h, train=train, mask=mask)
        # (B, 1024)
        for f in (512, 256):
            h = nn.Dense(f, dtype=self.dtype)(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(h)
            h = nn.relu(h)
        h = nn.Dense(self.k * self.k, kernel_init=nn.initializers.zeros)(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + iden).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """PointNet global encoder -> (B, 1024).

    space_dims coords are transformed by the input STN; remaining
    feature_dims pass through (reference pointnet.py:133-148). Submodules
    live in setup() so `__call__` and `forward_all_features` share weights
    (apply(..., method=model.forward_all_features)).
    """

    ENCODING_DIM = 1024

    space_dims: int = 3
    feature_dims: int = 3
    input_transform: bool = True
    feature_transform: bool = True
    dtype: jnp.dtype | None = None

    def setup(self):
        dt = self.dtype
        self.stn = STN(k=self.space_dims, dtype=dt) if self.input_transform else None
        self.mlp0 = PointwiseMLP((64, 64), dtype=dt)
        self.fstn = STN(k=64, dtype=dt) if self.feature_transform else None
        self.mlp1 = PointwiseMLP((64, 128), dtype=dt)
        # final 128->1024 layer: BN fuses with the global max-pool (pooled
        # BEFORE normalize — exact, see BNMaxPool; reference conv3+bn3 has
        # no ReLU, pointnet.py:159-161, hence final_relu=False)
        self.dense2 = nn.Dense(1024, dtype=dt)
        self.bnpool2 = BNMaxPool(final_relu=False, dtype=dt)

    def _point_features(self, x, train, mask):
        if self.stn is not None:
            trans = self.stn(x, train=train, mask=mask)
            xyz = jnp.einsum("bnc,bcd->bnd", x[..., : self.space_dims], trans)
            x = jnp.concatenate([xyz, x[..., self.space_dims :]], axis=-1)
        x = self.mlp0(x, train=train)
        if self.fstn is not None:
            ftrans = self.fstn(x, train=train, mask=mask)
            x = jnp.einsum("bnc,bcd->bnd", x, ftrans)
        return x

    def __call__(self, x, train: bool = False, mask: Array | None = None):
        check_train_mask_contract(train, mask)
        x = self._point_features(x, train, mask)
        x = self.mlp1(x, train=train)
        x = self.dense2(x)
        return self.bnpool2(x, train=train, mask=mask)  # (B, 1024)

    def forward_all_features(self, x, train: bool = False, mask: Array | None = None):
        """Per-point (64-d) + tiled global features, (B, N, 64+1024)
        (reference forward_all_features, pointnet.py:166-200)."""
        pointfeat = self._point_features(x, train, mask)
        x = self.mlp1(pointfeat, train=train)
        x = self.dense2(x)
        # relu commutes with the max-pool; re-assert the all-masked sentinel
        # that relu would clamp to 0
        glob = nn.relu(self.bnpool2(x, train=train, mask=mask))
        if mask is not None:
            glob = jnp.where(jnp.any(mask, axis=-1, keepdims=True), glob, _NEG)
        glob_tiled = jnp.broadcast_to(
            glob[:, None, :],
            (pointfeat.shape[0], pointfeat.shape[1], glob.shape[-1]),
        )
        return jnp.concatenate([pointfeat, glob_tiled], axis=-1)
