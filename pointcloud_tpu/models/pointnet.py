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
            # clamp: E[x^2]-E[x]^2 can go slightly negative in fp32 for
            # near-constant channels with large mean -> NaN through rsqrt
            var = jnp.maximum(jnp.mean(xf * xf, axis=red) - mean * mean, 0.0)
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


class DenseBNMaxPool(nn.Module):
    """Dense + BNMaxPool in one module, with a fused Pallas path on TPU.

    Semantics are exactly `BNMaxPool(final_relu)(nn.Dense(features)(x))`:
    the pre-pool dense output exists only as streamed tiles on TPU
    (ops/dense_bn_pool.py — forward accumulates BN stats + per-block masked
    max/min/argmax without materializing z in HBM; the custom VJP
    reconstructs dz = dssum + 2*dssq*z + sparse tile-wise), which removes
    the (B, N, 1024)-sized HBM tensors of every pre-pool layer from both
    passes. Elsewhere (CPU tests) an unfused XLA oracle with identical
    semantics feeds the same normalization code.

    Input (..., R, Cin): 3-D pools the whole R axis -> (..., C); 4-D
    (B, S, K, Cin) pools K per group -> (B, S, C). mask matches the input
    minus the channel dim.
    """

    features: int
    final_relu: bool = False
    use_bias: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None,
                 impl: str = "auto", interpret: bool = False):
        from pointcloud_tpu.ops.dense_bn_pool import dense_pool_stats

        C = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], C), jnp.float32,
        )
        dbias = (
            self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
            if self.use_bias
            else jnp.zeros((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        offset = self.param("offset", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (C,), jnp.float32
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (C,), jnp.float32
        )

        dt = self.dtype if self.dtype is not None else x.dtype
        lead = x.shape[:-2]
        pool = x.shape[-2]
        n_rows = x.size // x.shape[-1]  # all rows, every leading dim

        if impl == "auto":
            # The kernel's win is avoiding the stats passes and the dz
            # materialization in TRAIN, and it only beats XLA's batched
            # matmul when the pre-pool z is large enough that those passes
            # dominate (measured crossover ~2e8 elements: PointNet@B=256 is
            # 5.4e8 and gains 15%, PointNet2 SA@B=64 is 1.3e8 and loses
            # ~7%). Eval always takes XLA's single big fused matmul + pool.
            big = n_rows * C >= int(2e8)
            impl = "fused" if (train and big and _use_fused_pool()) else "xla"

        if impl == "fused":
            if x.ndim == 4:  # (B, S, K, Cin): K-blocks within each batch row
                xr = x.reshape(x.shape[0], -1, x.shape[-1])
            else:  # (B, R, Cin): one block spanning all R rows
                xr = x
            B2, R = xr.shape[0], xr.shape[1]
            pen = (
                jnp.where(mask.reshape(B2, R), jnp.float32(0.0),
                          jnp.float32(1e9))
                if mask is not None
                else None
            )
            # the kernel pools sign*z once (one reduction + one argmax
            # instead of max AND min chains); un-sign here — exact, and
            # identical to where(scale >= 0, max(z), min(z))
            sgn = jax.lax.stop_gradient(
                jnp.where(scale >= 0, jnp.float32(1.0), jnp.float32(-1.0))
            )
            psel, _, ssum, ssq = dense_pool_stats(
                xr.astype(dt), kernel.astype(dt), dbias.astype(dt), sgn,
                pen, pool, interpret,
            )
            sel = (sgn.astype(dt) * psel).reshape(*lead, C)
        else:
            # plain XLA in native shape — exactly nn.Dense + BNMaxPool's ops
            z = (
                jnp.einsum("...i,ic->...c", x.astype(dt), kernel.astype(dt))
                + dbias.astype(dt)
            ).astype(dt)
            zf = z.astype(jnp.float32)
            ssum = jnp.sum(zf, axis=tuple(range(z.ndim - 1)))
            ssq = jnp.sum(zf * zf, axis=tuple(range(z.ndim - 1)))
            if mask is not None:
                m = jnp.expand_dims(mask, -1)
                pmax = jnp.max(jnp.where(m, z, jnp.asarray(_NEG, dt)), axis=-2)
                pmin = jnp.min(jnp.where(m, z, jnp.asarray(-_NEG, dt)), axis=-2)
            else:
                pmax = jnp.max(z, axis=-2)
                pmin = jnp.min(z, axis=-2)
            sel = jnp.where(scale >= 0, pmax, pmin)  # (*lead, C)

        if train:
            count = float(n_rows)
            mean = ssum / count
            # clamp: fp32 cancellation guard (see BNMaxPool)
            var = jnp.maximum(ssq / count - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = sel.astype(dt) - mean.astype(dt)
        mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.epsilon, dt))
        y = y * (mul * scale.astype(dt)) + offset.astype(dt)
        if self.final_relu:
            y = nn.relu(y)
        if mask is not None:
            # all-masked rows keep the masked_max sentinel (pre-BN semantics)
            y = jnp.where(jnp.any(mask, axis=-1)[..., None], y, _NEG)
        return y


def _use_fused_pool() -> bool:
    import os

    if os.environ.get("PCTPU_DISABLE_FUSED_POOL"):  # escape hatch / A-B runs
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


class MLPChainPool(nn.Module):
    """L Dense+BN(+ReLU) layers then a masked global max-pool, as ONE fused
    chain on the TPU train path.

    Semantics == `PointwiseMLP(features[:-1]) + DenseBNMaxPool(features[-1],
    final_relu=final_relu)` (reference pointnet.py:152-165: conv1/conv2 with
    ReLU, conv3+bn3 WITHOUT, then the global pool): each mid layer is
    Dense -> BatchNorm -> ReLU, the last layer's post-BN pre-relu values
    max-pool over the whole point axis (exactly where(scale>=0, max z,
    min z) then normalize — BN is per-channel monotone affine), and
    final_relu optionally rectifies the pooled vector.

    In train mode on TPU the whole chain rides ops/preextract_fused.
    mlp_pool_fused (plain-chain mode): BN statistics accumulate in each
    matmul's epilogue and the post-BN (B, N, C) tensors never reach HBM —
    the same machinery as PointNet2's SetAbstraction.

    NEGATIVE RESULT (r5, measured): for PointNet's own 64->128->1024
    whole-cloud chains this LOSES to the PointwiseMLP + DenseBNMaxPool
    composition — 5.10/10.94 ms fwd+bwd (B=32/256) vs 4.08/9.08. A
    whole-cloud pool admits only bb=1 (single-static-tile 8-aligned
    passes), so the chain pays ~B grid steps of per-step overhead per
    pass, while dense_pool_stats batch-blocks and XLA already handles
    narrow BN layers well. The encoder therefore keeps the composition;
    this module remains for chains whose pool windows are small relative
    to the row count (where bb can stay > 1).

    Dense layers are bias-free: a pre-BN bias is exactly absorbed by the
    normalization in train mode and receives exactly-zero gradient, so it is
    a no-op degree of freedom the reference's Conv1d layers carry
    redundantly (same argument as SetAbstraction).

    Input (B, N, Cin) -> (B, features[-1]). Masked points are excluded from
    the pool but feed BN statistics (check_train_mask_contract); all-masked
    rows emit the -1e9 sentinel.
    """

    features: tuple
    final_relu: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Array | None = None,
                 interpret: bool = False):
        from pointcloud_tpu.ops.preextract_fused import (
            EPS,
            mlp_pool_fused,
            mlp_pool_reference,
        )

        B, N, Cin = x.shape
        layout = []
        ci = Cin
        for f in self.features:
            layout.append((ci, f))
            ci = f
        ws, gs, os_, ras = [], [], [], []
        for i, (cin, co) in enumerate(layout):
            ws.append(self.param(
                f"w{i}", nn.initializers.lecun_normal(), (cin, co),
                jnp.float32,
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
        xr = x.astype(dt)
        pen = (
            jnp.where(mask, jnp.float32(0.0), jnp.float32(1e9))
            if mask is not None
            else jnp.zeros((B, N), jnp.float32)
        )
        n = float(B * N)

        if train:
            C_last = self.features[-1]
            # N * C_last <= 2M elements: a whole-cloud pool admits only the
            # single-static-tile form of the 8-aligned kernel passes
            # (ops/preextract_fused._row_tile); larger clouds fall back to
            # the XLA reference path rather than blowing the VMEM budget
            fused = (
                _use_fused_pool() and B * N * C_last >= int(1e7)
                and N * C_last <= 4 * 512 * 1024
                and not interpret
            ) or interpret
            impl = mlp_pool_fused if fused else mlp_pool_reference
            kw = {"interpret": interpret} if fused else {}
            out, stats = impl(
                xr, tuple(ws), tuple(gs), tuple(os_), pen, N,
                final_relu=self.final_relu, **kw,
            )
            if not self.is_initializing():
                for (ram, rav), (ss, sq) in zip(ras, stats):
                    mean = ss / n
                    var = jnp.maximum(sq / n - mean * mean, 0.0)
                    ram.value = (self.momentum * ram.value
                                 + (1.0 - self.momentum) * mean)
                    rav.value = (self.momentum * rav.value
                                 + (1.0 - self.momentum) * var)
            return out[:, 0, :].astype(dt)  # (B, C_last)

        # eval: running statistics (same structure as SetAbstraction eval)
        def dense(a, w):
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

        h = dense(xr, ws[0])
        pre = bn_pre(h, 0)
        for u in range(1, len(layout)):
            a = jnp.maximum(pre, 0.0).astype(dt)
            h = dense(a, ws[u])
            pre = bn_pre(h, u)
        v = pre - pen[..., None]
        mx = jnp.max(v, axis=1)  # (B, C_last)
        out = jnp.maximum(mx, 0.0) if self.final_relu else mx
        out = jnp.where(mx < -5e8, _NEG, out)
        return out.astype(dt)


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
        h = DenseBNMaxPool(1024, final_relu=True, dtype=self.dtype)(
            h, train=train, mask=mask
        )  # (B, 1024)
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
        # final 128->1024 layer: Dense+BN fuse with the global max-pool
        # (pooled BEFORE normalize — exact, see BNMaxPool/DenseBNMaxPool;
        # reference conv3+bn3 has no ReLU, pointnet.py:159-161).
        # NOT the MLPChainPool fused chain: measured A/B (r5) has this
        # composition at 4.08/9.08 ms fwd+bwd (B=32/256) vs the chain's
        # 5.10/10.94 — the whole-cloud pool forces the chain to bb=1 and
        # ~B grid steps of per-step overhead, while dense_pool_stats
        # batch-blocks freely and XLA handles the 64/128-wide BN layers.
        self.dbnpool2 = DenseBNMaxPool(1024, final_relu=False, dtype=dt)

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
        return self.dbnpool2(x, train=train, mask=mask)  # (B, 1024)

    def forward_all_features(self, x, train: bool = False, mask: Array | None = None):
        """Per-point (64-d) + tiled global features, (B, N, 64+1024)
        (reference forward_all_features, pointnet.py:166-200)."""
        pointfeat = self._point_features(x, train, mask)
        x = self.mlp1(pointfeat, train=train)
        # relu commutes with the max-pool; re-assert the all-masked sentinel
        # that relu would clamp to 0
        glob = nn.relu(self.dbnpool2(x, train=train, mask=mask))
        if mask is not None:
            glob = jnp.where(jnp.any(mask, axis=-1, keepdims=True), glob, _NEG)
        glob_tiled = jnp.broadcast_to(
            glob[:, None, :],
            (pointfeat.shape[0], pointfeat.shape[1], glob.shape[-1]),
        )
        return jnp.concatenate([pointfeat, glob_tiled], axis=-1)
