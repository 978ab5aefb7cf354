"""Fixed-shape, mask-based point-cloud geometry primitives.

Behavioral parity targets (reference, CUDA/torch):
  - square_distance / index_points / query_ball_point / sample_and_group:
    pointcloud_vision/models/pointnet2_utils.py:20-164
  - knn_point: pointcloud_vision/models/pointmlp.py:106-124

TPU-first design notes:
  * Everything is static-shape. Ragged semantics ("drop points outside the
    bbox", "pad groups with the first index") become boolean masks: invalid
    points stay in the array but carry mask=False and are excluded from
    distance competitions by +inf masking.
  * Pairwise distances use the matmul expansion |x|^2 - 2<x,y> + |y|^2 so the
    O(N*M*C) work lands on the MXU; `method='direct'` keeps an exact
    squared-difference path for parity tests (fp32 accumulation order).
  * No atomics anywhere: selections are argmax/top_k reductions, which are
    deterministic on TPU (unlike the reference's atomicAdd/atomicMax kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = jnp.float32(1e10)  # used instead of +inf: keeps top_k/argsort well-defined


def pairwise_sqdist(src: Array, dst: Array, method: str = "matmul") -> Array:
    """Pairwise squared euclidean distance.

    src: (..., N, C), dst: (..., M, C) -> (..., N, M).

    Parity: pointnet2_utils.py:20-41 (same matmul expansion). The result is
    clamped at 0 to remove negative fp round-off, which the reference doesn't
    do — clamping only reduces error vs the exact value.
    """
    if method == "direct":
        diff = src[..., :, None, :] - dst[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # (..., N, 1)
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)  # (..., M, 1)
    # HIGHEST precision: the contraction dim is tiny (C=3..6), so full-fp32
    # MXU passes cost nothing, while the TPU default (bf16 inputs) would
    # break the <=1e-5 chamfer parity target (BASELINE.json).
    cross = jnp.einsum(
        "...nc,...mc->...nm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2), 0.0)


def index_points(points: Array, idx: Array) -> Array:
    """Batched gather: points (B, N, C), idx (B, *I) int -> (B, *I, C).

    Parity: pointnet2_utils.py:44-61.
    """
    B = points.shape[0]
    C = points.shape[-1]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None].astype(jnp.int32), axis=1)
    return out.reshape(*idx.shape, C)


def _select_k(neg_d: Array, k: int, approx: bool | None):
    """Top-k selection for the XLA grouping path.

    Default is EXACT jax.lax.top_k everywhere (VERDICT r1 weak #5): the hot
    TPU grouping path is the fused Pallas kernel (group_neighbors
    impl='pallas'), whose iterative min-extraction is exact by construction,
    so this XLA path no longer carries a perf motive for approximation.
    approx=True opts back into jax.lax.approx_max_k (recall 0.95, ~2.4x
    faster selection on TPU) for non-fused callers that can tolerate it.
    """
    if approx:
        return jax.lax.approx_max_k(neg_d, k, recall_target=0.95)
    return jax.lax.top_k(neg_d, k)


def knn(
    k: int,
    xyz: Array,
    new_xyz: Array,
    mask: Array | None = None,
    approx: bool | None = None,
):
    """k nearest neighbors of each query in `new_xyz` among `xyz`.

    xyz: (B, N, C), new_xyz: (B, S, C), mask: (B, N) bool (True = valid).
    Returns (idx (B, S, k) int32, sqdists (B, S, k)).

    Parity: pointmlp.py:106-124 (knn_point). Masked-out points never win.
    approx=True opts into the TPU approximate selector (~99% recall —
    grouping neighborhoods tolerate it; the reference's own ball query
    keeps arbitrary first-k-by-index members). Exact by default.
    """
    d = pairwise_sqdist(new_xyz, xyz)  # (B, S, N)
    if mask is not None:
        d = jnp.where(mask[..., None, :], d, _BIG)
    neg_d, idx = _select_k(-d, k, approx)
    if mask is not None:
        # Underfilled clouds (< k valid points): pad the empty slots with the
        # nearest valid point instead of surfacing masked points — pins the
        # same semantics as the fused Pallas kernel (grouped_gather), which
        # substitutes the nearest valid point for those slots (ADVICE r2 #1;
        # parity test: tests/test_geometry.py underfilled-mask case).
        underfill = -neg_d >= _BIG
        idx = jnp.where(underfill, idx[..., :1], idx)
        neg_d = jnp.where(underfill, neg_d[..., :1], neg_d)
    return idx.astype(jnp.int32), -neg_d


def ball_query(
    radius: float,
    k: int,
    xyz: Array,
    new_xyz: Array,
    mask: Array | None = None,
    approx: bool | None = None,
):
    """Indices of up to `k` points of `xyz` within `radius` of each query.

    Returns (idx (B, S, k) int32, in_ball (B, S, k) bool). Matches the
    reference exactly (pointnet2_utils.py:93-113): the first k in-radius
    points *by index order* fill the slots, and slots with fewer than k
    in-radius points are padded with the first in-radius index (slot 0,
    the reference's "pad with group_first"). Index-rank selection is also
    what lets the fused Pallas kernel replace per-slot min-extraction with
    one prefix-count + k cheap selector compares (pallas_kernels.
    _group_kernel ball path).
    """
    d = pairwise_sqdist(new_xyz, xyz)  # (B, S, N)
    valid = d <= radius * radius
    if mask is not None:
        valid = jnp.logical_and(valid, mask[..., None, :])
    # first-k-by-index: select the k smallest point indices among the valid
    key = jnp.where(valid, jnp.arange(xyz.shape[1], dtype=jnp.float32), _BIG)
    neg_key, idx = _select_k(-key, k, approx)
    in_ball = -neg_key < _BIG
    idx = jnp.where(in_ball, idx, idx[..., :1])
    return idx.astype(jnp.int32), in_ball


def _use_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _ball_kernel_ok(k: int, n: int) -> bool:
    """Fused ball-mode exactness envelope (ADVICE r3 #1): ranks ride a bf16
    tile (k <= 256) and indices ride bf16 hi/lo channels (N <= 16384);
    outside it dispatch falls back to the XLA ball_query composition."""
    from pointcloud_tpu.ops.pallas_kernels import BALL_MAX_K, BALL_MAX_N

    return k <= BALL_MAX_K and n <= BALL_MAX_N


def group_neighbors(
    xyz: Array,
    feats: Array | None,
    new_xyz: Array,
    k: int,
    radius: float | None = None,
    mask: Array | None = None,
    impl: str = "auto",
    interpret: bool = False,
    approx: bool | None = None,
    with_xyz: bool = True,
):
    """Neighborhood grouping + gather in one step.

    xyz (B, N, 3), feats (B, N, F) or None, new_xyz (B, S, 3) query points.
    radius=None -> kNN (pointmlp.py:106-124 semantics); radius set -> ball
    query with pad-with-nearest (pointnet2_utils.py:93-113 semantics).
    Returns:
      grouped_xyz (B, S, k, 3) — NOT centered; None if with_xyz=False,
      grouped_feats (B, S, k, F) or None,
      idx (B, S, k) int32,
      valid (B, S, k) bool (all True in kNN mode, in-ball flag otherwise).

    with_xyz=False skips grouped_xyz: on the fused kNN path this drops the
    (B, S, k, 3) output whose 3-lane tiles cost 12-byte strided HBM writes
    worth ~half the kernel runtime (LocalGrouper ships use_xyz=False and
    never reads it).

    impl='auto' fuses dist+select+gather into one Pallas program on TPU
    (exact selection — no approx_max_k — one MXU dot per neighbor slot;
    see pallas_kernels._group_kernel); the XLA path is the composition of
    ball_query/knn + index_points and is the parity oracle for tests.
    """
    if impl == "auto":
        impl = "pallas" if (_use_pallas() and feats is not None) else "xla"
    if (impl == "pallas" and feats is not None and radius is None
            and k % 8 == 0):
        # S-major kNN kernel: gathers land in the public row-major
        # (B, S, k, C) layout directly — the (B, k, C, S) legacy kernel
        # forced ~100 MB XLA relayout copies per grouped tensor per step
        # (see pallas_kernels._group_knn_smajor_kernel). Slot order is
        # distance order with lowest-index tie-break (lax.top_k parity);
        # indices come from the in-kernel argmin, so there is no bf16 N
        # ceiling on this path.
        from pointcloud_tpu.ops.pallas_kernels import (
            grouped_gather_knn,
            grouped_gather_knn_feats,
        )

        B, N, _ = xyz.shape
        pen = jnp.zeros((B, N, 1), jnp.float32)
        if mask is not None:
            pen = jnp.where(mask[..., None], 0.0, jnp.float32(1e9))
        valid_shape = (B, new_xyz.shape[1], k)
        if not with_xyz:
            gf, idx = grouped_gather_knn_feats(
                xyz[..., :3], feats, new_xyz, pen, k, interpret
            )
            return (None, gf.astype(feats.dtype), idx,
                    jnp.ones(valid_shape, dtype=bool))
        gx, gf, idx = grouped_gather_knn(
            xyz[..., :3], feats, new_xyz, pen, k, interpret
        )
        valid_b = jnp.ones(idx.shape, dtype=bool)
        return gx.astype(xyz.dtype), gf.astype(feats.dtype), idx, valid_b
    if impl == "pallas" and feats is not None and (
        radius is None or _ball_kernel_ok(k, xyz.shape[1])
    ):
        from pointcloud_tpu.ops.pallas_kernels import grouped_gather

        B, N, _ = xyz.shape
        pen = jnp.zeros((B, N, 1), jnp.float32)
        if mask is not None:
            pen = jnp.where(mask[..., None], 0.0, jnp.float32(1e9))
        gx, gf, idx, valid = grouped_gather(
            xyz[..., :3], feats, new_xyz, pen,
            k, None if radius is None else float(radius), interpret,
        )
        # kernel layout (B, k, C, S) -> public contract (B, S, k, C)
        grouped_xyz = gx.transpose(0, 3, 1, 2).astype(xyz.dtype)
        grouped_feats = gf.transpose(0, 3, 1, 2).astype(feats.dtype)
        valid_b = jnp.swapaxes(valid, 1, 2) > 0.5
        if radius is None:
            valid_b = jnp.ones_like(valid_b)
        if not with_xyz:
            grouped_xyz = None
        return grouped_xyz, grouped_feats, jnp.swapaxes(idx, 1, 2), valid_b

    if radius is None:
        idx, _ = knn(k, xyz, new_xyz, mask=mask, approx=approx)
        valid = jnp.ones(idx.shape, dtype=bool)
    else:
        idx, valid = ball_query(radius, k, xyz, new_xyz, mask=mask, approx=approx)
    grouped_xyz = index_points(xyz[..., :3], idx) if with_xyz else None
    grouped_feats = index_points(feats, idx) if feats is not None else None
    return grouped_xyz, grouped_feats, idx, valid


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: Array,
    features: Array | None,
    mask: Array | None = None,
    use_knn: bool = False,
):
    """FPS-downsample then group local neighborhoods (set-abstraction input).

    xyz: (B, N, 3), features: (B, N, F) or None, mask: (B, N) bool.
    Returns:
      new_xyz (B, npoint, 3) — FPS centroids,
      grouped (B, npoint, nsample, 3+F) — centered xyz (+ features),
      group_mask (B, npoint, nsample) bool,
      new_mask (B, npoint) bool.

    Parity: pointnet2_utils.py:116-144.
    """
    from pointcloud_tpu.ops.fps import farthest_point_sample

    fps_idx = farthest_point_sample(xyz, npoint, mask=mask)  # (B, npoint)
    new_xyz = index_points(xyz, fps_idx)
    if mask is not None:
        new_mask = jnp.take_along_axis(mask, fps_idx, axis=1)
    else:
        new_mask = jnp.ones(fps_idx.shape, dtype=bool)

    if (not use_knn and features is not None and nsample % 8 == 0
            and _use_pallas()
            and _ball_kernel_ok(nsample, xyz.shape[1])):
        # fused fast path: centered-xyz+feature gather lands directly in
        # SetAbstraction's (B, S, K, 3+F) layout — no XLA transpose/concat
        # glue (the S-major kernel; see pallas_kernels.grouped_gather_ball)
        from pointcloud_tpu.ops.pallas_kernels import grouped_gather_ball

        B, N, _ = xyz.shape
        pen = jnp.zeros((B, N, 1), jnp.float32)
        if mask is not None:
            pen = jnp.where(mask[..., None], 0.0, jnp.float32(1e9))
        grouped, _, valid = grouped_gather_ball(
            xyz[..., :3].astype(jnp.float32), features, new_xyz, pen,
            nsample, float(radius),
        )
        group_mask = jnp.logical_and(valid > 0.5, new_mask[..., None])
        return new_xyz, grouped, group_mask, new_mask

    grouped_xyz, grouped_feat, idx, group_mask = group_neighbors(
        xyz, features, new_xyz, nsample,
        radius=None if use_knn else radius, mask=mask,
    )
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if grouped_feat is not None:
        grouped = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    else:
        grouped = grouped_xyz
    group_mask = jnp.logical_and(group_mask, new_mask[..., None])
    return new_xyz, grouped, group_mask, new_mask


def sample_and_group_all(xyz: Array, features: Array | None, mask: Array | None = None):
    """Group the whole cloud into a single neighborhood at the origin.

    Parity: pointnet2_utils.py:147-164.
    Returns new_xyz (B, 1, 3)=0, grouped (B, 1, N, 3+F), group_mask (B, 1, N).
    """
    B, N, _ = xyz.shape
    new_xyz = jnp.zeros((B, 1, 3), dtype=xyz.dtype)
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped = jnp.concatenate([grouped_xyz, features[:, None, :, :]], axis=-1)
    else:
        grouped = grouped_xyz
    if mask is None:
        group_mask = jnp.ones((B, 1, N), dtype=bool)
    else:
        group_mask = mask[:, None, :]
    return new_xyz, grouped, group_mask, jnp.ones((B, 1), dtype=bool)


def three_nn_interpolate(
    xyz_to: Array,
    xyz_from: Array,
    features_from: Array,
    mask_from: Array | None = None,
    eps: float = 1e-8,
):
    """Inverse-distance-weighted 3-NN feature upsampling.

    Parity: PointNetFeaturePropagation core, pointnet2_utils.py:271-321
    (defined but unused by the reference's trained models; provided for
    completeness of the op library).
    xyz_to: (B, N, 3), xyz_from: (B, S, 3), features_from: (B, S, F).
    Returns (B, N, F).
    """
    idx, d = knn(3, xyz_from, xyz_to, mask=mask_from)  # (B, N, 3)
    w = 1.0 / (d + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neighbors = index_points(features_from, idx)  # (B, N, 3, F)
    return jnp.sum(neighbors * w[..., None], axis=-2)
