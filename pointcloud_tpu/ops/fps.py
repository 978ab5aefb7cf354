"""Farthest point sampling (FPS), batch-parallel and jit-compiled.

Replaces the reference's external CUDA kernels (pointnet2_ops
`furthest_point_sample`, pointnet2_utils.py:6,89-90, and pytorch3d
`sample_farthest_points`, utils.py:90, pointmlp.py:158). The reference notes
its pure-Python loop is >300x slower than CUDA (pointnet2_utils.py:88) —
here the K-step selection loop runs entirely on-device inside one XLA
`fori_loop` (sequential in K, parallel over batch and N), so there is no
per-step dispatch overhead. A Pallas kernel that pins the running-distance
vector in VMEM covers the large-N sensor path (ops/pallas_kernels.py).

Determinism: selection starts at `start_idx` (default 0, matching
pointnet2_ops and pytorch3d's random_start_point=False) and ties resolve to
the lowest index via argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _use_pallas() -> bool:
    """Pick the Pallas kernel on TPU backends (incl. the axon plugin)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def farthest_point_sample(
    xyz: Array,
    npoint: int,
    mask: Array | None = None,
    start_idx: int = 0,
    impl: str = "auto",
) -> Array:
    """Select `npoint` indices spreading maximally over the cloud.

    xyz: (B, N, 3[+]) — distances use the first 3 coordinate dims on the
    Pallas path and all dims on the XLA path (models pass xyz-only).
    mask: (B, N) bool; masked-out points are never selected. If fewer than
    `npoint` valid points exist, valid points are repeated (static shapes).
    impl: 'auto' (Pallas on TPU, XLA elsewhere) | 'pallas' | 'xla'.
    Returns int32 indices (B, npoint).
    """
    if impl == "auto":
        impl = "pallas" if (_use_pallas() and start_idx == 0) else "xla"
    if impl == "pallas":
        from pointcloud_tpu.ops.pallas_kernels import farthest_point_sample_pallas

        return farthest_point_sample_pallas(xyz, npoint, mask=mask)
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if mask is None:
        valid = jnp.ones((B, N), dtype=bool)
    else:
        valid = mask
    # Running min squared distance to the selected set. Invalid points are
    # pinned to -1 so the argmax (which only ever sees >= 0 for valid points)
    # cannot pick them while any valid point remains.
    mind = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))

    first = jnp.where(
        valid[:, start_idx], jnp.int32(start_idx), jnp.argmax(valid, axis=1).astype(jnp.int32)
    )
    idxs = jnp.zeros((B, npoint), dtype=jnp.int32).at[:, 0].set(first)

    def body(i, carry):
        mind, idxs = carry
        last = jax.lax.dynamic_slice_in_dim(idxs, i - 1, 1, axis=1)  # (B, 1)
        last_xyz = jnp.take_along_axis(xyz, last[..., None], axis=1)  # (B, 1, C)
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # (B, N)
        mind = jnp.where(valid, jnp.minimum(mind, d), -1.0)
        nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)
        idxs = jax.lax.dynamic_update_slice_in_dim(idxs, nxt[:, None], i, axis=1)
        return mind, idxs

    if npoint > 1:
        _, idxs = jax.lax.fori_loop(1, npoint, body, (mind, idxs))
    return idxs


def farthest_point_sample_xyz(
    xyz: Array, npoint: int, mask: Array | None = None, start_idx: int = 0
):
    """Convenience wrapper returning (sampled points, indices).

    Mirrors pytorch3d.ops.sample_farthest_points' (points, idx) return
    (used at reference utils.py:90).
    """
    idx = farthest_point_sample(xyz, npoint, mask=mask, start_idx=start_idx)
    pts = jnp.take_along_axis(xyz, idx[..., None].astype(jnp.int32), axis=1)
    return pts, idx
