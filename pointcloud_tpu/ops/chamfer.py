"""Chamfer distance with masked (ragged-equivalent) support.

Replaces pytorch3d.loss.chamfer_distance (reference utils.py:10,211,228).
The pytorch3d convention is reproduced exactly:

    cham(x, y) = batch_mean( point_mean_i min_j ||x_i - y_j||^2 )
               + batch_mean( point_mean_j min_i ||x_i - y_j||^2 )

with optional per-cloud validity masks standing in for pytorch3d's
`x_lengths`/`y_lengths` ragged support (used by FilteringChamferDistance,
reference utils.py:213-228): masked-out points neither compete as targets
nor contribute to the point means.

The pairwise distance matrix rides the MXU via the matmul expansion; for
clouds too large to materialize (B, N, M), `pallas_kernels.min_sqdist`
streams tiles flash-attention-style.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.geometry import pairwise_sqdist, _BIG

Array = jax.Array


def _masked_mean(values: Array, mask: Array | None, axis: int):
    if mask is None:
        return jnp.mean(values, axis=axis)
    mask = mask.astype(values.dtype)
    total = jnp.sum(values * mask, axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return total / count


def masked_chamfer(
    x: Array,
    y: Array,
    x_mask: Array | None = None,
    y_mask: Array | None = None,
    method: str = "matmul",
):
    """Per-batch-element directed chamfer means.

    x: (B, N, C), y: (B, M, C). Returns (cham_x (B,), cham_y (B,)) where
    cham_x = mean over valid x of min sqdist to valid y, and vice versa.
    """
    d = pairwise_sqdist(x, y, method=method)  # (B, N, M)
    d_for_x = d if y_mask is None else jnp.where(y_mask[:, None, :], d, _BIG)
    d_for_y = d if x_mask is None else jnp.where(x_mask[:, :, None], d, _BIG)
    min_x = jnp.min(d_for_x, axis=2)  # (B, N) nearest valid y for each x
    min_y = jnp.min(d_for_y, axis=1)  # (B, M) nearest valid x for each y
    cham_x = _masked_mean(min_x, x_mask, axis=1)
    cham_y = _masked_mean(min_y, y_mask, axis=1)
    return cham_x, cham_y


def chamfer_distance(
    x: Array,
    y: Array,
    x_mask: Array | None = None,
    y_mask: Array | None = None,
    batch_reduction: str | None = "mean",
    method: str = "matmul",
):
    """pytorch3d-compatible chamfer loss (scalar by default).

    batch_reduction: 'mean' | 'sum' | None (None returns (B,) per element).
    """
    cham_x, cham_y = masked_chamfer(x, y, x_mask, y_mask, method=method)
    per_batch = cham_x + cham_y
    if batch_reduction == "mean":
        return jnp.mean(per_batch)
    if batch_reduction == "sum":
        return jnp.sum(per_batch)
    return per_batch
