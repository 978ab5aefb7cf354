"""Ring chamfer: point-sharded chamfer distance over a device mesh.

For clouds too large for one chip (the reference bounds clouds at 2048
points precisely because its losses are single-GPU, SURVEY.md §5), shard the
point axis of BOTH clouds across devices and rotate the target shards around
the ring with `ppermute` — the CUDA kernel's shared-memory tiling loop
(emd_cuda.cu:97-158) lifted to the ICI mesh. Per step, each device holds one
x-shard and one visiting y-shard, updates running minima in both directions,
and passes the (y-shard, running-min) pair to its ring neighbor; after
axis_size steps every pair of shards has met exactly once and each min
vector is back home. Communication is O(points), compute O(N*M/d) per
device, and XLA overlaps the permute with the local matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pointcloud_tpu.ops.geometry import pairwise_sqdist

_BIG = jnp.float32(1e10)


def _ring_chamfer_shard(x_loc, y_loc, xw_loc, yw_loc, axis_name: str):
    """Per-device body (runs under shard_map).

    x_loc: (B, n_loc, 3), y_loc: (B, m_loc, 3); xw/yw: (B, n_loc)/(B, m_loc)
    validity weights (1 = valid). Returns the (scalar) global chamfer mean
    via psum-averaged directed masked means.
    """
    d = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % d) for j in range(d)]

    min_x = jnp.full(x_loc.shape[:2], _BIG)  # nearest-y dist for my x points
    y_cur, yw_cur = y_loc, yw_loc
    min_y_cur = jnp.full(y_loc.shape[:2], _BIG)  # travels with its y shard

    for _ in range(d):
        dmat = pairwise_sqdist(x_loc, y_cur)  # (B, n_loc, m_loc)
        dmat_for_x = jnp.where(yw_cur[:, None, :] > 0.5, dmat, _BIG)
        dmat_for_y = jnp.where(xw_loc[:, :, None] > 0.5, dmat, _BIG)
        min_x = jnp.minimum(min_x, jnp.min(dmat_for_x, axis=2))
        min_y_cur = jnp.minimum(min_y_cur, jnp.min(dmat_for_y, axis=1))
        y_cur, yw_cur, min_y_cur = jax.lax.ppermute(
            (y_cur, yw_cur, min_y_cur), axis_name, perm
        )
    # after d rotations min_y_cur is home again and covers all x shards
    sum_x = jax.lax.psum(jnp.sum(min_x * xw_loc, axis=1), axis_name)  # (B,)
    cnt_x = jax.lax.psum(jnp.sum(xw_loc, axis=1), axis_name)
    sum_y = jax.lax.psum(jnp.sum(min_y_cur * yw_loc, axis=1), axis_name)
    cnt_y = jax.lax.psum(jnp.sum(yw_loc, axis=1), axis_name)
    cham_x = sum_x / jnp.maximum(cnt_x, 1.0)
    cham_y = sum_y / jnp.maximum(cnt_y, 1.0)
    return jnp.mean(cham_x + cham_y)


def ring_chamfer(
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh | None = None,
    axis_name: str = "points",
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
):
    """Chamfer distance with the point axis sharded over `mesh`.

    x: (B, N, 3), y: (B, M, 3); N and M must divide the mesh size. Optional
    (B, N)/(B, M) bool masks reproduce the ragged semantics of
    ops.chamfer.chamfer_distance. Returns the same scalar (pytorch3d
    convention).
    """
    import numpy as np

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis_name,))

    xw = (
        jnp.ones(x.shape[:2], jnp.float32)
        if x_mask is None
        else x_mask.astype(jnp.float32)
    )
    yw = (
        jnp.ones(y.shape[:2], jnp.float32)
        if y_mask is None
        else y_mask.astype(jnp.float32)
    )
    fn = jax.shard_map(
        functools.partial(_ring_chamfer_shard, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None),
            P(None, axis_name, None),
            P(None, axis_name),
            P(None, axis_name),
        ),
        out_specs=P(),
    )
    return fn(x.astype(jnp.float32), y.astype(jnp.float32), xw, yw)
