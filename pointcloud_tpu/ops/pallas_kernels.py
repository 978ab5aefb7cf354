"""Pallas TPU kernels for the hot geometry ops.

farthest_point_sample_pallas: the XLA fori_loop FPS (ops/fps.py) round-trips
the (B, N) running-distance vector through HBM on every one of the K
sequential steps and pays per-step fusion overhead. This kernel runs the
whole selection loop inside ONE program with the cloud and the running
distances pinned in VMEM — the TPU analog of the reference's shared-memory
CUDA FPS (pointnet2_ops, models/pointnet2_utils.py:6).

Layout: coordinates are fed as (3, B, N) so each coordinate plane is a
(B, N) tile — batch on sublanes, points on lanes. Every step is a handful of
(B, N) VPU ops + a per-row lane argmax; the selected index is materialized
into the (B, K) output with a masked vector write (TPU VMEM rejects scalar
stores), and the previous selection is re-read with a masked reduction (TPU
rejects dynamic lane indexing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, mask_ref, idx_ref, mind_ref, *, npoint, n, b):
    # xyz_ref: (3, B, N) f32; mask_ref: (B, N) f32 (1=valid);
    # idx_ref: (B, K) i32 out; mind_ref: (B, N) f32 scratch.
    # Loop-body design notes (each avoids a Mosaic slow path):
    #   * the selected point's coords are CARRIED through the fori_loop as
    #     (B, 1) vectors — no re-reading indices back from idx_ref;
    #   * selection is max + min-lane-where-equal (deterministic lowest-index
    #     tie-break, matching ops/fps.py's argmax) — plain lane reductions;
    #   * gathers/stores use masked vector ops (no dynamic lane indexing,
    #     no scalar VMEM stores).
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    valid = mask_ref[:, :] > 0.5
    mind_ref[:, :] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    def gather(plane, sel):
        return jnp.sum(jnp.where(sel, plane, 0.0), axis=1, keepdims=True)

    # first selection per row: index 0 if valid, else the first valid index
    first_valid = jnp.min(
        jnp.where(valid, lane_ids, n), axis=1, keepdims=True
    ).astype(jnp.int32)
    first = jnp.where(valid[:, :1], jnp.int32(0), first_valid)  # (B, 1)
    idx_ref[:, :] = jnp.where(k_ids == 0, first, jnp.int32(0))
    sel0 = lane_ids == first

    def body(i, carry):
        lx, ly, lz = carry
        dx = x - lx
        dy = y - ly
        dz = z - lz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:, :], d)
        mind = jnp.where(valid, mind, -1.0)
        mind_ref[:, :] = mind
        m = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(mind == m, lane_ids, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        idx_ref[:, :] = jnp.where(k_ids == i, nxt, idx_ref[:, :])
        sel = lane_ids == nxt
        return gather(x, sel), gather(y, sel), gather(z, sel)

    jax.lax.fori_loop(
        1, npoint, body, (gather(x, sel0), gather(y, sel0), gather(z, sel0))
    )


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def farthest_point_sample_pallas(
    xyz: jax.Array,
    npoint: int,
    mask: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas FPS: xyz (B, N, 3[+]) -> int32 indices (B, npoint).

    Semantics identical to ops.fps.farthest_point_sample (deterministic,
    start index 0, mask-aware, repeats valid points when under-full).
    """
    B, N, _ = xyz.shape
    xyz_t = jnp.moveaxis(xyz[..., :3].astype(jnp.float32), -1, 0)  # (3, B, N)
    if mask is None:
        mask_f = jnp.ones((B, N), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=N, b=B)
    # rows pad to 8-sublane tiles and the loop body needs temporaries of the
    # same footprint — budget generously (VMEM is 128 MB on v5e; the working
    # set is ~5 (B, N) fp32 planes)
    padded_b = -(-B // 8) * 8
    vmem_bytes = 16 * padded_b * N * 4 + 8 * padded_b * npoint + (4 << 20)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 128 * 1024 * 1024)
        ),
        interpret=interpret,
    )(xyz_t, mask_f)
