"""Attribute the fused kNN grouping forward's time (VERDICT r4 task 5).

Three kernels with the production tiling (feats-only, bf16, bb bands):
  full     — the shipped _group_knn_smajor_kernel via grouped_gather_knn_feats
  extract  — distances + k argmin-extraction passes, idx output only
             (no one-hot stores, no gather dots, no grouped-feats DMA)
  gather   — distances + k/8 stacked one-hot builds + gather dots + stores,
             with the argmin extraction replaced by a cyclic fake selector
             (index = (slot*131 + row) % N — same one-hot/store/DMA cost,
             no min-extraction chain)

full - extract ~= gather-dot + emission cost; extract - (distance pass)
~= the VPU min-extraction chain. Stage shapes are PointMLP's LocalGrouper
calls at B=32 (reference pointmlp.py:106-124 drives the same shapes).

Usage: python benchmarks/knn_attrib.py [B] [stage...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_tpu.ops.pallas_kernels import grouped_gather_knn_feats

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
stages = [int(s) for s in sys.argv[2:]] or [1, 2, 3, 4]
K = 24
# PointMLP LocalGrouper shapes: (S, N, F)
SHAPES = {1: (1024, 2048, 64), 2: (512, 1024, 128),
          3: (256, 512, 256), 4: (128, 256, 512)}


def _tiling(S, N, Bb):
    s_tile = min(256, S, max(8, (10 << 20) // (8 * N * 4)))
    s_tile = 1 << (s_tile.bit_length() - 1)
    while S % s_tile:
        s_tile //= 2
    rows_budget = max(8, (2 << 20) // (N * 4))
    bb = max(1, min(8, rows_budget // s_tile))
    while Bb % bb:
        bb -= 1
    return s_tile, bb


def _extract_kernel(xyz_ref, cents_ref, pen_ref, idx_ref, d_ref, cv_ref,
                    *, k, n, s_tile, bb):
    BIG = jnp.float32(1e9)
    ones_n = jnp.ones((n, 1), jnp.bfloat16)
    for u in range(bb):
        acc = pen_ref[u, 0:1, :]
        for c in range(3):
            diff = cents_ref[u, :, c:c + 1] - xyz_ref[u, c:c + 1, :]
            acc = acc + diff * diff
        d_ref[u * s_tile:(u + 1) * s_tile, :] = acc
    cv_ref[:, :] = jax.lax.dot_general(
        (d_ref[:, :] < 0.5 * BIG).astype(jnp.bfloat16), ones_n,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = bb * s_tile
    laneid_r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    kiota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def slot(j, idxt):
        d = d_ref[:, :]
        m = jnp.min(d, axis=1, keepdims=True)
        im = jnp.min(
            jnp.where(d == m, laneid_r, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        d_ref[:, :] = jnp.where(laneid_r == im, BIG, d)
        return jnp.where(kiota_r == j, im, idxt)

    idxt = jax.lax.fori_loop(0, k, slot, jnp.zeros((rows, k), jnp.int32))
    for u in range(bb):
        idx_ref[u:u + 1, :, :] = idxt[
            u * s_tile:(u + 1) * s_tile, :
        ].reshape(1, s_tile, k)


def _gather_kernel(xyz_ref, cents_ref, p_ref, pen_ref, gf_ref, idx_ref,
                   d_ref, sel_ref, *, k, n, s_tile, n_feat, bb):
    # distance pass kept (same DMA in), then FAKE selection: one-hot at a
    # data-independent lane — same one-hot build/store/gather/DMA-out cost,
    # zero min-extraction work.
    pdt = p_ref.dtype
    for u in range(bb):
        acc = pen_ref[u, 0:1, :]
        for c in range(3):
            diff = cents_ref[u, :, c:c + 1] - xyz_ref[u, c:c + 1, :]
            acc = acc + diff * diff
        d_ref[u * s_tile:(u + 1) * s_tile, :] = acc
    rows = bb * s_tile
    laneid_r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    rowid_r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0)
    kiota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def group(jg, idxt):
        j0 = jg * 8
        for v in range(8):
            im = ((j0 + v) * 131 + rowid_r[:, 0:1]) % n
            one = laneid_r == im
            oh = one.astype(pdt)
            for u in range(bb):
                sel_ref[(u * 8 + v) * s_tile:(u * 8 + v + 1) * s_tile, :] = \
                    oh[u * s_tile:(u + 1) * s_tile, :]
            idxt = jnp.where(kiota_r == (j0 + v), im, idxt)
        for u in range(bb):
            gat = jax.lax.dot_general(
                sel_ref[u * 8 * s_tile:(u + 1) * 8 * s_tile, :],
                p_ref[u, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8*s_tile, F)
            gf_ref[u:u + 1, :, pl.ds(j0, 8), :] = (
                gat.reshape(8, s_tile, n_feat)
                .transpose(1, 0, 2)
                .astype(gf_ref.dtype)
                .reshape(1, s_tile, 8, n_feat)
            )
        return idxt

    idxt = jax.lax.fori_loop(
        0, k // 8, group, jnp.zeros((rows, k), jnp.int32)
    )
    for u in range(bb):
        idx_ref[u:u + 1, :, :] = idxt[
            u * s_tile:(u + 1) * s_tile, :
        ].reshape(1, s_tile, k)


def build(mode, S, N, F):
    s_tile, bb = _tiling(S, N, B)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((B, N, 3), np.float32))
    feats = jnp.asarray(rng.random((B, N, F), np.float32)).astype(jnp.bfloat16)
    cents = jnp.asarray(rng.random((B, S, 3), np.float32))
    pen = jnp.zeros((B, N, 1), jnp.float32)

    if mode == "full":
        def f(xyz, feats, cents, pen):
            gf, idx = grouped_gather_knn_feats(xyz, feats, cents, pen, K)
            return (jnp.sum(gf.astype(jnp.float32))
                    + jnp.sum(idx.astype(jnp.float32)))
        return jax.jit(f), (xyz, feats, cents, pen), dict(s_tile=s_tile, bb=bb)

    xyz_t = jnp.swapaxes(xyz, 1, 2)
    pen_t = jnp.swapaxes(pen, 1, 2)
    if mode == "extract":
        kern = functools.partial(
            _extract_kernel, k=K, n=N, s_tile=s_tile, bb=bb)
        call = pl.pallas_call(
            kern,
            grid=(B // bb, S // s_tile),
            in_specs=[
                pl.BlockSpec((bb, 3, N), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((bb, s_tile, 3), lambda b, s: (b, s, 0)),
                pl.BlockSpec((bb, 1, N), lambda b, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bb, s_tile, K), lambda b, s: (b, s, 0)),
            out_shape=jax.ShapeDtypeStruct((B, S, K), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((bb * s_tile, N), jnp.float32),
                pltpu.VMEM((bb * s_tile, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20),
        )

        def f(xyz_t, cents, pen_t):
            idx = call(xyz_t, cents, pen_t)
            return jnp.sum(idx.astype(jnp.float32))
        return jax.jit(f), (xyz_t, cents, pen_t), dict(s_tile=s_tile, bb=bb)

    if mode == "gather":
        kern = functools.partial(
            _gather_kernel, k=K, n=N, s_tile=s_tile, n_feat=F, bb=bb)
        call = pl.pallas_call(
            kern,
            grid=(B // bb, S // s_tile),
            in_specs=[
                pl.BlockSpec((bb, 3, N), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((bb, s_tile, 3), lambda b, s: (b, s, 0)),
                pl.BlockSpec((bb, N, F), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((bb, 1, N), lambda b, s: (b, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((bb, s_tile, K, F), lambda b, s: (b, s, 0, 0)),
                pl.BlockSpec((bb, s_tile, K), lambda b, s: (b, s, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, S, K, F), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, S, K), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((bb * s_tile, N), jnp.float32),
                pltpu.VMEM((bb * 8 * s_tile, N), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20),
        )

        def f(xyz_t, cents, feats, pen_t):
            gf, idx = call(xyz_t, cents, feats, pen_t)
            return (jnp.sum(gf.astype(jnp.float32))
                    + jnp.sum(idx.astype(jnp.float32)))
        return jax.jit(f), (xyz_t, cents, feats, pen_t), \
            dict(s_tile=s_tile, bb=bb)
    raise ValueError(mode)


def bench(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain reps inside one jit to dodge relay dedup

    @jax.jit
    def chained(*args):
        acc = jnp.float32(0.0)
        a0 = args[0]
        for _ in range(iters):
            acc = acc + fn(*((a0 + acc * 1e-20,) + args[1:]))
        return acc
    r = chained(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = chained(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B} k={K}")
    tot = {m: 0.0 for m in ("full", "extract", "gather")}
    for st in stages:
        S, N, F = SHAPES[st]
        row = [f"stage{st} ({S}x{N} F={F})"]
        for mode in ("full", "extract", "gather"):
            fn, args, t = build(mode, S, N, F)
            ms = bench(fn, args)
            tot[mode] += ms
            row.append(f"{mode} {ms:6.2f} ms (bb={t['bb']})")
        print("  ".join(row), flush=True)
    print("TOTALS  " + "  ".join(f"{m} {v:6.2f} ms" for m, v in tot.items()))
