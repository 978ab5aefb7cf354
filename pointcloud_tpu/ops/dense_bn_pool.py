"""Fused Dense -> (BatchNorm stats) -> signed block max pool, Pallas TPU.

The pre-pool Dense output `z = x @ W + bias` of every 1024-wide PointNet /
PointNet2 layer is consumed ONLY by (a) BatchNorm batch statistics and
(b) the max-pool (BNMaxPool pools raw z, models/pointnet.py). Unfused, z is
a (B, N, 1024) HBM tensor (1 GB at B=256) written once and re-read by the
stats and pooling passes, and the backward materializes a same-sized dz.
This kernel streams row tiles through the MXU and reduces them on the fly —
z NEVER exists in HBM, forward or backward.

Sign folding: BNMaxPool needs max(z) on channels whose BN scale >= 0 and
min(z) on the rest (BN is per-channel monotone affine; pool-then-normalize
is exact — models/pointnet.py). Instead of computing BOTH pooled extrema
and selecting outside (two reductions + two argmax chains per tile, the
dominant VPU cost of the pass), the caller passes s = sign(scale) in
{+1, -1} per channel and the kernel pools s*z ONCE:

  forward:  per tile  z_t = x_t @ W + bias  ->  accumulate fp32 sum/sumsq
            (BN stats, ALL rows incl. masked — the documented model
            contract), per-block max of s*z - pen + lowest-index argmax.
  backward: dz has the closed form  dssum_c + 2*dssq_c*z + s * sparse
            where the sparse part touches one argmax row per
            (block, channel); each tile recomputes z_t, forms dz_t in VMEM,
            and feeds the dx / dW matmuls directly.

The caller recovers its selected extremum as s * psel (exact: sign flips
are exact in IEEE). The BN normalization itself runs OUTSIDE on the pooled
(B, nb, C) values, so this op is purely `(pooled raw stats) = f(x, W,
bias)` with a custom VJP, and plain autodiff handles every
gamma/beta/mean/var path on small tensors.

Tie-break: the argmax keeps the lowest index (deterministic); jnp.max's
autodiff splits gradients evenly across exact ties instead — identical for
real-valued data, documented divergence on exact ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
_TILE_BUDGET_EL = 2 * 1024 * 1024  # z-tile element budget (patched in tests)


def _row_tile(rows: int, pool: int, C: int) -> int:
    """Largest multiple of `pool` dividing `rows` with tile*C <= ~2M el.

    Multi-tile passes store pooled rows at dynamic sublane offsets, which
    Mosaic only accepts at provable multiples of 8 — so a multi-tile bpt is
    either a multiple of 8 or collapses to 1 (the kernels then place/read
    the single pooled row with a masked RMW over the whole output block)."""
    bpt = max(1, _TILE_BUDGET_EL // max(C * pool, 1))
    bpt = min(bpt, rows // pool)
    while (rows // pool) % bpt:
        bpt -= 1
    if bpt != rows // pool and bpt % 8:
        while bpt > 1 and ((rows // pool) % bpt or bpt % 8):
            bpt -= 1
        if bpt % 8:
            bpt = 1
    return bpt * pool


def _bb(B0, R0, Cin, C, pool, isz, live_tiles):
    """Batch elements fused per grid step (free bitcast collapse).

    At bb=1 each pool pass paid ~13 us of per-grid-step overhead on ~5 us
    of work (~3x off its floor, VERDICT r3 #8). The ceiling is scoped VMEM:
    the tile loop keeps ~live_tiles (r_tile, C) f32 temporaries on the
    Mosaic stack (r_tile never shrinks below one pool block), and the
    pipeline holds two (bb*R0, Cin) x blocks; bb takes what the stack
    leaves of a ~96 MB envelope."""
    tile_el = max(_TILE_BUDGET_EL, pool * C)
    stack = live_tiles * tile_el * 4
    target = max(((88 << 20) - stack) // 2, 0)
    bb = 1
    while B0 % (bb * 2) == 0 and (bb * 2) * R0 * Cin * isz <= target:
        bb *= 2
    return bb


def _fwd_kernel(x_ref, w_ref, b_ref, s_ref, *rest,
                rows, pool, r_tile, dtype, f32_dots, has_pen):
    if has_pen:
        pen_ref, psel_ref, asel_ref, ssum_ref, ssq_ref = rest
    else:
        pen_ref = None
        psel_ref, asel_ref, ssum_ref, ssq_ref = rest
    b = pl.program_id(0)
    C = w_ref.shape[1]
    bpt = r_tile // pool
    n_tiles = rows // r_tile
    prec = jax.lax.Precision.HIGHEST if f32_dots else None
    # multi-tile stores at non-8-multiple sublane offsets are rejected by
    # Mosaic; _row_tile guarantees such passes have bpt == 1, placed by a
    # masked RMW over the whole (rows//pool, C) output block instead
    unaligned = n_tiles > 1 and bpt % 8 != 0
    assert not unaligned or bpt == 1, (bpt, n_tiles)
    orow = jax.lax.broadcasted_iota(jnp.int32, (rows // pool, C), 0)

    @pl.when(b == 0)
    def _():
        ssum_ref[:, :] = jnp.zeros((1, C), jnp.float32)
        ssq_ref[:, :] = jnp.zeros((1, C), jnp.float32)

    within = jax.lax.broadcasted_iota(jnp.int32, (bpt, pool, C), 1)
    sgn = s_ref[:, :]  # (1, C) f32, +-1

    def tile(t, acc):
        s, q = acc
        z = jax.lax.dot_general(
            x_ref[pl.ds(t * r_tile, r_tile), :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b_ref[:, :].astype(jnp.float32)
        # zf: the exact value flax's Dense hands to BN, promoted back to
        # f32 (exact). All epilogue math stays f32: Mosaic rejects the
        # sub-word i1 mask relayouts bf16 comparisons produce (CLAUDE.md
        # "compare floats"), and max commutes with the exact promotion.
        zf = z.astype(dtype).astype(jnp.float32)
        s = s + jnp.sum(zf, axis=0, keepdims=True)
        q = q + jnp.sum(zf * zf, axis=0, keepdims=True)

        zs = zf * sgn  # (r_tile, C), signed pool domain
        if has_pen:
            zs = zs - pen_ref[pl.ds(t * r_tile, r_tile), :]  # (r_tile, 1)
        if bpt == 1:
            mx = jnp.max(zs, axis=0, keepdims=True)  # (1, C)
            rid = jax.lax.broadcasted_iota(jnp.int32, (r_tile, C), 0)
            amx = jnp.min(
                jnp.where(zs == mx, rid, pool), axis=0, keepdims=True
            ).astype(jnp.int32)
        else:
            zs3 = zs.reshape(bpt, pool, C)
            mx = jnp.max(zs3, axis=1)  # (bpt, C)
            amx = jnp.min(
                jnp.where(zs3 == mx[:, None, :], within, pool), axis=1
            ).astype(jnp.int32)
        mxd = mx.astype(dtype)
        off = t * bpt
        if unaligned:  # bpt == 1: place row t by masked RMW
            psel_ref[:, :] = jnp.where(orow == t, mxd, psel_ref[:, :])
            asel_ref[:, :] = jnp.where(orow == t, amx, asel_ref[:, :])
        else:
            psel_ref[pl.ds(off, bpt), :] = mxd
            asel_ref[pl.ds(off, bpt), :] = amx
        return s, q

    s, q = jax.lax.fori_loop(
        0, n_tiles, tile,
        (jnp.zeros((1, C), jnp.float32), jnp.zeros((1, C), jnp.float32)),
    )
    ssum_ref[:, :] += s
    ssq_ref[:, :] += q


def _bwd_kernel(x_ref, w_ref, wt_ref, b_ref, s_ref, asel_ref, dpsel_ref,
                dssum_ref, dssq_ref,
                dx_ref, dw_ref, db_ref, dw_acc, db_acc,
                *, rows, pool, r_tile, dtype, f32_dots):
    b = pl.program_id(0)
    C = w_ref.shape[1]
    Cin = w_ref.shape[0]
    bpt = r_tile // pool
    n_tiles = rows // r_tile
    prec = jax.lax.Precision.HIGHEST if f32_dots else None

    @pl.when(b == 0)
    def _():
        dw_ref[:, :] = jnp.zeros((Cin, C), jnp.float32)
        db_ref[:, :] = jnp.zeros((1, C), jnp.float32)

    dw_acc[:, :] = jnp.zeros((Cin, C), jnp.float32)
    db_acc[:, :] = jnp.zeros((1, C), jnp.float32)

    # see _fwd_kernel: unaligned multi-tile passes have bpt == 1 and read
    # their pooled row with a masked reduction instead of a dynamic slice
    unaligned = n_tiles > 1 and bpt % 8 != 0
    assert not unaligned or bpt == 1, (bpt, n_tiles)
    orow = jax.lax.broadcasted_iota(jnp.int32, (rows // pool, C), 0)

    within = jax.lax.broadcasted_iota(jnp.int32, (bpt, pool, C), 1)
    A = dssum_ref[:, :]  # (1, C) f32
    Bc = 2.0 * dssq_ref[:, :]
    # d psel / d z[asel] = s; fold s into the pooled cotangent up front
    # (one (nb, C) multiply instead of one per tile element)
    sgn = s_ref[:, :]  # (1, C)

    def tile(t, _):
        z = jax.lax.dot_general(
            x_ref[pl.ds(t * r_tile, r_tile), :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b_ref[:, :].astype(jnp.float32)
        z = z.astype(dtype).astype(jnp.float32)  # identical rounding to fwd
        dz = A + Bc * z  # (r_tile, C) f32

        off = t * bpt
        if bpt == 1:  # 2-D path (see fwd kernel)
            rid = jax.lax.broadcasted_iota(jnp.int32, (r_tile, C), 0)
            if unaligned:  # masked reduction in place of a dynamic slice
                pick = lambda ref, zero: jnp.sum(
                    jnp.where(orow == t, ref[:, :], zero),
                    axis=0, keepdims=True,
                )
                amx = pick(asel_ref, 0)
                dmx = pick(dpsel_ref, 0.0)
            else:
                amx = asel_ref[pl.ds(off, 1), :]
                dmx = dpsel_ref[pl.ds(off, 1), :]
            dz = dz + jnp.where(rid == amx, dmx * sgn, 0.0)
        else:
            dz3 = dz.reshape(bpt, pool, C)
            amx = asel_ref[pl.ds(off, bpt), :][:, None, :]
            dmx = (dpsel_ref[pl.ds(off, bpt), :] * sgn)[:, None, :]
            dz3 = dz3 + jnp.where(within == amx, dmx, 0.0)
            dz = dz3.reshape(r_tile, C)
        db_acc[:, :] += jnp.sum(dz, axis=0, keepdims=True)

        dzc = dz.astype(dtype)  # activation-precision cotangents
        dx_ref[pl.ds(t * r_tile, r_tile), :] = jax.lax.dot_general(
            dzc, wt_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dtype)
        # lhs-transposed MXU dot: x_t^T @ dz, so no (B, Cin, R) transposed
        # copy of x ever exists in HBM
        dw_acc[:, :] += jax.lax.dot_general(
            x_ref[pl.ds(t * r_tile, r_tile), :], dzc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    dw_ref[:, :] += dw_acc[:, :]
    db_ref[:, :] += db_acc[:, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dense_pool_stats(x, w, bias, sign, pen, pool, interpret=False):
    """x (B, R, Cin), w (Cin, C), bias (C,), sign (C,) f32 in {+1, -1},
    pen (B, R) f32 (+BIG on masked rows) or None, pool: block size
    (R % pool == 0). Returns
      psel (B, R//pool, C) x.dtype — per-block max of sign*z - pen where
        z = (x @ w + bias) rounded to x.dtype (the caller's selected
        extremum is sign * psel),
      asel (B, R//pool, C) i32 — within-block lowest-index argmax,
      ssum, ssq (C,) f32 — sums of z and z^2 over ALL (B, R) rows.
    Gradients flow to x, w, bias (selection, sign and pen are non-diff).
    """
    return _fwd(x, w, bias, sign, pen, pool, interpret)[0]


def _fwd(x, w, bias, sign, pen, pool, interpret):
    B0, R0, Cin = x.shape
    C = w.shape[1]
    nb0 = R0 // pool
    dtype = x.dtype
    f32_dots = dtype == jnp.float32
    has_pen = pen is not None
    bb = _bb(B0, R0, Cin, C, pool, dtype.itemsize, live_tiles=8)
    B, R, nb = B0 // bb, bb * R0, bb * nb0
    x_b = x.reshape(B, R, Cin)
    r_tile = _row_tile(R, pool, C)
    kernel = functools.partial(
        _fwd_kernel, rows=R, pool=pool, r_tile=r_tile, dtype=dtype,
        f32_dots=f32_dots, has_pen=has_pen,
    )
    vmem = min(  # ~8 live (r_tile, C) f32 tiles + 2 x blocks + outputs
        8 * r_tile * C * 4 + 2 * R * Cin * x.dtype.itemsize
        + 2 * (R // pool) * C * 4 + (16 << 20),
        120 << 20,
    )
    in_specs = [
        pl.BlockSpec((None, R, Cin), lambda b: (b, 0, 0)),
        pl.BlockSpec((Cin, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
        pl.BlockSpec((1, C), lambda b: (0, 0)),
    ]
    args = [x_b, w, bias.reshape(1, C), sign.reshape(1, C)]
    if has_pen:
        in_specs.append(pl.BlockSpec((None, R, 1), lambda b: (b, 0, 0)))
        args.append(pen.reshape(B, R)[..., None])
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, nb, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, nb, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nb, C), dtype),
            jax.ShapeDtypeStruct((B, nb, C), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )(*args)
    psel, asel, ssum, ssq = out
    rs = lambda t: t.reshape(B0, nb0, C)
    outs = (rs(psel), rs(asel), ssum[0], ssq[0])
    return outs, (x, w, bias, sign, rs(asel), has_pen)


def _bwd(pool, interpret, res, cots):
    x, w, bias, sign, asel, has_pen = res
    dpsel = cots[0]
    dssum, dssq = cots[2], cots[3]
    B0, R0, Cin = x.shape
    C = w.shape[1]
    nb0 = R0 // pool
    dtype = x.dtype
    f32_dots = dtype == jnp.float32
    # own batch-block: the backward keeps more tile temporaries live than
    # the forward (z, dz, sparse-select, dzc, the two grad dots) AND two
    # (bb*R0, Cin) blocks per side (x in, dx out)
    bb = _bb(B0, R0, 2 * Cin, C, pool, dtype.itemsize, live_tiles=8)
    B, R, nb = B0 // bb, bb * R0, bb * nb0

    def zero_like(c, proto):
        # float0 / symbolic-zero cotangents from non-diff consumers
        if c is None or (hasattr(c, "dtype") and c.dtype == jax.dtypes.float0):
            return jnp.zeros(proto, jnp.float32)
        return c.astype(jnp.float32)

    dpsel = zero_like(dpsel, (B0, nb0, C))
    dssum = zero_like(dssum, (C,)).reshape(1, C)
    dssq = zero_like(dssq, (C,)).reshape(1, C)

    rb = lambda t: t.reshape(B, nb, C)  # free bitcast re-block
    x_b = x.reshape(B, R, Cin)
    wt = jnp.swapaxes(w, 0, 1)  # (C, Cin)
    r_tile = _row_tile(R, pool, C)
    kernel = functools.partial(
        _bwd_kernel, rows=R, pool=pool, r_tile=r_tile, dtype=dtype,
        f32_dots=f32_dots,
    )
    vmem = min(  # ~8 live (r_tile, C) f32 tiles + 2x (x, dx) blocks
        8 * r_tile * C * 4 + 2 * R * Cin * x.dtype.itemsize * 2
        + 2 * Cin * C * 4 + (16 << 20),
        120 << 20,
    )
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, R, Cin), lambda b: (b, 0, 0)),
            pl.BlockSpec((Cin, C), lambda b: (0, 0)),
            pl.BlockSpec((C, Cin), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((None, nb, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, nb, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, R, Cin), lambda b: (b, 0, 0)),
            pl.BlockSpec((Cin, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, Cin), dtype),
            jax.ShapeDtypeStruct((Cin, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Cin, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )(x_b, w, wt, bias.reshape(1, C), sign.reshape(1, C),
      rb(asel), rb(dpsel), dssum, dssq)
    return (
        dx.reshape(B0, R0, Cin),
        dw.astype(w.dtype),
        db[0].astype(bias.dtype),
        jnp.zeros_like(sign),
        jnp.zeros((B0, R0), jnp.float32) if has_pen else None,
    )


def _fwd_vjp(x, w, bias, sign, pen, pool, interpret):
    return _fwd(x, w, bias, sign, pen, pool, interpret)


dense_pool_stats.defvjp(_fwd_vjp, _bwd)


def dense_pool_stats_reference(x, w, bias, sign, pen, pool):
    """Unfused XLA oracle with identical semantics (tests + non-TPU path)."""
    B, R, Cin = x.shape
    C = w.shape[1]
    if x.dtype == jnp.float32:
        z = jnp.einsum("bri,ic->brc", x, w,
                       preferred_element_type=jnp.float32) + bias
    else:
        # dtype-native like flax Dense: f32 MXU accumulation, bf16 result —
        # a f32-preferred einsum would materialize a 2x-sized z before the
        # cast (measured ~10 ms on the B=64 PointNet2 train step)
        z = (jnp.einsum("bri,ic->brc", x, w) + bias).astype(x.dtype)
    zf = z.astype(jnp.float32)
    ssum = jnp.sum(zf, axis=(0, 1))
    ssq = jnp.sum(zf * zf, axis=(0, 1))
    zs = zf * sign
    if pen is not None:
        zs = zs - pen[..., None]
    zs3 = zs.reshape(B, R // pool, pool, C)
    psel = jnp.max(zs3, axis=2)
    within = jnp.arange(pool, dtype=jnp.int32)[None, None, :, None]
    asel = jnp.min(
        jnp.where(zs3 == psel[:, :, None, :], within, pool), axis=2
    ).astype(jnp.int32)
    return psel.astype(x.dtype), asel, ssum, ssq
