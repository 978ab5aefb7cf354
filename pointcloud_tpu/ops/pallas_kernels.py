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


############################ fused Sinkhorn EMD ############################


def _sinkhorn_kernel(
    x_ref, yt_ref, dists_ref, assign_ref, f_ref, g_ref, *scratch,
    n, m, iters, eps, tile, anneal_from=None,
):
    """Flash-style Sinkhorn: the (N, M) cost matrix never touches HBM.

    Per sweep, row tiles of C are consumed tile-by-tile:
      sweep 1 (g update, old f): online logsumexp over ROWS — running
        (max, sum) accumulators per column, merged tile by tile;
      sweep 2 (f update, new g): per-tile logsumexp over LANES.
    Layout: f lives as (N, 1) (rows on sublanes), g as (1, M) (columns on
    lanes) — both orientations are exactly what their sweep broadcasts
    need, so no transposes ever happen.

    Cost tiles: when a VMEM scratch is provided (N*M*4 within budget), C is
    computed ONCE per batch element and the 2*iters sweeps read it back —
    the 9-VPU-op/element squared-difference recompute was ~60% of sweep
    work (VERDICT r3 weak #3). Larger clouds fall back to recomputing each
    tile from the VMEM-resident clouds (direct fp32 expansion, see c_tile:
    an MXU dot is bf16 by default — ~1e-3 cost error perturbs the matching
    — and Precision.HIGHEST lowers ~3x slower).

    Replaces the HBM-bound XLA path (ops/emd.py sinkhorn_match: 50 iters x
    ~4 full passes over a 16 MB C per batch element) with a compute-bound
    kernel: per iteration only 2 in-VMEM passes of VPU work.
    """
    log_mu = -jnp.log(jnp.float32(n))
    log_nu = -jnp.log(jnp.float32(m))
    NEG = jnp.float32(-1e30)
    n_tiles = n // tile
    c_ref = scratch[0] if scratch else None
    # Constant eps (the training operating point): work entirely in the
    # SCALED domain — cache/recompute C/eps and store f/eps, g/eps. The
    # updates collapse to f' = log_mu - lse(g' - C') with zero per-element
    # multiplies (eps * inv_eps == 1); argmax is scale-invariant and dists
    # un-scale once at the end. Annealed eps keeps the explicit scaling.
    scaled = anneal_from is None
    c_scale = jnp.float32(1.0 / eps) if scaled else jnp.float32(1.0)

    def c_compute(i):
        # Direct squared-difference expansion on the VPU, fully fp32.
        acc = None
        for d in range(3):
            xd = x_ref[pl.ds(i * tile, tile), d : d + 1]  # (tile, 1)
            yd = yt_ref[d : d + 1, :]  # (1, M)
            diff = xd - yd
            acc = diff * diff if acc is None else acc + diff * diff
        return acc * c_scale if scaled else acc

    if c_ref is not None:
        def fill(i, _):
            c_ref[pl.ds(i * tile, tile), :] = c_compute(i)
            return 0

        jax.lax.fori_loop(0, n_tiles, fill, 0)

        def c_tile(i):
            return c_ref[pl.ds(i * tile, tile), :]
    else:
        c_tile = c_compute

    f_ref[:, :] = jnp.zeros((n, 1), jnp.float32)
    g_ref[:, :] = jnp.zeros((1, m), jnp.float32)

    def iteration(it, carry):
        if scaled:
            e = None
            inv_eps = jnp.float32(1.0)
        else:
            # epsilon scaling: geometric decay anneal_from -> eps
            frac = it.astype(jnp.float32) / max(iters - 1, 1)
            e = jnp.float32(anneal_from) * (eps / anneal_from) ** frac
            inv_eps = 1.0 / e

        # ---- g update (uses old f): online logsumexp over rows ----
        def sweep1(i, acc):
            m_acc, s_acc = acc  # (1, M) running max / scaled sum
            t = f_ref[pl.ds(i * tile, tile), :] - c_tile(i)
            if not scaled:
                t = t * inv_eps
            m_t = jnp.max(t, axis=0, keepdims=True)
            new_m = jnp.maximum(m_acc, m_t)
            s_acc = s_acc * jnp.exp(m_acc - new_m) + jnp.sum(
                jnp.exp(t - new_m), axis=0, keepdims=True
            )
            return new_m, s_acc

        m_acc, s_acc = jax.lax.fori_loop(
            0,
            n_tiles,
            sweep1,
            (jnp.full((1, m), NEG), jnp.zeros((1, m), jnp.float32)),
        )
        lse_g = log_nu - (m_acc + jnp.log(s_acc))
        g_ref[:, :] = lse_g if scaled else e * lse_g

        # ---- f update (uses new g): per-tile logsumexp over lanes ----
        def sweep2(i, _):
            t = g_ref[:, :] - c_tile(i)  # (tile, M)
            if not scaled:
                t = t * inv_eps
            m_t = jnp.max(t, axis=1, keepdims=True)
            lse = m_t + jnp.log(
                jnp.sum(jnp.exp(t - m_t), axis=1, keepdims=True)
            )
            out = log_mu - lse
            f_ref[pl.ds(i * tile, tile), :] = out if scaled else e * out
            return 0

        jax.lax.fori_loop(0, n_tiles, sweep2, 0)
        return carry

    jax.lax.fori_loop(0, iters, iteration, 0)

    # ---- assignment = argmax_j (f_i + g_j - C_ij); dists = C[i, assign] ----
    # in scaled mode everything is a constant 1/eps multiple: same argmax
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    d_scale = jnp.float32(eps) if scaled else jnp.float32(1.0)

    def final(i, _):
        C = c_tile(i)
        scores = f_ref[pl.ds(i * tile, tile), :] + g_ref[:, :] - C
        mx = jnp.max(scores, axis=1, keepdims=True)
        idx = jnp.min(
            jnp.where(scores == mx, lane, m), axis=1, keepdims=True
        ).astype(jnp.int32)
        assign_ref[pl.ds(i * tile, tile), :] = idx
        dists_ref[pl.ds(i * tile, tile), :] = jnp.maximum(
            d_scale
            * jnp.sum(jnp.where(lane == idx, C, 0.0), axis=1, keepdims=True),
            0.0,
        )
        return 0

    jax.lax.fori_loop(0, n_tiles, final, 0)


@functools.partial(
    jax.jit, static_argnames=("eps", "iters", "interpret", "anneal_from")
)
def sinkhorn_match_pallas(
    x: jax.Array,
    y: jax.Array,
    eps: float = 0.005,
    iters: int = 50,
    interpret: bool = False,
    anneal_from: float | None = None,
):
    """Fused-Sinkhorn matching: x (B, N, C), y (B, M, C) ->
    (dists (B, N), assignment (B, N) int32), same contract/semantics as
    ops.emd.sinkhorn_match."""
    B, N, _ = x.shape
    M = y.shape[1]
    tile = 512
    while N % tile:
        tile //= 2
    x = x[..., :3].astype(jnp.float32)
    y = y[..., :3].astype(jnp.float32)
    yt = jnp.swapaxes(y, 1, 2)  # (B, 3, M)

    kernel = functools.partial(
        _sinkhorn_kernel, n=N, m=M, iters=iters, eps=float(eps), tile=tile,
        anneal_from=None if anneal_from is None else float(anneal_from),
    )
    # Cache the (N, M) cost matrix in VMEM when it fits: computed once per
    # batch element instead of recomputed 2x per iteration (the 9-op
    # squared-difference expansion was ~60% of sweep work). 2048^2 = 16 MB.
    cache_cost = N * M * 4 <= (64 << 20)
    scratch = [
        pltpu.VMEM((N, 1), jnp.float32),
        pltpu.VMEM((1, M), jnp.float32),
    ]
    if cache_cost:
        scratch.append(pltpu.VMEM((N, M), jnp.float32))
    dists, assign = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N, 3), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 3, M), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                16 * tile * M + 64 * (N + M)
                + (N * M * 4 if cache_cost else 0) + (8 << 20),
                120 << 20,
            )
        ),
        interpret=interpret,
    )(x, yt)
    return dists[..., 0], assign[..., 0]


############################ fused Chamfer (nearest neighbor) ############################


def _nn_kernel(xa_ref, yb_ref, s2_ref, d2_ref,
               minx_ref, aminx_ref, miny_ref, aminy_ref, *, n, m, tile):
    """Bidirectional nearest-neighbor sweep without materializing C in HBM.

    Row tiles of the cost matrix are reconstructed in VMEM from pre-split
    bf16 operands and reduced twice on the fly:
      C_tile = s2 + d2 - 2 * (xa_tile @ yb)   [one K=4*C MXU dot]
    where xa = [x_hi, x_lo, x_hi, x_lo] and yb = [y_hi; y_hi; y_lo; y_lo]
    reconstruct the fp32 cross term to ~2^-17 relative error (split-bf16:
    hi*hi + lo*hi + hi*lo + lo*lo, fp32 accumulation). C is the point
    dimensionality (3 for xyz-only, up to 8 for xyz+features chamfer —
    the reference's plain ChamferDistance matches over ALL dims). Validity masks are
    pre-folded into s2/d2 as +BIG penalties by the caller, so no per-tile
    masking passes are needed. Both selection and the returned values use
    the ~3e-5-accurate C (zero-mean error — see the wrapper docstring for
    why no exact refinement pass exists).

    Reductions:
      x-side: per-row lane min + argmin (min-lane-where-equal tie-break);
      y-side: online column min with a running (value, row-index) pair —
        the running value wins ties, so the FIRST minimal row is kept,
        matching jnp.argmin.
    """
    BIG = jnp.float32(1e10)
    n_tiles = n // tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 0)
    d2 = d2_ref[:, :]  # (1, M), +BIG on invalid y
    yb = yb_ref[:, :]  # (4C, M) bf16

    def c_tile(i):
        cross = jax.lax.dot_general(
            xa_ref[pl.ds(i * tile, tile), :],
            yb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s2 = s2_ref[pl.ds(i * tile, tile), :]  # (tile, 1), +BIG on invalid x
        return s2 + (d2 - 2.0 * cross)

    def sweep(i, acc):
        best_v, best_i = acc  # (1, M) running column min + row index
        C = c_tile(i)

        # ---- x side: nearest valid y per row ----
        mn = jnp.min(C, axis=1, keepdims=True)
        am = jnp.min(jnp.where(C == mn, lane, m), axis=1, keepdims=True)
        # clamp split-bf16 round-off (can dip ~1e-5 below 0 for coincident
        # points); the BIG sentinel for masked rows survives the max
        minx_ref[pl.ds(i * tile, tile), :] = jnp.maximum(mn, 0.0)
        aminx_ref[pl.ds(i * tile, tile), :] = am.astype(jnp.int32)

        # ---- y side: online column min over valid x rows ----
        col_v = jnp.min(C, axis=0, keepdims=True)  # (1, M)
        col_i = jnp.min(
            jnp.where(C == col_v, row + i * tile, n), axis=0, keepdims=True
        )
        take = col_v < best_v  # strict: earlier tiles win ties
        best_i = jnp.where(take, col_i, best_i)
        best_v = jnp.where(take, col_v, best_v)
        return best_v, best_i

    best_v, best_i = jax.lax.fori_loop(
        0,
        n_tiles,
        sweep,
        (jnp.full((1, m), BIG), jnp.zeros((1, m), jnp.int32)),
    )
    miny_ref[:, :] = jnp.maximum(best_v, 0.0)
    aminy_ref[:, :] = best_i.astype(jnp.int32)


def _split_bf16(v: jax.Array):
    """Split fp32 into (hi, lo) bf16 with hi + lo capturing ~16 mantissa
    bits: the MXU-friendly decomposition behind the K=12 cross-term dot.

    The optimization_barrier is load-bearing: under jit, XLA's
    allow-excess-precision pass folds f32(bf16(v)) -> v, which silently
    turns lo into bf16(v - v) = 0 and degrades the split to plain bf16
    (observed: selection error 1e-4 -> 1e-2 without it).
    """
    hi = jax.lax.optimization_barrier(v.astype(jnp.bfloat16))
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor_pallas(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    interpret: bool = False,
):
    """x (B, N, C), y (B, M, C) -> (min_x (B,N), amin_x (B,N) i32,
    min_y (B,M), amin_y (B,M) i32): squared distance + index of each point's
    nearest valid counterpart over all C dims (C <= 8; the packed split
    operands stay within one 32-lane MXU K-pass). Masked points receive
    >=BIG distances.

    Distances come from a split-bf16 MXU reconstruction of C: per-point
    error <= ~3e-5 absolute for unit-cube clouds (zero-mean, so batch-mean
    chamfer parity vs the exact oracle is ~1e-7 — measured 100x inside the
    1e-5 BASELINE guard). Where two candidates sit within that error the
    index may name the (equidistant to ~3e-5) runner-up; exact per-pair
    recomputation was measured SLOWER than the whole sweep (XLA TPU gather
    ~9 ms at B=512 vs 10 ms for the kernel), so consumers needing exact
    values for the selected pair recompute them from the indices (the
    chamfer VJP does exactly this).
    """
    B, N, C = x.shape
    M = y.shape[1]
    tile = 512
    while N % tile:
        tile //= 2
    BIG = jnp.float32(1e10)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    yt = jnp.swapaxes(y, 1, 2)  # (B, C, M)

    x_hi, x_lo = _split_bf16(x)
    y_hi, y_lo = _split_bf16(yt)
    xa = jnp.concatenate([x_hi, x_lo, x_hi, x_lo], axis=-1)  # (B, N, 4C)
    yb = jnp.concatenate([y_hi, y_hi, y_lo, y_lo], axis=1)  # (B, 4C, M)

    s2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (B, N, 1)
    d2 = jnp.sum(yt * yt, axis=1, keepdims=True)  # (B, 1, M)
    if x_mask is not None:
        s2 = s2 + jnp.where(x_mask[..., None], 0.0, BIG)
    if y_mask is not None:
        d2 = d2 + jnp.where(y_mask[:, None, :], 0.0, BIG)

    kernel = functools.partial(_nn_kernel, n=N, m=M, tile=tile)
    minx, aminx, miny, aminy = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N, 4 * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 4 * C, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, M), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, N, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, M), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(24 * tile * M + (8 << 20), 120 << 20)
        ),
        interpret=interpret,
    )(xa, yb, s2, d2)
    return minx[..., 0], aminx[..., 0], miny[:, 0, :], aminy[:, 0, :]


def _split3_rows(v: jax.Array, barrier: bool = False) -> jax.Array:
    """fp32 (C, L) -> (3C, L) bf16 [hi; mid; lo] with hi+mid+lo == v to
    ~2^-24 relative: the 3-way split that lets one-hot MXU dots move fp32
    values exactly enough at bf16 speed (same trick as chamfer's
    scatter_rows_pallas packing, here built in-VMEM). barrier=True (set in
    interpret mode, where the kernel body runs under XLA) keeps XLA's
    allow-excess-precision pass from folding f32(bf16(v)) -> v, which
    would zero the tails; Mosaic lowers casts literally and does not
    support (or need) optimization_barrier."""
    def trunc(a):
        b = a.astype(jnp.bfloat16)
        return jax.lax.optimization_barrier(b) if barrier else b

    hi = trunc(v)
    r1 = v - hi.astype(jnp.float32)
    mid = trunc(r1)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=0)


def _fold3_rows(a: jax.Array, c: int) -> jax.Array:
    """(3C, L) f32 -> (C, L): undo _split3_rows after a linear op."""
    return a[0:c, :] + a[c : 2 * c, :] + a[2 * c : 3 * c, :]


def _dot_bf16(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chamfer_bwd_kernel(xt_ref, yt_ref, gx_ref, gy_ref, ax_ref, ay_ref,
                        dxt_ref, dyt_ref, *, n, m, c, bb, interp):
    """Fused chamfer/NN backward: gather + term + segment-sum in one program.

    Math (ops/chamfer.py:_nn_bwd): with nearest indices amin_x/amin_y and
    cotangents gx/gy of the min distances,
        term_x = 2*gx*(x - y[amin_x]);  term_y = 2*gy*(y - x[amin_y])
        dx = term_x - segsum(term_y -> amin_y)
        dy = term_y - segsum(term_x -> amin_x)
    The XLA composition of this (flat gathers + elementwise terms + the
    packed scatter_rows_pallas calls) spent ~16 ms of a B=256 PointNet AE
    train step, almost all of it in lane-starved layouts: every elementwise
    op on a (B, N, 3) tensor runs at 3/128 lane utilization, and the two
    row-gather fusions picked column-major T(4,128) layouts (~2.7 ms each;
    benchmarks/trace_top_ops.py compute-track listing).

    Here everything is C-MAJOR, (C, N): one-hot selectors are built from
    index compares in VMEM and every gather/segment-sum is a dot whose
    PADDED dimension (3C <= 24 -> 8-sublane tiles) sits on sublanes, so the
    four dots cost ~16/8 of a (C, N) pass each instead of the 128-lane-pad
    penalty of the row-major orientation (8x less MXU work). The 3-way
    split keeps fp32 exactness through the bf16 dots; gathered values are
    exact (one-hot rows), matching the flat-gather + fold=3 scatter path
    bit-for-bit up to f32 summation order.
    """
    for i in range(bb):
        xt = xt_ref[i]  # (C, N) f32
        yt = yt_ref[i]  # (C, M) f32
        gxv = gx_ref[i]  # (1, N) f32, pre-masked by the wrapper
        gyv = gy_ref[i]  # (1, M) f32
        ax = ax_ref[i]  # (1, N) i32 in [0, M)
        ay = ay_ref[i]  # (1, M) i32 in [0, N)

        # G1T[j, r] = [amin_x_r == j]: column r one-hot-selects y row j
        jrow_m = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
        g1t = (ax == jrow_m).astype(jnp.bfloat16)  # (M, N)
        ypk = _split3_rows(yt, barrier=interp)  # (3C, M) bf16
        y_near = _fold3_rows(
            _dot_bf16(ypk, g1t, (((1,), (0,)))), c
        )  # (C, N) f32: y[amin_x] gathered exactly
        tx = 2.0 * gxv * (xt - y_near)  # (C, N) f32
        txp = _split3_rows(tx, barrier=interp)
        # segsum(term_x -> amin_x): contract the shared N axis
        acc_dy = _dot_bf16(txp, g1t, (((1,), (1,))))  # (3C, M) f32

        # OTT[i_, j] = [amin_y_j == i_]
        irow_n = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        ott = (ay == irow_n).astype(jnp.bfloat16)  # (N, M)
        xpk = _split3_rows(xt, barrier=interp)  # (3C, N)
        x_near = _fold3_rows(
            _dot_bf16(xpk, ott, (((1,), (0,)))), c
        )  # (C, M): x[amin_y]
        ty = 2.0 * gyv * (yt - x_near)  # (C, M)
        dyt_ref[i] = ty - _fold3_rows(acc_dy, c)
        typ = _split3_rows(ty, barrier=interp)  # (3C, M)
        # segsum(term_y -> amin_y): contract the shared M axis
        dx_scat = _dot_bf16(typ, ott, (((1,), (1,))))  # (3C, N)
        dxt_ref[i] = tx - _fold3_rows(dx_scat, c)


def chamfer_nn_bwd_pallas(x, y, gx, gy, amin_x, amin_y, interpret=False):
    """Fused backward of nearest_neighbor_dists (see _chamfer_bwd_kernel).

    x (B, N, C) f32, y (B, M, C) f32, gx (B, N) f32 (already zeroed on
    masked rows), gy (B, M) f32, amin_x (B, N) i32, amin_y (B, M) i32.
    Returns (dx (B, N, C), dy (B, M, C)) f32. C <= 8.
    """
    B, N, C = x.shape
    M = y.shape[1]
    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)  # (B, C, N)
    yt = jnp.swapaxes(y.astype(jnp.float32), 1, 2)
    bb = 1
    while B % (bb * 2) == 0 and bb < 4:
        bb *= 2
    kernel = functools.partial(_chamfer_bwd_kernel, n=N, m=M, c=C, bb=bb,
                               interp=interpret)
    vmem = (
        2 * N * M * 2  # the two bf16 one-hot selectors
        + 2 * N * M * 4  # index-compare iota operands (i32)
        + 24 * 8 * max(N, M) * 4  # f32 (C<=8-sublane, L) temporaries
        + (24 << 20)
    )
    dxt, dyt = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, C, N), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, C, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, 1, N), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, 1, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, 1, N), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, 1, M), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bb, C, N), lambda b: (b, 0, 0)),
            pl.BlockSpec((bb, C, M), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, N), jnp.float32),
            jax.ShapeDtypeStruct((B, C, M), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 << 20)
        ),
        interpret=interpret,
    )(
        xt, yt,
        gx.astype(jnp.float32)[:, None, :], gy.astype(jnp.float32)[:, None, :],
        amin_x.astype(jnp.int32)[:, None, :],
        amin_y.astype(jnp.int32)[:, None, :],
    )
    return jnp.swapaxes(dxt, 1, 2), jnp.swapaxes(dyt, 1, 2)


############################ fused neighborhood grouping ############################


def _group_kernel(
    xyz_ref, cents_ref, p_ref, pen_ref, gx_ref, gf_ref, idx_ref, valid_ref,
    d_ref, g0_ref, idx0_ref, *, k, radius, split_xyz, n, s_tile,
):
    """Fused ball-query/kNN + gather for one (batch, centroid-tile) program.

    Layout rule: centroids live on LANES everywhere — distances are
    (N, S_t), reductions run over sublanes, gathers are (C, N) @ (N, S_t)
    MXU dots, and every output block is (k, C|1, S_t) — so no array in the
    pipeline lane-pads a small trailing dim to 128 (which is what blew the
    scoped-VMEM budget in the row-major formulation).

    Two selection modes:

    * kNN (radius=None, pointmlp.py:106-124 semantics): the (N, S_t)
      squared-distance tile is built once in VMEM (direct fp32 VPU
      expansion — exact, no approx_max_k) and the k nearest neighbors are
      extracted by iterative min + masked argmin (deterministic
      lowest-index tie-break, the top_k convention). Each slot re-reads
      AND re-writes the full f32 tile — O(k·N·S_t) VMEM traffic.
    * ball query (radius set, pointnet2_utils.py:93-113 semantics —
      first k in-radius points BY INDEX ORDER): each in-radius point's
      slot is its index-rank among the in-radius points of its column,
      computed once by a blocked prefix-count (strictly-lower-triangular
      one-MXU-dot per N-block); slot j's selector is then a single bf16
      compare (rank == j), which doubles as the one-hot gather operand.
      No distance tile survives, no write-back per slot — the per-slot
      VMEM traffic drops ~8x vs min-extraction (the SA1 grouping op was
      29 ms/step of the PointNet2 B=256 train step under min-extraction,
      benchmarks/trace_top_ops.py).

    Each slot gathers the selected points' channels with ONE MXU dot
    against the one-hot selection column; bf16 features are still selected
    exactly (one-hot rows), and fp32 xyz precision survives as split-bf16
    hi/lo channels recombined here. In ball mode the selected INDEX rides
    the same dot as two extra hi/lo channels (idx = hi*128 + lo, both
    exactly representable in bf16 for N <= 16384).

    Replaces the XLA chain pairwise_sqdist -> top_k -> take_along_axis x2
    (reference hot loop pointnet2_utils.py:93-144), which at B=64 spent
    ~44 ms/step materializing (B, S, N) in HBM + gathering (benchmarks/
    sa_profile.py).

    Slots past the in-radius count replicate slot 0 (the first in-radius
    point; the nearest in kNN mode) and report valid=0, matching
    ops.geometry.ball_query's pad-with-first.
    """
    BIG = jnp.float32(1e9)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n, s_tile), 0)

    def emit(j, gat, amin, vb):
        if split_xyz:
            gx = gat[0:3, :] + gat[3:6, :]
            base = 6
        else:
            gx = gat[0:3, :]
            base = 3
        gf = gat[base:, :] if radius is None else gat[base:-2, :]

        @pl.when(j == 0)
        def _():
            g0_ref[:, :] = jnp.concatenate([gx, gf], axis=0)
            idx0_ref[:, :] = amin

        # at j == 0 the scratch now holds this slot's values, so the pad
        # select below is the identity there (slot 0 is always emitted)
        nf = 3 + gf.shape[0]
        gx_ref[pl.ds(j, 1)] = jnp.where(vb, gx, g0_ref[0:3, :])[None]
        gf_ref[pl.ds(j, 1)] = jnp.where(vb, gf, g0_ref[3:nf, :])[None].astype(
            gf_ref.dtype
        )
        idx_ref[pl.ds(j, 1)] = jnp.where(vb, amin, idx0_ref[:, :])[None]
        valid_ref[pl.ds(j, 1)] = vb.astype(jnp.float32)[None]

    def gather_dot(sel):
        return jax.lax.dot_general(
            p_ref[:, :],
            sel.astype(p_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Mosaic lowers fp32 dots through bf16 passes unless HIGHEST is
            # requested; the bf16 path instead keeps default speed and gets
            # fp32 xyz accuracy from the split hi/lo channels
            precision=(None if p_ref.dtype == jnp.bfloat16
                       else jax.lax.Precision.HIGHEST),
        )  # (Cp, S_t) fp32

    if radius is not None:
        # ---- ball query: blocked prefix-count of in-radius points ----
        nb = min(256, n)
        while n % nb:
            nb -= 1
        r2 = jnp.float32(radius * radius)
        kf = jnp.float32(k)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
        ).astype(jnp.bfloat16)  # strictly-lower: exclusive prefix

        def blk(b, carry):
            sl = pl.ds(b * nb, nb)
            acc = pen_ref[sl, :]  # (nb, 1) mask penalty, broadcasts
            for c in range(3):
                diff = xyz_ref[sl, c : c + 1] - cents_ref[c : c + 1, :]
                acc = acc + diff * diff
            # all compares stay f32: Mosaic/v5e has no bf16 comparison
            vf = (acc <= r2).astype(jnp.float32)  # (nb, S_t) 0/1
            # rank within block: one MXU dot (counts <= nb are exact)
            r_in = jax.lax.dot_general(
                tri, vf.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rank = r_in + carry
            # clamp to k (bf16-exact for k <= 256); out-of-ball rows get k,
            # which no slot j < k ever selects
            d_ref[sl, :] = jnp.where(
                vf > 0.0, jnp.minimum(rank, kf), kf
            ).astype(d_ref.dtype)
            return carry + jnp.sum(vf, axis=0, keepdims=True)

        cnt = jax.lax.fori_loop(
            0, n // nb, blk, jnp.zeros((1, s_tile), jnp.float32)
        )  # (1, S_t) in-radius count per centroid
        rid0p = (rowid == 0).astype(p_ref.dtype)

        def slot(j, _):
            jf = jax.lax.convert_element_type(j, jnp.float32)
            sel = (d_ref[:, :].astype(jnp.float32) == jf).astype(p_ref.dtype)
            # zero-in-ball columns: slot 0 falls back to point 0 (the
            # all-BIG tie-break of the XLA oracle's top_k); where() runs on
            # numeric one-hots — bool-valued select doesn't lower on Mosaic
            sel = jnp.where((j == 0) & (cnt <= 0.5), rid0p, sel)
            gat = gather_dot(sel)
            # the index rides the dot as exact hi/lo channels
            amin = (gat[-2:-1, :] * 128.0 + gat[-1:, :]).astype(jnp.int32)
            emit(j, gat, amin, jf < cnt)
            return 0

        jax.lax.fori_loop(0, k, slot, 0)
        return

    # ---- kNN: iterative min-extraction over the f32 distance tile ----
    acc = pen_ref[:, :]  # (N, 1) mask penalty, broadcasts over lanes
    for c in range(3):
        diff = xyz_ref[:, c : c + 1] - cents_ref[c : c + 1, :]  # (N, S_t)
        acc = acc + diff * diff
    d_ref[:, :] = acc

    # fori_loop (not python unroll): Mosaic gives every unrolled iteration
    # its own stack slots, which at k tiles of (N, S_t) temporaries blows
    # the ~13 MB scoped-VMEM budget; the loop body keeps exactly one
    # iteration's temporaries live.
    def slot(j, _):
        d = d_ref[:, :]
        m = jnp.min(d, axis=0, keepdims=True)  # (1, S_t)
        amin = jnp.min(
            jnp.where(d == m, rowid, n), axis=0, keepdims=True
        ).astype(jnp.int32)
        sel = rowid == amin
        d_ref[:, :] = jnp.where(sel, BIG, d)
        gat = gather_dot(sel)
        emit(j, gat, amin, m < jnp.float32(0.5) * BIG)
        return 0

    jax.lax.fori_loop(0, k, slot, 0)


def _group_gather_call(xyz, cents_t, p_t, pen, *, k, radius, split_xyz,
                       s_tile, interpret):
    B, N, _ = xyz.shape
    S = cents_t.shape[-1]
    Cp = p_t.shape[1]
    # ball mode carries 2 extra exact hi/lo index channels at the end of p_t
    n_feat = Cp - (6 if split_xyz else 3) - (0 if radius is None else 2)
    kernel = functools.partial(
        _group_kernel, k=k, radius=radius, split_xyz=split_xyz,
        n=N, s_tile=s_tile,
    )
    # kNN holds the f32 distance tile; ball only the bf16 rank tile
    sel_dtype = jnp.float32 if radius is None else jnp.bfloat16
    vmem = (
        (8 if radius is None else 4) * N * s_tile * 4
        + 2 * N * (Cp + 4) * p_t.dtype.itemsize
        + 2 * k * s_tile * (3 * 4 + n_feat * p_t.dtype.itemsize + 8)
        + (4 << 20)
    )
    return pl.pallas_call(
        kernel,
        grid=(B, S // s_tile),
        in_specs=[
            pl.BlockSpec((None, N, 3), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((None, 3, s_tile), lambda b, s: (b, 0, s)),
            pl.BlockSpec((None, Cp, N), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((None, N, 1), lambda b, s: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, k, 3, s_tile), lambda b, s: (b, 0, 0, s)),
            pl.BlockSpec((None, k, n_feat, s_tile), lambda b, s: (b, 0, 0, s)),
            pl.BlockSpec((None, k, 1, s_tile), lambda b, s: (b, 0, 0, s)),
            pl.BlockSpec((None, k, 1, s_tile), lambda b, s: (b, 0, 0, s)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k, 3, S), jnp.float32),
            jax.ShapeDtypeStruct((B, k, n_feat, S), p_t.dtype),
            jax.ShapeDtypeStruct((B, k, 1, S), jnp.int32),
            jax.ShapeDtypeStruct((B, k, 1, S), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, s_tile), sel_dtype),
            pltpu.VMEM((3 + n_feat, s_tile), jnp.float32),
            pltpu.VMEM((1, s_tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 << 20)
        ),
        interpret=interpret,
    )(xyz, cents_t, p_t, pen)


def _scatter_kernel(g_ref, idxt_ref, out_ref, *, n, r_tile, fold, init_ref=None):
    """Segment-sum of g rows onto their idx targets: the grouping VJP.

    out[n] = sum_r [idx[r] == n] * g[r], computed as R-row tiles of a
    transposed one-hot (N, R) @ g (R, C) MXU matmul — no scatter, no
    atomics (a deterministic replacement for the reference's atomicAdd
    backward pattern, emd_cuda.cu:284-316). The row tiles live on the GRID
    (same out block revisited) so only one one-hot is in VMEM at a time.

    fold > 1: g carries `fold` split-precision copies of each of the C
    output channels ([hi | mid | lo] columns, chamfer.py segsum); the
    per-tile dot result folds them back before accumulating, so the split
    never materializes in HBM. init_ref: optional (n, C) addend the output
    starts from (fuses the consumer's `term + segsum(...)` add).
    """
    t = pl.program_id(1)
    C = out_ref.shape[1]

    @pl.when(t == 0)
    def _():
        out_ref[:, :] = (
            jnp.zeros((n, C), jnp.float32)
            if init_ref is None
            else init_ref[:, :].astype(jnp.float32)
        )

    ids = idxt_ref[:, :]  # (1, R)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (n, r_tile), 0) == ids
    ).astype(g_ref.dtype)
    acc = jax.lax.dot_general(
        oh,
        g_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # fp32 cotangents (debug/parity mode) must not round through bf16
        # MXU passes; bf16 cotangents keep the fast default
        precision=(None if g_ref.dtype == jnp.bfloat16
                   else jax.lax.Precision.HIGHEST),
    )
    if fold > 1:
        acc = sum(acc[:, k * C : (k + 1) * C] for k in range(fold))
    out_ref[:, :] += acc


def _scatter_kernel_init(g_ref, idxt_ref, init_ref, out_ref, *, n, r_tile, fold):
    _scatter_kernel(g_ref, idxt_ref, out_ref, n=n, r_tile=r_tile, fold=fold,
                    init_ref=init_ref)


@functools.partial(jax.jit, static_argnames=("n", "fold", "interpret"))
def scatter_rows_pallas(g: jax.Array, idx: jax.Array, n: int,
                        init: jax.Array | None = None, fold: int = 1,
                        interpret: bool = False) -> jax.Array:
    """g (B, R, fold*C), idx (B, R) int32 -> (B, n, C) fp32 with
    out[b, idx[b,r]] += g[b,r] (deterministic segment-sum via one-hot MXU
    matmuls). fold > 1 folds split-precision column groups in-kernel;
    init (B, n, C) seeds the output (fused `init + segsum` add)."""
    B, rows, Cg = g.shape
    C = Cg // fold
    idxt = idx.reshape(B, 1, rows).astype(jnp.int32)
    # r_tile=512 measured equal to 2048 at the chamfer-VJP shapes
    # (benchmarks/chamfer_bwd_profile.py) — grid-step overhead is not the
    # bottleneck; keep the smaller tile for VMEM headroom.
    r_tile = 512
    while rows % r_tile:
        r_tile //= 2
    vmem = min(
        4 * n * r_tile
        + 4 * r_tile * max(Cg, 128)
        + 12 * n * max(Cg, 128)
        + (4 << 20),
        120 << 20,
    )
    grid = (B, rows // r_tile)
    out_spec = pl.BlockSpec((None, n, C), lambda b, t: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, n, C), jnp.float32)
    in_specs = [
        pl.BlockSpec((None, r_tile, Cg), lambda b, t: (b, t, 0)),
        pl.BlockSpec((None, 1, r_tile), lambda b, t: (b, 0, t)),
    ]
    if init is None:
        kernel = functools.partial(_scatter_kernel, n=n, r_tile=r_tile, fold=fold)
        args = (g, idxt)
    else:
        kernel = functools.partial(
            _scatter_kernel_init, n=n, r_tile=r_tile, fold=fold
        )
        in_specs.append(pl.BlockSpec((None, n, C), lambda b, t: (b, 0, 0)))
        args = (g, idxt, init)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def grouped_gather(xyz, feats, new_xyz, pen, k, radius, interpret):
    """Fused neighborhood grouping with gradient flow to xyz/feats values.

    xyz (B, N, 3) fp32, feats (B, N, F), new_xyz (B, S, 3), pen (B, N, 1)
    fp32 (+BIG on masked points). Static: k, radius (None = kNN),
    interpret. Returns (centroids-on-lanes kernel layout):
      gxyz (B, k, 3, S) fp32 — neighbor coordinates,
      gfeat (B, k, F, S) feats.dtype — neighbor features,
      idx (B, k, S) int32, valid (B, k, S) fp32 in {0, 1}.

    Differentiation contract (matches XLA top_k+gather autodiff): the
    neighbor SELECTION is non-differentiable; gradients flow through the
    gathered VALUES back to xyz/feats rows (deterministic segment-sum VJP),
    and new_xyz/pen get zeros.
    """
    out, _ = _grouped_gather_fwd(xyz, feats, new_xyz, pen, k, radius, interpret)
    return out


# Ball-mode exactness envelope (ADVICE r3 #1): neighbor ranks ride a bf16
# tile (integers exact only up to 256) and point indices ride bf16 hi/lo
# channels (hi = i // 128 exact only while N/128 <= 128). Outside it the
# kernels would silently corrupt slot selection — fail loudly instead;
# callers (ops/geometry.py) gate their dispatch on the same bounds.
BALL_MAX_K = 256
BALL_MAX_N = 16384


def _check_ball_ranges(k, n, name):
    if k > BALL_MAX_K or n > BALL_MAX_N:
        raise ValueError(
            f"{name} ball mode needs k <= {BALL_MAX_K} (bf16 rank tile) and "
            f"N <= {BALL_MAX_N} (bf16 hi/lo index channels); got k={k}, "
            f"N={n} — use the XLA ball_query path for larger shapes"
        )


def _grouped_gather_fwd(xyz, feats, new_xyz, pen, k, radius, interpret):
    if radius is not None:
        _check_ball_ranges(k, xyz.shape[1], "grouped_gather")
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    cents_t = jnp.swapaxes(new_xyz[..., :3].astype(jnp.float32), 1, 2)
    if feats.dtype == jnp.bfloat16:
        # MXU path: exact one-hot selection of bf16 features; xyz precision
        # survives as split-bf16 hi/lo channels recombined in-kernel
        hi, lo = _split_bf16(xyz)
        parts = [hi, lo, feats]
        split = True
    else:
        parts = [xyz, feats.astype(jnp.float32)]
        split = False
    if radius is not None:
        # ball mode: the selected index rides the gather dot as hi/lo
        # channels (idx = hi*128 + lo; hi <= N/128 and lo <= 127 are exact
        # in bf16 for N <= 16384)
        i = jnp.arange(N, dtype=jnp.int32)
        ihl = jnp.broadcast_to(
            jnp.stack([i // 128, i % 128], -1).astype(parts[-1].dtype),
            (B, N, 2),
        )
        parts.append(ihl)
    p = jnp.concatenate(parts, axis=-1)
    p_t = jnp.swapaxes(p, 1, 2)  # (B, Cp, N)
    # centroid tile: ~8 (N, s_tile) fp32 temporaries must fit scoped VMEM
    s_tile = min(256, S, max(8, (10 << 20) // (8 * N * 4)))
    s_tile = 1 << (s_tile.bit_length() - 1)  # round down to a power of 2
    while S % s_tile:
        s_tile //= 2
    gx, gf, idx, valid = _group_gather_call(
        xyz, cents_t, p_t, pen.astype(jnp.float32),
        k=k, radius=radius, split_xyz=split, s_tile=s_tile,
        interpret=interpret,
    )
    out = (gx, gf, idx[:, :, 0, :], valid[:, :, 0, :])
    # residuals: idx + zero-size views carrying the input shapes/dtypes
    return out, (idx[:, :, 0, :], xyz[:, :, :0], feats[:, :, :0],
                 new_xyz[:, :0], pen[:, :0])


def _grouped_gather_bwd(k, radius, interpret, res, cots):
    idx, xyz0, feats0, nx0, pen0 = res
    N = xyz0.shape[1]
    g_gx, g_gf = cots[0], cots[1]  # (B,k,3,S) f32, (B,k,F,S); idx/valid non-diff
    B, _, _, S = g_gx.shape
    g = jnp.concatenate([g_gx, g_gf.astype(jnp.float32)], axis=2)
    g = g.transpose(0, 1, 3, 2).reshape(B, k * S, -1)  # (B, kS, 3+F)
    if feats0.dtype == jnp.bfloat16:
        g = g.astype(jnp.bfloat16)  # grads are activation-precision anyway
    scat = scatter_rows_pallas(g, idx.reshape(B, -1), N, interpret=interpret)
    d_xyz = scat[..., :3].astype(xyz0.dtype)
    d_feats = scat[..., 3:].astype(feats0.dtype)
    d_new_xyz = jnp.zeros((B, S, nx0.shape[-1]), nx0.dtype)
    return d_xyz, d_feats, d_new_xyz, jnp.zeros((B, N, 1), jnp.float32)


grouped_gather.defvjp(_grouped_gather_fwd, _grouped_gather_bwd)


def _group_ball_smajor_kernel(
    xyz_ref, cents_ref, p_ref, pen_ref, grp_ref, idx_ref, valid_ref,
    d_ref, g0_ref, idx0_ref, *, k, radius, split_xyz, n, s_tile, n_feat,
):
    """S-major fused ball grouping: centered-xyz+feature gather in the
    consumer's layout.

    The (B, k, C, S) layout of `_group_kernel` forces the SetAbstraction
    chain through two big XLA transposes plus a concat/pad round trip
    (~15-20 ms/step of PointNet2 at B=256, benchmarks/trace_top_ops.py).
    This variant puts centroids on SUBLANES instead: ranks are a
    (S_t, N) tile, the per-slot gather is one (S_t, N) @ (N, Cp) MXU dot
    whose (S_t, Cp) result is ALREADY row-major, the centroid subtraction
    and the [centered_xyz | feats] concat happen in-VMEM, and each slot
    stores to grp_ref[:, j, :] (dynamic-sublane store) — so the kernel
    emits the exact (B, S, k, 3+F) tensor sample_and_group's contract
    wants and the downstream reshape to (B, S*k, C) rows is free.

    Selection semantics are identical to _group_kernel's ball mode
    (reference pointnet2_utils.py:93-113: first k in-radius by index
    order, pad-with-first, blocked prefix-count ranks via one
    strictly-upper-triangular MXU dot per N-block). idx rides the gather
    dot as exact hi/lo channels (bf16) or one f32 channel.
    """
    pdt = p_ref.dtype
    nb = min(256, n)
    while n % nb:
        nb -= 1
    r2 = jnp.float32(radius * radius)
    kf = jnp.float32(k)
    # strictly-upper: U[i', i] = 1[i' < i] -> (vf @ U)[s, i] = exclusive
    # prefix count of in-ball points before i (within the block)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    ).astype(jnp.bfloat16)

    def blk(bi, carry):
        sl = pl.ds(bi * nb, nb)
        acc = pen_ref[0:1, sl]  # (1, nb) mask penalty, broadcasts over rows
        for c in range(3):
            diff = cents_ref[:, c : c + 1] - xyz_ref[c : c + 1, sl]
            acc = acc + diff * diff  # (s_tile, nb)
        # all compares stay f32: Mosaic/v5e has no bf16 comparison
        vf = (acc <= r2).astype(jnp.float32)
        r_in = jax.lax.dot_general(
            vf.astype(jnp.bfloat16), tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rank = r_in + carry
        d_ref[:, sl] = jnp.where(
            vf > 0.0, jnp.minimum(rank, kf), kf
        ).astype(d_ref.dtype)
        return carry + jnp.sum(vf, axis=1, keepdims=True)

    cnt = jax.lax.fori_loop(
        0, n // nb, blk, jnp.zeros((s_tile, 1), jnp.float32)
    )  # (s_tile, 1) in-ball count per centroid

    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (s_tile, n), 1) == 0
    ).astype(pdt)
    kiota = jax.lax.broadcasted_iota(jnp.int32, (s_tile, k), 1)

    # slots are processed 8 at a time so the grp store offset is always
    # 8-aligned: Mosaic rejects a dynamic (s_tile, 1, C) sublane store
    # unless C is a multiple of 8 ("index in dimension 2 must be a
    # multiple of 8"), but a (s_tile, 8, C) store at offset 8*jg lowers
    # for every C (entry requires k % 8 == 0)
    def slot_group(jg, _):
        j0 = jg * 8
        combs = []
        for u in range(8):
            j = j0 + u
            jf = jax.lax.convert_element_type(j, jnp.float32)
            sel = (d_ref[:, :].astype(jnp.float32) == jf).astype(pdt)
            # zero-in-ball columns: slot 0 falls back to point 0; where()
            # runs on numeric one-hots — bool select doesn't lower on Mosaic
            if u == 0:
                sel = jnp.where((j == 0) & (cnt <= 0.5), lane0, sel)
            gat = jax.lax.dot_general(
                sel, p_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(None if pdt == jnp.bfloat16
                           else jax.lax.Precision.HIGHEST),
            )  # (s_tile, Cp) f32
            if split_xyz:
                gx = gat[:, 0:3] + gat[:, 3:6]
                base = 6
                amin = (gat[:, -2:-1] * 128.0 + gat[:, -1:]).astype(jnp.int32)
            else:
                gx = gat[:, 0:3]
                base = 3
                amin = gat[:, -1:].astype(jnp.int32)
            gf = gat[:, base : base + n_feat]
            comb = jnp.concatenate([gx - cents_ref[:, 0:3], gf], axis=-1)
            vb = jf < cnt  # (s_tile, 1)

            if u == 0:
                @pl.when(jg == 0)
                def _():
                    g0_ref[:, :] = comb
                    idx0_ref[:, :] = amin

            # at j == 0 the scratch holds this slot's values -> the pad
            # select is the identity there (slot 0 is always emitted)
            combs.append(jnp.where(vb, comb, g0_ref[:, :]))
            # idx/valid have k on LANES: dynamic lane stores don't lower,
            # so write the full tile with a lane mask (k*k per slot — tiny)
            iv = jnp.where(vb, amin, idx0_ref[:, :])
            idx_ref[:, :] = jnp.where(kiota == j, iv, idx_ref[:, :])
            valid_ref[:, :] = jnp.where(
                kiota == j, vb.astype(jnp.float32), valid_ref[:, :]
            )
        grp_ref[:, pl.ds(j0, 8), :] = jnp.stack(
            combs, axis=1
        ).astype(grp_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k // 8, slot_group, 0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def grouped_gather_ball(xyz, feats, new_xyz, pen, k, radius,
                        interpret=False):
    """Fused ball grouping in SetAbstraction's input layout.

    xyz (B, N, 3) f32, feats (B, N, F) (bf16 -> split-xyz MXU path),
    new_xyz (B, S, 3), pen (B, N, 1) f32 (+BIG on masked points). Returns
      grouped (B, S, k, 3+F) in feats.dtype — [xyz - centroid | feats],
        the exact tensor sample_and_group hands SetAbstraction
        (reference pointnet2_utils.py:116-144, concat at :139),
      idx (B, S, k) int32,
      valid (B, S, k) f32 (1=in-ball).

    Differentiation: selection is non-differentiable; value gradients
    scatter back to xyz/feats rows (deterministic one-hot segment-sum),
    and the in-kernel centering routes -sum_k d(grouped_xyz) to new_xyz.
    """
    out, _ = _gg_ball_fwd(xyz, feats, new_xyz, pen, k, radius, interpret)
    return out


def _gg_ball_fwd(xyz, feats, new_xyz, pen, k, radius, interpret):
    if k % 8:
        raise ValueError(
            f"grouped_gather_ball needs k % 8 == 0 (8-slot aligned stores); "
            f"got k={k} — use group_neighbors for other k"
        )
    _check_ball_ranges(k, xyz.shape[1], "grouped_gather_ball")
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    cents = new_xyz[..., :3].astype(jnp.float32)  # (B, S, 3)
    i = jnp.arange(N, dtype=jnp.int32)
    if feats.dtype == jnp.bfloat16:
        hi, lo = _split_bf16(xyz)
        # idx = hi*128 + lo rides the dot exactly in bf16 for N <= 16384
        ihl = jnp.broadcast_to(
            jnp.stack([i // 128, i % 128], -1).astype(jnp.bfloat16),
            (B, N, 2),
        )
        p = jnp.concatenate([hi, lo, feats, ihl], axis=-1)
        split = True
    else:
        idxf = jnp.broadcast_to(
            i.astype(jnp.float32)[None, :, None], (B, N, 1)
        )
        p = jnp.concatenate([xyz, feats.astype(jnp.float32), idxf], axis=-1)
        split = False
    Cp = p.shape[-1]
    F = feats.shape[-1]
    C = 3 + F

    s_tile = min(256, S, max(8, (10 << 20) // (8 * N * 4)))
    s_tile = 1 << (s_tile.bit_length() - 1)
    while S % s_tile:
        s_tile //= 2

    kernel = functools.partial(
        _group_ball_smajor_kernel, k=k, radius=float(radius),
        split_xyz=split, n=N, s_tile=s_tile, n_feat=F,
    )
    isz = p.dtype.itemsize
    vmem = (
        5 * N * s_tile * 4  # rank tile + selector/compare temporaries
        # the 8-slot store group unrolls: 8 live selector/gather/comb sets
        + 8 * s_tile * (N + Cp + 3 * C) * 4
        + 2 * N * (Cp + 4) * isz
        + 2 * s_tile * k * (C * isz + 8)
        + (8 << 20)
    )
    grouped, idx, valid = pl.pallas_call(
        kernel,
        grid=(B, S // s_tile),
        in_specs=[
            pl.BlockSpec((None, 3, N), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((None, s_tile, 3), lambda b, s: (b, s, 0)),
            pl.BlockSpec((None, N, Cp), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((None, 1, N), lambda b, s: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, s_tile, k, C), lambda b, s: (b, s, 0, 0)),
            pl.BlockSpec((None, s_tile, k), lambda b, s: (b, s, 0)),
            pl.BlockSpec((None, s_tile, k), lambda b, s: (b, s, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, k, C), feats.dtype),
            jax.ShapeDtypeStruct((B, S, k), jnp.int32),
            jax.ShapeDtypeStruct((B, S, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((s_tile, N), jnp.bfloat16),
            pltpu.VMEM((s_tile, C), jnp.float32),
            pltpu.VMEM((s_tile, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 << 20)
        ),
        interpret=interpret,
    )(xyz_t, cents, p, jnp.swapaxes(pen, 1, 2))
    out = (grouped, idx, valid)
    return out, (idx, xyz[:, :, :0], feats[:, :, :0], new_xyz[:, :0])


def _gg_ball_bwd(k, radius, interpret, res, cots):
    idx, xyz0, feats0, nx0 = res
    N = xyz0.shape[1]
    dg = cots[0]  # (B, S, k, 3+F); idx/valid are non-diff
    B, S = idx.shape[0], idx.shape[1]
    g = dg.astype(jnp.float32)
    d_new_xyz = -jnp.sum(g[..., :3], axis=2)  # centering term
    g2 = g.reshape(B, S * k, -1)
    if feats0.dtype == jnp.bfloat16:
        g2 = g2.astype(jnp.bfloat16)  # grads are activation-precision anyway
    scat = scatter_rows_pallas(g2, idx.reshape(B, -1), N,
                               interpret=interpret)
    d_xyz = scat[..., :3].astype(xyz0.dtype)
    d_feats = scat[..., 3:].astype(feats0.dtype)
    return (d_xyz, d_feats, d_new_xyz.astype(nx0.dtype),
            jnp.zeros((B, N, 1), jnp.float32))


grouped_gather_ball.defvjp(_gg_ball_fwd, _gg_ball_bwd)


def _group_knn_smajor_kernel(
    *refs, k, split_xyz, emit_xyz, n, s_tile, n_feat, bb,
):
    """S-major fused kNN grouping (reference knn_point, pointmlp.py:106-124).

    The (B, k, C, S) layout of `_group_kernel`'s kNN mode forced PointMLP's
    LocalGrouper through five ~100 MB XLA layout copies per train step at
    B=32 (813 MB/step of pure relayout traffic, benchmarks/trace_top_ops.py)
    — the same disease the ball-mode S-major rework cured for PointNet2.
    This variant keeps centroids on SUBLANES: distance tiles are
    (bb*S_t, N) with `bb` batch elements stacked as sublane bands, slot
    gathers are (8*S_t, N) @ (N, Cp) MXU dots whose row-major results land
    directly in the public (B, S, k, C) contract.

    Selection: iterative lane-min extraction with deterministic
    lowest-index tie-break — slot order IS distance order, matching
    torch.topk / lax.top_k exactly. (A bit-radix threshold + prefix-count
    rank variant was benchmarked in round 4 and lost: 31 dependent
    compare+count passes over the (rows, N) tile cost more VPU traffic
    than k=24 min extractions at every shipped shape — 22.3 ms vs 16.5 ms
    total over the four PointMLP stages at B=32.)

    Two emission optimizations over the r3 kernel:
    - 8 slot one-hots stack into sel_ref so each gather is ONE
      (8*S_t, N) @ (N, Cp) MXU dot instead of 8 (S_t, N) dots.
    - emit_xyz=False drops the grouped-xyz output AND its gather channels
      entirely: a (B, S, k, 3) f32 output puts 3 elements on the 128-lane
      axis, and its tile-padded 12-byte strided HBM writes are ~20% of the
      kernel's runtime — while PointMLP's LocalGrouper (use_xyz=False, the
      shipped config) discards grouped_xyz unread.

    Slots past the valid count replicate slot 0 (the nearest valid point —
    the documented underfilled-mask semantics).
    """
    if emit_xyz:
        (xyz_ref, cents_ref, p_ref, pen_ref, gx_ref, gf_ref, idx_ref,
         d_ref, sel_ref, g0_ref, idx0_ref, cv_ref) = refs
    else:
        (xyz_ref, cents_ref, p_ref, pen_ref, gf_ref, idx_ref,
         d_ref, sel_ref, g0_ref, idx0_ref, cv_ref) = refs
    BIG = jnp.float32(1e9)
    pdt = p_ref.dtype
    ones_n = jnp.ones((n, 1), jnp.bfloat16)

    def count(ind):  # (rows, n) 0/1 f32 -> (rows, 1) f32, exact
        return jax.lax.dot_general(
            ind.astype(jnp.bfloat16), ones_n,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for u in range(bb):
        acc = pen_ref[u, 0:1, :]  # (1, N) mask penalty, broadcasts over rows
        for c in range(3):
            diff = cents_ref[u, :, c : c + 1] - xyz_ref[u, c : c + 1, :]
            acc = acc + diff * diff  # (s_tile, N)
        d_ref[u * s_tile : (u + 1) * s_tile, :] = acc
    # valid-point count per centroid row (pad-slot selection threshold)
    cv_ref[:, :] = count((d_ref[:, :] < 0.5 * BIG).astype(jnp.float32))

    # extraction + emission, slots in groups of 8: each argmin runs over
    # the FULL (bb*S_t, N) tile (one lane-reduce for all bands — every ref
    # access in the hot loop is statically indexed; dynamic per-band
    # sublane offsets measurably slow Mosaic's addressing), the 8 slot
    # one-hots land in sel_ref band-major, and each band's gather is ONE
    # (8*S_t, N) @ (N, Cp) MXU dot whose (s_tile, 8, C) stores stay
    # 8-aligned in dim 2 (Mosaic constraint, same as the ball kernel).
    # The slot-group loop MUST be a fori_loop: Mosaic's scoped stack does
    # not reuse slots across unrolled iterations (~11 MB of live
    # temporaries per group x k/8 groups blew the 128 MB space when
    # unrolled).
    Cp = p_ref.shape[-1]
    xoff = 3 if emit_xyz else 0
    rows = bb * s_tile
    laneid_r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    kiota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def group(jg, idxt):
        j0 = jg * 8
        ims = []
        for v in range(8):
            d = d_ref[:, :]  # (rows, N)
            m = jnp.min(d, axis=1, keepdims=True)  # (rows, 1)
            im = jnp.min(
                jnp.where(d == m, laneid_r, n), axis=1, keepdims=True
            ).astype(jnp.int32)
            one = laneid_r == im
            d_ref[:, :] = jnp.where(one, BIG, d)
            oh = one.astype(pdt)
            for u in range(bb):
                sel_ref[(u * 8 + v) * s_tile : (u * 8 + v + 1) * s_tile, :] \
                    = oh[u * s_tile : (u + 1) * s_tile, :]
            ims.append(im)

        gats = []
        for u in range(bb):
            gats.append(jax.lax.dot_general(
                sel_ref[u * 8 * s_tile : (u + 1) * 8 * s_tile, :],
                p_ref[u, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(None if pdt == jnp.bfloat16
                           else jax.lax.Precision.HIGHEST),
            ))  # (8*s_tile, Cp) f32, p band indexed statically

        combx = [[] for _ in range(bb)]
        combf = [[] for _ in range(bb)]
        for v in range(8):
            j = j0 + v
            jf = jax.lax.convert_element_type(j, jnp.float32)
            ivs = []
            for u in range(bb):
                r0 = u * s_tile
                gat = gats[u][v * s_tile : (v + 1) * s_tile, :]
                im = ims[v][r0 : r0 + s_tile, :]
                if emit_xyz:
                    gx = (gat[:, 0:3] + gat[:, 3:6]) if split_xyz \
                        else gat[:, 0:3]
                else:
                    gx = None
                gf = gat[:, xoff * (2 if split_xyz else 1):][:, :n_feat]
                vb = jf < cv_ref[r0 : r0 + s_tile, :]  # (s_tile, 1)

                if v == 0:
                    @pl.when(jg == 0)
                    def _(gx=gx, gf=gf, im=im, r0=r0):
                        if emit_xyz:
                            g0_ref[r0 : r0 + s_tile, :] = jnp.concatenate(
                                [gx, gf], axis=-1
                            )
                        else:
                            g0_ref[r0 : r0 + s_tile, :] = gf
                        idx0_ref[r0 : r0 + s_tile, :] = im

                # at j == 0 the scratch holds this slot's values -> the pad
                # select is the identity there (slot 0 is always emitted)
                g0 = g0_ref[r0 : r0 + s_tile, :]
                if emit_xyz:
                    combx[u].append(jnp.where(vb, gx, g0[:, 0:3]))
                combf[u].append(jnp.where(vb, gf, g0[:, xoff : xoff + n_feat]))
                ivs.append(jnp.where(vb, im, idx0_ref[r0 : r0 + s_tile, :]))
            # idx has k on LANES: dynamic lane stores don't lower — carry
            # the (rows, k) tile and lane-mask one slot per pass
            idxt = jnp.where(
                kiota_r == j, jnp.concatenate(ivs, axis=0), idxt
            )
        for u in range(bb):
            if emit_xyz:
                gx_ref[u : u + 1, :, pl.ds(j0, 8), :] = jnp.stack(
                    combx[u], axis=1
                ).reshape(1, s_tile, 8, 3)
            gf_ref[u : u + 1, :, pl.ds(j0, 8), :] = jnp.stack(
                combf[u], axis=1
            ).astype(gf_ref.dtype).reshape(1, s_tile, 8, n_feat)
        return idxt

    idxt = jax.lax.fori_loop(
        0, k // 8, group, jnp.zeros((rows, k), jnp.int32)
    )
    for u in range(bb):
        idx_ref[u : u + 1, :, :] = idxt[
            u * s_tile : (u + 1) * s_tile, :
        ].reshape(1, s_tile, k)


def _gg_knn_call(xyz, feats, new_xyz, pen, k, interpret, emit_xyz):
    """Shared fwd driver for grouped_gather_knn / grouped_gather_knn_feats.

    Returns (gx, gf, idx) with gx=None when emit_xyz is False (the xyz
    gather channels are then dropped from the MXU dot entirely)."""
    if k % 8:
        raise ValueError(
            f"grouped_gather_knn needs k % 8 == 0 (8-slot aligned stores); "
            f"got k={k} — use group_neighbors' XLA path for other k"
        )
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    xyz_t = jnp.swapaxes(xyz, 1, 2)  # (B, 3, N)
    cents = new_xyz[..., :3].astype(jnp.float32)  # (B, S, 3)
    # selection indices come straight from the in-kernel argmin (i32), so
    # no index channels ride the gather dot and there is no bf16 N ceiling
    if feats.dtype == jnp.bfloat16:
        if emit_xyz:
            # xyz rides the bf16 dot as exact hi/lo split channels
            hi, lo = _split_bf16(xyz)
            p = jnp.concatenate([hi, lo, feats], axis=-1)
        else:
            p = feats
        split = True
    else:
        if emit_xyz:
            p = jnp.concatenate([xyz, feats.astype(jnp.float32)], axis=-1)
        else:
            p = feats.astype(jnp.float32)
        split = False
    Cp = p.shape[-1]
    F = feats.shape[-1]

    s_tile = min(256, S, max(8, (10 << 20) // (8 * N * 4)))
    s_tile = 1 << (s_tile.bit_length() - 1)
    while S % s_tile:
        s_tile //= 2

    # batch bands amortize per-grid-step overhead (input DMA setup); bound
    # rows = bb*s_tile by a ~2 MB distance tile so Mosaic's live (rows, N)
    # temporaries stay within the scoped-VMEM budget.
    rows_budget = max(8, (2 << 20) // (N * 4))
    bb = max(1, min(8, rows_budget // s_tile))
    while B % bb:
        bb -= 1
    # Mosaic does not reuse stack slots across the 8 unrolled argmin passes
    # (~2 live (s_tile, N) f32 temporaries each per band) nor across the
    # unrolled per-band emission (gather result + pad-select temps). The
    # scoped-stack model below (x1.25 safety) reproduces the compiler's
    # measured allocations within ~5% on the shapes that OOM'd during
    # bring-up (94.3 MB at stage-4 bb=8, 103.8 MB at stage-3-xyz bb=4);
    # bound bb so the grant stays under 112 MB — past that the pipeline's
    # window buffers no longer fit in the 128 MB core and Mosaic falls off
    # a ~20x serialization cliff (measured, round 4).
    xoffF = (3 if emit_xyz else 0) + F
    isz = p.dtype.itemsize

    def _scoped_est(b):
        ext = 16 * s_tile * N * 4 * b
        # xyz emission keeps an extra set of pad-select temporaries live
        # (combx tiles pad 3 lanes -> 128): measured 125.3 MB at stage-4
        # bb=8 vs 94.3 MB for the feats-only variant of the same shape
        emit = 8 * s_tile * 4 * (Cp + (3 if emit_xyz else 2) * xoffF) * b
        sel = b * 8 * s_tile * N * isz
        return (ext + emit + sel + (16 << 20)) * 5 // 4

    while bb > 1 and _scoped_est(bb) > (112 << 20):
        bb -= 1
    while B % bb:
        bb -= 1

    kernel = functools.partial(
        _group_knn_smajor_kernel, k=k, split_xyz=split, emit_xyz=emit_xyz,
        n=N, s_tile=s_tile, n_feat=F, bb=bb,
    )
    # grant exactly the modeled scoped need (floor 72 MB): over-granting
    # starves the pipeline windows and serializes the grid (the 20x cliff
    # noted above), under-granting fails the compile outright
    vmem = max(_scoped_est(bb), 72 << 20)
    out_specs = [
        pl.BlockSpec((bb, s_tile, k, F), lambda b, s: (b, s, 0, 0)),
        pl.BlockSpec((bb, s_tile, k), lambda b, s: (b, s, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, S, k, F), feats.dtype),
        jax.ShapeDtypeStruct((B, S, k), jnp.int32),
    ]
    if emit_xyz:
        out_specs.insert(
            0, pl.BlockSpec((bb, s_tile, k, 3), lambda b, s: (b, s, 0, 0))
        )
        out_shape.insert(0, jax.ShapeDtypeStruct((B, S, k, 3), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B // bb, S // s_tile),
        in_specs=[
            pl.BlockSpec((bb, 3, N), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((bb, s_tile, 3), lambda b, s: (b, s, 0)),
            pl.BlockSpec((bb, N, Cp), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((bb, 1, N), lambda b, s: (b, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((bb * s_tile, N), jnp.float32),
            pltpu.VMEM((bb * 8 * s_tile, N), p.dtype),
            pltpu.VMEM(
                (bb * s_tile, (3 if emit_xyz else 0) + F), jnp.float32
            ),
            pltpu.VMEM((bb * s_tile, 1), jnp.int32),
            pltpu.VMEM((bb * s_tile, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 << 20)
        ),
        interpret=interpret,
    )(xyz_t, cents, p, jnp.swapaxes(pen, 1, 2))
    if emit_xyz:
        gx, gf, idx = outs
    else:
        gf, idx = outs
        gx = None
    return gx, gf, idx


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def grouped_gather_knn(xyz, feats, new_xyz, pen, k, interpret=False):
    """Fused kNN grouping in the public row-major layout.

    xyz (B, N, 3) f32, feats (B, N, F) (bf16 -> split-xyz MXU path),
    new_xyz (B, S, 3), pen (B, N, 1) f32 (+BIG on masked points). Returns
      grouped_xyz (B, S, k, 3) f32 — NOT centered,
      grouped_feats (B, S, k, F) feats.dtype,
      idx (B, S, k) int32.
    Requires k % 8 == 0 (8-slot aligned stores). Slot order is distance
    order with deterministic lowest-index tie-break — exact lax.top_k /
    torch.topk parity; indices come from the in-kernel argmin, so no
    index channels ride the gather dot and there is no bf16 N ceiling.
    Prefer grouped_gather_knn_feats when grouped_xyz is unused — the
    (B, S, k, 3) output's 12-byte strided HBM writes are expensive.

    Differentiation: selection is non-differentiable; value gradients
    scatter back to xyz/feats rows (deterministic one-hot segment-sum);
    new_xyz/pen get zeros (matches XLA top_k+gather autodiff).
    """
    return _gg_knn_fwd(xyz, feats, new_xyz, pen, k, interpret)[0]


def _gg_knn_fwd(xyz, feats, new_xyz, pen, k, interpret):
    out = _gg_knn_call(xyz, feats, new_xyz, pen, k, interpret, True)
    return out, (out[2], xyz[:, :, :0], feats[:, :, :0], new_xyz[:, :0])


def _gg_knn_bwd(k, interpret, res, cots):
    idx, xyz0, feats0, nx0 = res
    N = xyz0.shape[1]
    dgx, dgf = cots[0], cots[1]  # (B, S, k, 3) f32, (B, S, k, F); idx non-diff
    B, S = idx.shape[0], idx.shape[1]
    g = jnp.concatenate(
        [dgx.astype(jnp.float32), dgf.astype(jnp.float32)], axis=-1
    ).reshape(B, S * k, -1)  # already row-major: no transpose
    if feats0.dtype == jnp.bfloat16:
        g = g.astype(jnp.bfloat16)  # grads are activation-precision anyway
    scat = scatter_rows_pallas(g, idx.reshape(B, -1), N, interpret=interpret)
    d_xyz = scat[..., :3].astype(xyz0.dtype)
    d_feats = scat[..., 3:].astype(feats0.dtype)
    return (d_xyz, d_feats, jnp.zeros((B, S, nx0.shape[-1]), nx0.dtype),
            jnp.zeros((B, N, 1), jnp.float32))


grouped_gather_knn.defvjp(_gg_knn_fwd, _gg_knn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def grouped_gather_knn_feats(xyz, feats, new_xyz, pen, k, interpret=False):
    """grouped_gather_knn without the grouped-xyz output: returns
    (grouped_feats (B, S, k, F), idx (B, S, k) int32).

    The xyz gather channels are dropped from the MXU dot and the
    (B, S, k, 3) f32 output — whose 3-lane tiles cost 12-byte strided HBM
    writes worth ~20% of the kernel runtime — is never materialized. This is
    the LocalGrouper path: PointMLP ships use_xyz=False and reads only the
    grouped features (reference pointmlp.py:150-178). Same selection
    semantics and slot order as grouped_gather_knn.
    """
    return _gg_knnf_fwd(xyz, feats, new_xyz, pen, k, interpret)[0]


def _gg_knnf_fwd(xyz, feats, new_xyz, pen, k, interpret):
    _, gf, idx = _gg_knn_call(xyz, feats, new_xyz, pen, k, interpret, False)
    return (gf, idx), (idx, xyz[:, :, :0], feats[:, :, :0], new_xyz[:, :0])


def _gg_knnf_bwd(k, interpret, res, cots):
    idx, xyz0, feats0, nx0 = res
    N = xyz0.shape[1]
    dgf = cots[0]  # (B, S, k, F); idx non-diff
    B, S = idx.shape[0], idx.shape[1]
    g = dgf.astype(
        jnp.bfloat16 if feats0.dtype == jnp.bfloat16 else jnp.float32
    ).reshape(B, S * k, -1)
    scat = scatter_rows_pallas(g, idx.reshape(B, -1), N, interpret=interpret)
    return (jnp.zeros((B, N, 3), xyz0.dtype), scat.astype(feats0.dtype),
            jnp.zeros((B, S, nx0.shape[-1]), nx0.dtype),
            jnp.zeros((B, N, 1), jnp.float32))


grouped_gather_knn_feats.defvjp(_gg_knnf_fwd, _gg_knnf_bwd)



############################ FPS ############################


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
