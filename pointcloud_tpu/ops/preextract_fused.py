"""Fused PointMLP PreExtraction block: Dense+BN residual stack + K-pool.

Reference semantics: pointcloud_vision/models/pointmlp.py:227-256 —
PreExtraction applies ConvBNReLU1D (embed) then `blocks` ConvBNReLURes1D
residual blocks to every neighborhood row, then max-pools over the K
neighbors. Under XLA each of the 1+2*blocks Dense+BN layers streams the
full (B, G, K, C) activation tensor (~200 MB bf16 per full-PointMLP stage)
to HBM for the layer output, the BatchNorm statistics pass, and the
normalize pass — and the backward re-streams all of it. Measured ~22-27 ms
per stage fwd+bwd at B=32 (benchmarks/preextract_profile.py), ~95 ms of the
104 ms full-PointMLP train step (VERDICT r2 weak #1).

This module rebuilds the block as a chain of Pallas passes in which the
POST-BN activations never exist in HBM:

  forward (one pass per layer):
    pass l reads h_{l-1} (the raw pre-BN output of the previous Dense,
    stored in HBM), applies BN_{l-1} (statistics finalized by pass l-1) +
    ReLU (+ the residual add) in VMEM, runs the layer matmul on the MXU,
    accumulates fp32 sum/sum-of-squares for BN_l in the epilogue, and
    writes only the raw h_l. BN statistics therefore cost no extra pass at
    all, and each layer moves 2 tensors (read h_{l-1}, write h_l) instead
    of XLA's ~4.
  pool pass: reads h_last (+ the residual), pools the PRE-relu values over
    K with a deterministic lowest-index argmax, and emits the (B, G, C)
    pooled output plus the per-(group, channel) argmax and the gathered
    h_last rows for the backward.

  backward (one pass per layer, reverse order): BN train-mode backward
    needs the global sums Sd = sum(dz), Se = sum(dz*zhat) of each layer
    finalized before the upstream cotangent exists, so pass p computes
      dh_up = c1*dz_up - c4 - c3*(h_up - mu)       [BN backward, scalars
                                                    folded outside]
      da_down = dh_up @ W_up^T (+ pool/skip shares)
      dz_down = da_down * 1[pre_down > 0]          [pre_down recomputed
                                                    from h_down in VMEM]
    accumulating (Sd_down, Se_down, dW_up) on the fly. The pool cotangent
    enters as a sparse (dout, argmax) pair and is scattered in-kernel; no
    dense dz for the pooled layer ever exists.

Numerics: h_l is rounded to the activation dtype exactly like flax Dense
(f32 MXU accumulation, cast to dtype); BN normalize + ReLU run in f32 from
the rounded h and the result is rounded to dtype before feeding the next
matmul. `preextract_pool_reference` is the XLA oracle with identical
op-for-op semantics (tests pin kernel == oracle in interpret mode, and
module-level fused-vs-flax-stack parity within bf16 tolerance).

Supported: blocks in {1, 2} (1 + 2*blocks Dense+BN layers), use_bias=False
(the PointMLP/PointMLPElite configs), no validity masks (PreExtraction has
none), groups=1. ssum/ssq outputs feed the running-average update only —
gradients through them are supported via the same c3/c4 folding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _row_tile(rows: int, pool: int, C: int, aligned: bool = False) -> int:
    """Largest multiple of `pool` dividing `rows` with tile*C <= ~512K el
    (the backward pass holds ~12 live f32 tiles on the Mosaic scoped stack;
    512K el * 4 B * 12 ~= 24 MB leaves pipeline headroom under the VMEM
    cap).

    aligned=True: the kernel indexes (nb, C) refs at per-tile group
    granularity (pl.ds(t*bpt, bpt)); Mosaic requires such dynamic sublane
    offsets to be provably multiples of 8, so bpt must be a multiple of 8
    unless the whole pass is a single tile (offset statically 0)."""
    nb = rows // pool
    bpt = max(1, (512 * 1024) // max(C * pool, 1))
    bpt = min(bpt, nb)
    step = 8 if (aligned and nb % 8 == 0) else 1
    bpt = max(step, bpt - bpt % step)
    while nb % bpt and bpt > step:
        bpt -= step
    if nb % bpt or (aligned and bpt != nb and bpt % 8):
        # single tile: offsets are static. This discards the ~512K-element
        # tile budget, so fail loudly rather than silently blowing the
        # backward pass's scoped-VMEM stack (ADVICE r3 #3): a single tile
        # is only admissible while it stays within ~4x the budget.
        if nb * pool * C > 4 * 512 * 1024:
            raise ValueError(
                f"_row_tile: rows//pool={nb} has no "
                f"{'8-aligned ' if aligned else ''}divisor giving tiles "
                f"<= ~512K elements, and one tile would be "
                f"{nb * pool * C} elements (> 4x budget). Pad rows/pool "
                f"to a power-of-two-friendly shape."
            )
        bpt = nb
    return bpt * pool


def _dot(a, b, f32_dots):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if f32_dots else None,
    )


def _dot_t(a, b, f32_dots):
    """a (R, Cd), b (R, Cu) -> a^T @ b (Cd, Cu)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if f32_dots else None,
    )


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _mm_stats_kernel(x_ref, w_ref, h_ref, ssum_ref, ssq_ref,
                     *, rows, r_tile, dtype, f32_dots):
    """h = (x @ W) rounded to dtype; fp32 ssum/ssq of h in the epilogue."""
    b = pl.program_id(0)
    C = w_ref.shape[1]

    @pl.when(b == 0)
    def _():
        ssum_ref[:, :] = jnp.zeros((1, C), jnp.float32)
        ssq_ref[:, :] = jnp.zeros((1, C), jnp.float32)

    def tile(t, acc):
        s, q = acc
        z = _dot(x_ref[pl.ds(t * r_tile, r_tile), :], w_ref[:, :], f32_dots)
        z = z.astype(dtype)
        h_ref[pl.ds(t * r_tile, r_tile), :] = z
        zf = z.astype(jnp.float32)
        return s + jnp.sum(zf, axis=0, keepdims=True), \
            q + jnp.sum(zf * zf, axis=0, keepdims=True)

    s, q = jax.lax.fori_loop(
        0, rows // r_tile, tile,
        (jnp.zeros((1, C), jnp.float32), jnp.zeros((1, C), jnp.float32)),
    )
    ssum_ref[:, :] += s
    ssq_ref[:, :] += q


def _bn_act(hf, sc_ref):
    """relu-input pre-activation from f32 h: (h - mu) * mul + beta.

    sc rows: 0=mu, 1=mul (gamma*rsqrt(var+eps)), 2=beta, 3=rsig.
    """
    return (hf - sc_ref[0:1, :]) * sc_ref[1:2, :] + sc_ref[2:3, :]


RES_NONE, RES_BNRELU, RES_DENSE = 0, 1, 2


def _bnact_mm_stats_kernel(*refs, rows, r_tile, dtype, f32_dots, res_mode,
                           write_r):
    """a = relu(BN(h_in) [+ res]); h_out = a @ W; stats epilogue.

    res_mode: RES_NONE | RES_BNRELU (res = relu(BN(h_b))) | RES_DENSE
    (res = stored r tensor). write_r additionally stores a (the next
    residual) to HBM.
    """
    i = 0
    h_ref = refs[i]; i += 1
    sc_ref = refs[i]; i += 1
    if res_mode == RES_BNRELU:
        hb_ref = refs[i]; i += 1
        scb_ref = refs[i]; i += 1
    elif res_mode == RES_DENSE:
        rd_ref = refs[i]; i += 1
    w_ref = refs[i]; i += 1
    hout_ref = refs[i]; i += 1
    if write_r:
        rout_ref = refs[i]; i += 1
    ssum_ref = refs[i]; i += 1
    ssq_ref = refs[i]; i += 1

    b = pl.program_id(0)
    C = w_ref.shape[1]

    @pl.when(b == 0)
    def _():
        ssum_ref[:, :] = jnp.zeros((1, C), jnp.float32)
        ssq_ref[:, :] = jnp.zeros((1, C), jnp.float32)

    def tile(t, acc):
        s, q = acc
        sl = pl.ds(t * r_tile, r_tile)
        pre = _bn_act(h_ref[sl, :].astype(jnp.float32), sc_ref)
        if res_mode == RES_BNRELU:
            rb = _bn_act(hb_ref[sl, :].astype(jnp.float32), scb_ref)
            pre = pre + jnp.maximum(rb, 0.0)
        elif res_mode == RES_DENSE:
            pre = pre + rd_ref[sl, :].astype(jnp.float32)
        a = jnp.maximum(pre, 0.0).astype(dtype)
        if write_r:
            rout_ref[sl, :] = a
        z = _dot(a, w_ref[:, :], f32_dots).astype(dtype)
        hout_ref[sl, :] = z
        zf = z.astype(jnp.float32)
        return s + jnp.sum(zf, axis=0, keepdims=True), \
            q + jnp.sum(zf * zf, axis=0, keepdims=True)

    s, q = jax.lax.fori_loop(
        0, rows // r_tile, tile,
        (jnp.zeros((1, C), jnp.float32), jnp.zeros((1, C), jnp.float32)),
    )
    ssum_ref[:, :] += s
    ssq_ref[:, :] += q


_SENT = -1e9  # all-masked-group sentinel (models/pointnet.py masked_max)


def _bn_respool_kernel(*refs, rows, pool, r_tile, dtype, res_mode, masked,
                       pool_relu=True):
    """v = BN(h_last) + res (PRE-relu, f32); out = relu(max_pool(v));
    lowest-index argmax + gathered h_last rows for the backward.

    masked=True (plain/SetAbstraction mode): a (rows, 1) penalty ref (+BIG
    on invalid rows) excludes rows from the pool (stats upstream still saw
    them — the documented BN/mask contract); all-masked groups emit the
    masked_max sentinel (and get zero gradient via the maxv>0 relu gate).
    """
    i = 0
    h_ref = refs[i]; i += 1
    sc_ref = refs[i]; i += 1
    if res_mode == RES_BNRELU:
        hb_ref = refs[i]; i += 1
        scb_ref = refs[i]; i += 1
    elif res_mode == RES_DENSE:
        rd_ref = refs[i]; i += 1
    if masked:
        pen_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    maxv_ref = refs[i]; i += 1
    amax_ref = refs[i]; i += 1
    hsel_ref = refs[i]; i += 1

    C = h_ref.shape[1]
    bpt = r_tile // pool
    within = jax.lax.broadcasted_iota(jnp.int32, (bpt, pool, C), 1)

    def tile(t, _):
        sl = pl.ds(t * r_tile, r_tile)
        hf = h_ref[sl, :].astype(jnp.float32)
        v = _bn_act(hf, sc_ref)
        if res_mode == RES_BNRELU:
            rb = _bn_act(hb_ref[sl, :].astype(jnp.float32), scb_ref)
            v = v + jnp.maximum(rb, 0.0)
        elif res_mode == RES_DENSE:
            v = v + rd_ref[sl, :].astype(jnp.float32)
        v3 = v.reshape(bpt, pool, C)
        if masked:
            # pen rides in (nb, pool) layout (dense lanes)
            v3 = v3 - pen_ref[pl.ds(t * bpt, bpt), :][:, :, None]
        mx = jnp.max(v3, axis=1)  # (bpt, C) f32
        amx = jnp.min(
            jnp.where(v3 == mx[:, None, :], within, pool), axis=1
        ).astype(jnp.int32)
        h3 = hf.reshape(bpt, pool, C)
        hsel = jnp.sum(jnp.where(within == amx[:, None, :], h3, 0.0), axis=1)
        off = t * bpt
        # pool_relu=False (e.g. PointNet's final pre-bottleneck pool,
        # reference pointnet.py:159-161 conv3+bn3 without ReLU) emits the
        # raw pooled post-BN value
        out = jnp.maximum(mx, 0.0) if pool_relu else mx
        if masked:
            # all-masked groups: keep the sentinel, not relu's 0
            out = jnp.where(mx < jnp.float32(0.5 * _SENT), jnp.float32(_SENT),
                            out)
        out_ref[pl.ds(off, bpt), :] = out.astype(dtype)
        maxv_ref[pl.ds(off, bpt), :] = mx
        amax_ref[pl.ds(off, bpt), :] = amx
        hsel_ref[pl.ds(off, bpt), :] = hsel
        return 0

    jax.lax.fori_loop(0, rows // r_tile, tile, 0)


# ---------------------------------------------------------------------------
# backward pass kernel (one per layer, reverse order)
# ---------------------------------------------------------------------------


def _bwd_pass_kernel(*refs, rows, pool, r_tile, dtype, f32_dots,
                     sparse_up, down_bn, res_mode, skip_pool, skip_dense,
                     pool_relu=True):
    """dh_up = c1*dz_up - c4 - c3*(h_up - mu); da = dh_up @ Wt (+ shares);
    dz_down = da * 1[pre_down > 0]; accumulate Sd/Se_down and dW_up.

    up-scalars uc rows: 0=c1, 1=c4, 2=c3, 3=mu (BN backward + the
    ssum/ssq-cotangent injection folded by the wrapper).
    down-scalars sc rows as in _bn_act (+ rsig at row 3 for Se).
    """
    i = 0
    hu_ref = refs[i]; i += 1
    uc_ref = refs[i]; i += 1
    if sparse_up:
        dout_ref = refs[i]; i += 1
        pamax_ref = refs[i]; i += 1
        maxv_ref = refs[i]; i += 1
    else:
        dz_ref = refs[i]; i += 1
    wt_ref = refs[i]; i += 1
    if down_bn:
        hd_ref = refs[i]; i += 1
        sc_ref = refs[i]; i += 1
        if res_mode == RES_BNRELU:
            hb_ref = refs[i]; i += 1
            scb_ref = refs[i]; i += 1
        elif res_mode == RES_DENSE:
            rd_ref = refs[i]; i += 1
        if skip_pool:
            dout2_ref = refs[i]; i += 1
            pamax2_ref = refs[i]; i += 1
            maxv2_ref = refs[i]; i += 1
        if skip_dense:
            dskip_ref = refs[i]; i += 1
    else:
        x0_ref = refs[i]; i += 1  # row-major chain input (rows, Cd)
    # outputs
    dzd_ref = refs[i]; i += 1
    if down_bn:
        sd_ref = refs[i]; i += 1
        se_ref = refs[i]; i += 1
    dw_ref = refs[i]; i += 1
    dw_acc = refs[i]; i += 1

    b = pl.program_id(0)
    Cu = hu_ref.shape[1]
    Cd = wt_ref.shape[1]
    bpt = r_tile // pool

    @pl.when(b == 0)
    def _():
        dw_ref[:, :] = jnp.zeros((Cd, Cu), jnp.float32)
        if down_bn:
            sd_ref[:, :] = jnp.zeros((1, Cd), jnp.float32)
            se_ref[:, :] = jnp.zeros((1, Cd), jnp.float32)

    dw_acc[:, :] = jnp.zeros((Cd, Cu), jnp.float32)
    if sparse_up or skip_pool:
        within_u = jax.lax.broadcasted_iota(jnp.int32, (bpt, pool, Cu), 1)
    if skip_pool:
        within_d = jax.lax.broadcasted_iota(jnp.int32, (bpt, pool, Cd), 1)

    def tile(t, acc):
        sl = pl.ds(t * r_tile, r_tile)
        off = t * bpt
        huf = hu_ref[sl, :].astype(jnp.float32)
        if sparse_up:
            do = dout_ref[pl.ds(off, bpt), :]
            mv = maxv_ref[pl.ds(off, bpt), :]
            am = pamax_ref[pl.ds(off, bpt), :]
            # pool_relu gates the pool cotangent at 0 (drelu); without the
            # final relu only the all-masked sentinel groups are cut
            gate = 0.0 if pool_relu else 0.5 * _SENT
            dz3 = jnp.where(
                jnp.logical_and(within_u == am[:, None, :],
                                (mv > gate)[:, None, :]),
                do[:, None, :], 0.0,
            )
            dz = dz3.reshape(r_tile, Cu)
        else:
            dz = dz_ref[sl, :].astype(jnp.float32)
        dh = (
            uc_ref[0:1, :] * dz - uc_ref[1:2, :]
            - uc_ref[2:3, :] * (huf - uc_ref[3:4, :])
        )
        dh16 = dh.astype(dtype)
        da = _dot(dh16, wt_ref[:, :], f32_dots)  # (r_tile, Cd) f32

        if down_bn:
            hdf = hd_ref[sl, :].astype(jnp.float32)
            pre = _bn_act(hdf, sc_ref)
            if res_mode == RES_BNRELU:
                rb = _bn_act(hb_ref[sl, :].astype(jnp.float32), scb_ref)
                pre = pre + jnp.maximum(rb, 0.0)
            elif res_mode == RES_DENSE:
                pre = pre + rd_ref[sl, :].astype(jnp.float32)
            if skip_pool:
                do2 = dout2_ref[pl.ds(off, bpt), :]
                mv2 = maxv2_ref[pl.ds(off, bpt), :]
                am2 = pamax2_ref[pl.ds(off, bpt), :]
                sh3 = jnp.where(
                    jnp.logical_and(within_d == am2[:, None, :],
                                    (mv2 > 0.0)[:, None, :]),
                    do2[:, None, :], 0.0,
                )
                da = da + sh3.reshape(r_tile, Cd)
            if skip_dense:
                da = da + dskip_ref[sl, :].astype(jnp.float32)
            in_up = jnp.maximum(pre, 0.0).astype(dtype)  # feeds dW_up
            dzd = jnp.where(pre > 0.0, da, 0.0).astype(dtype)
            dzd_ref[sl, :] = dzd
            dzf = dzd.astype(jnp.float32)
            s, q = acc
            s = s + jnp.sum(dzf, axis=0, keepdims=True)
            zhat = (hdf - sc_ref[0:1, :]) * sc_ref[3:4, :]
            q = q + jnp.sum(dzf * zhat, axis=0, keepdims=True)
            dw_acc[:, :] += _dot_t(in_up, dh16, f32_dots)
            return s, q
        else:
            dzd_ref[sl, :] = da.astype(dtype)  # dx through W^T
            dw_acc[:, :] += _dot_t(x0_ref[sl, :], dh16, f32_dots)
            return acc

    s, q = jax.lax.fori_loop(
        0, rows // r_tile, tile,
        (jnp.zeros((1, Cd), jnp.float32), jnp.zeros((1, Cd), jnp.float32)),
    )
    dw_ref[:, :] += dw_acc[:, :]
    if down_bn:
        sd_ref[:, :] += s
        se_ref[:, :] += q


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _layer_res_cfg(u: int, L: int, residual: bool = True):
    """Residual structure of layer u's input a_in(u) = relu(pre_{u-1}).

    Returns (res_mode, aux) where aux is None, 'h0' (RES_BNRELU source), or
    an int index into the stored-residual list (RES_DENSE). Layer layout
    (residual=True, PreExtraction): 0 = embed, odd = block expand,
    even>0 = block project; block j's input is s_1 = relu(BN0(h0)) for j=1
    and r_{j-1} for j>1, with r_j = relu(BN(h_proj_j) + input_of_block_j).
    residual=False (plain chain, SetAbstraction): every layer input is just
    relu(BN(h_{u-1})).
    """
    if residual and u % 2 == 1:
        j = (u + 1) // 2
        if j == 1:
            return RES_NONE, None
        if j == 2:
            return RES_BNRELU, "h0"
        return RES_DENSE, j - 2
    return RES_NONE, None


def _vmem(*byte_counts):
    return min(sum(byte_counts) + (16 << 20), 120 << 20)


def _gen(C):
    """Grant-model scale: 1 = the tile model calibrated on the shipped
    PointNet2/PointMLP shapes (C >= 128). At narrow C (<= 64) Mosaic's
    measured stack need exceeds that model (PointMLPElite stage 1: 96 MB
    demanded vs 73 granted in the layer pass, 104 vs 100 in the pool pass
    — compile OOM, r5), so those shapes get ~1.6x; keeping the tight model
    where it is known-sufficient avoids the ~1.6 ms/stage cost of blanket
    over-granting measured on full-PointMLP stage 1."""
    return 1.6 if C <= 64 else 1.0


def _batch_block(B, R, Cmax, isz, n_blocks=8):
    """Batch elements fused per grid step.

    With one batch element per step the chain kernels pay ~13 us of
    per-grid-step overhead on ~5 us of DMA (measured 2.5-3x off HBM
    roofline at PointNet2 B=256, benchmarks/trace_top_ops.py). Blocking
    bb elements per step — a free (B, R, C) -> (B/bb, bb*R, C) bitcast —
    amortizes it.

    n_blocks is how many (bb*R, Cmax) buffers the caller's kernels keep
    live (pipeline io + stack); the per-block target divides the VMEM
    budget by it. The forward passes hold ~8, the backward ~12 — VERDICT
    r3 item 1: sizing both from the backward's budget pinned the forward
    to bb=1 at PointMLP stages 1-3. The backward re-blocks the saved
    tensors to its own bb (a free bitcast), so each side now gets its own
    ceiling."""
    import os

    budget = int(os.environ.get("PCTPU_BB_BUDGET_MB", "96")) << 20
    target = budget // n_blocks
    bb = 1
    while B % (bb * 2) == 0 and (bb * 2) * R * Cmax * isz <= target:
        bb *= 2
    return bb


def _feasible_bb(bb, R0, pool, Cmax):
    """Shrink bb until every pass's row tiling is admissible.

    The 8-aligned passes (pool pass, sparse backward) need either tiles of
    a multiple-of-8 groups within the ~512K-element budget or a single
    static tile; a whole-cloud pool (R0 == pool, e.g. PointNet's
    MLPChainPool at N=2048 x C=1024) only admits the single-tile form,
    which forces bb=1 (VERDICT r5: first TPU run of the chain raised
    _row_tile's guard at bb=2)."""
    while bb > 1:
        try:
            _row_tile(bb * R0, pool, Cmax, aligned=True)
            break
        except ValueError:
            bb //= 2
    return bb


def _bspec(R, C):
    return pl.BlockSpec((None, R, C), lambda b: (b, 0, 0))


def _cspec(rows, C):
    return pl.BlockSpec((rows, C), lambda b: (0, 0))


def _affine_scalars(ssum, ssq, gamma, beta, n):
    """(4, C) f32 rows: mu, mul (gamma*rsig), beta, rsig."""
    mean = ssum / n
    var = jnp.maximum(ssq / n - mean * mean, 0.0)
    rsig = jax.lax.rsqrt(var + EPS)
    return jnp.stack(
        [mean, rsig * gamma.astype(jnp.float32), beta.astype(jnp.float32),
         rsig]
    )


def _forward(x, ws, gammas, betas, pool, interpret, residual=True, pen=None,
             final_relu=True):
    B0, R0, Cin = x.shape
    L = len(ws)
    blocks = (L - 1) // 2
    if residual:
        assert L == 1 + 2 * blocks and blocks >= 1
    else:
        assert L >= 1 and pen is not None
    assert R0 % pool == 0
    dt = x.dtype
    isz = jnp.dtype(dt).itemsize
    f32_dots = dt == jnp.float32
    n = float(B0 * R0)
    ws_c = tuple(w.astype(dt) for w in ws)

    # fuse bb batch elements per grid step (free bitcast reshape); the
    # forward keeps ~8 (R, C) buffers live, the backward re-blocks to its
    # own (smaller) bb in _bwd_vjp
    Cmax = max([Cin] + [w.shape[1] for w in ws])
    bb = _feasible_bb(
        _batch_block(B0, R0, Cmax, isz, n_blocks=8), R0, pool, Cmax
    )
    B, R = B0 // bb, bb * R0
    x = x.reshape(B, R, Cin)

    hs, stats, scs, rs = [], [], [], []

    # layer 0: plain matmul + stats
    C0 = ws[0].shape[1]
    r_tile = _row_tile(R, pool, C0)
    h, ss, sq = pl.pallas_call(
        functools.partial(
            _mm_stats_kernel, rows=R, r_tile=r_tile, dtype=dt,
            f32_dots=f32_dots,
        ),
        grid=(B,),
        in_specs=[_bspec(R, Cin), _cspec(Cin, C0)],
        out_specs=(_bspec(R, C0), _cspec(1, C0), _cspec(1, C0)),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, C0), dt),
            jax.ShapeDtypeStruct((1, C0), jnp.float32),
            jax.ShapeDtypeStruct((1, C0), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem(int(_gen(max(Cin, C0)) * (
                6 * r_tile * max(Cin, C0) * 4 + 4 * R * max(Cin, C0) * isz
            )))
        ),
        interpret=interpret,
    )(x, ws_c[0])
    hs.append(h)
    stats.append((ss[0], sq[0]))
    scs.append(_affine_scalars(ss[0], sq[0], gammas[0], betas[0], n))

    for u in range(1, L):
        Cd = ws[u].shape[0]
        Cu = ws[u].shape[1]
        res_mode, aux = _layer_res_cfg(u, L, residual)
        write_r = residual and u % 2 == 1 and (u + 1) // 2 >= 2
        ins = [hs[u - 1], scs[u - 1]]
        in_specs = [_bspec(R, Cd), _cspec(4, Cd)]
        if res_mode == RES_BNRELU:
            ins += [hs[0], scs[0]]
            in_specs += [_bspec(R, ws[0].shape[1]), _cspec(4, ws[0].shape[1])]
        elif res_mode == RES_DENSE:
            ins.append(rs[aux - 1])
            in_specs.append(_bspec(R, Cd))
        ins.append(ws_c[u])
        in_specs.append(_cspec(Cd, Cu))

        out_specs = [_bspec(R, Cu)]
        out_shape = [jax.ShapeDtypeStruct((B, R, Cu), dt)]
        if write_r:
            out_specs.append(_bspec(R, Cd))
            out_shape.append(jax.ShapeDtypeStruct((B, R, Cd), dt))
        out_specs += [_cspec(1, Cu), _cspec(1, Cu)]
        out_shape += [
            jax.ShapeDtypeStruct((1, Cu), jnp.float32),
            jax.ShapeDtypeStruct((1, Cu), jnp.float32),
        ]
        r_tile = _row_tile(R, pool, max(Cd, Cu))
        outs = pl.pallas_call(
            functools.partial(
                _bnact_mm_stats_kernel, rows=R, r_tile=r_tile, dtype=dt,
                f32_dots=f32_dots, res_mode=res_mode, write_r=write_r,
            ),
            grid=(B,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem(int(_gen(max(Cd, Cu)) * (
                    8 * r_tile * max(Cd, Cu) * 4
                    + 8 * R * max(Cd, Cu) * isz
                )))
            ),
            interpret=interpret,
        )(*ins)
        if write_r:
            h, r, ss, sq = outs
            rs.append(r)
        else:
            h, ss, sq = outs
        hs.append(h)
        stats.append((ss[0], sq[0]))
        scs.append(_affine_scalars(ss[0], sq[0], gammas[u], betas[u], n))

    # pool pass
    CL = ws[-1].shape[1]
    nb = R // pool
    if residual:
        pool_res = RES_BNRELU if blocks == 1 else RES_DENSE
    else:
        pool_res = RES_NONE
    ins = [hs[-1], scs[-1]]
    in_specs = [_bspec(R, CL), _cspec(4, CL)]
    if pool_res == RES_BNRELU:
        ins += [hs[0], scs[0]]
        in_specs += [_bspec(R, ws[0].shape[1]), _cspec(4, ws[0].shape[1])]
    elif pool_res == RES_DENSE:
        ins.append(rs[blocks - 2])
        in_specs.append(_bspec(R, CL))
    if not residual:
        # (nb, pool) layout: a (R, 1) block lane-pads 128x and XLA
        # materializes a 2.9 ms relayout copy at PointNet2 B=256
        ins.append(pen.reshape(B, nb, pool).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((None, nb, pool), lambda b: (b, 0, 0)))
    r_tile = _row_tile(R, pool, CL, aligned=True)
    out, maxv, amax, hsel = pl.pallas_call(
        functools.partial(
            _bn_respool_kernel, rows=R, pool=pool, r_tile=r_tile, dtype=dt,
            res_mode=pool_res, masked=not residual, pool_relu=final_relu,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(
            _bspec(nb, CL), _bspec(nb, CL), _bspec(nb, CL), _bspec(nb, CL),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nb, CL), dt),
            jax.ShapeDtypeStruct((B, nb, CL), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, CL), jnp.int32),
            jax.ShapeDtypeStruct((B, nb, CL), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem(int(_gen(CL) * (
                8 * r_tile * CL * 4 + 6 * R * CL * isz
            )))
        ),
        interpret=interpret,
    )(*ins)

    stats_out = tuple((ss, sq) for ss, sq in stats)
    saved = (x, ws, gammas, betas, tuple(hs), tuple(rs), maxv, amax, hsel,
             stats_out, (B0, R0))
    return (out.reshape(B0, R0 // pool, CL), stats_out), saved


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def preextract_pool_fused(x, ws, gammas, betas, pool, interpret=False):
    """Fused PreExtraction block + K-pool (see module docstring).

    x (B, R, Cin) with R = G*pool; ws/gammas/betas: per-layer Dense kernels
    (f32 (Ci, Co)) and BN scale/offset (f32 (Co,)), layers = 1 + 2*blocks.
    Returns (pooled (B, R//pool, C_last) in x.dtype,
             stats tuple of per-layer (ssum, ssq) fp32 (C_l,)).
    """
    return _forward(x, ws, gammas, betas, pool, interpret)[0]


def _fwd_vjp(x, ws, gammas, betas, pool, interpret):
    return _forward(x, ws, gammas, betas, pool, interpret)


def _zero_cot(c, shape):
    if c is None or (hasattr(c, "dtype") and c.dtype == jax.dtypes.float0):
        return jnp.zeros(shape, jnp.float32)
    return c.astype(jnp.float32)


def _bwd_vjp(pool, interpret, saved, cots, residual=True, final_relu=True):
    x, ws, gammas, betas, hs, rs, maxv, amax, hsel, stats, (B0, R0) = saved
    dout, dstats = cots
    L = len(ws)
    blocks = (L - 1) // 2
    dt = x.dtype
    isz = jnp.dtype(dt).itemsize
    f32_dots = dt == jnp.float32

    # re-block the saved tensors to the BACKWARD's own bb: its kernels keep
    # ~12 (R, C) buffers live vs the forward's ~8, so sharing the forward's
    # blocking would blow its VMEM budget (and sharing the backward's
    # pinned the forward to bb=1 — VERDICT r3 item 1). The re-block is a
    # free bitcast on the (B0, R0(/pool), C) row-major layout.
    Cin = x.shape[-1]
    Cmax = max([Cin] + [w.shape[1] for w in ws])
    bb = _feasible_bb(
        _batch_block(B0, R0, Cmax, isz, n_blocks=12), R0, pool, Cmax
    )
    B, R = B0 // bb, bb * R0
    nb = R // pool
    if B != x.shape[0]:
        rb = lambda t, unit: t.reshape(B, bb * unit, t.shape[-1])
        x = rb(x, R0)
        hs = tuple(rb(h, R0) for h in hs)
        rs = tuple(rb(r, R0) for r in rs)
        maxv = rb(maxv, R0 // pool)
        amax = rb(amax, R0 // pool)
        hsel = rb(hsel, R0 // pool)
    n = float(B * R)

    CL = ws[-1].shape[1]
    dout = _zero_cot(dout, (B0, R0 // pool, CL)).reshape(B, nb, CL)
    dss = [
        _zero_cot(ds, (ws[l].shape[1],)) for l, (ds, _) in enumerate(
            dstats if dstats is not None else [(None, None)] * L
        )
    ] if dstats is not None else [
        jnp.zeros((w.shape[1],), jnp.float32) for w in ws
    ]
    dsq = [
        _zero_cot(dq, (ws[l].shape[1],)) for l, (_, dq) in enumerate(
            dstats if dstats is not None else [(None, None)] * L
        )
    ] if dstats is not None else [
        jnp.zeros((w.shape[1],), jnp.float32) for w in ws
    ]

    scs = [
        _affine_scalars(ss, sq, gammas[l], betas[l], n)
        for l, (ss, sq) in enumerate(stats)
    ]

    def up_scalars(l, Sd, Se):
        mu, _, _, rsig = scs[l]
        c1 = gammas[l].astype(jnp.float32) * rsig
        c4 = c1 * Sd / n - dss[l] - 2.0 * dsq[l] * mu
        c3 = c1 * rsig * Se / n - 2.0 * dsq[l]
        return jnp.stack([c1, c4, c3, mu])

    # pool layer (top): sparse dz scalars computed from pooled quantities.
    # final_relu=False passes gradient for negative pooled values too (only
    # the all-masked sentinel groups stay cut)
    relu_m = (maxv > (0.0 if final_relu else 0.5 * _SENT)).astype(jnp.float32)
    dosel = dout * relu_m  # (B, nb, CL) f32
    Sd = jnp.sum(dosel, axis=(0, 1))
    mu_t, _, _, rsig_t = scs[L - 1]
    zhat_sel = (hsel - mu_t) * rsig_t
    Se = jnp.sum(dosel * zhat_sel, axis=(0, 1))

    dws = [None] * L
    dgs = [None] * L
    dbs = [None] * L
    dgs[L - 1] = Se
    dbs[L - 1] = Sd

    ws_c = tuple(w.astype(dt) for w in ws)
    dz = None  # dense dz of the layer below the current pass
    dzs = [None] * L  # stored dense dz tensors by layer index
    dx = None

    for u in range(L - 1, -1, -1):
        Cd = ws[u].shape[0]
        Cu = ws[u].shape[1]
        sparse_up = u == L - 1
        down_bn = u > 0
        uc = up_scalars(u, Sd, Se)
        wt = jnp.swapaxes(ws_c[u], 0, 1)  # (Cu, Cd)

        ins = [hs[u], uc]
        in_specs = [_bspec(R, Cu), _cspec(4, Cu)]
        if sparse_up:
            ins += [dosel, amax, maxv]
            in_specs += [_bspec(nb, CL), _bspec(nb, CL), _bspec(nb, CL)]
        else:
            ins.append(dzs[u])
            in_specs.append(_bspec(R, Cu))
        ins.append(wt)
        in_specs.append(_cspec(Cu, Cd))

        if down_bn:
            res_mode, aux = _layer_res_cfg(u, L, residual)
            j = (u + 1) // 2 if (residual and u % 2 == 1) else None
            skip_pool = j is not None and j == blocks
            skip_dense = j is not None and j < blocks
            ins += [hs[u - 1], scs[u - 1]]
            in_specs += [_bspec(R, Cd), _cspec(4, Cd)]
            if res_mode == RES_BNRELU:
                ins += [hs[0], scs[0]]
                in_specs += [
                    _bspec(R, ws[0].shape[1]), _cspec(4, ws[0].shape[1])
                ]
            elif res_mode == RES_DENSE:
                ins.append(rs[aux - 1])
                in_specs.append(_bspec(R, Cd))
            if skip_pool:
                ins += [dosel, amax, maxv]
                in_specs += [_bspec(nb, CL), _bspec(nb, CL), _bspec(nb, CL)]
            if skip_dense:
                ins.append(dzs[2 * j])
                in_specs.append(_bspec(R, Cd))
        else:
            res_mode, skip_pool, skip_dense = RES_NONE, False, False
            # row-major x + _dot_t: a (B, Cd, R) operand forced XLA to
            # materialize a transposed copy of the whole input (~4 ms at
            # PointNet2 B=256)
            ins.append(x)
            in_specs.append(_bspec(R, Cd))

        out_specs = [_bspec(R, Cd)]
        out_shape = [jax.ShapeDtypeStruct((B, R, Cd), dt)]
        if down_bn:
            out_specs += [_cspec(1, Cd), _cspec(1, Cd)]
            out_shape += [
                jax.ShapeDtypeStruct((1, Cd), jnp.float32),
                jax.ShapeDtypeStruct((1, Cd), jnp.float32),
            ]
        out_specs.append(_cspec(Cd, Cu))
        out_shape.append(jax.ShapeDtypeStruct((Cd, Cu), jnp.float32))

        r_tile = _row_tile(R, pool, max(Cd, Cu),
                           aligned=sparse_up or skip_pool)
        outs = pl.pallas_call(
            functools.partial(
                _bwd_pass_kernel, rows=R, pool=pool, r_tile=r_tile, dtype=dt,
                f32_dots=f32_dots, sparse_up=sparse_up, down_bn=down_bn,
                res_mode=res_mode, skip_pool=skip_pool, skip_dense=skip_dense,
                pool_relu=final_relu,
            ),
            grid=(B,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((Cd, Cu), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                # stack: ~14 live f32 (r_tile, C) temporaries; io: the
                # per-b (R, C) pipeline blocks, double-buffered
                vmem_limit_bytes=_vmem(int(_gen(max(Cd, Cu)) * (
                    14 * r_tile * max(Cd, Cu) * 4
                    + 12 * R * max(Cd, Cu) * isz
                )))
            ),
            interpret=interpret,
        )(*ins)
        if down_bn:
            dzd, sd, se, dw = outs
            dzs[u - 1] = dzd
            Sd, Se = sd[0], se[0]
            dgs[u - 1] = Se
            dbs[u - 1] = Sd
        else:
            dx, dw = outs
        dws[u] = dw.astype(ws[u].dtype)

    return (
        dx.astype(x.dtype).reshape(B0, R0, Cin),
        tuple(dws),
        tuple(dg.astype(g.dtype) for dg, g in zip(dgs, gammas)),
        tuple(db.astype(b.dtype) for db, b in zip(dbs, betas)),
    )


preextract_pool_fused.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# XLA oracle (identical op-for-op semantics; tests + autodiff reference)
# ---------------------------------------------------------------------------


def preextract_pool_reference(x, ws, gammas, betas, pool):
    """Unfused oracle of preextract_pool_fused: same rounding points, same
    f32 normalize math, same lowest-index pool argmax (via first-occurrence
    jnp.argmax + take_along_axis so autodiff routes the pool gradient to a
    single row, matching the kernel), relu as where(pre > 0) so autodiff is
    exactly 1[pre > 0]."""
    B, R, Cin = x.shape
    L = len(ws)
    blocks = (L - 1) // 2
    dt = x.dtype
    n = float(B * R)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    def dense(a, w):
        z = jax.lax.dot_general(
            a, w.astype(dt),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        zf = z.astype(jnp.float32)
        return z, jnp.sum(zf, axis=(0, 1)), jnp.sum(zf * zf, axis=(0, 1))

    def bn_pre(h, ss, sq, g, b):
        mean = ss / n
        var = jnp.maximum(sq / n - mean * mean, 0.0)
        rsig = jax.lax.rsqrt(var + EPS)
        return (h.astype(jnp.float32) - mean) * (
            rsig * g.astype(jnp.float32)
        ) + b.astype(jnp.float32)

    def relu(v):
        return jnp.where(v > 0.0, v, 0.0)

    hs, stats, pres = [], [], []
    h, ss, sq = dense(x, ws[0])
    hs.append(h)
    stats.append((ss, sq))
    pres.append(bn_pre(h, ss, sq, gammas[0], betas[0]))

    rs = []
    for u in range(1, L):
        res_mode, aux = _layer_res_cfg(u, L)
        pre = pres[u - 1]
        if res_mode == RES_BNRELU:
            pre = pre + relu(pres[0])
        elif res_mode == RES_DENSE:
            pre = pre + rs[aux - 1].astype(jnp.float32)
        a = relu(pre).astype(dt)
        if u % 2 == 1 and (u + 1) // 2 >= 2:
            rs.append(a)
        h, ss, sq = dense(a, ws[u])
        hs.append(h)
        stats.append((ss, sq))
        pres.append(bn_pre(h, ss, sq, gammas[u], betas[u]))

    v = pres[-1]
    if blocks == 1:
        v = v + relu(pres[0])
    else:
        v = v + rs[blocks - 2].astype(jnp.float32)
    nb = R // pool
    CL = ws[-1].shape[1]
    v4 = v.reshape(B, nb, pool, CL)
    am = jnp.argmax(v4, axis=2)  # first occurrence = lowest index
    mx = jnp.take_along_axis(v4, am[:, :, None, :], axis=2)[:, :, 0, :]
    out = relu(mx).astype(dt)
    return out, tuple(stats)


# ---------------------------------------------------------------------------
# plain-chain variant: Dense+BN+ReLU stack + masked K-pool (SetAbstraction)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def mlp_pool_fused(x, ws, gammas, betas, pen, pool, interpret=False,
                   final_relu=True):
    """SetAbstraction body as the fused chain (reference
    pointnet2_utils.py:167-208): L plain Dense+BN+ReLU layers over the
    grouped rows, then a masked max-pool over each `pool`-row group.

    x (B, R, Cin) with R = S*pool (grouped neighborhoods flattened);
    pen (B, R) f32 — +BIG on rows excluded from the pool (out-of-ball
    padding; they still feed BN statistics, the documented mask contract).
    All-masked groups emit the masked_max sentinel (-1e9) and receive no
    gradient. final_relu=False skips the post-pool relu (PointNet's final
    conv3+bn3+pool has none, reference pointnet.py:159-161) — the pooled
    post-BN value is emitted raw and its gradient is not relu-gated.
    Returns (pooled (B, R//pool, C_last), per-layer (ssum, ssq)).
    """
    return _forward(
        x, ws, gammas, betas, pool, interpret, residual=False, pen=pen,
        final_relu=final_relu,
    )[0]


def _mlp_fwd_vjp(x, ws, gammas, betas, pen, pool, interpret,
                 final_relu=True):
    out, saved = _forward(
        x, ws, gammas, betas, pool, interpret, residual=False, pen=pen,
        final_relu=final_relu,
    )
    return out, (saved, x.shape[:2])


def _mlp_bwd_vjp(pool, interpret, final_relu, res, cots):
    saved, (B, R) = res
    dx, dws, dgs, dbs = _bwd_vjp(pool, interpret, saved, cots,
                                 residual=False, final_relu=final_relu)
    return dx, dws, dgs, dbs, jnp.zeros((B, R), jnp.float32)


mlp_pool_fused.defvjp(_mlp_fwd_vjp, _mlp_bwd_vjp)


def mlp_pool_reference(x, ws, gammas, betas, pen, pool, final_relu=True):
    """XLA oracle of mlp_pool_fused (identical op-for-op semantics)."""
    B, R, Cin = x.shape
    L = len(ws)
    dt = x.dtype
    n = float(B * R)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    def dense(a, w):
        z = jax.lax.dot_general(
            a, w.astype(dt),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        zf = z.astype(jnp.float32)
        return z, jnp.sum(zf, axis=(0, 1)), jnp.sum(zf * zf, axis=(0, 1))

    def bn_pre(h, ss, sq, g, b):
        mean = ss / n
        var = jnp.maximum(sq / n - mean * mean, 0.0)
        rsig = jax.lax.rsqrt(var + EPS)
        return (h.astype(jnp.float32) - mean) * (
            rsig * g.astype(jnp.float32)
        ) + b.astype(jnp.float32)

    def relu(v):
        return jnp.where(v > 0.0, v, 0.0)

    h, ss, sq = dense(x, ws[0])
    stats = [(ss, sq)]
    pre = bn_pre(h, ss, sq, gammas[0], betas[0])
    for u in range(1, L):
        a = relu(pre).astype(dt)
        h, ss, sq = dense(a, ws[u])
        stats.append((ss, sq))
        pre = bn_pre(h, ss, sq, gammas[u], betas[u])

    v = pre - pen.astype(jnp.float32)[..., None]
    nb = R // pool
    CL = ws[-1].shape[1]
    v4 = v.reshape(B, nb, pool, CL)
    am = jnp.argmax(v4, axis=2)
    mx = jnp.take_along_axis(v4, am[:, :, None, :], axis=2)[:, :, 0, :]
    out = relu(mx) if final_relu else mx
    out = jnp.where(mx < 0.5 * _SENT, _SENT, out).astype(dt)
    return out, tuple(stats)
