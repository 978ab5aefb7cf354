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
    validity weights (1 = valid). Returns the per-batch (B,) global chamfer
    via psum-averaged directed masked means.
    """
    d = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % d) for j in range(d)]

    min_x = jnp.full(x_loc.shape[:2], _BIG)  # nearest-y dist for my x points
    y_cur, yw_cur = y_loc, yw_loc
    min_y_cur = jnp.full(y_loc.shape[:2], _BIG)  # travels with its y shard

    @jax.checkpoint
    def step_mins(x_loc, xw_loc, y_cur, yw_cur):
        # checkpointed so autodiff re-derives the (B, n_loc, m_loc) tile in
        # the backward instead of storing one per ring step (which would
        # reassemble the full cost matrix per device and defeat the point
        # scaling this exists for)
        dmat = pairwise_sqdist(x_loc, y_cur)
        dmat_for_x = jnp.where(yw_cur[:, None, :] > 0.5, dmat, _BIG)
        dmat_for_y = jnp.where(xw_loc[:, :, None] > 0.5, dmat, _BIG)
        return jnp.min(dmat_for_x, axis=2), jnp.min(dmat_for_y, axis=1)

    for _ in range(d):
        mx, my = step_mins(x_loc, xw_loc, y_cur, yw_cur)
        min_x = jnp.minimum(min_x, mx)
        min_y_cur = jnp.minimum(min_y_cur, my)
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
    return cham_x + cham_y


def ring_chamfer(
    x: jax.Array,
    y: jax.Array,
    mesh: Mesh | None = None,
    axis_name: str = "points",
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    batch_reduction: str | None = "mean",
):
    """Chamfer distance with the point axis sharded over `mesh`.

    x: (B, N, 3), y: (B, M, 3) — any N/M: point counts that do not divide
    the mesh size are padded up with masked points (VERDICT r3 weak #5;
    chamfer's validity weights make the pad exact, not approximate).
    Optional (B, N)/(B, M) bool masks reproduce the ragged semantics of
    ops.chamfer.chamfer_distance. batch_reduction 'mean' | 'sum' | None
    matches chamfer_distance (None returns (B,)).
    """
    import numpy as np

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis_name,))
    d = mesh.shape[axis_name]

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

    def pad_pts(a, w):
        pad = (-a.shape[1]) % d
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, pad)))  # zero weight = masked out
        return a, w

    x, xw = pad_pts(x, xw)
    y, yw = pad_pts(y, yw)
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
    per_batch = fn(x.astype(jnp.float32), y.astype(jnp.float32), xw, yw)
    if batch_reduction == "mean":
        return jnp.mean(per_batch)
    if batch_reduction == "sum":
        return jnp.sum(per_batch)
    return per_batch


def _ring_sinkhorn_shard(x_loc, y_loc, off, mu_loc, nu_loc, axis_name: str,
                         *, eps, iters, anneal_from):
    """Per-device Sinkhorn body (runs under shard_map).

    x_loc (B, n_loc, C) and y_loc (B, m_loc, C) are point-shards; the f
    potentials stay home with their x rows while (y shard, g shard) pairs
    rotate around the ring — twice per iteration (g update over all x, then
    f update over the new g), exactly the dense log-domain iteration of
    ops.emd.sinkhorn_match with the row/column logsumexps accumulated
    shard-by-shard via logaddexp. `off` carries each y shard's global point
    offset for assignment indices. mu_loc (n_loc,) / nu_loc (m_loc,) are
    per-point log marginals: -log(N_real) on real points, -inf on the
    divisibility padding (zero mass — pads never send or receive).
    """
    d = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % d) for j in range(d)]
    B, n_loc, _ = x_loc.shape
    m_loc = y_loc.shape[1]
    NEG = jnp.float32(-jnp.inf)
    # row exclusion penalty: initial f = 0 would otherwise give pad rows
    # mass in the very first column logsumexp
    penx = jnp.where(jnp.isneginf(mu_loc), NEG, 0.0)[None, :]  # (1, n_loc)

    def eps_at(t):
        if anneal_from is None:
            return jnp.float32(eps)
        frac = t.astype(jnp.float32) / max(iters - 1, 1)
        return jnp.float32(anneal_from) * (eps / anneal_from) ** frac

    def one_iter(t, fg):
        f, g = fg
        e = eps_at(t)
        # g update: each y shard visits every device, accumulating its
        # column logsumexp over the local f/x rows
        y_cur, acc = y_loc, jnp.full((B, m_loc), NEG)
        for _ in range(d):
            Cb = pairwise_sqdist(x_loc, y_cur)  # (B, n_loc, m_loc)
            part = jax.nn.logsumexp(
                ((f + penx)[:, :, None] - Cb) / e, axis=1
            )
            acc = jnp.logaddexp(acc, part)
            y_cur, acc = jax.lax.ppermute((y_cur, acc), axis_name, perm)
        g = e * (nu_loc[None, :] - acc)  # acc is home after d rotations
        # f update: rotate (y, g) shards past the stationary x/f rows;
        # pad columns carry g = -inf and drop out of the logsumexp
        y_cur, g_cur = y_loc, g
        accf = jnp.full((B, n_loc), NEG)
        for _ in range(d):
            Cb = pairwise_sqdist(x_loc, y_cur)
            part = jax.nn.logsumexp((g_cur[:, None, :] - Cb) / e, axis=2)
            accf = jnp.logaddexp(accf, part)
            y_cur, g_cur = jax.lax.ppermute((y_cur, g_cur), axis_name, perm)
        f = e * (mu_loc[None, :] - accf)
        return f, g

    f, g = jax.lax.fori_loop(
        0, iters, one_iter,
        jax.lax.pvary(  # mark the carry as device-varying for the scan
            (jnp.zeros((B, n_loc), jnp.float32),
             jnp.zeros((B, m_loc), jnp.float32)),
            axis_name,
        ),
    )

    # extraction: argmax_j (f_i + g_j - C_ij), lowest GLOBAL index tie-break
    # (matching the dense path's jnp.argmax), dists = C at the argmax
    y_cur, g_cur, off_cur = y_loc, g, off
    best = jnp.full((B, n_loc), NEG)
    besti = jnp.zeros((B, n_loc), jnp.int32)
    bestd = jnp.zeros((B, n_loc), jnp.float32)
    for _ in range(d):
        Cb = pairwise_sqdist(x_loc, y_cur)
        score = f[:, :, None] + g_cur[:, None, :] - Cb
        loc_best = jnp.max(score, axis=2)
        loc_am = jnp.argmax(score, axis=2).astype(jnp.int32)
        glob_am = loc_am + off_cur[0]
        loc_d = jnp.take_along_axis(Cb, loc_am[..., None], axis=2)[..., 0]
        take = jnp.logical_or(
            loc_best > best,
            jnp.logical_and(loc_best == best, glob_am < besti),
        )
        best = jnp.where(take, loc_best, best)
        besti = jnp.where(take, glob_am, besti)
        bestd = jnp.where(take, loc_d, bestd)
        y_cur, g_cur, off_cur = jax.lax.ppermute(
            (y_cur, g_cur, off_cur), axis_name, perm
        )
    return bestd, besti


def ring_sinkhorn_match(
    x: jax.Array,
    y: jax.Array,
    eps: float = 0.005,
    iters: int = 50,
    anneal_from: float | None = None,
    mesh: Mesh | None = None,
    axis_name: str = "points",
):
    """Point-sharded Sinkhorn-EMD matching (VERDICT r2 missing #3).

    Same contract as ops.emd.sinkhorn_match — (dists (B, N), assignment
    (B, N) int32) — with the O(N*M) cost matrix never materialized on one
    device: x rows and their f potentials stay home, (y, g) shards rotate
    with ppermute twice per Sinkhorn iteration (the CUDA kernel's 2048-point
    target tiling, emd_cuda.cu:97-158, lifted to the ICI mesh). Point
    counts that do not divide the mesh size are padded up with zero-mass
    points (log marginal -inf — exact, the transport problem is unchanged;
    VERDICT r3 weak #5), and pad rows are sliced off the outputs.
    """
    import numpy as np

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (axis_name,))
    d = mesh.shape[axis_name]
    B, N, _ = x.shape
    M = y.shape[1]
    pad_n, pad_m = (-N) % d, (-M) % d
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
    if pad_m:
        y = jnp.pad(y, ((0, 0), (0, pad_m), (0, 0)))
    Np, Mp = N + pad_n, M + pad_m
    NEG = jnp.float32(-jnp.inf)
    mu = jnp.where(jnp.arange(Np) < N, jnp.float32(-np.log(N)), NEG)
    nu = jnp.where(jnp.arange(Mp) < M, jnp.float32(-np.log(M)), NEG)
    offs = jnp.arange(d, dtype=jnp.int32) * (Mp // d)  # one scalar per shard

    fn = jax.shard_map(
        functools.partial(
            _ring_sinkhorn_shard, axis_name=axis_name,
            eps=float(eps), iters=int(iters), anneal_from=anneal_from,
        ),
        mesh=mesh,
        in_specs=(
            P(None, axis_name, None),
            P(None, axis_name, None),
            P(axis_name),
            P(axis_name),
            P(axis_name),
        ),
        out_specs=(P(None, axis_name), P(None, axis_name)),
    )
    dists, asn = fn(x.astype(jnp.float32), y.astype(jnp.float32), offs,
                    mu, nu)
    if pad_n:
        dists, asn = dists[:, :N], asn[:, :N]
    return dists, asn
