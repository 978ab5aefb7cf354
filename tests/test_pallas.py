"""Pallas kernel tests (CPU interpret mode — exact-match vs the XLA path).

The same kernels are benchmarked compiled on real TPU by bench.py; these
tests pin the semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.ops.emd import sinkhorn_match
from pointcloud_tpu.ops.fps import farthest_point_sample
from pointcloud_tpu.ops.pallas_kernels import (
    farthest_point_sample_pallas,
    sinkhorn_match_pallas,
)


def test_fps_pallas_matches_xla(rng):
    xyz = jnp.asarray(rng.random((3, 128, 3), dtype=np.float32))
    ref = np.asarray(farthest_point_sample(xyz, 32, impl="xla"))
    got = np.asarray(farthest_point_sample_pallas(xyz, 32, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_fps_pallas_mask(rng):
    xyz = jnp.asarray(rng.random((2, 96, 3), dtype=np.float32))
    mask = np.ones((2, 96), bool)
    mask[:, ::2] = False
    m = jnp.asarray(mask)
    ref = np.asarray(farthest_point_sample(xyz, 16, mask=m, impl="xla"))
    got = np.asarray(farthest_point_sample_pallas(xyz, 16, mask=m, interpret=True))
    np.testing.assert_array_equal(ref, got)
    assert np.all(np.asarray(got) % 2 == 1)


def test_fps_pallas_invalid_first_point(rng):
    """Row whose point 0 is masked out must start at the first valid index."""
    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    mask = np.ones((1, 64), bool)
    mask[0, :5] = False
    got = np.asarray(
        farthest_point_sample_pallas(xyz, 8, mask=jnp.asarray(mask), interpret=True)
    )
    assert got[0, 0] == 5


def test_fps_pallas_extra_feature_dims(rng):
    """(B, N, 6) input: only xyz drives distances (matches model usage)."""
    xyz = rng.random((1, 80, 3), dtype=np.float32)
    pc6 = np.concatenate([xyz, rng.random((1, 80, 3), dtype=np.float32)], axis=-1)
    ref = np.asarray(farthest_point_sample(jnp.asarray(xyz), 10, impl="xla"))
    got = np.asarray(
        farthest_point_sample_pallas(jnp.asarray(pc6), 10, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_sinkhorn_pallas_matches_xla(rng):
    x = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    d_ref, a_ref = sinkhorn_match(x, y, eps=0.01, iters=30)
    d_pal, a_pal = sinkhorn_match_pallas(x, y, eps=0.01, iters=30, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pal))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), atol=1e-6)


def test_sinkhorn_pallas_asymmetric_and_features(rng):
    """N != M clouds and extra feature dims (sliced off) both work."""
    x = jnp.asarray(rng.random((1, 64, 6), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 128, 6), dtype=np.float32))
    d, a = sinkhorn_match_pallas(x, y, eps=0.01, iters=20, interpret=True)
    d_ref, a_ref = sinkhorn_match(x[..., :3], y[..., :3], eps=0.01, iters=20)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a_ref))
    assert (np.asarray(a) < 128).all()


def test_sinkhorn_pallas_identity(rng):
    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    d, a = sinkhorn_match_pallas(x, x, eps=0.002, iters=100, interpret=True)
    np.testing.assert_array_equal(np.asarray(a)[0], np.arange(64))
    assert float(np.asarray(d).max()) <= 1e-6


def test_nearest_neighbor_pallas_matches_xla(rng):
    from pointcloud_tpu.ops.geometry import pairwise_sqdist
    from pointcloud_tpu.ops.pallas_kernels import nearest_neighbor_pallas

    x = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 192, 3), dtype=np.float32))
    minx, aminx, miny, aminy = nearest_neighbor_pallas(x, y, interpret=True)
    d = np.asarray(pairwise_sqdist(x, y, method="direct"))
    # Contract: distances within the split-bf16 error (~3e-5) of the true
    # minimum; the index must name a point whose exact distance is within
    # that same error of the minimum (near-ties may pick the runner-up).
    np.testing.assert_allclose(np.asarray(minx), d.min(2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(miny), d.min(1), atol=5e-5)
    bi = np.arange(2)[:, None]
    np.testing.assert_allclose(
        d[bi, np.arange(128)[None], np.asarray(aminx)], d.min(2), atol=5e-5
    )
    np.testing.assert_allclose(
        d[bi, np.asarray(aminy), np.arange(192)[None]], d.min(1), atol=5e-5
    )
    # batch-mean parity is far tighter than per-point (zero-mean error)
    got = np.asarray(minx).mean() + np.asarray(miny).mean()
    want = d.min(2).mean() + d.min(1).mean()
    assert abs(got - want) <= 1e-5, (got, want)


def test_nearest_neighbor_pallas_masked(rng):
    from pointcloud_tpu.ops.pallas_kernels import nearest_neighbor_pallas

    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    ym = np.ones((1, 64), bool)
    ym[0, ::2] = False
    minx, aminx, _, _ = nearest_neighbor_pallas(
        x, y, y_mask=jnp.asarray(ym), interpret=True
    )
    assert np.all(np.asarray(aminx) % 2 == 1)  # only valid y selected


def test_chamfer_fast_path_grad_matches_direct(rng):
    """custom-VJP (gather/scatter) grads == autodiff-through-min grads."""
    from pointcloud_tpu.ops.chamfer import chamfer_distance

    x = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    g_fast = jax.grad(lambda a: chamfer_distance(a, y))(x)
    g_ref = jax.grad(lambda a: chamfer_distance(a, y, method="direct"))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-6)
    gy_fast = jax.grad(lambda b: chamfer_distance(x, b))(y)
    gy_ref = jax.grad(lambda b: chamfer_distance(x, b, method="direct"))(y)
    np.testing.assert_allclose(np.asarray(gy_fast), np.asarray(gy_ref), atol=1e-6)


def test_fps_auto_dispatch_cpu_uses_xla(rng):
    """On CPU, impl='auto' must route to the XLA path (no TPU lowering)."""
    xyz = jnp.asarray(rng.random((1, 50, 3), dtype=np.float32))
    a = np.asarray(farthest_point_sample(xyz, 8, impl="auto"))
    b = np.asarray(farthest_point_sample(xyz, 8, impl="xla"))
    np.testing.assert_array_equal(a, b)


def _exact_sqdist(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def test_group_neighbors_pallas_ball_matches_xla(rng):
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 128, 5), dtype=np.float32))
    cents = jnp.asarray(rng.random((2, 16, 3), dtype=np.float32))
    gx, gf, idx, valid = group_neighbors(
        xyz, feats, cents, 8, radius=0.3, impl="pallas", interpret=True
    )
    rx, rf, ridx, rvalid = group_neighbors(
        xyz, feats, cents, 8, radius=0.3, impl="xla", approx=False
    )
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(rvalid))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=1e-6)


def test_group_neighbors_pallas_knn_matches_xla(rng):
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 96, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((1, 96, 4), dtype=np.float32))
    cents = xyz[:, ::8, :]
    gx, gf, idx, valid = group_neighbors(
        xyz, feats, cents, 6, radius=None, impl="pallas", interpret=True
    )
    _, _, ridx, _ = group_neighbors(
        xyz, feats, cents, 6, radius=None, impl="xla", approx=False
    )
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    # each query's own point is its nearest neighbor
    np.testing.assert_array_equal(
        np.asarray(idx)[0, :, 0], np.arange(0, 96, 8)
    )


def test_group_neighbors_pallas_bf16_features(rng):
    """bf16 feats take the split-xyz MXU path: feats selected exactly,
    xyz gathered to split-bf16 accuracy (~1e-4 abs for unit clouds)."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    feats = jnp.asarray(
        rng.random((1, 64, 4), dtype=np.float32)
    ).astype(jnp.bfloat16)
    cents = jnp.asarray(rng.random((1, 8, 3), dtype=np.float32))
    gx, gf, idx, _ = group_neighbors(
        xyz, feats, cents, 4, radius=None, impl="pallas", interpret=True
    )
    assert gf.dtype == jnp.bfloat16
    xn, fn, idxn = np.asarray(xyz), np.asarray(feats), np.asarray(idx)
    np.testing.assert_allclose(
        np.asarray(gx), xn[np.zeros_like(idxn), idxn], atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(gf.astype(jnp.float32)),
        fn[np.zeros_like(idxn), idxn].astype(np.float32),
    )


def test_group_neighbors_pallas_mask(rng):
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((1, 64, 2), dtype=np.float32))
    cents = jnp.asarray(rng.random((1, 8, 3), dtype=np.float32))
    mask = np.ones((1, 64), bool)
    mask[0, ::2] = False
    _, _, idx, valid = group_neighbors(
        xyz, feats, cents, 4, radius=1.0, mask=jnp.asarray(mask),
        impl="pallas", interpret=True,
    )
    sel = np.asarray(idx)[np.asarray(valid)]
    assert (sel % 2 == 1).all()


def test_group_neighbors_pallas_pad_with_nearest(rng):
    """Slots beyond the in-radius count replicate slot 0 with valid=False
    (reference pad-with-group_first, pointnet2_utils.py:108-112)."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    # one point within radius of each centroid
    cents = jnp.asarray(rng.random((1, 4, 3), dtype=np.float32))
    far = jnp.asarray(10.0 + rng.random((1, 60, 3), dtype=np.float32))
    xyz = jnp.concatenate([cents + 0.01, far], axis=1)
    feats = jnp.asarray(rng.random((1, 64, 2), dtype=np.float32))
    _, _, idx, valid = group_neighbors(
        xyz, feats, cents, 4, radius=0.1, impl="pallas", interpret=True
    )
    v = np.asarray(valid)
    assert v[..., 0].all() and not v[..., 1:].any()
    np.testing.assert_array_equal(
        np.asarray(idx), np.broadcast_to(np.arange(4)[None, :, None], (1, 4, 4))
    )


def test_group_neighbors_pallas_multitile(rng):
    """S larger than one 256-row centroid tile exercises the grid."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((1, 64, 2), dtype=np.float32))
    cents = jnp.asarray(rng.random((1, 512, 3), dtype=np.float32))
    _, _, idx, _ = group_neighbors(
        xyz, feats, cents, 4, radius=None, impl="pallas", interpret=True
    )
    _, _, ridx, _ = group_neighbors(
        xyz, feats, cents, 4, radius=None, impl="xla", approx=False
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))


def test_group_neighbors_pallas_grad_matches_xla(rng):
    """Custom VJP (one-hot MXU segment-sum) == XLA gather autodiff."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((2, 48, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 48, 4), dtype=np.float32))
    cents = jnp.asarray(rng.random((2, 8, 3), dtype=np.float32))
    wx = jnp.asarray(rng.random((2, 8, 4, 3), dtype=np.float32))
    wf = jnp.asarray(rng.random((2, 8, 4, 4), dtype=np.float32))

    def loss(f, x, impl):
        gx, gf, _, _ = group_neighbors(
            x, f, cents, 4, radius=0.5, impl=impl,
            interpret=(impl == "pallas"),
            **({} if impl == "pallas" else {"approx": False}),
        )
        return jnp.sum(gx * wx) + jnp.sum(gf * wf)

    gf_p, gx_p = jax.grad(loss, argnums=(0, 1))(feats, xyz, "pallas")
    gf_x, gx_x = jax.grad(loss, argnums=(0, 1))(feats, xyz, "xla")
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=1e-5)


def test_scatter_rows_pallas(rng):
    from pointcloud_tpu.ops.pallas_kernels import scatter_rows_pallas

    g = jnp.asarray(rng.random((2, 32, 5), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 16, (2, 32)), dtype=jnp.int32)
    out = np.asarray(scatter_rows_pallas(g, idx, 16, interpret=True))
    want = np.zeros((2, 16, 5), np.float32)
    for b in range(2):
        for r in range(32):
            want[b, int(idx[b, r])] += np.asarray(g)[b, r]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_sinkhorn_pallas_annealing(rng):
    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    d_ref, a_ref = sinkhorn_match(x, y, eps=0.005, iters=40, anneal_from=0.1)
    d_pal, a_pal = sinkhorn_match_pallas(
        x, y, eps=0.005, iters=40, anneal_from=0.1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pal))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), atol=1e-6)


def test_scatter_rows_pallas_fold_init(rng):
    """fold=3 folds split-precision column groups in-kernel; init seeds the
    output (the chamfer-backward configuration)."""
    from pointcloud_tpu.ops.pallas_kernels import scatter_rows_pallas

    B, R, C, n = 2, 32, 3, 16
    g = jnp.asarray(rng.standard_normal((B, R, 3 * C)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (B, R)), dtype=jnp.int32)
    init = jnp.asarray(rng.standard_normal((B, n, C)), dtype=jnp.float32)
    out = np.asarray(
        scatter_rows_pallas(g, idx, n, init=init, fold=3, interpret=True)
    )
    want = np.asarray(init).copy()
    gn = np.asarray(g)
    for b in range(B):
        for r in range(R):
            folded = gn[b, r, :C] + gn[b, r, C:2 * C] + gn[b, r, 2 * C:]
            want[b, int(idx[b, r])] += folded
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_group_neighbors_knn_underfilled_mask_parity(rng):
    """kNN with fewer valid points than k: both paths surface only valid
    points and pad the underfilled slots by replicating a member of the
    valid set (the Pallas kernel's top-k SET is index-ordered, so slot
    order and the replicated member may differ from XLA's distance order —
    consumers are slot-permutation invariant, see grouped_gather_knn)."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    k = 8
    xyz = jnp.asarray(rng.random((2, 32, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 32, 2), dtype=np.float32))
    cents = jnp.asarray(rng.random((2, 4, 3), dtype=np.float32))
    mask = np.zeros((2, 32), bool)
    mask[:, :5] = True  # only 5 valid points < k=8
    gx, gf, idx, valid = group_neighbors(
        xyz, feats, cents, k, radius=None, mask=jnp.asarray(mask),
        impl="pallas", interpret=True,
    )
    rx, rf, ridx, rvalid = group_neighbors(
        xyz, feats, cents, k, radius=None, mask=jnp.asarray(mask),
        impl="xla", approx=False,
    )
    idxn, ridxn = np.asarray(idx), np.asarray(ridx)
    # no masked point ever surfaces, and the selected SETS agree
    assert (idxn < 5).all()
    for b in range(idxn.shape[0]):
        for s in range(idxn.shape[1]):
            assert set(idxn[b, s]) == set(ridxn[b, s]), (b, s)
    # first 5 slots hold the full valid set; the rest replicate slot 0
    assert (np.sort(idxn[..., :5], axis=-1) == np.arange(5)).all()
    np.testing.assert_array_equal(
        idxn[..., 5:], np.broadcast_to(idxn[..., :1], idxn[..., 5:].shape)
    )
    # gathers are consistent with the emitted indices
    xn, fn = np.asarray(xyz), np.asarray(feats)
    bix = np.arange(2)[:, None, None]
    np.testing.assert_allclose(np.asarray(gx), xn[bix, idxn], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), fn[bix, idxn], atol=1e-6)


def _ball_smajor_oracle(xyz, feats, new_xyz, k, radius, mask=None):
    """XLA composition matching grouped_gather_ball's contract."""
    from pointcloud_tpu.ops.geometry import ball_query, index_points

    idx, in_ball = ball_query(radius, k, xyz, new_xyz, mask=mask)
    gx = index_points(xyz[..., :3], idx) - new_xyz[:, :, None, :]
    gf = index_points(feats, idx)
    grouped = jnp.concatenate(
        [gx.astype(feats.dtype), gf], axis=-1
    )
    return grouped, idx, in_ball


def test_grouped_gather_ball_smajor_matches_oracle(rng):
    from pointcloud_tpu.ops.pallas_kernels import grouped_gather_ball

    B, N, S, k, F = 2, 128, 16, 8, 5
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, F), dtype=np.float32))
    cents = xyz[:, ::8, :]
    pen = jnp.zeros((B, N, 1), jnp.float32)
    grouped, idx, valid = grouped_gather_ball(
        xyz, feats, cents, pen, k, 0.3, True
    )
    og, oi, ov = _ball_smajor_oracle(xyz, feats, cents, k, 0.3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(valid) > 0.5, np.asarray(ov))
    np.testing.assert_allclose(
        np.asarray(grouped), np.asarray(og), atol=1e-6
    )


def test_grouped_gather_ball_smajor_bf16_and_mask(rng):
    from pointcloud_tpu.ops.pallas_kernels import grouped_gather_ball

    B, N, S, k, F = 2, 128, 16, 8, 4
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(
        rng.random((B, N, F), dtype=np.float32)
    ).astype(jnp.bfloat16)
    cents = xyz[:, ::8, :]
    mask = np.ones((B, N), bool)
    mask[:, ::3] = False
    pen = jnp.where(jnp.asarray(mask)[..., None], 0.0, jnp.float32(1e9))
    grouped, idx, valid = grouped_gather_ball(
        xyz, feats, cents, pen, k, 0.35, True
    )
    og, oi, ov = _ball_smajor_oracle(
        xyz, feats, cents, k, 0.35, mask=jnp.asarray(mask)
    )
    assert grouped.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oi))
    np.testing.assert_array_equal(np.asarray(valid) > 0.5, np.asarray(ov))
    # split-bf16 xyz + bf16 rounding: compare at bf16 resolution
    np.testing.assert_allclose(
        np.asarray(grouped.astype(jnp.float32)),
        np.asarray(og.astype(jnp.float32)), atol=1e-2,
    )
    # feature channels are selected exactly
    np.testing.assert_array_equal(
        np.asarray(grouped[..., 3:].astype(jnp.float32)),
        np.asarray(og[..., 3:].astype(jnp.float32)),
    )
    assert (np.asarray(idx) % 3 != 0).all()


def test_grouped_gather_ball_smajor_grad(rng):
    """VJP parity vs XLA autodiff of the oracle composition: gradients to
    xyz, feats, and new_xyz (the in-kernel centering term)."""
    from pointcloud_tpu.ops.pallas_kernels import grouped_gather_ball

    B, N, S, k, F = 1, 64, 8, 8, 3
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, F), dtype=np.float32))
    cents = jnp.asarray(np.asarray(xyz[:, ::8, :]))
    pen = jnp.zeros((B, N, 1), jnp.float32)
    w = jnp.asarray(rng.random((B, S, k, 3 + F), dtype=np.float32))

    def f_pallas(xyz, feats, cents):
        g, _, _ = grouped_gather_ball(xyz, feats, cents, pen, k, 0.4, True)
        return jnp.sum(g * w)

    def f_oracle(xyz, feats, cents):
        g, _, _ = _ball_smajor_oracle(xyz, feats, cents, k, 0.4)
        return jnp.sum(g * w)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(xyz, feats, cents)
    go = jax.grad(f_oracle, argnums=(0, 1, 2))(xyz, feats, cents)
    for a, b, name in zip(gp, go, ["xyz", "feats", "new_xyz"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_sample_and_group_fused_path_matches_xla(rng, monkeypatch):
    """sample_and_group's fused ball path == the XLA composition."""
    import pointcloud_tpu.ops.geometry as geo

    xyz = jnp.asarray(rng.random((2, 96, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 96, 4), dtype=np.float32))
    ref = geo.sample_and_group(16, 0.3, 8, xyz, feats)

    monkeypatch.setattr(geo, "_use_pallas", lambda: True)
    import pointcloud_tpu.ops.pallas_kernels as pk
    orig = pk.grouped_gather_ball

    def interp(*args, **kw):
        return orig(*args[:6], True)

    monkeypatch.setattr(pk, "grouped_gather_ball", interp)
    got = geo.sample_and_group(16, 0.3, 8, xyz, feats)
    for a, b, name in zip(got, ref, ["new_xyz", "grouped", "gmask", "nmask"]):
        np.testing.assert_allclose(
            np.asarray(a).astype(np.float32),
            np.asarray(b).astype(np.float32), atol=1e-6, err_msg=name,
        )


def test_grouped_gather_knn_smajor_matches_xla(rng):
    """S-major kNN kernel == the XLA knn+gather composition (k % 8 == 0
    routes group_neighbors to grouped_gather_knn)."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((2, 96, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 96, 5), dtype=np.float32))
    cents = xyz[:, ::6, :]
    gx, gf, idx, valid = group_neighbors(
        xyz, feats, cents, 8, radius=None, impl="pallas", interpret=True
    )
    rx, rf, ridx, _ = group_neighbors(
        xyz, feats, cents, 8, radius=None, impl="xla", approx=False
    )
    assert np.asarray(valid).all()
    idxn, ridxn = np.asarray(idx), np.asarray(ridx)
    # exact top-k SET parity (kernel slots are index-ordered, XLA's are
    # distance-ordered — consumers are slot-permutation invariant)
    np.testing.assert_array_equal(
        np.sort(idxn, axis=-1), np.sort(ridxn, axis=-1)
    )
    # gathers are consistent with the emitted indices
    xn, fn = np.asarray(xyz), np.asarray(feats)
    bix = np.arange(2)[:, None, None]
    np.testing.assert_allclose(np.asarray(gx), xn[bix, idxn], atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), fn[bix, idxn], atol=1e-6)
    # each query's own point is in its neighbor set
    own = np.broadcast_to(np.arange(0, 96, 6), (2, 16))
    assert (idxn == own[..., None]).any(-1).all()


def test_grouped_gather_knn_smajor_bf16_multitile(rng):
    """bf16 split-xyz path + S > s_tile grid; feats selected exactly."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    feats = jnp.asarray(
        rng.random((1, 64, 4), dtype=np.float32)
    ).astype(jnp.bfloat16)
    cents = jnp.asarray(rng.random((1, 512, 3), dtype=np.float32))
    gx, gf, idx, _ = group_neighbors(
        xyz, feats, cents, 8, radius=None, impl="pallas", interpret=True
    )
    _, _, ridx, _ = group_neighbors(
        xyz, feats, cents, 8, radius=None, impl="xla", approx=False
    )
    assert gf.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.sort(np.asarray(idx), axis=-1), np.sort(np.asarray(ridx), axis=-1)
    )
    xn, fn, idxn = np.asarray(xyz), np.asarray(feats), np.asarray(idx)
    np.testing.assert_allclose(
        np.asarray(gx), xn[np.zeros_like(idxn), idxn], atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(gf.astype(jnp.float32)),
        fn[np.zeros_like(idxn), idxn].astype(np.float32),
    )


def test_grouped_gather_knn_smajor_underfilled_mask(rng):
    """Fewer valid points than k: empty slots replicate slot 0 (the nearest
    valid point) — the documented underfilled-mask semantics."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((1, 64, 2), dtype=np.float32))
    cents = jnp.asarray(rng.random((1, 8, 3), dtype=np.float32))
    mask = np.zeros((1, 64), bool)
    mask[0, [7, 20, 33]] = True  # 3 valid < k=8
    gx, gf, idx, _ = group_neighbors(
        xyz, feats, cents, 8, radius=None, mask=jnp.asarray(mask),
        impl="pallas", interpret=True,
    )
    rx, rf, ridx, _ = group_neighbors(
        xyz, feats, cents, 8, radius=None, mask=jnp.asarray(mask),
        impl="xla", approx=False,
    )
    idxn, ridxn = np.asarray(idx), np.asarray(ridx)
    assert np.isin(idxn, [7, 20, 33]).all()
    # 3 valid < k: first 3 slots hold the full valid set (index order),
    # pad slots replicate slot 0; set parity with the XLA path
    assert (np.sort(idxn[..., :3], axis=-1) == np.array([7, 20, 33])).all()
    np.testing.assert_array_equal(
        idxn[..., 3:], np.broadcast_to(idxn[..., :1], idxn[..., 3:].shape)
    )
    for s in range(idxn.shape[1]):
        assert set(idxn[0, s]) == set(ridxn[0, s]), s
    xn, fn = np.asarray(xyz), np.asarray(feats)
    np.testing.assert_allclose(
        np.asarray(gx), xn[np.zeros_like(idxn), idxn], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gf), fn[np.zeros_like(idxn), idxn], atol=1e-6
    )


def test_grouped_gather_knn_smajor_grad(rng):
    """VJP parity vs XLA autodiff (gradients to xyz and feats; selection
    non-differentiable; new_xyz gets zeros like top_k+gather autodiff)."""
    from pointcloud_tpu.ops.geometry import group_neighbors

    xyz = jnp.asarray(rng.random((2, 48, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((2, 48, 4), dtype=np.float32))
    cents = jnp.asarray(rng.random((2, 16, 3), dtype=np.float32))
    # weights broadcast over the slot axis: the Pallas kernel's slots hold
    # the same top-k SET in a different order than XLA's distance sort, so
    # the comparison loss must be slot-permutation invariant
    wx = jnp.asarray(rng.random((2, 16, 1, 3), dtype=np.float32))
    wf = jnp.asarray(rng.random((2, 16, 1, 4), dtype=np.float32))

    def loss(f, x, impl):
        gx, gf, _, _ = group_neighbors(
            x, f, cents, 8, radius=None, impl=impl,
            interpret=(impl == "pallas"),
            **({} if impl == "pallas" else {"approx": False}),
        )
        return jnp.sum(gx * wx) + jnp.sum(gf * wf)

    gf_p, gx_p = jax.grad(loss, argnums=(0, 1))(feats, xyz, "pallas")
    gf_x, gx_x = jax.grad(loss, argnums=(0, 1))(feats, xyz, "xla")
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), atol=1e-5)


def test_chamfer_nn_bwd_fused_matches_composition(rng):
    """Fused chamfer backward kernel == the gather+term+scatter composition
    (exact one-hot gathers; 3-way-split segment sums)."""
    from pointcloud_tpu.ops import chamfer as ch
    from pointcloud_tpu.ops.pallas_kernels import chamfer_nn_bwd_pallas

    B, N, M = 2, 96, 64
    x = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((B, M, 3), dtype=np.float32))
    gx = jnp.asarray(rng.random((B, N), dtype=np.float32)) - 0.5
    gy = jnp.asarray(rng.random((B, M), dtype=np.float32)) - 0.5
    xw = jnp.ones((B, N), jnp.float32)
    yw = jnp.ones((B, M), jnp.float32)
    _, amin_x, _, amin_y = ch._nn_forward(x, y, xw, yw)

    dx_k, dy_k = chamfer_nn_bwd_pallas(
        x, y, gx, gy, amin_x, amin_y, interpret=True
    )

    # composition reference (the XLA fallback inside _nn_bwd)
    y_near = ch._flat_gather(y, amin_x)
    term_x = 2.0 * gx[..., None] * (x - y_near)
    x_near = ch._flat_gather(x, amin_y)
    term_y = 2.0 * gy[..., None] * (y - x_near)
    dx_r, dy_r = ch._combine_nn_grads(
        term_x, term_y, amin_x, amin_y, impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(dx_k), np.asarray(dx_r), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(dy_k), np.asarray(dy_r), atol=2e-6
    )


@pytest.mark.slow
def test_chamfer_grad_fused_bwd_parity(rng, monkeypatch):
    """grad(chamfer_distance) through the fused backward kernel (interpret
    mode, masked + unmasked) == pure-XLA autodiff-equivalent path."""
    from pointcloud_tpu.ops import chamfer as ch
    from pointcloud_tpu.ops import pallas_kernels as pk
    from pointcloud_tpu.ops.chamfer import chamfer_distance

    B, N, M = 2, 64, 96
    x = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((B, M, 3), dtype=np.float32))
    x_mask = jnp.asarray(rng.random((B, N)) > 0.2)
    y_mask = jnp.asarray(rng.random((B, M)) > 0.2)

    def loss(x_, y_):
        return chamfer_distance(x_, y_, x_mask=x_mask, y_mask=y_mask)

    gx_ref, gy_ref = jax.grad(loss, argnums=(0, 1))(x, y)

    orig = pk.chamfer_nn_bwd_pallas
    monkeypatch.setattr(
        pk, "chamfer_nn_bwd_pallas",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_nn = pk.nearest_neighbor_pallas
    monkeypatch.setattr(
        pk, "nearest_neighbor_pallas",
        lambda *a, **k: orig_nn(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(ch, "_use_pallas", lambda: True)
    gx_k, gy_k = jax.grad(loss, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy_k), np.asarray(gy_ref), atol=1e-6)
