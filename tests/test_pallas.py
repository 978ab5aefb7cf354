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


def test_sinkhorn_pallas_annealing(rng):
    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    d_ref, a_ref = sinkhorn_match(x, y, eps=0.005, iters=40, anneal_from=0.1)
    d_pal, a_pal = sinkhorn_match_pallas(
        x, y, eps=0.005, iters=40, anneal_from=0.1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_pal))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pal), atol=1e-6)
