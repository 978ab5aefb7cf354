"""FPS tests: exactness vs a numpy oracle, masking, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_tpu.ops import farthest_point_sample, farthest_point_sample_xyz


def np_fps(xyz, k, start=0):
    n = xyz.shape[0]
    sel = [start]
    mind = np.full(n, np.inf)
    for _ in range(k - 1):
        d = ((xyz - xyz[sel[-1]]) ** 2).sum(-1)
        mind = np.minimum(mind, d)
        sel.append(int(np.argmax(mind)))
    return np.array(sel)


def test_fps_matches_numpy_oracle(rng):
    xyz = rng.random((3, 40, 3), dtype=np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 10))
    for b in range(3):
        np.testing.assert_array_equal(idx[b], np_fps(xyz[b], 10))


def test_fps_no_duplicates_when_enough_points(rng):
    xyz = rng.random((2, 100, 3), dtype=np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 32))
    for b in range(2):
        assert len(set(idx[b].tolist())) == 32


def test_fps_mask_excludes_invalid(rng):
    xyz = rng.random((1, 50, 3), dtype=np.float32)
    mask = np.ones((1, 50), dtype=bool)
    mask[0, ::2] = False
    idx = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 10, mask=jnp.asarray(mask))
    )
    assert np.all(idx % 2 == 1)


def test_fps_fewer_valid_than_npoint_repeats_valid(rng):
    xyz = rng.random((1, 20, 3), dtype=np.float32)
    mask = np.zeros((1, 20), dtype=bool)
    mask[0, [3, 7, 11]] = True
    idx = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 8, mask=jnp.asarray(mask))
    )
    assert set(idx[0].tolist()) <= {3, 7, 11}


def test_fps_deterministic_and_jittable(rng):
    xyz = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    f = jax.jit(lambda x: farthest_point_sample(x, 16))
    a = np.asarray(f(xyz))
    b = np.asarray(f(xyz))
    np.testing.assert_array_equal(a, b)


def test_fps_xyz_wrapper(rng):
    xyz = rng.random((1, 30, 3), dtype=np.float32)
    pts, idx = farthest_point_sample_xyz(jnp.asarray(xyz), 5)
    np.testing.assert_array_equal(np.asarray(pts)[0], xyz[0][np.asarray(idx)[0]])
