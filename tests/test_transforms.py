"""Transform-chain tests (reference semantics from utils.py:16-202)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_tpu.transforms import (
    Compose,
    FilterBBox,
    FilterClasses,
    IntegerEncode,
    Normalize,
    OneHotEncode,
    SampleFurthestPoints,
    SampleRandomPoints,
    Unnormalize,
    apply_np,
    class_mean_pos,
    seg_to_color,
)

BBOX = np.array([[-1.0, 1.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)


def test_filter_bbox_masks_outside(rng):
    pc = (rng.random((100, 3), dtype=np.float32) - 0.5) * 10
    _, mask = FilterBBox(BBOX)(jnp.asarray(pc), None, None)
    mask = np.asarray(mask)
    inside = (
        (pc[:, 0] >= -1) & (pc[:, 0] <= 1)
        & (pc[:, 1] >= -2) & (pc[:, 1] <= 2)
        & (pc[:, 2] >= 0) & (pc[:, 2] <= 4)
    )
    np.testing.assert_array_equal(mask, inside)


def test_normalize_unnormalize_roundtrip(rng):
    pc = rng.random((50, 6), dtype=np.float32)
    pc[:, 0] = pc[:, 0] * 2 - 1
    pc[:, 1] = pc[:, 1] * 4 - 2
    pc[:, 2] = pc[:, 2] * 4
    n_pc, _ = Normalize(BBOX)(jnp.asarray(pc), None, None)
    n_np = np.asarray(n_pc)
    assert n_np[:, :3].min() >= -1e-6 and n_np[:, :3].max() <= 1 + 1e-6
    # feature dims untouched
    np.testing.assert_array_equal(n_np[:, 3:], pc[:, 3:])
    back, _ = Unnormalize(BBOX)(n_pc, None, None)
    np.testing.assert_allclose(np.asarray(back), pc, atol=1e-5)


def test_one_hot_integer_roundtrip(rng):
    xyz = rng.random((20, 3), dtype=np.float32)
    labels = rng.integers(0, 5, size=(20, 1)).astype(np.float32)
    pc = np.concatenate([xyz, labels], axis=1)
    oh, _ = OneHotEncode(5, seg_dim=3)(jnp.asarray(pc), None, None)
    assert oh.shape == (20, 8)
    back, _ = IntegerEncode(5, seg_dim=3)(oh, None, None)
    np.testing.assert_array_equal(np.asarray(back), pc)


def test_filter_classes(rng):
    xyz = rng.random((30, 3), dtype=np.float32)
    labels = rng.integers(0, 4, size=(30, 1)).astype(np.float32)
    pc = np.concatenate([xyz, labels], axis=1)
    _, mask = FilterClasses([1, 3], seg_dim=3)(jnp.asarray(pc), None, None)
    np.testing.assert_array_equal(
        np.asarray(mask), np.isin(labels[:, 0].astype(int), [1, 3])
    )


def test_sample_random_points_only_valid(rng):
    pc = rng.random((40, 3), dtype=np.float32)
    mask = np.zeros(40, dtype=bool)
    mask[10:20] = True
    out, out_mask = SampleRandomPoints(16)(
        jnp.asarray(pc), jnp.asarray(mask), jax.random.PRNGKey(0)
    )
    assert out.shape == (16, 3)
    assert bool(out_mask.all())
    valid_rows = {tuple(r) for r in pc[10:20].tolist()}
    for row in np.asarray(out).tolist():
        assert tuple(row) in valid_rows


def test_sample_fps_spreads(rng):
    pc = rng.random((200, 3), dtype=np.float32)
    out, out_mask = SampleFurthestPoints(32)(jnp.asarray(pc), None, None)
    assert out.shape == (32, 3)
    assert bool(out_mask.all())
    # FPS output has no duplicate rows
    assert len({tuple(r) for r in np.asarray(out).tolist()}) == 32


def test_compose_filter_then_sample(rng):
    """The canonical sensor chain: FilterBBox -> FPS (pc_sensor.py:23-27)."""
    pc = (rng.random((500, 6), dtype=np.float32) - 0.5) * 6
    chain = Compose([FilterBBox(BBOX), SampleFurthestPoints(64)])
    out, mask = chain(jnp.asarray(pc), key=jax.random.PRNGKey(1))
    out = np.asarray(out)
    assert out.shape == (64, 6)
    assert bool(mask.all())
    assert (out[:, 0] >= -1).all() and (out[:, 0] <= 1).all()
    assert (out[:, 2] >= 0).all() and (out[:, 2] <= 4).all()


def test_class_mean_pos(rng):
    xyz = rng.random((50, 3), dtype=np.float32)
    labels = np.zeros((50, 1), dtype=np.float32)
    labels[5:15] = 1.0
    pc = np.concatenate([xyz, labels], axis=1)
    got = np.asarray(class_mean_pos(jnp.asarray(pc), cls=1, seg_dim=3))
    np.testing.assert_allclose(got, xyz[5:15].mean(0), atol=1e-5)


def test_seg_to_color():
    colors = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    got = np.asarray(seg_to_color(jnp.asarray([2, 0, 1]), colors))
    np.testing.assert_array_equal(got, np.asarray(colors, np.float32)[[2, 0, 1]])


def test_apply_np_edge(rng):
    pc = rng.random((100, 3), dtype=np.float32)
    out, mask = apply_np(Compose([Normalize(BBOX)]), pc)
    assert isinstance(out, np.ndarray) and isinstance(mask, np.ndarray)
    assert out.shape == (100, 3)


def test_transforms_vmap(rng):
    """Transforms are single-cloud functions; batching is jax.vmap."""
    pcs = rng.random((4, 60, 3), dtype=np.float32)
    t = Normalize(BBOX)
    out, mask = jax.vmap(lambda p: t(p, None, None))(jnp.asarray(pcs))
    assert out.shape == (4, 60, 3)
    assert mask.shape == (4, 60)
