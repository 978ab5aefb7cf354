"""Multi-device tests on the 8-device CPU mesh: ring chamfer, data-parallel
train step, graft dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.ops import chamfer_distance
from pointcloud_tpu.parallel import ring_chamfer


@pytest.fixture(scope="module")
def mesh8():
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) == 8, "conftest must force 8 CPU devices"
    return Mesh(np.array(devs), ("points",))


def test_ring_chamfer_matches_single_device(rng, mesh8):
    x = jnp.asarray(rng.random((2, 256, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 512, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    got = float(ring_chamfer(x, y, mesh=mesh8))
    assert abs(got - want) <= 1e-5, (got, want)


def test_ring_chamfer_asymmetric_and_zero(rng, mesh8):
    x = jnp.asarray(rng.random((1, 128, 3), dtype=np.float32))
    got = float(ring_chamfer(x, x, mesh=mesh8))
    assert got <= 1e-6
    # asymmetric cloud sizes
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    got = float(ring_chamfer(x, y, mesh=mesh8))
    assert abs(got - want) <= 1e-5


def test_ring_chamfer_gradients(rng, mesh8):
    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    g_ring = jax.grad(lambda a: ring_chamfer(a, y, mesh=mesh8))(x)
    g_ref = jax.grad(lambda a: chamfer_distance(a, y))(x)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=1e-5)


def test_data_parallel_train_step_matches_single(rng):
    """The sharded train step must produce the same loss as unsharded."""
    from pointcloud_tpu.models import AE, PointNetEncoder
    from pointcloud_tpu.ops import chamfer_distance as cham
    from pointcloud_tpu.train.harness import data_mesh, replicate, shard_batch

    x = jnp.asarray(rng.random((8, 64, 6), dtype=np.float32))
    model = AE(PointNetEncoder(), out_points=64, out_dim=6, bottleneck=8)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    @jax.jit
    def loss_fn(variables, x):
        out = model.apply(variables, x, train=False)
        return cham(out[..., :3], x[..., :3])

    single = float(loss_fn(variables, x))

    mesh = data_mesh(batch_size=8)
    assert mesh.devices.size == 8
    v_sharded = replicate(mesh, variables)
    x_sharded = shard_batch(mesh, x)
    sharded = float(loss_fn(v_sharded, x_sharded))
    assert abs(single - sharded) <= 1e-5


def test_graft_dryrun_8_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_ring_chamfer_masked(rng, mesh8):
    """Masks reproduce chamfer_distance's ragged semantics across the ring."""
    x = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32))
    ym = np.ones((2, 128), bool)
    ym[:, 40:] = False  # ragged: only the first 40 y are valid
    xm = np.ones((2, 128), bool)
    xm[0, ::2] = False
    want = float(
        chamfer_distance(x, y, x_mask=jnp.asarray(xm), y_mask=jnp.asarray(ym))
    )
    got = float(
        ring_chamfer(
            x, y, mesh=mesh8, x_mask=jnp.asarray(xm), y_mask=jnp.asarray(ym)
        )
    )
    assert abs(got - want) <= 1e-5, (got, want)
