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


@pytest.mark.slow
def test_ring_chamfer_matches_single_device(rng, mesh8):
    x = jnp.asarray(rng.random((2, 256, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 512, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    got = float(ring_chamfer(x, y, mesh=mesh8))
    assert abs(got - want) <= 1e-5, (got, want)


@pytest.mark.slow
def test_ring_chamfer_asymmetric_and_zero(rng, mesh8):
    x = jnp.asarray(rng.random((1, 128, 3), dtype=np.float32))
    got = float(ring_chamfer(x, x, mesh=mesh8))
    assert got <= 1e-6
    # asymmetric cloud sizes
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    got = float(ring_chamfer(x, y, mesh=mesh8))
    assert abs(got - want) <= 1e-5


@pytest.mark.slow
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


@pytest.mark.slow
def test_graft_dryrun_8_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


@pytest.mark.slow
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


@pytest.mark.slow
def test_ring_sinkhorn_matches_dense(rng, mesh8):
    """Point-sharded Sinkhorn == dense sinkhorn_match (same contract)."""
    from pointcloud_tpu.ops.emd import sinkhorn_match
    from pointcloud_tpu.parallel.ring import ring_sinkhorn_match

    x = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    dd, da = sinkhorn_match(x, y, eps=0.02, iters=40)
    rd, ra = ring_sinkhorn_match(x, y, eps=0.02, iters=40, mesh=mesh8)
    # logsumexp accumulated shard-by-shard -> tiny fp drift; assignments
    # should agree except at near-ties
    agree = float(np.mean(np.asarray(da) == np.asarray(ra)))
    assert agree >= 0.95, agree
    same = np.asarray(da) == np.asarray(ra)
    np.testing.assert_allclose(
        np.asarray(rd)[same], np.asarray(dd)[same], rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_ring_sinkhorn_annealed(rng, mesh8):
    from pointcloud_tpu.ops.emd import sinkhorn_match
    from pointcloud_tpu.parallel.ring import ring_sinkhorn_match

    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    dd, da = sinkhorn_match(x, y, eps=0.005, iters=30, anneal_from=0.1)
    rd, ra = ring_sinkhorn_match(
        x, y, eps=0.005, iters=30, anneal_from=0.1, mesh=mesh8
    )
    agree = float(np.mean(np.asarray(da) == np.asarray(ra)))
    assert agree >= 0.95, agree


@pytest.mark.slow
def test_ring_chamfer_non_divisible(rng, mesh8):
    """Point counts that do not divide the mesh size are padded with masked
    points inside ring_chamfer — values and gradients stay exact (r3 weak
    #5: divisibility must not force giant clouds back to the dense path)."""
    x = jnp.asarray(rng.random((2, 101, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 67, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    got = float(ring_chamfer(x, y, mesh=mesh8))
    assert abs(got - want) <= 1e-5, (got, want)
    g_ring = jax.grad(lambda a: ring_chamfer(a, y, mesh=mesh8))(x)
    g_ref = jax.grad(lambda a: chamfer_distance(a, y))(x)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=1e-5)
    # padding composes with a caller-supplied ragged mask
    xm = jnp.asarray(rng.random((2, 101)) > 0.3)
    want_m = float(chamfer_distance(x, y, x_mask=xm))
    got_m = float(ring_chamfer(x, y, mesh=mesh8, x_mask=xm))
    assert abs(got_m - want_m) <= 1e-5, (got_m, want_m)


@pytest.mark.slow
def test_ring_sinkhorn_non_divisible(rng, mesh8):
    """Zero-mass (-inf log-marginal) padding keeps the transport problem
    unchanged when N/M don't divide the mesh size; outputs are sliced back
    to the caller's shapes."""
    from pointcloud_tpu.ops.emd import sinkhorn_match
    from pointcloud_tpu.parallel.ring import ring_sinkhorn_match

    x = jnp.asarray(rng.random((1, 61, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 43, 3), dtype=np.float32))
    dd, da = sinkhorn_match(x, y, eps=0.02, iters=40)
    rd, ra = ring_sinkhorn_match(x, y, eps=0.02, iters=40, mesh=mesh8)
    assert rd.shape == (1, 61) and ra.shape == (1, 61)
    # no pad column is ever assigned
    assert (np.asarray(ra) < 43).all()
    agree = float(np.mean(np.asarray(da) == np.asarray(ra)))
    assert agree >= 0.95, agree
    same = np.asarray(da) == np.asarray(ra)
    np.testing.assert_allclose(
        np.asarray(rd)[same], np.asarray(dd)[same], rtol=1e-4, atol=1e-5
    )


def test_ring_eligible_size_only():
    """ring_eligible depends only on problem size, not divisibility."""
    from pointcloud_tpu.ops.chamfer import ring_eligible

    assert ring_eligible(1, 100_004, 100_004)
    assert not ring_eligible(1, 1024, 1024)


@pytest.mark.slow
def test_chamfer_large_cloud_ring_dispatch(rng, mesh8, monkeypatch):
    """chamfer_distance auto-routes above RING_MIN_ELEMENTS (r2 weak #6)."""
    from pointcloud_tpu.ops import chamfer as cham_mod

    x = jnp.asarray(rng.random((2, 256, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 512, 3), dtype=np.float32))
    want = float(chamfer_distance(x, y))
    monkeypatch.setattr(cham_mod, "RING_MIN_ELEMENTS", 1000)
    got = float(cham_mod.chamfer_distance(x, y))
    assert abs(got - want) <= 1e-5
    # per-batch reduction survives the dispatch
    per = cham_mod.chamfer_distance(x, y, batch_reduction=None)
    assert per.shape == (2,)
    # masked semantics survive the dispatch
    xm = jnp.asarray(rng.random((2, 256)) > 0.3)
    ym = jnp.asarray(rng.random((2, 512)) > 0.3)
    monkeypatch.setattr(cham_mod, "RING_MIN_ELEMENTS", 1 << 28)
    want_m = float(chamfer_distance(x, y, x_mask=xm, y_mask=ym))
    monkeypatch.setattr(cham_mod, "RING_MIN_ELEMENTS", 1000)
    got_m = float(cham_mod.chamfer_distance(x, y, x_mask=xm, y_mask=ym))
    assert abs(got_m - want_m) <= 1e-5


@pytest.mark.slow
def test_emd_large_cloud_ring_dispatch(rng, mesh8, monkeypatch):
    from pointcloud_tpu.ops import chamfer as cham_mod
    from pointcloud_tpu.ops.emd import emd_match

    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    dd, da = emd_match(x, y, 0.02, 40)
    monkeypatch.setattr(cham_mod, "RING_MIN_ELEMENTS", 1000)
    rd, ra = emd_match(x, y, 0.02, 40)
    agree = float(np.mean(np.asarray(da) == np.asarray(ra)))
    assert agree >= 0.95, agree
    # reference gradient contract survives: grad to x only, through the
    # matched pair
    g = jax.grad(lambda a: jnp.sum(emd_match(a, y, 0.02, 40)[0]))(x)
    assert np.isfinite(np.asarray(g)).all()
