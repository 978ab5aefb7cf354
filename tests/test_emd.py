"""EMD matching tests: contract, optimality vs scipy oracle, gradient parity.

Mirrors the reference's own smoke test (loss/emd/emd_module.py:81-97):
random clouds in, (dists, assignment) out, dists re-checkable from the
assignment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.ops import auction_match, emd_match, sinkhorn_match


def _recheck_dists(x, y, assignment, dists):
    """Reference emd_module.py:90-96: recompute matched dists from assignment."""
    matched = np.take_along_axis(y, assignment[..., None], axis=1)
    want = ((x - matched) ** 2).sum(-1)
    np.testing.assert_allclose(dists, want, atol=1e-5)


@pytest.mark.parametrize("match_fn", [sinkhorn_match, auction_match])
def test_match_contract(rng, match_fn):
    x = rng.random((2, 64, 3), dtype=np.float32)
    y = rng.random((2, 64, 3), dtype=np.float32)
    dists, assignment = match_fn(jnp.asarray(x), jnp.asarray(y), eps=0.01, iters=50)
    dists, assignment = np.asarray(dists), np.asarray(assignment)
    assert dists.shape == (2, 64)
    assert assignment.shape == (2, 64)
    assert assignment.dtype == np.int32
    assert (assignment >= 0).all() and (assignment < 64).all()
    _recheck_dists(x, y, assignment, dists)


def test_auction_is_permutation(rng):
    """With enough iterations the auction produces a one-to-one matching."""
    x = rng.random((1, 32, 3), dtype=np.float32)
    y = rng.random((1, 32, 3), dtype=np.float32)
    _, assignment = auction_match(jnp.asarray(x), jnp.asarray(y), eps=0.002, iters=500)
    a = np.asarray(assignment)[0]
    assert len(set(a.tolist())) == 32


def test_auction_near_optimal_vs_scipy(rng):
    scipy = pytest.importorskip("scipy.optimize")
    x = rng.random((1, 24, 3), dtype=np.float32)
    y = rng.random((1, 24, 3), dtype=np.float32)
    C = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    row, col = scipy.linear_sum_assignment(C)
    opt = C[row, col].sum()
    dists, _ = auction_match(jnp.asarray(x), jnp.asarray(y), eps=0.001, iters=2000)
    got = float(np.asarray(dists).sum())
    # auction with eps-scaling-free single run: within (1+tol) of optimal
    assert got <= opt + 24 * 0.001 * 3 + 1e-4, (got, opt)


def test_sinkhorn_identity_clouds(rng):
    """Matching a cloud to itself finds the identity (distinct points)."""
    x = rng.random((1, 48, 3), dtype=np.float32)
    dists, assignment = sinkhorn_match(jnp.asarray(x), jnp.asarray(x), eps=0.002, iters=200)
    np.testing.assert_array_equal(np.asarray(assignment)[0], np.arange(48))
    assert float(np.asarray(dists).max()) <= 1e-6


def test_emd_match_gradient_reference_semantics(rng):
    """Backward must equal 2 * g * (x - y[assignment]) with zero grad to y
    (reference emd_cuda.cu:284-316)."""
    x = jnp.asarray(rng.random((2, 16, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 16, 3), dtype=np.float32))

    def loss(x, y):
        dists, _ = emd_match(x, y, 0.01, 100, "sinkhorn")
        return jnp.sum(dists)

    dx, dy = jax.grad(loss, argnums=(0, 1))(x, y)
    _, assignment = emd_match(x, y, 0.01, 100, "sinkhorn")
    matched = jnp.take_along_axis(y, assignment[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(2.0 * (x - matched)), atol=1e-5)
    assert float(jnp.abs(dy).sum()) == 0.0


def test_emd_match_jit_and_methods(rng):
    x = jnp.asarray(rng.random((1, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 32, 3), dtype=np.float32))
    for method in ("sinkhorn", "auction"):
        f = jax.jit(lambda a, b, m=method: emd_match(a, b, 0.01, 20, m)[0].sum())
        assert np.isfinite(float(f(x, y)))


def test_sinkhorn_beats_random_matching(rng):
    """Sinkhorn matched cost must be far below a random permutation's cost."""
    x = rng.random((1, 64, 3), dtype=np.float32)
    y = rng.random((1, 64, 3), dtype=np.float32)
    dists, _ = sinkhorn_match(jnp.asarray(x), jnp.asarray(y), eps=0.005, iters=100)
    matched_cost = float(np.asarray(dists).mean())
    C = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    random_cost = float(C.mean())  # expected cost of a uniformly random match
    assert matched_cost < 0.5 * random_cost


def test_sinkhorn_annealing_matches_long_run(rng):
    """Epsilon-scaled Sinkhorn at few iters reaches the matching quality of a
    long constant-eps run (the practical test-operating-point path)."""
    x = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
    d_long, a_long = sinkhorn_match(x, y, eps=0.002, iters=400)
    d_fast, a_fast = sinkhorn_match(x, y, eps=0.002, iters=60, anneal_from=0.1)
    agree = float(np.mean(np.asarray(a_long) == np.asarray(a_fast)))
    assert agree >= 0.9, agree
    # matched transport cost comparable
    assert float(np.asarray(d_fast).mean()) <= float(np.asarray(d_long).mean()) * 1.1
    # and far better than a short constant-eps run of the same length
    d_const, a_const = sinkhorn_match(x, y, eps=0.002, iters=60)
    agree_const = float(np.mean(np.asarray(a_long) == np.asarray(a_const)))
    assert agree >= agree_const
