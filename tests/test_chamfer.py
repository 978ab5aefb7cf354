"""Chamfer parity tests vs a PyTorch oracle (BASELINE.json: <=1e-5 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pointcloud_tpu.ops import chamfer_distance, masked_chamfer


def torch_chamfer(x, y, y_lengths=None):
    """pytorch3d-convention chamfer: mean-over-points both ways, mean over batch."""
    x, y = torch.from_numpy(x), torch.from_numpy(y)
    d = torch.cdist(x, y) ** 2  # (B, N, M)
    B, N, M = d.shape
    if y_lengths is not None:
        for b in range(B):
            d[b, :, y_lengths[b] :] = float("inf")
    min_x = d.min(dim=2).values  # (B, N)
    min_y = d.min(dim=1).values  # (B, M)
    cham_x = min_x.mean(dim=1)
    if y_lengths is not None:
        cham_y = torch.stack(
            [min_y[b, : y_lengths[b]].mean() for b in range(B)]
        )
    else:
        cham_y = min_y.mean(dim=1)
    return (cham_x + cham_y).mean().item()


def test_chamfer_parity_unmasked(rng):
    x = rng.random((4, 256, 3), dtype=np.float32)
    y = rng.random((4, 256, 3), dtype=np.float32)
    want = torch_chamfer(x, y)
    got = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) <= 1e-5, (got, want)
    got_direct = float(
        chamfer_distance(jnp.asarray(x), jnp.asarray(y), method="direct")
    )
    assert abs(got_direct - want) <= 1e-6


def test_chamfer_parity_2048pts(rng):
    """The headline parity config: 2048-point clouds in the unit cube."""
    x = rng.random((2, 2048, 3), dtype=np.float32)
    y = rng.random((2, 2048, 3), dtype=np.float32)
    want = torch_chamfer(x, y)
    got = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) <= 1e-5, (got, want)


def test_chamfer_masked_equals_torch_ragged(rng):
    """y-mask reproduces pytorch3d's y_lengths ragged support
    (reference FilteringChamferDistance, utils.py:213-228)."""
    x = rng.random((3, 128, 3), dtype=np.float32)
    y = rng.random((3, 128, 3), dtype=np.float32)
    y_lengths = np.array([128, 60, 97])
    want = torch_chamfer(x, y.copy(), y_lengths)
    y_mask = np.arange(128)[None, :] < y_lengths[:, None]
    got = float(
        chamfer_distance(jnp.asarray(x), jnp.asarray(y), y_mask=jnp.asarray(y_mask))
    )
    assert abs(got - want) <= 1e-5


def test_chamfer_zero_for_identical(rng):
    x = rng.random((2, 64, 3), dtype=np.float32)
    got = float(chamfer_distance(jnp.asarray(x), jnp.asarray(x)))
    assert got <= 1e-6


def test_chamfer_gradients_flow(rng):
    x = jnp.asarray(rng.random((2, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 32, 3), dtype=np.float32))
    g = jax.grad(lambda a: chamfer_distance(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_chamfer_batch_reduction_none(rng):
    x = rng.random((3, 16, 3), dtype=np.float32)
    y = rng.random((3, 16, 3), dtype=np.float32)
    per = chamfer_distance(jnp.asarray(x), jnp.asarray(y), batch_reduction=None)
    assert per.shape == (3,)
    mean = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(float(jnp.mean(per)), mean, rtol=1e-6)


def test_masked_chamfer_directed(rng):
    x = rng.random((1, 16, 3), dtype=np.float32)
    y = x + 0.0
    cx, cy = masked_chamfer(jnp.asarray(x), jnp.asarray(y))
    assert float(cx[0]) <= 1e-7 and float(cy[0]) <= 1e-7


def test_nn_bwd_pallas_segsum_matches_scatter(rng):
    """The TPU chamfer backward (one-hot MXU segment-sum, interpret mode)
    matches the XLA scatter-add combine exactly."""
    from pointcloud_tpu.ops.chamfer import _combine_nn_grads

    B, N, M = 2, 64, 48
    term_x = jnp.asarray(rng.standard_normal((B, N, 3)), dtype=jnp.float32)
    term_y = jnp.asarray(rng.standard_normal((B, M, 3)), dtype=jnp.float32)
    amin_x = jnp.asarray(rng.integers(0, M, (B, N)), dtype=jnp.int32)
    amin_y = jnp.asarray(rng.integers(0, N, (B, M)), dtype=jnp.int32)

    dx_ref, dy_ref = _combine_nn_grads(term_x, term_y, amin_x, amin_y, impl="xla")
    dx_pal, dy_pal = _combine_nn_grads(
        term_x, term_y, amin_x, amin_y, impl="pallas", interpret=True
    )
    np.testing.assert_allclose(np.asarray(dx_pal), np.asarray(dx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy_pal), np.asarray(dy_ref), atol=1e-5)


def test_chamfer_full_dim_parity_and_grad(rng):
    """6-dim chamfer (reference ChamferDistance matches over ALL dims,
    utils.py:209-211) rides the same fused/VJP path as xyz-only: value
    parity vs the torch oracle and gradients matching autodiff through the
    dense min (the production AE+chamfer config trains on (B, N, 6))."""
    x = rng.random((2, 128, 6), dtype=np.float32)
    y = rng.random((2, 128, 6), dtype=np.float32)
    want = torch_chamfer(x, y)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    got = float(chamfer_distance(xj, yj))
    assert abs(got - want) <= 1e-5, (got, want)

    g = jax.grad(lambda a: chamfer_distance(a, yj))(xj)
    g_dense = jax.grad(
        lambda a: chamfer_distance(a, yj, method="direct")
    )(xj)
    assert np.allclose(np.asarray(g), np.asarray(g_dense), atol=1e-5)


def test_nn_pallas_interpret_6dim(rng):
    """Interpret-mode check of the generalized (C=6) fused NN sweep."""
    from pointcloud_tpu.ops.geometry import pairwise_sqdist, _BIG
    from pointcloud_tpu.ops.pallas_kernels import nearest_neighbor_pallas

    x = jnp.asarray(rng.random((2, 256, 6), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 192, 6), dtype=np.float32))
    xm = jnp.asarray(rng.random((2, 256)) > 0.1)
    ym = jnp.asarray(rng.random((2, 192)) > 0.1)
    minx, aminx, miny, aminy = nearest_neighbor_pallas(
        x, y, xm, ym, interpret=True
    )
    d = pairwise_sqdist(x, y)
    dx = jnp.where(ym[:, None, :], d, _BIG)
    dy = jnp.where(xm[:, :, None], d, _BIG)
    assert float(jnp.max(jnp.abs(
        jnp.where(xm, minx - jnp.min(dx, 2), 0.0)))) <= 1e-4
    assert float(jnp.max(jnp.abs(
        jnp.where(ym, miny - jnp.min(dy, 1), 0.0)))) <= 1e-4
    # selection agreement (ties within split-bf16 error may differ)
    assert float(jnp.mean(
        jnp.where(xm, aminx == jnp.argmin(dx, 2), True))) >= 0.99
