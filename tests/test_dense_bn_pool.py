"""Fused Dense->BN-stats->signed-block-pool kernel vs the unfused oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.ops.dense_bn_pool import (
    dense_pool_stats,
    dense_pool_stats_reference,
)


def _data(rng, B=2, R=64, Cin=8, C=16, masked=False):
    x = jnp.asarray(rng.standard_normal((B, R, Cin)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((Cin, C)) * 0.3, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, dtype=jnp.float32)
    # mixed per-channel signs: exercises both max- and min-pool channels
    s = jnp.asarray(np.where(rng.random(C) > 0.5, 1.0, -1.0),
                    dtype=jnp.float32)
    if masked:
        pen = jnp.where(jnp.asarray(rng.random((B, R)) > 0.25), 0.0, 1e9)
        pen = pen.astype(jnp.float32)
    else:
        pen = None
    return x, w, b, s, pen


@pytest.mark.parametrize("pool", [8, 64])
@pytest.mark.parametrize("masked", [False, True])
def test_fwd_matches_reference(rng, pool, masked):
    x, w, b, s, pen = _data(rng, masked=masked)
    got = dense_pool_stats(x, w, b, s, pen, pool, True)
    want = dense_pool_stats_reference(x, w, b, s, pen, pool)
    names = ["psel", "asel", "ssum", "ssq"]
    for n, g, r in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=n
        )


@pytest.mark.parametrize("pool", [8, 64])
def test_grads_match_reference(rng, pool):
    x, w, b, s, pen = _data(rng)

    def scalar(op):
        def f(x, w, b):
            psel, asel, ssum, ssq = op(x, w, b)
            # exercise every differentiable output with distinct weights
            return (
                jnp.sum(psel * 1.3)
                + jnp.sum(ssum * 0.11)
                + jnp.sum(ssq * 0.05)
            )
        return f

    f_fused = scalar(
        lambda x, w, b: dense_pool_stats(x, w, b, s, pen, pool, True)
    )
    f_ref = scalar(
        lambda x, w, b: dense_pool_stats_reference(x, w, b, s, pen, pool)
    )

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r, n in zip(gf, gr, ["dx", "dw", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=3e-5, atol=3e-5, err_msg=n
        )


def test_unaligned_multitile_masked_rmw(rng, monkeypatch):
    """bpt==1 multi-tile path (pooled rows placed/read by masked RMW).

    Shrinking the z-tile budget forces r_tile == pool with several tiles
    per grid step — the layout the batch-blocked global pools hit on TPU
    (rows//pool not 8-aligned, dynamic sublane offsets rejected)."""
    import pointcloud_tpu.ops.dense_bn_pool as dbp

    monkeypatch.setattr(dbp, "_TILE_BUDGET_EL", 64)
    x, w, b, s, pen = _data(rng, B=4, R=48, masked=True)
    pool = 16  # rows//pool per grid step not a multiple of 8
    got = dense_pool_stats(x, w, b, s, pen, pool, True)
    want = dense_pool_stats_reference(x, w, b, s, pen, pool)
    for n, g, r in zip(["psel", "asel", "ssum", "ssq"], got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5, err_msg=n
        )

    def scalar(op):
        def f(x, w, b):
            psel, _, ssum, ssq = op(x, w, b)
            return (jnp.sum(psel * 1.3)
                    + jnp.sum(ssum * 0.11) + jnp.sum(ssq * 0.05))
        return f

    gf = jax.grad(scalar(
        lambda x, w, b: dense_pool_stats(x, w, b, s, pen, pool, True)
    ), argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(scalar(
        lambda x, w, b: dense_pool_stats_reference(x, w, b, s, pen, pool)
    ), argnums=(0, 1, 2))(x, w, b)
    for a, r, n in zip(gf, gr, ["dx", "dw", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=3e-5, atol=3e-5, err_msg=n
        )


def test_grads_pool_only(rng):
    """Stats cotangents zero (eval-mode shape): only sparse paths remain."""
    x, w, b, s, pen = _data(rng, masked=True)

    def f(x, w, b):
        psel, *_ = dense_pool_stats(x, w, b, s, pen, 8, True)
        return jnp.sum(psel)

    def fr(x, w, b):
        psel, *_ = dense_pool_stats_reference(x, w, b, s, pen, 8)
        return jnp.sum(psel)

    gf = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(fr, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-5, atol=3e-5)


class _DenseThenBNMax(__import__("flax").linen.Module):
    """Unfused composition oracle: nn.Dense -> BNMaxPool."""

    features: int
    final_relu: bool
    dtype = None

    @__import__("flax").linen.compact
    def __call__(self, x, train=False, mask=None):
        import flax.linen as nn

        from pointcloud_tpu.models.pointnet import BNMaxPool

        z = nn.Dense(self.features, dtype=self.dtype)(x)
        return BNMaxPool(final_relu=self.final_relu, dtype=self.dtype)(
            z, train=train, mask=mask
        )


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("ndim", [3, 4])
@pytest.mark.parametrize("masked", [False, True])
def test_module_matches_dense_plus_bnmaxpool(rng, train, ndim, masked):
    from pointcloud_tpu.models.pointnet import DenseBNMaxPool

    if ndim == 3:
        x = jnp.asarray(rng.standard_normal((2, 32, 8)), dtype=jnp.float32)
        mask = jnp.asarray(rng.random((2, 32)) > 0.3) if masked else None
    else:
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
        mask = jnp.asarray(rng.random((2, 4, 8)) > 0.3) if masked else None

    kernel = jnp.asarray(rng.standard_normal((8, 16)) * 0.4, dtype=jnp.float32)
    dbias = jnp.asarray(rng.standard_normal(16) * 0.1, dtype=jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), dtype=jnp.float32)  # +/- signs
    offset = jnp.asarray(rng.standard_normal(16), dtype=jnp.float32)
    rmean = jnp.asarray(rng.standard_normal(16), dtype=jnp.float32)
    rvar = jnp.asarray(rng.random(16) + 0.5, dtype=jnp.float32)

    fused = DenseBNMaxPool(16, final_relu=True)
    vf = {
        "params": {"kernel": kernel, "bias": dbias,
                   "scale": scale, "offset": offset},
        "batch_stats": {"mean": rmean, "var": rvar},
    }
    comp = _DenseThenBNMax(16, final_relu=True)
    vc = {
        "params": {"Dense_0": {"kernel": kernel, "bias": dbias},
                   "BNMaxPool_0": {"scale": scale, "bias": offset}},
        "batch_stats": {"BNMaxPool_0": {"mean": rmean, "var": rvar}},
    }

    def run(mod, v):
        if train:
            out, mut = mod.apply(
                v, x, train=True, mask=mask, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return mod.apply(v, x, train=False, mask=mask), None

    of, sf = run(fused, vf)
    oc, sc = run(comp, vc)
    np.testing.assert_allclose(np.asarray(of), np.asarray(oc),
                               rtol=1e-5, atol=1e-5)
    if train:
        np.testing.assert_allclose(
            np.asarray(sf["mean"]),
            np.asarray(sc["BNMaxPool_0"]["mean"]), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(sf["var"]),
            np.asarray(sc["BNMaxPool_0"]["var"]), rtol=1e-5,
        )

    # gradient parity wrt input and all params
    def loss_f(xx, p):
        v = {"params": p, "batch_stats": {"mean": rmean, "var": rvar}}
        if train:
            out, _ = fused.apply(v, xx, train=True, mask=mask,
                                 mutable=["batch_stats"])
        else:
            out = fused.apply(v, xx, train=False, mask=mask)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_c(xx, p):
        v = {"params": p,
             "batch_stats": {"BNMaxPool_0": {"mean": rmean, "var": rvar}}}
        if train:
            out, _ = comp.apply(v, xx, train=True, mask=mask,
                                mutable=["batch_stats"])
        else:
            out = comp.apply(v, xx, train=False, mask=mask)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gfx, gfp = jax.grad(loss_f, argnums=(0, 1))(x, vf["params"])
    gcx, gcp = jax.grad(loss_c, argnums=(0, 1))(x, vc["params"])
    np.testing.assert_allclose(np.asarray(gfx), np.asarray(gcx),
                               rtol=2e-5, atol=2e-5)
    pairs = [
        (gfp["kernel"], gcp["Dense_0"]["kernel"]),
        (gfp["bias"], gcp["Dense_0"]["bias"]),
        (gfp["scale"], gcp["BNMaxPool_0"]["scale"]),
        (gfp["offset"], gcp["BNMaxPool_0"]["bias"]),
    ]
    for a, b in pairs:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_module_fused_impl_matches_xla_impl(rng, masked):
    """interpret-mode fused path == XLA reference path inside the module.

    Mixed-sign BN scales exercise both pool directions of the signed
    kernel; the unmasked case exercises the pen=None fast path."""
    from pointcloud_tpu.models.pointnet import DenseBNMaxPool

    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random((2, 4, 8)) > 0.3) if masked else None
    mod = DenseBNMaxPool(16, final_relu=True)
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    v = jax.tree.map(lambda t: t, v)  # unfreeze-safe shallow copy
    scale = jnp.asarray(rng.standard_normal(16), dtype=jnp.float32)
    v["params"] = dict(v["params"], scale=scale)
    a, _ = mod.apply(v, x, train=True, mask=mask, impl="fused",
                     interpret=True, mutable=["batch_stats"])
    b, _ = mod.apply(v, x, train=True, mask=mask, impl="xla",
                     mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    # gradient parity through the module on both impls (signed sparse path)
    def loss(impl):
        def f(p):
            vv = dict(v, params=p)
            kw = dict(train=True, mask=mask, impl=impl,
                      mutable=["batch_stats"])
            if impl == "fused":
                kw["interpret"] = True
            out, _ = mod.apply(vv, x, **kw)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))
        return f

    ga = jax.grad(loss("fused"))(v["params"])
    gb = jax.grad(loss("xla"))(v["params"])
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)
