"""Fused PreExtraction block kernel vs its XLA oracle (interpret mode).

The oracle (preextract_pool_reference) defines the op semantics; the module
-level equivalence of oracle vs the plain flax stack is covered in
tests/test_models.py. Gradients are checked against jax.grad of the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.ops.preextract_fused import (
    preextract_pool_fused,
    preextract_pool_reference,
)


def _make_params(rng, layout):
    """layout: list of (Cin, Cout) per layer."""
    ws, gs, bs = [], [], []
    for ci, co in layout:
        ws.append(jnp.asarray(
            rng.standard_normal((ci, co)).astype(np.float32) * 0.3
        ))
        gs.append(jnp.asarray(1.0 + 0.1 * rng.standard_normal(co),
                              dtype=jnp.float32))
        bs.append(jnp.asarray(0.1 * rng.standard_normal(co),
                              dtype=jnp.float32))
    return tuple(ws), tuple(gs), tuple(bs)


LAYOUTS = {
    1: [(10, 16), (16, 8), (8, 16)],            # blocks=1, expansion 0.5
    2: [(10, 16), (16, 16), (16, 16), (16, 16), (16, 16)],  # blocks=2
}


@pytest.mark.parametrize("blocks", [1, 2])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_oracle(rng, blocks, dtype):
    B, R, pool = 2, 48, 4
    ws, gs, bs = _make_params(rng, LAYOUTS[blocks])
    x = jnp.asarray(
        rng.standard_normal((B, R, 10)).astype(np.float32)
    ).astype(dtype)
    out, stats = preextract_pool_fused(x, ws, gs, bs, pool, True)
    rout, rstats = preextract_pool_reference(x, ws, gs, bs, pool)
    assert out.dtype == dtype
    # fp32: tiny tiled-vs-single-sum stats reduction-order drift; bf16:
    # additionally +-1 ulp where a value sits on a rounding boundary
    tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(rout, dtype=np.float32),
        rtol=tol, atol=tol,
    )
    stol = 1e-5 if dtype == jnp.float32 else 5e-3
    for (ss, sq), (rss, rsq) in zip(stats, rstats):
        np.testing.assert_allclose(np.asarray(ss), np.asarray(rss),
                                   rtol=stol, atol=stol)
        np.testing.assert_allclose(np.asarray(sq), np.asarray(rsq),
                                   rtol=stol, atol=stol)


@pytest.mark.slow
@pytest.mark.parametrize("blocks", [1, 2])
def test_grad_matches_oracle_autodiff(rng, blocks):
    B, R, pool = 2, 24, 4
    ws, gs, bs = _make_params(rng, LAYOUTS[blocks])
    x = jnp.asarray(rng.standard_normal((B, R, 10)).astype(np.float32))
    # weight the pooled output so every channel gets a distinct cotangent
    cw = jnp.asarray(rng.standard_normal((B, R // pool, 16)).astype(np.float32))

    def loss_fused(x, ws, gs, bs):
        out, _ = preextract_pool_fused(x, ws, gs, bs, pool, True)
        return jnp.sum(out * cw)

    def loss_ref(x, ws, gs, bs):
        out, _ = preextract_pool_reference(x, ws, gs, bs, pool)
        return jnp.sum(out * cw)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, ws, gs, bs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, ws, gs, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32),
            rtol=2e-4, atol=2e-4,
        )


def test_grad_through_stats_outputs(rng):
    """Gradients through the ssum/ssq outputs (running-average path) are
    supported via the c3/c4 fold."""
    B, R, pool = 2, 24, 4
    ws, gs, bs = _make_params(rng, LAYOUTS[1])
    x = jnp.asarray(rng.standard_normal((B, R, 10)).astype(np.float32))

    def loss_fused(x):
        out, stats = preextract_pool_fused(x, ws, gs, bs, pool, True)
        return jnp.sum(out) + sum(
            jnp.sum(ss) * 0.1 + jnp.sum(sq) * 0.01 for ss, sq in stats
        )

    def loss_ref(x):
        out, stats = preextract_pool_reference(x, ws, gs, bs, pool)
        return jnp.sum(out) + sum(
            jnp.sum(ss) * 0.1 + jnp.sum(sq) * 0.01 for ss, sq in stats
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(x)),
        np.asarray(jax.grad(loss_ref)(x)),
        rtol=2e-4, atol=2e-4,
    )


def test_module_fused_matches_xla_path(rng):
    """PreExtraction module: fused vs XLA train path (f32), shared params,
    matching outputs, batch_stats updates, and gradients."""
    from pointcloud_tpu.models.pointmlp import PreExtraction

    B, G, K, D = 2, 6, 4, 10
    mod = PreExtraction(16, blocks=2, res_expansion=1.0, use_bias=False)
    x = jnp.asarray(rng.standard_normal((B, G, K, D)).astype(np.float32))
    vs = mod.init(jax.random.PRNGKey(0), x, train=True)

    def run(impl):
        out, upd = mod.apply(
            vs, x, train=True, impl=impl, interpret=True,
            mutable=["batch_stats"],
        )
        return out, upd

    of, uf = run("fused")
    ox, ux = run("xla")
    assert of.shape == (B, G, 16)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ox),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(uf),
                    jax.tree_util.tree_leaves(ux)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def loss(p, impl):
        out, _ = mod.apply(
            {**vs, "params": p}, x, train=True, impl=impl, interpret=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    gf = jax.grad(lambda p: loss(p, "fused"))(vs["params"])
    gx = jax.grad(lambda p: loss(p, "xla"))(vs["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_module_eval_uses_running_stats(rng):
    from pointcloud_tpu.models.pointmlp import PreExtraction

    B, G, K, D = 2, 6, 4, 10
    mod = PreExtraction(16, blocks=1, res_expansion=0.5, use_bias=False)
    x = jnp.asarray(rng.standard_normal((B, G, K, D)).astype(np.float32))
    vs = mod.init(jax.random.PRNGKey(0), x, train=True)
    # drive the running stats toward this batch, then eval should roughly
    # reproduce the train-path output
    for _ in range(60):
        _, upd = mod.apply(
            vs, x, train=True, impl="xla", mutable=["batch_stats"]
        )
        vs = {**vs, **upd}
    otr, _ = mod.apply(vs, x, train=True, impl="xla",
                       mutable=["batch_stats"])
    oev = mod.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(oev), np.asarray(otr),
                               rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# plain-chain variant (SetAbstraction body): Dense+BN+ReLU stack + masked
# K-pool
# ---------------------------------------------------------------------------

from pointcloud_tpu.ops.preextract_fused import (
    mlp_pool_fused,
    mlp_pool_reference,
)

PLAIN_LAYOUT = [(9, 16), (16, 16), (16, 24)]


def _plain_inputs(rng, B=2, R=48, masked=True, dtype=jnp.float32):
    ws, gs, bs = _make_params(rng, PLAIN_LAYOUT)
    x = jnp.asarray(
        rng.standard_normal((B, R, 9)).astype(np.float32)
    ).astype(dtype)
    if masked:
        pen = jnp.asarray(
            np.where(rng.random((B, R)) < 0.3, 1e9, 0.0).astype(np.float32)
        )
    else:
        pen = jnp.zeros((B, R), jnp.float32)
    return x, ws, gs, bs, pen


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_plain_chain_matches_oracle(rng, dtype):
    x, ws, gs, bs, pen = _plain_inputs(rng, dtype=dtype)
    out, stats = mlp_pool_fused(x, ws, gs, bs, pen, 4, True)
    rout, rstats = mlp_pool_reference(x, ws, gs, bs, pen, 4)
    tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(rout, dtype=np.float32), rtol=tol, atol=tol,
    )
    stol = 1e-5 if dtype == jnp.float32 else 5e-3
    for (ss, sq), (rss, rsq) in zip(stats, rstats):
        np.testing.assert_allclose(np.asarray(ss), np.asarray(rss),
                                   rtol=stol, atol=stol)


def test_plain_chain_all_masked_group_sentinel(rng):
    x, ws, gs, bs, _ = _plain_inputs(rng, masked=False)
    pen = np.zeros((2, 48), np.float32)
    pen[0, 0:4] = 1e9  # group 0 of batch 0 fully masked
    out, _ = mlp_pool_fused(x, ws, gs, bs, jnp.asarray(pen), 4, True)
    assert (np.asarray(out)[0, 0] == -1e9).all()
    assert np.isfinite(np.asarray(out)[0, 1:]).all()
    # masked groups get zero gradient
    g = jax.grad(
        lambda x: jnp.sum(mlp_pool_fused(x, ws, gs, bs, jnp.asarray(pen),
                                         4, True)[0][0, 1:])
    )(x)
    assert np.isfinite(np.asarray(g)).all()


def test_plain_chain_grad_matches_oracle(rng):
    x, ws, gs, bs, pen = _plain_inputs(rng)
    cw = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))
    # only weight finite outputs (sentinel rows are constants)
    def loss(fn):
        def f(x, ws, gs, bs):
            out, _ = fn(x, ws, gs, bs, pen, 4)
            return jnp.sum(jnp.where(out > -1e8, out * cw, 0.0))
        return f

    gf = jax.grad(loss(lambda *a: mlp_pool_fused(*a, True)),
                  argnums=(0, 1, 2, 3))(x, ws, gs, bs)
    gr = jax.grad(loss(mlp_pool_reference), argnums=(0, 1, 2, 3))(
        x, ws, gs, bs
    )
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-4,
        )


def test_set_abstraction_fused_matches_reference_path(rng):
    """SetAbstraction: the fused chain (interpret mode) on the module's
    extracted params — exactly what the train-on-TPU branch runs — matches
    both the op-level oracle and the module's oracle path."""
    import pointcloud_tpu.models.pointnet2 as pn2
    from pointcloud_tpu.ops.geometry import sample_and_group
    from pointcloud_tpu.ops.preextract_fused import (
        mlp_pool_fused, mlp_pool_reference,
    )

    B, N = 2, 64
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    mod = pn2.SetAbstraction(npoint=16, radius=0.3, nsample=8,
                             mlp=(16, 16, 24))
    vs = mod.init(jax.random.PRNGKey(0), xyz, feats, train=True)

    new_xyz, grouped, gmask, new_mask = sample_and_group(
        16, 0.3, 8, xyz, feats, mask=None
    )
    Bs, S, K, Cin = grouped.shape
    ws = tuple(vs["params"][f"w{i}"] for i in range(3))
    gs = tuple(vs["params"][f"scale{i}"] for i in range(3))
    os_ = tuple(vs["params"][f"offset{i}"] for i in range(3))
    xr = grouped.reshape(Bs, S * K, Cin)
    pen = jnp.where(gmask.reshape(Bs, S * K), 0.0, jnp.float32(1e9))
    fo, fstats = mlp_pool_fused(xr, ws, gs, os_, pen, K, True)
    ro, rstats = mlp_pool_reference(xr, ws, gs, os_, pen, K)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro),
                               rtol=1e-5, atol=1e-5)

    # and the module's oracle path output equals the op-level oracle
    (nx, out, nm), _ = mod.apply(
        vs, xyz, feats, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ro),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_plain_chain_final_relu_false(rng, dtype):
    """final_relu=False (PointNet conv3+bn3+pool, no post-pool ReLU):
    fused == oracle for values AND gradients, and negative pooled values
    actually survive (the relu-less path is exercised)."""
    x, ws, gs, bs, pen = _plain_inputs(rng, dtype=dtype)
    out, _ = mlp_pool_fused(x, ws, gs, bs, pen, 4, True, False)
    rout, _ = mlp_pool_reference(x, ws, gs, bs, pen, 4, final_relu=False)
    tol = 1e-5 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(rout, np.float32),
        rtol=tol, atol=tol,
    )
    finite = np.asarray(out, np.float32)
    finite = finite[finite > -1e8]
    assert (finite < 0).any(), "no negative pooled values - relu-less path untested"

    if dtype == jnp.float32:
        cw = jnp.asarray(rng.standard_normal((2, 12, 24)).astype(np.float32))

        def loss(fn, **kw):
            def f(x, ws, gs, bs):
                out, _ = fn(x, ws, gs, bs, pen, 4, **kw)
                return jnp.sum(jnp.where(out > -1e8, out * cw, 0.0))
            return f

        gf = jax.grad(
            loss(lambda *a, **k: mlp_pool_fused(*a, True, **k),
                 final_relu=False),
            argnums=(0, 1, 2, 3))(x, ws, gs, bs)
        gr = jax.grad(loss(mlp_pool_reference, final_relu=False),
                      argnums=(0, 1, 2, 3))(x, ws, gs, bs)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=2e-4,
            )


def test_vmem_grants_cover_measured_mosaic_demand():
    """Regression guard for the r5 PointMLPElite compile OOM: the VMEM
    grants for the chain passes at Elite's wide-R narrow-C stage-1 shapes
    must stay at or above Mosaic's MEASURED stack demand (96 MB for the
    bb=4 forward layer pass, 104 MB for the pool pass — the exact failures
    observed on TPU before the _gen() shape-aware scale landed)."""
    from pointcloud_tpu.ops.preextract_fused import _gen, _row_tile, _vmem

    # Elite stage 1 forward at bb=4: B0=32, R0=24576, C=64, bf16
    R, C, isz = 4 * 24576, 64, 2
    r_tile = _row_tile(R, 24, C)
    layer_grant = _vmem(int(_gen(C) * (6 * r_tile * C * 4 + 4 * R * C * isz)))
    assert layer_grant >= 96 << 20, layer_grant

    r_tile_p = _row_tile(R, 24, C, aligned=True)
    pool_grant = _vmem(int(_gen(C) * (8 * r_tile_p * C * 4 + 6 * R * C * isz)))
    assert pool_grant >= 104 << 20, pool_grant

    # and the tight model stays tight where it was calibrated (C >= 128)
    assert _gen(128) == 1.0 and _gen(64) > 1.0
