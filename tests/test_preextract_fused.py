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
