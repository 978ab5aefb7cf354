"""Model-zoo tests: shapes, contracts, BatchNorm state, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_tpu.models import (
    AE,
    MultiGTEncoder,
    MultiSegAE,
    PointNet2Encoder,
    PointNetEncoder,
    SegAE,
    backbone_factory,
)
from pointcloud_tpu.models.architectures import encoding_dim_of
from pointcloud_tpu.models.pointmlp import PointMLPElite

B, N = 2, 128


def init_and_run(model, x, method=None):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fn = model.apply
    if method is None:
        out = fn(variables, x, train=False)
    else:
        out = fn(variables, x, train=False, method=method)
    return variables, out


@pytest.fixture
def cloud(rng):
    return jnp.asarray(rng.random((B, N, 6), dtype=np.float32))


def test_pointnet_encoding_shape(cloud):
    model = PointNetEncoder(space_dims=3, feature_dims=3)
    _, enc = init_and_run(model, cloud)
    assert enc.shape == (B, 1024)
    assert model.ENCODING_DIM == 1024


@pytest.mark.slow
def test_pointnet2_encoding_shape(cloud):
    model = PointNet2Encoder(space_dims=3, feature_dims=3)
    _, enc = init_and_run(model, cloud)
    assert enc.shape == (B, 1024)


@pytest.mark.slow
def test_pointmlp_factories(rng):
    x = jnp.asarray(rng.random((B, 256, 3), dtype=np.float32))
    model = backbone_factory["PointMLP"](points=256, feature_dims=3)
    _, enc = init_and_run(model, x)
    assert enc.shape == (B, 1024)
    elite = PointMLPElite(points=256)
    assert encoding_dim_of(elite) == 256
    _, enc_e = init_and_run(elite, x)
    assert enc_e.shape == (B, 256)


def test_ae_output_in_unit_cube(cloud):
    model = AE(PointNetEncoder(), out_points=64, out_dim=6, bottleneck=16)
    _, out = init_and_run(model, cloud)
    assert out.shape == (B, 64, 6)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0  # sigmoid output


def test_ae_encode_bottleneck(cloud):
    model = AE(PointNetEncoder(), out_points=64, out_dim=6, bottleneck=16)
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    enc = model.apply(variables, cloud, train=False, method=model.encode)
    assert enc.shape == (B, 16)


def test_segae_output_split(cloud):
    model = SegAE(PointNetEncoder(), num_classes=5, out_points=64, bottleneck=16)
    _, out = init_and_run(model, cloud)
    assert out.shape == (B, 64, 8)
    o = np.asarray(out)
    assert o[..., :3].min() >= 0 and o[..., :3].max() <= 1  # xyz sigmoid
    assert o[..., 3:].min() < 0 or o[..., 3:].max() > 1  # raw logits


def test_multisegae_forward_and_labeled(cloud):
    model = MultiSegAE(
        preencoder=PointNetEncoder(),
        class_labels={"cube": 1, "arm": 2},
        name_points_dims=(("cube", 32, 3), ("arm", 48, 7)),
    )
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    out = model.apply(variables, cloud, train=False)
    assert out["cube"].shape == (B, 32, 3)
    assert out["arm"].shape == (B, 48, 3)
    enc = model.apply(variables, cloud, train=False, method=model.encode)
    assert enc["cube"].shape == (B, 3) and enc["arm"].shape == (B, 7)
    flat = model.apply(variables, cloud, train=False, method=model.encode_flat)
    assert flat.shape == (B, 10)
    labeled = model.apply(
        variables, cloud, train=False, method=model.reconstruct_labeled
    )
    assert labeled.shape == (B, 80, 4)
    labels = np.unique(np.asarray(labeled)[..., 3])
    assert set(labels.tolist()) == {1.0, 2.0}


def test_multigt_encoder(cloud):
    model = MultiGTEncoder(
        preencoder=PointNetEncoder(),
        state_dims={"cube_pos": 3, "eef_pos": 3},
    )
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    out = model.apply(variables, cloud, train=False)
    assert out["cube_pos"].shape == (B, 3)
    o = np.asarray(out["cube_pos"])
    assert o.min() >= 0 and o.max() <= 1
    enc = model.apply(variables, cloud, train=False, method=model.encode)
    assert enc.shape == (B, 6)


def test_batchnorm_state_updates(cloud):
    model = PointNetEncoder()
    variables = model.init(jax.random.PRNGKey(0), cloud, train=True)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, cloud, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "batch stats must update in train mode"


@pytest.mark.slow
def test_ae_gradients_finite(cloud):
    from pointcloud_tpu.ops import chamfer_distance

    model = AE(PointNetEncoder(), out_points=64, out_dim=6, bottleneck=16)
    variables = model.init(jax.random.PRNGKey(0), cloud, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            cloud,
            train=True,
            mutable=["batch_stats"],
        )
        return chamfer_distance(out[..., :3], cloud[..., :3])

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_pointnet_mask_excludes_points(rng):
    """Masked-out points must not affect the encoding."""
    x = rng.random((1, 64, 6), dtype=np.float32)
    model = PointNetEncoder()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    mask = np.ones((1, 64), dtype=bool)
    mask[0, 32:] = False
    enc_masked = model.apply(
        variables, jnp.asarray(x), train=False, mask=jnp.asarray(mask)
    )
    x2 = x.copy()
    x2[0, 32:] = 123.0  # garbage in masked region
    enc_masked2 = model.apply(
        variables, jnp.asarray(x2), train=False, mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(enc_masked), np.asarray(enc_masked2), atol=2e-4
    )


@pytest.mark.slow
def test_pointnet2_ssg_msg_encoders(cloud):
    from pointcloud_tpu.models import PointNet2MSGEncoder, PointNet2SSGEncoder

    for cls in (PointNet2SSGEncoder, PointNet2MSGEncoder):
        model = cls()
        _, enc = init_and_run(model, cloud)
        assert enc.shape == (B, 1024), cls.__name__


def test_pointnet_forward_all_features_shares_weights(cloud):
    """forward_all_features must reuse __call__'s weights (setup-shared)."""
    model = PointNetEncoder()
    variables = model.init(jax.random.PRNGKey(0), cloud, train=False)
    allf = model.apply(
        variables, cloud, train=False, method=model.forward_all_features
    )
    assert allf.shape == (B, N, 64 + 1024)
    # the tiled global features derive from the same params as __call__
    variables2 = model.init(
        jax.random.PRNGKey(0), cloud, train=False,
        method=model.forward_all_features,
    )
    t1 = jax.tree_util.tree_structure(variables["params"])
    t2 = jax.tree_util.tree_structure(variables2["params"])
    assert t1 == t2


def test_bn_mask_contract_warns_in_debug(cloud):
    """Training-mode forward with a mask warns under cfg.debug: BatchNorm
    stats ignore masks (documented contract, VERDICT r1 weak #7)."""
    import warnings

    from pointcloud_tpu import cfg

    model = PointNetEncoder()
    mask = jnp.ones(cloud.shape[:2], bool)
    old = cfg.debug
    cfg.debug = True
    try:
        with pytest.warns(UserWarning, match="BatchNorm"):
            model.init(jax.random.PRNGKey(0), cloud, train=True, mask=mask)
    finally:
        cfg.debug = old
    # no mask, or eval mode: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        model.init(jax.random.PRNGKey(0), cloud, train=True)
        model.init(jax.random.PRNGKey(0), cloud, train=False, mask=mask)


class _UnfusedBNMax(__import__("flax").linen.Module):
    """Reference composition: BatchNorm -> (relu) -> mask -> max(axis=-2)."""

    final_relu: bool = False
    dtype: jnp.dtype | None = None

    @__import__("flax").linen.compact
    def __call__(self, x, train=False, mask=None):
        import flax.linen as nn

        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)
        if self.final_relu:
            y = nn.relu(y)
        if mask is not None:
            y = jnp.where(jnp.expand_dims(mask, -1), y, -1e9)
        return jnp.max(y, axis=-2)


@pytest.mark.slow
@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("final_relu", [True, False])
@pytest.mark.parametrize("masked", [True, False])
def test_bnmaxpool_matches_unfused(rng, train, final_relu, masked):
    """BNMaxPool (pool before normalize) == BatchNorm+relu+masked max,
    including negative scales, batch-stat updates, and gradients."""
    from pointcloud_tpu.models.pointnet import BNMaxPool

    x = jnp.asarray(rng.standard_normal((3, 17, 8), dtype=np.float32))
    mask = jnp.asarray(rng.random((3, 17)) > 0.3) if masked else None
    scale = jnp.asarray(rng.standard_normal(8), dtype=jnp.float32)  # +/- signs
    bias = jnp.asarray(rng.standard_normal(8), dtype=jnp.float32)
    rmean = jnp.asarray(rng.standard_normal(8), dtype=jnp.float32)
    rvar = jnp.asarray(rng.random(8) + 0.5, dtype=jnp.float32)

    fused = BNMaxPool(final_relu=final_relu)
    unfused = _UnfusedBNMax(final_relu=final_relu)
    vf = {
        "params": {"scale": scale, "bias": bias},
        "batch_stats": {"mean": rmean, "var": rvar},
    }
    vu = {
        "params": {"BatchNorm_0": {"scale": scale, "bias": bias}},
        "batch_stats": {"BatchNorm_0": {"mean": rmean, "var": rvar}},
    }

    def run(mod, v, x):
        if train:
            out, mut = mod.apply(v, x, train=True, mask=mask, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return mod.apply(v, x, train=False, mask=mask), None

    of, sf = run(fused, vf, x)
    ou, su = run(unfused, vu, x)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ou), rtol=1e-6, atol=1e-6)
    if train:
        np.testing.assert_allclose(
            np.asarray(sf["mean"]), np.asarray(su["BatchNorm_0"]["mean"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sf["var"]), np.asarray(su["BatchNorm_0"]["var"]), rtol=1e-6
        )

    # gradient parity (w.r.t. input and scale/bias)
    def loss_f(xx, s, b):
        v = {"params": {"scale": s, "bias": b},
             "batch_stats": {"mean": rmean, "var": rvar}}
        if train:
            out, _ = fused.apply(v, xx, train=True, mask=mask, mutable=["batch_stats"])
        else:
            out = fused.apply(v, xx, train=False, mask=mask)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_u(xx, s, b):
        v = {"params": {"BatchNorm_0": {"scale": s, "bias": b}},
             "batch_stats": {"BatchNorm_0": {"mean": rmean, "var": rvar}}}
        if train:
            out, _ = unfused.apply(v, xx, train=True, mask=mask, mutable=["batch_stats"])
        else:
            out = unfused.apply(v, xx, train=False, mask=mask)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, scale, bias)
    gu = jax.grad(loss_u, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_localgrouper_std_matches_unbiased_oracle(rng):
    """LocalGrouper's fused sum/sumsq std == the reference unbiased
    torch.std-over-flattened formulation (pointmlp.py:174)."""
    from pointcloud_tpu.models.pointmlp import LocalGrouper
    from pointcloud_tpu.ops.fps import farthest_point_sample
    from pointcloud_tpu.ops.geometry import group_neighbors, index_points

    B, N, D, G, K = 2, 64, 8, 16, 4
    xyz = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, N, D), dtype=np.float32))
    lg = LocalGrouper(groups=G, kneighbors=K, normalize="anchor")
    vs = lg.init(jax.random.PRNGKey(0), xyz, feats)
    # non-trivial affine so the params matter
    vs = {"params": {
        "affine_alpha": jnp.full((1, 1, 1, D), 1.5, jnp.float32),
        "affine_beta": jnp.full((1, 1, 1, D), -0.25, jnp.float32),
    }}
    _, grouped, _ = lg.apply(vs, xyz, feats)

    # oracle: same grouping ops + the old two-pass unbiased-std math
    fps_idx = farthest_point_sample(xyz, G)
    new_xyz = index_points(xyz, fps_idx)
    anchor = index_points(feats, fps_idx)
    _, gfeats, _, _ = group_neighbors(xyz, feats, new_xyz, K, radius=None)
    centered = np.asarray(gfeats) - np.asarray(anchor)[:, :, None, :]
    flat = centered.reshape(B, -1).astype(np.float64)
    std = flat.std(axis=-1, ddof=1)[:, None, None, None]
    normed = centered / (std + 1e-5)
    want = 1.5 * normed - 0.25
    got = np.asarray(grouped)[..., :D]  # first D dims = normalized feats
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("final_relu", [True, False])
@pytest.mark.parametrize("train", [True, False])
def test_mlp_chain_pool_matches_composition(rng, train, final_relu):
    """MLPChainPool == PointwiseMLP(features[:-1]) + DenseBNMaxPool(last):
    same values (params synced; composition biases zero) in train (batch
    stats) and eval (running stats), with a mask, plus matching input
    gradients in train mode."""
    import flax.linen as nn

    from pointcloud_tpu.models.pointnet import (
        DenseBNMaxPool,
        MLPChainPool,
        PointwiseMLP,
    )

    feats = (8, 12, 16)
    Bc, Nc, Cin = 3, 32, 5
    x = jnp.asarray(rng.standard_normal((Bc, Nc, Cin)).astype(np.float32))
    mask = jnp.asarray(rng.random((Bc, Nc)) > 0.2)

    chain = MLPChainPool(feats, final_relu=final_relu)
    cv = chain.init(jax.random.PRNGKey(0), x, train=True)

    class Comp(nn.Module):
        @nn.compact
        def __call__(self, xx, train=False, mask=None):
            h = PointwiseMLP(feats[:-1])(xx, train=train)
            return DenseBNMaxPool(feats[-1], final_relu=final_relu,
                                  use_bias=False)(h, train=train, mask=mask)

    comp = Comp()
    pv = comp.init(jax.random.PRNGKey(1), x, train=True)

    # sync composition params from the chain's
    p = jax.tree_util.tree_map(lambda a: a, pv)  # deep copy
    cp = cv["params"]
    p["params"]["PointwiseMLP_0"]["Dense_0"]["kernel"] = cp["w0"]
    p["params"]["PointwiseMLP_0"]["Dense_1"]["kernel"] = cp["w1"]
    p["params"]["PointwiseMLP_0"]["BatchNorm_0"]["scale"] = cp["scale0"]
    p["params"]["PointwiseMLP_0"]["BatchNorm_0"]["bias"] = cp["offset0"]
    p["params"]["PointwiseMLP_0"]["BatchNorm_1"]["scale"] = cp["scale1"]
    p["params"]["PointwiseMLP_0"]["BatchNorm_1"]["bias"] = cp["offset1"]
    p["params"]["DenseBNMaxPool_0"]["kernel"] = cp["w2"]
    p["params"]["DenseBNMaxPool_0"]["scale"] = cp["scale2"]
    p["params"]["DenseBNMaxPool_0"]["offset"] = cp["offset2"]
    # zero the composition Dense biases (absorbed by BN; chain has none)
    p["params"]["PointwiseMLP_0"]["Dense_0"]["bias"] = jnp.zeros(feats[0])
    p["params"]["PointwiseMLP_0"]["Dense_1"]["bias"] = jnp.zeros(feats[1])

    if train:
        co, cmut = chain.apply(cv, x, train=True, mask=mask,
                               mutable=["batch_stats"])
        po, pmut = comp.apply(p, x, train=True, mask=mask,
                              mutable=["batch_stats"])
    else:
        # push one identical train step through both to populate stats
        _, cmut = chain.apply(cv, x, train=True, mask=mask,
                              mutable=["batch_stats"])
        _, pmut = comp.apply(p, x, train=True, mask=mask,
                             mutable=["batch_stats"])
        co = chain.apply({**cv, **cmut}, x, train=False, mask=mask)
        po = comp.apply({**p, **pmut}, x, train=False, mask=mask)

    np.testing.assert_allclose(np.asarray(co), np.asarray(po),
                               rtol=3e-5, atol=3e-5)

    if train:
        def loss_c(xx):
            o, _ = chain.apply(cv, xx, train=True, mask=mask,
                               mutable=["batch_stats"])
            return jnp.sum(jnp.where(o > -1e8, o * o, 0.0))

        def loss_p(xx):
            o, _ = comp.apply(p, xx, train=True, mask=mask,
                              mutable=["batch_stats"])
            return jnp.sum(jnp.where(o > -1e8, o * o, 0.0))

        gc = jax.grad(loss_c)(x)
        gp = jax.grad(loss_p)(x)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gp),
                                   rtol=2e-4, atol=2e-4)
