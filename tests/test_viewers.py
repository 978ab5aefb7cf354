"""Viewer logic tests (headless: assembly + PNG export, no windows)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pointcloud_tpu.envs.synthetic import generate_dataset
from pointcloud_tpu.viewers.reconstruct import aa_lines, lerp_clouds


def test_aa_lines_shape_and_center():
    pts, cols = aa_lines([1.0, 2.0, 3.0], [1, 0, 0], length=0.2, n=10)
    assert pts.shape == (30, 3) and cols.shape == (30, 3)
    np.testing.assert_allclose(pts.mean(0), [1, 2, 3], atol=1e-6)
    assert np.abs(pts - [1, 2, 3]).max() <= 0.1 + 1e-6


def test_lerp_clouds():
    a = np.zeros((5, 3), np.float32)
    b = np.ones((5, 3), np.float32)
    np.testing.assert_allclose(lerp_clouds(a, b, 0.25), 0.25)


def test_pc_viewer_cli_headless(tmp_path):
    d = tmp_path / "data"
    generate_dataset(str(d), scene="Cube", frames=1, seed=0, sample_points=128)
    out = tmp_path / "frame.png"
    r = subprocess.run(
        [sys.executable, "pc_viewer.py", str(d / "0.npz"), "--save", str(out)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1000
    assert "class 1 cube" in r.stdout


def test_assemble_prediction_autoencoder(rng):
    """Assembly works against a freshly initialized (untrained) model."""
    import jax

    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.train.harness import create_model
    from pointcloud_tpu.viewers.reconstruct import assemble_prediction

    scenes.cfg_scene["Cube"] = dict(scenes.cfg_scene["Cube"], sample_points=64)
    try:
        spec, _ = create_model("Autoencoder", "PointNet", "Cube")
        x = rng.random((64, 6), dtype=np.float32)
        variables = spec.model.init(
            jax.random.PRNGKey(0), np.asarray(x)[None], train=False
        )
        p_xyz, p_rgb, g_xyz, g_rgb = assemble_prediction(
            "Autoencoder", spec, variables, x, x
        )
        assert p_xyz.shape == (64, 3) and p_rgb.shape == (64, 3)
        np.testing.assert_array_equal(g_xyz, x[:, :3])
    finally:
        scenes.cfg_scene["Cube"] = dict(scenes.cfg_scene["Cube"], sample_points=2048)


def test_assemble_prediction_statepredictor(rng):
    import jax

    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.train.harness import create_model
    from pointcloud_tpu.viewers.reconstruct import assemble_prediction

    scenes.cfg_scene["Cube"] = dict(scenes.cfg_scene["Cube"], sample_points=64)
    try:
        spec, _ = create_model("StatePredictor", "PointNet", "Cube")
        x = rng.random((64, 6), dtype=np.float32)
        variables = spec.model.init(
            jax.random.PRNGKey(0), np.asarray(x)[None], train=False
        )
        target = {"cube_pos": np.zeros(3, np.float32),
                  "robot0_eef_pos": np.ones(3, np.float32)}
        p_xyz, p_rgb, g_xyz, g_rgb = assemble_prediction(
            "StatePredictor", spec, variables, x, target
        )
        assert len(p_xyz) == 300  # 2 states x 3 axes x 50 pts
        assert len(g_xyz) == 300
    finally:
        scenes.cfg_scene["Cube"] = dict(scenes.cfg_scene["Cube"], sample_points=2048)


def test_assemble_prediction_segmenter_and_multiseg(rng):
    import jax

    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.train.harness import create_model
    from pointcloud_tpu.viewers.reconstruct import assemble_prediction

    colors = scenes.cfg_scene["Cube"]["class_colors"]
    scenes.cfg_scene["Cube"] = dict(scenes.cfg_scene["Cube"], sample_points=64)
    try:
        x = rng.random((64, 6), dtype=np.float32)
        target = np.concatenate(
            [rng.random((64, 3), dtype=np.float32),
             rng.integers(0, 5, (64, 1)).astype(np.float32)], axis=1
        )
        for model_type in ("Segmenter", "MultiSegmenter"):
            spec, _ = create_model(model_type, "PointNet", "Cube")
            variables = spec.model.init(
                jax.random.PRNGKey(0), np.asarray(x)[None], train=False
            )
            p_xyz, p_rgb, g_xyz, g_rgb = assemble_prediction(
                model_type, spec, variables, x, target, class_colors=colors
            )
            assert p_xyz.shape[1] == 3 and p_rgb.shape == p_xyz.shape
            assert len(g_xyz) == 64
            # colors come from the class palette
            palette = {tuple(c) for c in np.asarray(colors, np.float32)}
            assert all(tuple(c) in palette for c in p_rgb[:10])
    finally:
        scenes.cfg_scene["Cube"] = dict(
            scenes.cfg_scene["Cube"], sample_points=2048
        )


# ---------------------------------------------------------------------------
# interactive viewer core (reference ae_viewer key navigation + lerp
# animation + live i/o/v toggles, driven headlessly)
# ---------------------------------------------------------------------------


def _mk_core(n=4, speed=0.5, mode="overlap"):
    import numpy as np

    from pointcloud_tpu.viewers.interactive import ReconViewerCore

    def load(i):
        pred = np.full((8, 3), float(i), np.float32)
        gt = np.full((8, 3), float(i) + 100.0, np.float32)
        col = np.full((8, 3), 0.5, np.float32)
        return pred, col, gt, col

    return ReconViewerCore(load, n, mode=mode, animation_speed=speed), load


def test_interactive_navigation_wraps():
    core, _ = _mk_core(n=3)
    assert core.index == 0
    core.key("right")
    assert core.index == 1
    core.key("left")
    core.key("left")
    assert core.index == 2  # wraps like the reference's python indexing


def test_interactive_lerp_animation():
    import numpy as np

    core, _ = _mk_core(speed=0.5)
    core.key("right")  # sample 0 -> 1; animation starts at t=0
    assert core.anim_t == 0.0
    xyz, _ = core.frame()
    # prediction part (second half in overlap mode order: gt first) morphs
    gt_part, pred_part = xyz[:8], xyz[8:]
    np.testing.assert_allclose(pred_part, 0.0)   # t=0: still the old pred
    np.testing.assert_allclose(gt_part, 101.0)   # gt jumps immediately
    assert core.tick()
    pred_mid = core.frame()[0][8:]
    np.testing.assert_allclose(pred_mid, 0.5)    # halfway morph
    assert core.tick()
    assert not core.tick()                        # animation finished
    np.testing.assert_allclose(core.frame()[0][8:], 1.0)


def test_interactive_mode_and_toggles():
    import numpy as np

    core, _ = _mk_core(mode="overlap")
    xyz, rgb = core.frame()
    assert xyz.shape == (16, 3)
    # overlap tints: gt toward green, pred toward red (30%)
    np.testing.assert_allclose(rgb[0], [0.35, 0.65, 0.35], atol=1e-6)
    np.testing.assert_allclose(rgb[8], [0.65, 0.35, 0.35], atol=1e-6)

    core.key("m")  # side-by-side: +-0.3 shift on y, no tint
    xyz2, rgb2 = core.frame()
    np.testing.assert_allclose(xyz2[0, 1], 100.0 - 0.3, atol=1e-6)
    np.testing.assert_allclose(xyz2[8, 1], 0.0 + 0.3, atol=1e-6)
    np.testing.assert_allclose(rgb2[0], 0.5, atol=1e-6)

    core.key("i")  # hide input/GT
    assert core.frame()[0].shape == (8, 3)
    core.key("o")  # hide prediction too
    assert core.frame()[0].shape == (0, 3)
    core.key("i")
    core.key("o")
    assert core.frame()[0].shape == (16, 3)


def test_interactive_marker_part_toggle():
    import numpy as np

    from pointcloud_tpu.viewers.interactive import ReconViewerCore

    def load(i):
        z8 = np.zeros((8, 3), np.float32)
        vis = np.ones((4, 3), np.float32)
        return z8, z8, z8, z8, vis, vis

    core = ReconViewerCore(load, 2)
    assert core.frame()[0].shape == (20, 3)
    core.key("v")
    assert core.frame()[0].shape == (16, 3)
