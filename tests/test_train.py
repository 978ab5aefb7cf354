"""End-to-end training harness tests (small shapes, CPU 8-device mesh)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end runs; excluded by -m "not slow"

import pointcloud_tpu.cfg as cfg
from pointcloud_tpu.envs.synthetic import generate_dataset
from pointcloud_tpu.train import create_model, train
from pointcloud_tpu.train.harness import latest_checkpoint, load_checkpoint_raw

N_PTS = 128


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """input/<scene>/{train,val} layout with tiny clouds."""
    root = tmp_path_factory.mktemp("input_root")
    d = root / "Cube"
    generate_dataset(str(d / "train"), scene="Cube", frames=16, seed=0, sample_points=N_PTS)
    generate_dataset(str(d / "val"), scene="Cube", frames=4, seed=99, sample_points=N_PTS)
    return str(root)


@pytest.fixture(autouse=True)
def small_scene(monkeypatch):
    """Shrink the Cube scene's point budget to match the tiny test data."""
    from pointcloud_tpu.envs import scenes

    patched = dict(scenes.cfg_scene["Cube"], sample_points=N_PTS)
    monkeypatch.setitem(scenes.cfg_scene, "Cube", patched)
    monkeypatch.setattr(cfg, "emd_iterations", 10)
    yield


def _run(model_type, backbone, data_root, out_root, **kw):
    return train(
        model_type,
        backbone,
        scene="Cube",
        epochs=2,
        batch_size=4,
        input_root=data_root,
        output_root=out_root,
        log_meshes=False,
        **kw,
    )


def test_autoencoder_chamfer_loss_decreases(data_root, tmp_path):
    """The minimum end-to-end slice (SURVEY.md §7): synthetic data ->
    PointNet AE -> chamfer -> loss falls."""
    import io
    from contextlib import redirect_stdout

    loss, ckpt_dir = _run(
        "Autoencoder", "PointNet", data_root, str(tmp_path), loss_override="chamfer"
    )
    assert np.isfinite(loss)
    ckpt = latest_checkpoint(ckpt_dir)
    assert ckpt is not None and ckpt.endswith("step_1")
    payload = load_checkpoint_raw(ckpt)
    assert "params" in payload and "batch_stats" in payload


def test_autoencoder_emd_loss(data_root, tmp_path):
    loss, _ = _run("Autoencoder", "PointNet", data_root, str(tmp_path))
    assert np.isfinite(loss)


def test_segmenter_trains(data_root, tmp_path):
    loss, _ = _run("Segmenter", "PointNet", data_root, str(tmp_path))
    assert np.isfinite(loss)


def test_multisegmenter_trains(data_root, tmp_path):
    loss, _ = _run("MultiSegmenter", "PointNet", data_root, str(tmp_path))
    assert np.isfinite(loss)


def test_statepredictor_trains(data_root, tmp_path):
    loss, _ = _run("StatePredictor", "PointNet", data_root, str(tmp_path))
    assert np.isfinite(loss)


def test_resume_from_checkpoint(data_root, tmp_path):
    loss, ckpt_dir = _run(
        "Autoencoder", "PointNet", data_root, str(tmp_path), loss_override="chamfer"
    )
    ckpt = latest_checkpoint(ckpt_dir)
    loss2, ckpt_dir2 = train(
        "Autoencoder",
        "PointNet",
        scene="Cube",
        epochs=3,
        batch_size=4,
        input_root=data_root,
        output_root=str(tmp_path),
        ckpt_path=ckpt,
        loss_override="chamfer",
        log_meshes=False,
    )
    assert np.isfinite(loss2)
    # resumed into the SAME version dir (train.py:176-182) and continued
    # epoch numbering: epochs 0-1 trained, resume runs epoch 2 -> step_2
    assert ckpt_dir2 == ckpt_dir
    assert latest_checkpoint(ckpt_dir2).endswith("step_2")


def test_create_model_encoder_only_strips_decoder(data_root, tmp_path):
    loss, ckpt_dir = _run(
        "Autoencoder", "PointNet", data_root, str(tmp_path), loss_override="chamfer"
    )
    from pointcloud_tpu.train.harness import load_checkpoint_variables

    ckpt = latest_checkpoint(ckpt_dir)
    payload = load_checkpoint_variables(ckpt, encoder_only=True)
    assert all(not k.startswith("decoder") for k in payload["params"])
    full = load_checkpoint_variables(ckpt, encoder_only=False)
    assert any(k.startswith("decoder") for k in full["params"])


def test_training_actually_learns(data_root, tmp_path):
    """8 epochs of chamfer AE on 16 samples must cut the loss by >2x
    vs a 1-epoch run."""
    losses = []
    loss, ckpt_dir = train(
        "Autoencoder",
        "PointNet",
        scene="Cube",
        epochs=8,
        batch_size=4,
        input_root=data_root,
        output_root=str(tmp_path),
        loss_override="chamfer",
        log_meshes=False,
    )
    # reconstruct first-epoch loss from checkpointed TB? simpler: retrain 1 epoch
    first_loss, _ = train(
        "Autoencoder",
        "PointNet",
        scene="Cube",
        epochs=1,
        batch_size=4,
        input_root=data_root,
        output_root=str(tmp_path / "b"),
        loss_override="chamfer",
        log_meshes=False,
    )
    assert loss < first_loss / 2, (loss, first_loss)


def test_train_multihost_single_process(data_root, tmp_path):
    """multihost=True on one process: global mesh over the 8 CPU devices,
    shard_batch_global feeds the full process_local slice (= whole batch),
    and the run produces a finite loss + checkpoint like the local path."""
    # every batch (incl. val) must divide the 8 global devices
    root = tmp_path / "input"
    generate_dataset(str(root / "Cube" / "train"), scene="Cube", frames=16,
                     seed=0, sample_points=N_PTS)
    generate_dataset(str(root / "Cube" / "val"), scene="Cube", frames=8,
                     seed=99, sample_points=N_PTS)
    loss, ckpt_dir = train(
        "Autoencoder", "PointNet", scene="Cube", epochs=2, batch_size=8,
        input_root=str(root), output_root=str(tmp_path / "out"),
        log_meshes=False, loss_override="chamfer", multihost=True,
    )
    assert np.isfinite(loss)
    assert latest_checkpoint(ckpt_dir) is not None


def test_pointmlp_backbone_trains(tmp_path, monkeypatch):
    """PointMLPElite AE through the full harness (the restructured
    PreExtraction param tree round-trips init -> step -> checkpoint).
    Needs >=384 points: the 4 stages halve the cloud and stage 4's kNN
    requires k=24 <= N/16 (the reference has the same constraint)."""
    from pointcloud_tpu.envs import scenes

    n = 384
    monkeypatch.setitem(
        scenes.cfg_scene, "Cube",
        dict(scenes.cfg_scene["Cube"], sample_points=n),
    )
    root = tmp_path / "input"
    generate_dataset(str(root / "Cube" / "train"), scene="Cube", frames=8,
                     seed=0, sample_points=n)
    generate_dataset(str(root / "Cube" / "val"), scene="Cube", frames=4,
                     seed=9, sample_points=n)
    loss, ckpt_dir = train(
        "Autoencoder", "PointMLPE", scene="Cube", epochs=1, batch_size=4,
        input_root=str(root), output_root=str(tmp_path / "out"),
        log_meshes=False, loss_override="chamfer",
    )
    assert np.isfinite(loss)
    assert latest_checkpoint(ckpt_dir) is not None


def test_pointnet2_backbone_trains(data_root, tmp_path):
    """PointNet2 AE through the full harness (restructured SetAbstraction
    param tree)."""
    loss, ckpt_dir = _run(
        "Autoencoder", "PointNet2", data_root, str(tmp_path),
        loss_override="chamfer",
    )
    assert np.isfinite(loss)
    assert latest_checkpoint(ckpt_dir) is not None
