"""Native C++ npz loader tests: exact parity with numpy, throughput sanity."""

import time

import numpy as np
import pytest

from pointcloud_tpu.data.native_loader import (
    NativeBatchLoader,
    load_key,
    native_available,
)
from pointcloud_tpu.envs.synthetic import generate_dataset

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def npz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_data")
    generate_dataset(str(d), scene="Cube", frames=10, seed=0, sample_points=128)
    return str(d)


def test_load_key_matches_numpy(npz_dir):
    import os

    f = sorted(os.listdir(npz_dir))[0]
    path = os.path.join(npz_dir, f)
    ref = np.load(path)
    for key in ("points", "rgb", "segmentation", "boundingbox"):
        got = load_key(path, key)
        want = np.asarray(ref[key], np.float32).reshape(-1)
        np.testing.assert_array_equal(got, want)


def test_load_key_fortran_order(tmp_path):
    """Column slices save as Fortran-order npy entries; the native decoder
    must convert them to C order (regression: real 2048-pt datasets)."""
    rng = np.random.default_rng(0)
    big = rng.random((64, 7)).astype(np.float32)
    fortran_slice = big[:, :3]  # may save as fortran_order=True
    f_arr = np.asfortranarray(rng.random((32, 5)).astype(np.float32))
    f3 = np.asfortranarray(rng.random((4, 5, 6)).astype(np.float32))
    path = str(tmp_path / "f.npz")
    np.savez(path, a=fortran_slice, b=f_arr, c=f3)
    for key, want in (("a", fortran_slice), ("b", f_arr), ("c", f3)):
        np.testing.assert_array_equal(
            load_key(path, key), np.ascontiguousarray(want).reshape(-1)
        )


def test_load_key_compressed(tmp_path):
    """np.savez_compressed (deflate) entries decode too."""
    arr = np.random.default_rng(0).random((64, 3)).astype(np.float32)
    ints = np.arange(64, dtype=np.int64)
    path = str(tmp_path / "c.npz")
    np.savez_compressed(path, points=arr, labels=ints)
    np.testing.assert_array_equal(load_key(path, "points"), arr.reshape(-1))
    np.testing.assert_array_equal(
        load_key(path, "labels"), ints.astype(np.float32)
    )


def test_batch_loader_shapes_and_content(npz_dir):
    loader = NativeBatchLoader(
        npz_dir, keys=("points", "rgb"), batch_size=4, shuffle=False
    )
    assert len(loader) == 2  # 10 // 4
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["points"].shape == (4, 128, 3)
    assert batches[0]["rgb"].shape == (4, 128, 3)
    # unshuffled: first sample == file 0
    import os

    f0 = np.load(os.path.join(npz_dir, sorted(os.listdir(npz_dir))[0]))
    np.testing.assert_array_equal(batches[0]["points"][0], f0["points"])


def test_batch_loader_shuffle_deterministic(npz_dir):
    a = list(NativeBatchLoader(npz_dir, batch_size=4, shuffle=True, seed=7))
    b = list(NativeBatchLoader(npz_dir, batch_size=4, shuffle=True, seed=7))
    np.testing.assert_array_equal(a[0]["points"], b[0]["points"])
    c = list(NativeBatchLoader(npz_dir, batch_size=4, shuffle=True, seed=8))
    assert not np.array_equal(a[0]["points"], c[0]["points"])


def test_batch_loader_multiple_epochs(npz_dir):
    loader = NativeBatchLoader(npz_dir, batch_size=4, shuffle=True, seed=0)
    e1 = list(loader)
    e2 = list(loader)
    assert len(e1) == len(e2) == 2
    # different shuffle order across epochs
    same = all(
        np.array_equal(x["points"], y["points"]) for x, y in zip(e1, e2)
    )
    assert not same


def test_native_faster_than_python_baseline(npz_dir):
    """Throughput sanity: native threaded decode beats single-thread numpy."""
    loader = NativeBatchLoader(
        npz_dir, keys=("points", "rgb", "segmentation"), batch_size=5,
        shuffle=False, threads=6,
    )
    t0 = time.perf_counter()
    for _ in range(5):
        for _ in loader:
            pass
    t_native = time.perf_counter() - t0

    import os

    files = [os.path.join(npz_dir, f) for f in sorted(os.listdir(npz_dir))]
    t0 = time.perf_counter()
    for _ in range(5):
        for f in files:
            d = np.load(f)
            _ = d["points"], d["rgb"], d["segmentation"]
    t_py = time.perf_counter() - t0
    # don't be flaky: just require the native path not be pathologically slow
    assert t_native < t_py * 3, (t_native, t_py)
