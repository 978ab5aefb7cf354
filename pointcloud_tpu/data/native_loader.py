"""ctypes bindings for the native C++ npz batch loader (native/pcloader.cpp).

`NativeBatchLoader` is a drop-in for data.dataset.BatchLoader on the
cloud->cloud autoencoder path (fixed per-key shapes, float-convertible
dtypes). It decodes ZIP/npy in a C++ thread pool with zero Python in the
hot loop — the native replacement for the reference's 6 DataLoader worker
processes (train.py:188).

The shared library is built lazily with `make -C native` on first use;
anything that can't use it (object arrays, missing toolchain) should stay
on the Python BatchLoader.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpcloader.so")

_lib = None


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pcl_create.restype = ctypes.c_void_p
    lib.pcl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.pcl_num_batches.restype = ctypes.c_int
    lib.pcl_num_batches.argtypes = [ctypes.c_void_p]
    lib.pcl_start_epoch.argtypes = [ctypes.c_void_p]
    lib.pcl_next.restype = ctypes.c_int
    lib.pcl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    lib.pcl_destroy.argtypes = [ctypes.c_void_p]
    lib.pcl_load_key.restype = ctypes.c_int
    lib.pcl_load_key.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_library() is not None


def load_key(path: str, key: str, capacity: int = 1 << 24) -> np.ndarray:
    """Decode one npz key to a flat float32 array (test/diagnostic helper)."""
    lib = get_library()
    assert lib is not None
    out = np.empty(capacity, np.float32)
    size = ctypes.c_int64()
    rc = lib.pcl_load_key(
        path.encode(),
        key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity,
        ctypes.byref(size),
    )
    if rc != 0:
        raise IOError(f"pcl_load_key({path}, {key}) failed with rc={rc}")
    return out[: size.value].copy()


class NativeBatchLoader:
    """Threaded native batch iterator over npz files.

    Yields {key: (B, *shape) float32 array} dicts per batch. Per-key shapes
    are probed from the first file and must be constant across the dataset
    (the generate_pc contract guarantees this).
    """

    def __init__(
        self,
        root_dir: str,
        keys: Sequence[str] = ("points", "rgb"),
        batch_size: int = 25,
        shuffle: bool = True,
        seed: int = 0,
        threads: int = 6,
        prefetch: int = 2,
        drop_last: bool = True,
        files: Sequence[str] | None = None,
    ):
        lib = get_library()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable (build native/libpcloader.so)"
            )
        self.lib = lib
        names = files if files is not None else sorted(os.listdir(root_dir))
        self.files = [
            os.path.join(root_dir, f) for f in names if f.endswith(".npz")
        ]
        if not self.files:
            raise ValueError(f"no npz files in {root_dir}")
        self.keys = list(keys)
        self.batch_size = batch_size
        self.drop_last = drop_last

        probe = np.load(self.files[0])
        self.shapes = {k: probe[k].shape for k in self.keys}
        key_sizes = np.array(
            [int(np.prod(self.shapes[k])) for k in self.keys], np.int64
        )

        paths_arr = (ctypes.c_char_p * len(self.files))(
            *[p.encode() for p in self.files]
        )
        keys_arr = (ctypes.c_char_p * len(self.keys))(
            *[k.encode() for k in self.keys]
        )
        self._handle = lib.pcl_create(
            paths_arr,
            len(self.files),
            keys_arr,
            len(self.keys),
            key_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            batch_size,
            threads,
            prefetch,
            int(shuffle),
            seed,
            int(drop_last),
        )
        # keep the ctypes arrays alive for the handle's lifetime
        self._keepalive = (paths_arr, keys_arr, key_sizes)

    def __len__(self):
        return self.lib.pcl_num_batches(self._handle)

    def __iter__(self):
        self.lib.pcl_start_epoch(self._handle)
        n_total = len(self.files)
        n_batches = len(self)
        for b in range(n_batches):
            n_in = min(self.batch_size, n_total - b * self.batch_size)
            bufs = {
                k: np.empty((n_in, *self.shapes[k]), np.float32)
                for k in self.keys
            }
            ptrs = (ctypes.c_void_p * len(self.keys))(
                *[bufs[k].ctypes.data for k in self.keys]
            )
            rc = self.lib.pcl_next(self._handle, ptrs)
            if rc == 1:
                return
            if rc != 0:
                raise IOError(f"native loader failed (rc={rc}) at batch {b}")
            yield bufs

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self.lib.pcl_destroy(self._handle)
                self._handle = None
        except Exception:
            pass


class NativeCloudPairLoader:
    """(in_pc, out_pc) batches via the native loader — a drop-in for
    BatchLoader over PointCloudDataset when no host-side transforms are
    configured (the default: transforms run on-device in the train step)."""

    def __init__(
        self,
        root_dir: str,
        in_features: Sequence[str] = ("rgb",),
        out_features: Sequence[str] = ("rgb",),
        batch_size: int = 25,
        shuffle: bool = True,
        seed: int = 0,
        threads: int = 6,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        keys = ["points"] + sorted(set(list(in_features) + list(out_features)))
        self.in_features = list(in_features)
        self.out_features = list(out_features)
        self._loader = NativeBatchLoader(
            root_dir,
            keys=keys,
            batch_size=batch_size,
            shuffle=shuffle,
            seed=seed,
            threads=threads,
            prefetch=prefetch,
            drop_last=drop_last,
        )

    def __len__(self):
        return len(self._loader)

    @staticmethod
    def _assemble(batch, features):
        cols = [batch["points"]]
        for f in features:
            arr = batch[f]
            if arr.ndim == 2:
                arr = arr[..., None]
            cols.append(arr)
        return np.concatenate(cols, axis=-1)

    def __iter__(self):
        for batch in self._loader:
            x = self._assemble(batch, self.in_features)
            y = (
                x
                if self.in_features == self.out_features
                else self._assemble(batch, self.out_features)
            )
            yield x, y
