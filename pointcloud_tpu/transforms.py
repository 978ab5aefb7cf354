"""Point-cloud transforms (reference: pointcloud_vision/utils.py:16-202).

torchvision-`Compose`-style callables, redesigned for XLA's static shapes:

  * A transform is a pure function `(pc, mask, key) -> (pc, mask)` over a
    single cloud `pc: (N, D)` with validity mask `(N,) bool` and an optional
    PRNG key (only sampling transforms consume it). Batched use is `jax.vmap`.
  * Filters (FilterBBox, FilterClasses — reference utils.py:96-124) do NOT
    drop rows; they clear mask bits. Samplers (SampleRandomPoints,
    SampleFurthestPoints — utils.py:70-95) consume the mask and emit a new
    fixed-size, fully-valid cloud. This mask-then-sample pair is the
    fixed-shape equivalent of the reference's ragged filter->sample chain.
  * Normalize/Unnormalize (utils.py:126-160) are functional (no in-place
    mutation) but numerically identical: affine map of the first `dim`
    coordinates from the bbox to/from the unit cube.

The numpy edge: `apply_np(transform, pc)` runs a transform chain on a numpy
array and returns numpy, matching the reference's `@support_numpy` ergonomics
(utils.py:58-67).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Transform = Callable  # (pc, mask, key) -> (pc, mask)


def _ensure_mask(pc, mask):
    if mask is None:
        return jnp.ones(pc.shape[:-1], dtype=bool)
    return mask


class Compose:
    """Chain transforms; splits the PRNG key across stages (utils.py Compose usage)."""

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        keys = (
            jax.random.split(key, len(self.transforms))
            if key is not None
            else [None] * len(self.transforms)
        )
        for t, k in zip(self.transforms, keys):
            pc, mask = t(pc, mask, k)
        return pc, mask


class SampleRandomPoints:
    """Uniformly sample K points (with replacement) among valid points.

    Reference: utils.py:70-79 (torch.randint over all rows; ours restricts
    to mask-valid rows, which is the correct ragged-equivalent behavior).
    """

    def __init__(self, K: int):
        self.K = K

    def __call__(self, pc, mask=None, key=None):
        if key is None:
            raise ValueError("SampleRandomPoints requires a PRNG key")
        mask = _ensure_mask(pc, mask)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        idx = jax.random.categorical(key, logits, shape=(self.K,))
        return pc[idx], jnp.ones((self.K,), dtype=bool)


class SampleFurthestPoints:
    """FPS-downsample to exactly K valid points (reference utils.py:81-95,
    backed by pytorch3d.sample_farthest_points -> ours: ops/fps.py)."""

    def __init__(self, K: int):
        self.K = K

    def __call__(self, pc, mask=None, key=None):
        from pointcloud_tpu.ops.fps import farthest_point_sample

        mask = _ensure_mask(pc, mask)
        idx = farthest_point_sample(pc[None, :, :3], self.K, mask=mask[None])[0]
        return pc[idx], jnp.ones((self.K,), dtype=bool)


class FilterBBox:
    """Mask out points outside a 3D bounding box (reference utils.py:96-108).

    bbox: (3, 2) array-like of (min, max) per axis.
    """

    def __init__(self, bbox):
        self.bbox = jnp.asarray(bbox, dtype=jnp.float32)

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        xyz = pc[..., :3]
        inside = jnp.all(
            (xyz >= self.bbox[:, 0]) & (xyz <= self.bbox[:, 1]), axis=-1
        )
        return pc, mask & inside


class FilterClasses:
    """Keep only points whose integer label (at `seg_dim`) is whitelisted
    (reference utils.py:110-124)."""

    def __init__(self, whitelist: Sequence[int], seg_dim: int):
        self.whitelist = tuple(whitelist)
        self.seg_dim = seg_dim

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        label = pc[..., self.seg_dim].astype(jnp.int32)
        keep = jnp.zeros_like(mask)
        for w in self.whitelist:
            keep = keep | (label == w)
        return pc, mask & keep


class Normalize:
    """Map the first `dim` coords from bbox to the unit cube
    (reference utils.py:126-143; functional, not in-place)."""

    def __init__(self, bbox, dim: int = 3):
        self.bbox = jnp.asarray(bbox, dtype=jnp.float32)
        self.dim = dim

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        lo = self.bbox[: self.dim, 0]
        span = self.bbox[: self.dim, 1] - self.bbox[: self.dim, 0]
        xyz = (pc[..., : self.dim] - lo) / span
        return jnp.concatenate([xyz, pc[..., self.dim :]], axis=-1), mask


class Unnormalize:
    """Inverse of Normalize (reference utils.py:145-160)."""

    def __init__(self, bbox, dim: int = 3):
        self.bbox = jnp.asarray(bbox, dtype=jnp.float32)
        self.dim = dim

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        lo = self.bbox[: self.dim, 0]
        span = self.bbox[: self.dim, 1] - self.bbox[: self.dim, 0]
        xyz = pc[..., : self.dim] * span + lo
        return jnp.concatenate([xyz, pc[..., self.dim :]], axis=-1), mask


class OneHotEncode:
    """Integer label column at seg_dim -> one-hot columns
    (reference utils.py:162-176)."""

    def __init__(self, num_classes: int, seg_dim: int):
        self.num_classes = num_classes
        self.seg_dim = seg_dim

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        label = pc[..., self.seg_dim].astype(jnp.int32)
        onehot = jax.nn.one_hot(label, self.num_classes, dtype=pc.dtype)
        rest = jnp.concatenate(
            [pc[..., : self.seg_dim], pc[..., self.seg_dim + 1 :]], axis=-1
        )
        return jnp.concatenate([rest, onehot], axis=-1), mask


class IntegerEncode:
    """One-hot (or logit) columns starting at seg_dim -> single integer column
    (reference utils.py:178-190)."""

    def __init__(self, num_classes: int, seg_dim: int):
        self.num_classes = num_classes
        self.seg_dim = seg_dim

    def __call__(self, pc, mask=None, key=None):
        mask = _ensure_mask(pc, mask)
        probs = pc[..., self.seg_dim : self.seg_dim + self.num_classes]
        label = jnp.argmax(probs, axis=-1).astype(pc.dtype)
        return (
            jnp.concatenate([pc[..., : self.seg_dim], label[..., None]], axis=-1),
            mask,
        )


def class_mean_pos(pc, cls: int, seg_dim: int, mask=None):
    """Centroid of points of one class (reference mean_cube_pos, utils.py:192-202).

    Returns the masked mean of xyz over points with label == cls; the origin
    if no such point exists (the reference warns under cfg.debug)."""
    mask = _ensure_mask(pc, mask)
    sel = mask & (pc[..., seg_dim].astype(jnp.int32) == cls)
    w = sel.astype(pc.dtype)
    count = jnp.sum(w)
    from pointcloud_tpu import cfg

    if cfg.debug:
        # reference warns when the class has no points (utils.py:196-199)
        jax.debug.print(
            "DEBUG: class_mean_pos cls={c} count={n}", c=cls, n=count
        )
    return jnp.sum(pc[..., :3] * w[..., None], axis=0) / jnp.maximum(count, 1.0)


def seg_to_color(labels, class_colors):
    """Map integer labels to RGB colors (reference utils.py:38-51)."""
    colors = jnp.asarray(class_colors, dtype=jnp.float32)
    return colors[labels.astype(jnp.int32)]


def apply_np(transform, pc: np.ndarray, mask=None, seed: int = 0):
    """Numpy edge wrapper (reference @support_numpy, utils.py:58-67):
    run a transform (or Compose) on numpy data, return numpy (pc, mask)."""
    key = jax.random.PRNGKey(seed)
    pc_j = jnp.asarray(pc)
    mask_j = None if mask is None else jnp.asarray(mask)
    out_pc, out_mask = transform(pc_j, mask_j, key)
    return np.asarray(out_pc), np.asarray(out_mask)
