"""Depth-map -> point-cloud math (reference: robosuite_envs/utils.py:48-177).

Pure-JAX, jitted, batched-over-pixels unprojection. Conventions:

  * intrinsics K (3x3): pixel = K @ (x_cam/z, y_cam/z, 1), pixel = (u, v)
    with u = column (x right), v = row (y down).
  * extrinsic E (4x4): world -> camera (OpenCV-style: +z forward).
  * `camera_matrix` = K_hom @ E (4x4), the analog of robosuite's
    get_camera_transform_matrix (world -> pixel); unprojection inverts it
    exactly like the reference's pixel_to_world (utils.py:48-74).

`multiview_pointcloud(views, transform, features)` fuses per-camera clouds
and applies the sensor preprocessing chain on-device in one jitted program
(utils.py:129-177).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def make_intrinsics(fovy_rad: float, height: int, width: int) -> np.ndarray:
    """Pinhole K from a vertical field of view (MuJoCo convention)."""
    f = 0.5 * height / np.tan(fovy_rad / 2)
    return np.array(
        [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1.0]], dtype=np.float32
    )


def quat_to_rotmat(quat) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> 3x3 rotation matrix."""
    w, x, y, z = np.asarray(quat, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n if n > 0 else 0.0
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array(
        [
            [1 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1 - (xx + yy)],
        ],
        dtype=np.float32,
    )


def extrinsics(cam_pos, cam_quat) -> np.ndarray:
    """World -> camera 4x4 from camera pose (position + (w,x,y,z) quat of the
    camera-to-world rotation)."""
    R_c2w = quat_to_rotmat(cam_quat)
    t = np.asarray(cam_pos, dtype=np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R_c2w.T
    E[:3, 3] = -R_c2w.T @ t
    return E


def camera_matrix(K: np.ndarray, E: np.ndarray) -> np.ndarray:
    """World -> pixel 4x4 (robosuite get_camera_transform_matrix analog)."""
    K_hom = np.eye(4, dtype=np.float32)
    K_hom[:3, :3] = K
    return K_hom @ E


def project(points: Array, cam_mat: Array):
    """World points (N, 3) -> (pixels (N, 2) as (u, v), depth (N,))."""
    p = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    q = p @ cam_mat.T
    depth = q[..., 2]
    return q[..., :2] / depth[..., None], depth


@functools.partial(jax.jit, static_argnames=())
def pixel_to_world(depth: Array, inv_cam_mat: Array) -> Array:
    """Unproject a full (H, W) real-depth map to world points (H*W, 3)
    (reference pixel_to_world, utils.py:48-74)."""
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    d = depth
    # pixel-homogeneous scaled by depth: (u*d, v*d, d, 1)
    ph = jnp.stack([u * d, v * d, d, jnp.ones_like(d)], axis=-1).reshape(-1, 4)
    world = ph @ inv_cam_mat.T
    return world[:, :3] / world[:, 3:4]


def to_pointcloud(depth: Array, feature_maps: dict, cam_mat: Array):
    """Depth + per-pixel feature maps -> (points (H*W, 3), {name: (H*W, C)})
    (reference to_pointcloud, utils.py:96-126)."""
    inv = jnp.linalg.inv(jnp.asarray(cam_mat, dtype=jnp.float32))
    pts = pixel_to_world(jnp.asarray(depth, dtype=jnp.float32), inv)
    feats = {}
    for name, fmap in feature_maps.items():
        fmap = jnp.asarray(fmap)
        C = fmap.shape[-1] if fmap.ndim == 3 else 1
        feats[name] = fmap.reshape(-1, C).astype(jnp.float32)
    return pts, feats


def multiview_pointcloud(views, transform=None, features=("rgb",), key=None):
    """Fuse per-camera depth observations into one preprocessed cloud
    (reference multiview_pointcloud, utils.py:129-177).

    views: list of dicts with 'depth' (H, W) real depth, 'camera_matrix'
    (4, 4) world->pixel, and per-pixel feature maps named in `features`
    ('rgb' in [0,1], 'segmentation' integer labels, ...).
    transform: a transforms.Compose applied to the fused (points || feats)
    cloud on-device. Returns (points (K, 3), {feature: (K, C)}).
    """
    all_pts, all_feats = [], []
    dims = {}
    for view in views:
        fmaps = {f: view[f] for f in features}
        pts, feats = to_pointcloud(view["depth"], fmaps, view["camera_matrix"])
        all_pts.append(pts)
        all_feats.append(feats)
        dims = {f: all_feats[0][f].shape[-1] for f in features}
    points = jnp.concatenate(all_pts, axis=0)
    feats = {
        f: jnp.concatenate([v[f] for v in all_feats], axis=0) for f in features
    }
    pc = jnp.concatenate([points] + [feats[f] for f in features], axis=-1)
    if transform is not None:
        pc, _ = transform(pc, None, key)
    # split back by feature dims (utils.py:172-175)
    out_points = pc[:, :3]
    out_feats = {}
    off = 3
    for f in features:
        out_feats[f] = pc[:, off : off + dims[f]]
        off += dims[f]
    return out_points, out_feats
