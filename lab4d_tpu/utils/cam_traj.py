"""Camera trajectory generators + render-batch construction.

Parity: lab4d/utils/camera_utils.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from lab4d_tpu.utils.geom import K2inv
from lab4d_tpu.utils.quat import se3_to_quaternion_translation


def _axis_angle_matrix(theta_deg: float, axis) -> np.ndarray:
    from scipy.spatial.transform import Rotation as R

    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    return R.from_rotvec(np.deg2rad(theta_deg) * axis).as_matrix()


def get_object_to_camera_matrix(theta, axis, distance) -> np.ndarray:
    """(4, 4) object-to-camera rotating `theta` degrees about `axis` at
    `distance` (camera_utils.py:50-69)."""
    rt = np.eye(4)
    rt[:3, :3] = _axis_angle_matrix(theta, axis)
    rt[2, 3] = distance
    return rt


def get_rotating_cam(
    num_cameras, axis=(0, 1, 0), distance=3.0, initial_angle=0.0,
    max_angle=360.0,
) -> np.ndarray:
    angles = np.linspace(initial_angle, max_angle, num_cameras)
    return np.stack(
        [get_object_to_camera_matrix(a, axis, distance) for a in angles]
    )


def get_fixed_cam(num_cameras, axis=(0, 1, 0), distance=3.0, angle=0.0):
    rshift, lshift = np.eye(4)[None], np.eye(4)[None]
    lshift = lshift.copy()
    rshift = rshift.copy()
    lshift[0, :3, 3] = [0, 0, distance]
    rshift[0, :3, 3] = [0, 0, -distance]
    ext = get_rotating_cam(num_cameras, axis, 0.0, angle, angle)
    return lshift @ ext @ rshift


def get_orbit_camera(num_cameras, max_angle=5.0, cycles=2):
    from scipy.spatial.transform import Rotation as R

    max_angle = np.deg2rad(max_angle)
    out = np.tile(np.eye(4)[None], (num_cameras, 1, 1))
    for i in range(num_cameras):
        aa = [
            max_angle * np.cos(cycles * 2 * np.pi * i / num_cameras),
            max_angle * np.sin(cycles * 2 * np.pi * i / num_cameras),
            0.0,
        ]
        out[i, :3, :3] = R.from_rotvec(aa).as_matrix()
    return out


def get_bev_cam(field2cam: np.ndarray, elev: float = 90.0) -> np.ndarray:
    """Bird's-eye trajectory relative to the view-space object
    (camera_utils.py:34-47)."""
    ave_depth = field2cam[:, 2, 3].mean()
    center2cam = get_object_to_camera_matrix(0, [1, 0, 0], ave_depth)[None]
    center2bev = get_object_to_camera_matrix(elev, [1, 0, 0], 2 * ave_depth)[None]
    return center2bev @ np.linalg.inv(center2cam) @ field2cam


def create_field2cam(cam_traj: np.ndarray, keys) -> Dict[str, np.ndarray]:
    keys = list(keys)
    if "bg" in keys and "fg" in keys:
        raise NotImplementedError
    return {keys[0]: cam_traj}


def create_xy_grid(res: int) -> np.ndarray:
    x, y = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    return np.stack(
        [x.reshape(-1), y.reshape(-1), np.ones(res * res)], -1
    ).astype(np.float32)


def construct_batch(
    inst_id: int,
    frameid_sub,
    eval_res: int,
    field2cam: Optional[Dict[str, np.ndarray]],
    camera_int,
    crop2raw,
) -> Dict:
    """Batch for rendering (camera_utils.py:144-189). field2cam values are
    (N,4,4) SE(3); stored as (N,7) quat+trans."""
    batch = {}
    frameid_sub = np.asarray(frameid_sub, dtype=np.int32)
    batch["frameid_sub"] = jnp.asarray(frameid_sub)
    batch["dataid"] = jnp.full_like(batch["frameid_sub"], inst_id)

    hxy = create_xy_grid(eval_res)
    batch["hxy"] = jnp.tile(jnp.asarray(hxy)[None], (len(frameid_sub), 1, 1))

    if crop2raw is not None:
        batch["crop2raw"] = jnp.asarray(np.asarray(crop2raw, np.float32))
    if field2cam is not None:
        out = {}
        for k, v in field2cam.items():
            v = jnp.asarray(np.asarray(v, np.float32))
            out[k] = se3_to_quaternion_translation(v, tuple_out=False)
        batch["field2cam"] = out
    if camera_int is not None:
        batch["Kinv"] = K2inv(jnp.asarray(np.asarray(camera_int, np.float32)))
    return batch
