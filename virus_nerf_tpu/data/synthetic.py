"""Synthetic box-world dataset for tests and benchmarks.

Plays the role the Robot@Home2 loader plays in the reference — a dataset
whose USS/ToF measurements are *simulated from dense depth* through the
sensor models (reference: datasets/dataset_rh.py:450-504) — but with fully
analytic geometry, so every stage of the pipeline (training, occupancy
updates, 360° scan evaluation against a GT point cloud) runs hermetically.

The scene is a rectangular room with box obstacles; cameras orbit the center
looking outward.  Depth is exact ray/AABB arithmetic; colors encode the hit
surface.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.data.dataset import DeviceDataset
from virus_nerf_tpu.data.rays import get_ray_directions
from virus_nerf_tpu.data.scene import Scene
from virus_nerf_tpu.data.sensors import RGBDModel, ToFModel, USSModel

# default room: 6m x 6m x 3m centered at origin
_ROOM_MIN = np.array([-3.0, -3.0, -1.5])
_ROOM_MAX = np.array([3.0, 3.0, 1.5])

_WALL_COLORS = np.array(
    [
        [0.9, 0.3, 0.3],  # +x wall
        [0.3, 0.9, 0.3],  # -x wall
        [0.3, 0.3, 0.9],  # +y wall
        [0.9, 0.9, 0.3],  # -y wall
        [0.8, 0.8, 0.8],  # ceiling
        [0.4, 0.4, 0.4],  # floor
    ]
)


def _default_boxes() -> Tuple[np.ndarray, np.ndarray]:
    """A few box obstacles (min, max) + colors."""
    mins = np.array(
        [
            [1.2, -0.6, -1.5],
            [-2.2, 1.0, -1.5],
            [-0.5, -2.4, -1.5],
        ]
    )
    maxs = np.array(
        [
            [2.0, 0.4, 0.2],
            [-1.4, 2.0, 0.0],
            [0.5, -1.6, -0.3],
        ]
    )
    colors = np.array([[0.9, 0.5, 0.1], [0.1, 0.8, 0.8], [0.8, 0.1, 0.8]])
    return np.stack([mins, maxs], axis=1), colors


def _raycast(rays_o, rays_d, boxes, box_colors, room_min=None, room_max=None):
    """Exact depth + color of rays from inside the room.

    Depth = min(room-wall exit, nearest obstacle entry).
    Returns depth (N,), rgb (N, 3).
    """
    room_min = _ROOM_MIN if room_min is None else np.asarray(room_min)
    room_max = _ROOM_MAX if room_max is None else np.asarray(room_max)
    n = rays_o.shape[0]
    inv = 1.0 / np.where(np.abs(rays_d) < 1e-12, 1e-12, rays_d)

    # room walls: exit distance of the room box
    t_lo = (room_min - rays_o) * inv
    t_hi = (room_max - rays_o) * inv
    t_exit_per_axis = np.maximum(t_lo, t_hi)  # (N, 3)
    axis = np.argmin(t_exit_per_axis, axis=1)
    depth = t_exit_per_axis[np.arange(n), axis]
    sign_pos = rays_d[np.arange(n), axis] > 0
    wall_idx = axis * 2 + (~sign_pos).astype(int)  # +x,-x,+y,-y,+z,-z
    # reorder to color table [+x,-x,+y,-y,ceil,floor]
    rgb = _WALL_COLORS[wall_idx]

    # obstacles: slab entry
    for b in range(boxes.shape[0]):
        bt_lo = (boxes[b, 0] - rays_o) * inv
        bt_hi = (boxes[b, 1] - rays_o) * inv
        t1 = np.minimum(bt_lo, bt_hi).max(axis=1)
        t2 = np.maximum(bt_lo, bt_hi).min(axis=1)
        hit = (t2 > t1) & (t1 > 1e-6) & (t1 < depth)
        depth = np.where(hit, t1, depth)
        rgb = np.where(hit[:, None], box_colors[b], rgb)
    return depth, rgb


def _sample_surfaces(rng, boxes: np.ndarray, n_points: int,
                     room_min=None, room_max=None) -> np.ndarray:
    """Sample points uniformly by area on the room walls + box faces —
    an exact dense 'GT map' of the analytic scene."""
    room_min = _ROOM_MIN if room_min is None else np.asarray(room_min)
    room_max = _ROOM_MAX if room_max is None else np.asarray(room_max)
    aabbs = np.concatenate(
        [np.stack([room_min, room_max])[None], boxes], axis=0
    )  # (B, 2, 3)
    faces = []  # (axis, side, aabb_idx, area)
    for b in range(aabbs.shape[0]):
        ext = aabbs[b, 1] - aabbs[b, 0]
        for axis in range(3):
            o1, o2 = (axis + 1) % 3, (axis + 2) % 3
            area = ext[o1] * ext[o2]
            for side in range(2):
                faces.append((axis, side, b, area))
    areas = np.array([f[3] for f in faces])
    counts = rng.multinomial(n_points, areas / areas.sum())
    pts = []
    for (axis, side, b, _), c in zip(faces, counts):
        if c == 0:
            continue
        p = rng.uniform(aabbs[b, 0], aabbs[b, 1], size=(c, 3))
        p[:, axis] = aabbs[b, side, axis]
        pts.append(p)
    return np.concatenate(pts, axis=0)


def make_synthetic_dataset(
    n_images: int = 16,
    img_wh: Tuple[int, int] = (64, 40),
    seed: int = 21,
    sensors: Tuple[str, ...] = ("RGBD", "USS", "ToF"),
    camera_aov_deg: Tuple[float, float] = (90.0, 65.0),
    tof_matrix: Tuple[int, int] = (8, 8),
    n_gt_points: int = 400_000,
) -> Tuple[DeviceDataset, Scene, Dict]:
    """Build a synthetic DeviceDataset + Scene.

    Returns (dataset, scene, info) where info carries the sensor models,
    intrinsics, and image size.
    """
    rng = np.random.default_rng(seed)
    W, H = img_wh
    boxes, box_colors = _default_boxes()

    # pinhole intrinsics from the camera angle of view
    fx = W / 2.0 / np.tan(np.deg2rad(camera_aov_deg[0]) / 2.0)
    fy = H / 2.0 / np.tan(np.deg2rad(camera_aov_deg[1]) / 2.0)
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
    dirs_cam = get_ray_directions(H, W, K)  # (H*W, 3) unit

    # camera poses: orbit the center at radius 1m, looking outward
    poses = np.zeros((n_images, 3, 4), np.float64)
    for i in range(n_images):
        a = 2 * np.pi * i / n_images
        front = np.array([np.cos(a), np.sin(a), 0.0])
        right = np.array([-np.sin(a), np.cos(a), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        # camera axes [right down front] as world columns
        poses[i, :, :3] = np.stack([right, down, front], axis=1)
        poses[i, :, 3] = np.array([np.cos(a), np.sin(a), 0.0]) * 1.0

    # render all images analytically
    rgbs = np.zeros((n_images, H * W, 3), np.float32)
    depths_w = np.zeros((n_images, H * W), np.float64)
    for i in range(n_images):
        rays_d = dirs_cam @ poses[i, :, :3].T
        rays_o = np.broadcast_to(poses[i, :, 3], rays_d.shape)
        d, c = _raycast(rays_o, rays_d, boxes, box_colors)
        depths_w[i] = d
        rgbs[i] = c

    # GT point cloud sampled uniformly (by area) on the analytic surfaces —
    # the exact counterpart of the reference's dense LiDAR map
    pts = _sample_surfaces(rng, boxes, n_gt_points)
    scene = Scene(point_cloud=pts, xyz_min=_ROOM_MIN, xyz_max=_ROOM_MAX)

    # sensor models simulate USS/ToF from dense depth
    # (reference: datasets/dataset_rh.py:450-504, format="img")
    uss = USSModel(img_wh, camera_aov_deg)
    tof = ToFModel(img_wh, camera_aov_deg, matrix=tof_matrix)
    rgbd = RGBDModel(img_wh, camera_aov_deg)

    depths_dict = {}
    scale = scene.w2c(1.0, only_scale=True)  # world->cube depth scaling
    if "RGBD" in sensors:
        depths_dict["RGBD"] = (rgbd.convert_depth(depths_w) * scale).astype(
            np.float32
        )
    if "USS" in sensors:
        depths_dict["USS"] = (uss.convert_depth(depths_w) * scale).astype(
            np.float32
        )
    if "ToF" in sensors:
        depths_dict["ToF"] = (tof.convert_depth(depths_w) * scale).astype(
            np.float32
        )

    # poses into cube coordinates (reference converts everything at load,
    # datasets/dataset_ethz.py:483-571)
    poses_c = poses.copy()
    poses_c[:, :, 3] = scene.w2c(poses[:, :, 3])

    dataset = DeviceDataset(
        poses=jnp.asarray(poses_c, jnp.float32),
        directions=jnp.asarray(dirs_cam[None], jnp.float32),
        cam_idx=jnp.zeros(n_images, jnp.int32),
        rgbs=jnp.asarray(rgbs),
        depths={k: jnp.asarray(v) for k, v in depths_dict.items()},
        times=jnp.asarray(np.linspace(0, 10, n_images), jnp.float32),
        uss_mask_idx=jnp.asarray(np.where(uss.mask)[0], jnp.int32),
        tof_mask_idx=jnp.asarray(np.where(tof.mask)[0], jnp.int32),
        sensor_ids=jnp.zeros(n_images, jnp.int32),
    )
    info = {
        "img_wh": img_wh,
        "K": K,
        "sensor_models": {"RGBD": rgbd, "USS": uss, "ToF": tof},
        "boxes": boxes,
        "box_colors": box_colors,
        "depths_world": depths_w,
    }
    return dataset, scene, info
