"""Robot@Home2 dataset loader.

Counterpart of the reference's ``DatasetRH``/``SceneRH``
(reference: datasets/dataset_rh.py:21-576, datasets/scene_rh.py:7-60):
labelled RGBD observations of one room, with USS/ToF measurements
*simulated from the dense RGBD depth* through the sensor models
(reference: datasets/dataset_rh.py:450-504).

The external ``robotathome`` package (and its ~2 GB data download) is only
needed by :func:`load_rh_dataset`; everything RH-specific — the camera
intrinsics, Euler-angle pose assembly, depth-png decoding, the
deterministic interleaved split — lives in pure functions below so the
pipeline is unit-testable hermetically.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data.dataset import DeviceDataset
from virus_nerf_tpu.data.rays import get_ray_directions
from virus_nerf_tpu.data.scene import Scene
from virus_nerf_tpu.data.sensors import RGBDModel, ToFModel, USSModel

# Calibration constants of the RH2 RGBD camera (the dataset ships no
# intrinsics file; these are the values the reference derived for it,
# datasets/dataset_rh.py:107-114).  Note the camera is mounted sideways:
# the intrinsics matrix swaps the fx/fy and cx/cy roles accordingly.
RH_CX = 157.3245865
RH_CY = 120.0802295
RH_FX = 286.441384
RH_FY = 271.36999

# depth png value -> meters (RH2 stores depth as value*5/128 m,
# reference: datasets/dataset_rh.py:417)
RH_DEPTH_SCALE = 5.0 / 128.0


def rh_intrinsics() -> np.ndarray:
    """3x3 K of the (sideways-mounted) RH2 RGBD camera."""
    return np.array(
        [
            [RH_FY, 0.0, RH_CY],
            [0.0, RH_FX, RH_CX],
            [0.0, 0.0, 1.0],
        ]
    )


def euler_to_pose(
    xyz: np.ndarray, yaw: np.ndarray, pitch: np.ndarray, roll: np.ndarray
) -> np.ndarray:
    """Assemble (N, 3, 4) camera-to-world poses from RH2 sensor poses.

    RH2 gives the sensor pose as position + yaw/pitch/roll Euler angles;
    the camera convention requires a -90 deg yaw offset
    (reference: datasets/dataset_rh.py:281-305).  R = Rz(yaw) Ry(pitch)
    Rx(roll).
    """
    yaw = np.asarray(yaw, np.float64) - np.pi / 2.0
    pitch = np.asarray(pitch, np.float64)
    roll = np.asarray(roll, np.float64)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    n = yaw.shape[0]
    rz = np.zeros((n, 3, 3))
    rz[:, 0, 0], rz[:, 0, 1] = cy, -sy
    rz[:, 1, 0], rz[:, 1, 1] = sy, cy
    rz[:, 2, 2] = 1.0
    ry = np.zeros((n, 3, 3))
    ry[:, 0, 0], ry[:, 0, 2] = cp, sp
    ry[:, 1, 1] = 1.0
    ry[:, 2, 0], ry[:, 2, 2] = -sp, cp
    rx = np.zeros((n, 3, 3))
    rx[:, 0, 0] = 1.0
    rx[:, 1, 1], rx[:, 1, 2] = cr, -sr
    rx[:, 2, 1], rx[:, 2, 2] = sr, cr
    R = rz @ ry @ rx
    return np.concatenate([R, np.asarray(xyz)[:, :, None]], axis=2)


def rh_depth_to_scan(depths_raw: np.ndarray, directions: np.ndarray) -> np.ndarray:
    """Decode RH2 depth pngs to per-ray scan depths in meters.

    png value -> meters (``* 5/128``), then z-depth -> distance along the
    ray (divide by the ray's z component ``sqrt(1 - dx^2 - dy^2)``); zeros
    mark invalid and become NaN (reference: datasets/dataset_rh.py:398-433).

    Args:
        depths_raw: (N, H*W) raw png values.
        directions: (H*W, 3) unit ray directions in the camera frame.
    Returns:
        (N, H*W) float64 depths in meters, NaN where invalid.
    """
    d = RH_DEPTH_SCALE * np.asarray(depths_raw, np.float64)
    dz = np.sqrt(
        np.clip(1.0 - directions[:, 0] ** 2 - directions[:, 1] ** 2, 1e-12, None)
    )
    d = d / dz[None, :]
    d[d == 0.0] = np.nan
    return d


def interleaved_split(
    sensor_ids: np.ndarray,
    split_ratio: Dict[str, float],
    split_dir: Optional[str] = None,
    split_name: str = "split.csv",
) -> np.ndarray:
    """Deterministic interleaved train/val/test split, persisted as CSV.

    Per sensor id, observation k (in time order) goes to the partition at
    position ``k mod 10`` of the pattern
    ``[train]*10r_t + [val]*10r_v + [test]*10r_s`` — the reference's
    modulo-10 scheme (datasets/dataset_rh.py:546-556), which interleaves
    the splits uniformly along the trajectory.  Ratios must be multiples
    of 0.1 summing to 1.  If ``split_dir`` is given the labels are saved
    to (or reloaded from) ``split_dir/split_name``, reused iff the ratios
    recorded in ``split_description.csv`` match
    (reference: datasets/dataset_rh.py:525-540).

    Returns:
        (N,) array of labels 'train' | 'val' | 'test'.
    """
    r = {k: round(float(split_ratio[k]) * 10) for k in ("train", "val", "test")}
    if sum(r.values()) != 10:
        raise ValueError("split ratios must be multiples of 0.1 summing to 1")
    desc_now = f"{r['train'] / 10},{r['val'] / 10},{r['test'] / 10}"

    if split_dir is not None:
        desc_path = os.path.join(split_dir, "split_description.csv")
        path = os.path.join(split_dir, split_name)
        if os.path.exists(desc_path) and os.path.exists(path):
            with open(desc_path) as f:
                f.readline()
                if f.readline().strip() == desc_now:
                    arr = np.loadtxt(path, dtype=str, delimiter=",", skiprows=1)
                    if arr.ndim == 1:
                        arr = arr[None]
                    if arr.shape[0] == sensor_ids.shape[0]:
                        return arr[:, 1]

    pattern = (
        ["train"] * r["train"] + ["val"] * r["val"] + ["test"] * r["test"]
    )
    labels = np.empty(sensor_ids.shape[0], dtype=object)
    for sid in np.unique(sensor_ids):
        idxs = np.where(sensor_ids == sid)[0]
        for offset, part in enumerate(pattern):
            labels[idxs[offset::10]] = part

    if split_dir is not None:
        os.makedirs(split_dir, exist_ok=True)
        with open(os.path.join(split_dir, split_name), "w") as f:
            f.write("idx,split\n")
            for i, s in enumerate(labels):
                f.write(f"{i},{s}\n")
        with open(os.path.join(split_dir, "split_description.csv"), "w") as f:
            f.write("train,val,test\n")
            f.write(desc_now + "\n")
    return labels.astype(str)


def build_rh_device_dataset(
    cfg: Config,
    scene: Scene,
    poses: np.ndarray,
    rgbs: np.ndarray,
    depths_raw: np.ndarray,
    sensor_ids: np.ndarray,
    times: np.ndarray,
    img_wh: Tuple[int, int],
) -> Tuple[DeviceDataset, Dict]:
    """Assemble a DeviceDataset from decoded RH2 arrays.

    Pure (no robotathome dependency): converts depths to cube units and
    simulates USS/ToF from the dense RGBD depth through the sensor models
    with ``format='img'`` — USS = min over its elliptic FoV, ToF = the 8x8
    pixel lattice sample (reference: datasets/dataset_rh.py:450-504).
    """
    import jax.numpy as jnp

    W, H = img_wh
    K = rh_intrinsics()
    directions = get_ray_directions(H, W, K)  # (H*W, 3)

    d_m = rh_depth_to_scan(depths_raw, directions)  # meters, NaN invalid
    w2c_scale = scene.w2c(1.0, only_scale=True)
    d_cube = d_m * w2c_scale

    cam_aov = (
        2 * np.rad2deg(np.arctan(W / (2 * K[0, 0]))),
        2 * np.rad2deg(np.arctan(H / (2 * K[1, 1]))),
    )
    uss_model = USSModel(
        img_wh, cam_aov, aov_sensor_deg=tuple(cfg.uss.angle_of_view)
    )
    tof_model = ToFModel(
        img_wh, cam_aov,
        matrix=tuple(cfg.tof.matrix),
        aov_sensor_deg=tuple(cfg.tof.angle_of_view),
        tof_pix_size=cfg.tof.tof_pix_size,
        sensor_calibration_error=cfg.tof.sensor_calibration_error,
        sensor_random_error=cfg.tof.sensor_random_error,
    )
    rgbd_model = RGBDModel(img_wh, cam_aov)

    depths_dict = {}
    sensors = cfg.dataset.sensors
    if "RGBD" in sensors:
        depths_dict["RGBD"] = rgbd_model.convert_depth(
            d_cube, format="img"
        ).astype(np.float32)
    if "USS" in sensors:
        depths_dict["USS"] = uss_model.convert_depth(
            d_cube, format="img"
        ).astype(np.float32)
    if "ToF" in sensors:
        depths_dict["ToF"] = tof_model.convert_depth(
            d_cube, format="img"
        ).astype(np.float32)

    poses_c = np.asarray(poses, np.float64).copy()
    poses_c[:, :, 3] = scene.w2c(poses[:, :, 3])

    dataset = DeviceDataset(
        poses=jnp.asarray(poses_c, jnp.float32),
        directions=jnp.asarray(directions[None], jnp.float32),
        cam_idx=jnp.zeros(poses.shape[0], jnp.int32),
        rgbs=jnp.asarray(rgbs, jnp.float32),
        depths={k: jnp.asarray(v) for k, v in depths_dict.items()},
        times=jnp.asarray(times, jnp.float32),
        uss_mask_idx=jnp.asarray(np.where(uss_model.mask)[0], jnp.int32),
        tof_mask_idx=jnp.asarray(np.where(tof_model.mask)[0], jnp.int32),
        sensor_ids=jnp.asarray(sensor_ids, jnp.int32),
    )
    info = {
        "img_wh": img_wh,
        "K": K,
        "sensor_models": {
            "RGBD": rgbd_model, "USS": uss_model, "ToF": tof_model,
        },
        "camera_aov_deg": cam_aov,
    }
    return dataset, info


def make_rh_scene(points: np.ndarray) -> Scene:
    """Scene from the RH2 room's labelled point cloud: cube bounds from the
    cloud min/max (reference: datasets/scene_rh.py:42-60)."""
    pts = np.asarray(points, np.float64)
    return Scene(
        point_cloud=pts, xyz_min=pts.min(axis=0), xyz_max=pts.max(axis=0)
    )


def load_rh_dataset(
    cfg: Config,
    split: str = "train",
    scene: Optional[Scene] = None,
) -> Tuple[DeviceDataset, Scene, Dict]:
    """Load one split of an RH2 room (needs the ``robotathome`` package and
    its downloaded data, reference: datasets/dataset_rh.py:229-267).

    Selects the labelled-RGBD observations of ``cfg.rh2.home/room``,
    applies the persistent interleaved split, decodes images/poses, and
    hands off to :func:`build_rh_device_dataset`.
    """
    try:
        from robotathome import RobotAtHome
    except ImportError as e:  # pragma: no cover - external package
        raise ImportError(
            "RH2 needs the external 'robotathome' package and dataset; "
            "the full RH pipeline (sensor simulation from RGBD, interleaved "
            "split, Euler poses) is exercised hermetically by the synthetic "
            "dataset and tests/test_rh.py"
        ) from e

    import matplotlib.image as mpimg

    rh2 = cfg.rh2
    rh = RobotAtHome(
        rh_path=rh2.dataset_dir,
        wspc_path=rh2.dataset_dir,
        db_filename="rh.db",
    )
    df = rh.get_sensor_observations("lblrgbd")
    home_id = rh.name2id(rh2.home, "h")
    room_id = rh.name2id(rh2.home + "_" + rh2.room, "r")
    df = df[(df["home_id"] == home_id) & (df["room_id"] == room_id)]
    df = df.sort_values("timestamp")

    sensor_ids = df["sensor_id"].to_numpy()
    labels = interleaved_split(
        sensor_ids,
        cfg.dataset.split_ratio,
        split_dir=os.path.join(
            rh2.dataset_dir, "files", "rgbd", rh2.session, rh2.home, rh2.room
        ),
        split_name=f"split_{rh2.subsession}.csv",
    )
    df = df[labels == split]
    if cfg.dataset.keep_sensor != "all":
        # keep observations of one named sensor only
        # (reference: datasets/dataset_rh.py:207-261 getIdxFromSensorName)
        df = df[df["sensor_id"] == rh.name2id(cfg.dataset.keep_sensor, "s")]
    if cfg.dataset.keep_N_observations != "all":
        df = df.iloc[: int(cfg.dataset.keep_N_observations)]

    poses = euler_to_pose(
        np.stack(
            [df[f"sensor_pose_{a}"].to_numpy() for a in "xyz"], axis=1
        ),
        df["sensor_pose_yaw"].to_numpy(),
        df["sensor_pose_pitch"].to_numpy(),
        df["sensor_pose_roll"].to_numpy(),
    )

    rgbs, depths_raw = [], []
    import cv2

    for obs_id in df["id"].to_numpy():
        rgb_f, d_f = rh.get_RGBD_files(obs_id)
        rgbs.append(mpimg.imread(rgb_f))
        # depth must keep its raw integer scale (0..255, later 5*d/128 m);
        # mpimg would rescale 8-bit pngs to [0, 1] — read unchanged like
        # the reference (datasets/dataset_rh.py:332-343) and keep one
        # channel if the file is 3-channel grayscale
        d = cv2.imread(d_f, cv2.IMREAD_UNCHANGED)
        if d.ndim == 3:
            d = d[:, :, 0]
        depths_raw.append(d)
    rgbs = np.stack(rgbs).astype(np.float32)
    if rgbs.max() > 1.0:
        rgbs = rgbs / 255.0
    n, H, W = rgbs.shape[:3]
    rgbs = rgbs.reshape(n, H * W, 3)
    depths_raw = np.stack(depths_raw).astype(np.float32).reshape(n, H * W)

    if scene is None:
        scene = make_rh_scene(rh.get_scene_points(home_id, room_id))

    times = df["timestamp"].to_numpy().astype(np.float64)
    times = times - times.min()

    dataset, info = build_rh_device_dataset(
        cfg, scene, poses, rgbs, depths_raw,
        df["sensor_id"].to_numpy().astype(np.int64) % 4,
        times, (W, H),
    )
    return dataset, scene, info
