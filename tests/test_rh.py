"""Robot@Home2 pipeline tests (hermetic — no robotathome package).

Covers the RH-specific pure logic (reference: datasets/dataset_rh.py):
Euler pose assembly, depth png decoding, the interleaved modulo-10 split
with CSV persistence, and the full DeviceDataset assembly with USS/ToF
simulated from dense RGBD depth.
"""

import numpy as np
import pytest

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data.dataset import sample_batch
from virus_nerf_tpu.data.rays import get_ray_directions
from virus_nerf_tpu.data.rh import (
    build_rh_device_dataset,
    euler_to_pose,
    interleaved_split,
    make_rh_scene,
    rh_depth_to_scan,
    rh_intrinsics,
)


def test_euler_to_pose_orthonormal():
    rng = np.random.default_rng(0)
    n = 32
    xyz = rng.normal(size=(n, 3))
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(-0.5, 0.5, n)
    roll = rng.uniform(-0.5, 0.5, n)
    poses = euler_to_pose(xyz, yaw, pitch, roll)
    assert poses.shape == (n, 3, 4)
    R = poses[:, :, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (n, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    np.testing.assert_allclose(poses[:, :, 3], xyz)


def test_euler_to_pose_yaw_offset():
    # yaw=90deg with zero pitch/roll: after the -90deg offset R must be
    # identity (reference: datasets/dataset_rh.py:289 applies yaw -= 90deg)
    poses = euler_to_pose(
        np.zeros((1, 3)), np.array([np.pi / 2]), np.zeros(1), np.zeros(1)
    )
    np.testing.assert_allclose(poses[0, :, :3], np.eye(3), atol=1e-12)


def test_rh_depth_to_scan_values():
    K = rh_intrinsics()
    H, W = 12, 16
    dirs = get_ray_directions(H, W, K)
    raw = np.full((2, H * W), 128.0)  # 128 * 5/128 = 5 m z-depth
    raw[0, 0] = 0.0  # invalid
    d = rh_depth_to_scan(raw, dirs)
    assert np.isnan(d[0, 0])
    # along-ray distance >= z-depth, equality at the principal axis
    dz = np.sqrt(1 - dirs[:, 0] ** 2 - dirs[:, 1] ** 2)
    np.testing.assert_allclose(d[1], 5.0 / dz, rtol=1e-5)
    assert (d[1] >= 5.0 - 1e-9).all()


def test_interleaved_split_pattern_and_ratios():
    sensor_ids = np.repeat([0, 1], 50)
    labels = interleaved_split(
        sensor_ids, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert labels.shape == (100,)
    # per sensor: 8/1/1 of every 10 consecutive observations
    for sid in (0, 1):
        lab = labels[sensor_ids == sid]
        assert (lab[:8] == "train").all()
        assert lab[8] == "val" and lab[9] == "test"
    assert (labels == "train").sum() == 80
    assert (labels == "val").sum() == 10
    assert (labels == "test").sum() == 10


def test_interleaved_split_persistence(tmp_path):
    sensor_ids = np.zeros(30, int)
    ratio = {"train": 0.6, "val": 0.2, "test": 0.2}
    l1 = interleaved_split(sensor_ids, ratio, split_dir=str(tmp_path))
    assert (tmp_path / "split.csv").exists()
    assert (tmp_path / "split_description.csv").exists()
    l2 = interleaved_split(sensor_ids, ratio, split_dir=str(tmp_path))
    assert (l1 == l2).all()
    # changed ratios -> fresh split, not the stale file
    l3 = interleaved_split(
        sensor_ids, {"train": 0.8, "val": 0.1, "test": 0.1},
        split_dir=str(tmp_path),
    )
    assert (l3 == "train").sum() == 24


def test_interleaved_split_bad_ratio():
    with pytest.raises(ValueError):
        interleaved_split(
            np.zeros(10, int), {"train": 0.85, "val": 0.1, "test": 0.05}
        )


def test_build_rh_device_dataset_end_to_end():
    """Full assembly: decoded RH arrays -> DeviceDataset with simulated
    USS/ToF, then one batch sampled from it."""
    import jax

    rng = np.random.default_rng(3)
    K = rh_intrinsics()
    H, W = 24, 32
    n = 4
    cfg = Config()
    cfg.dataset.sensors = ["RGBD", "USS", "ToF"]
    cfg.tof.matrix = [4, 4]

    pts = rng.uniform(-3, 3, size=(2000, 3))
    scene = make_rh_scene(pts)

    poses = euler_to_pose(
        rng.normal(size=(n, 3)),
        rng.uniform(-np.pi, np.pi, n),
        np.zeros(n),
        np.zeros(n),
    )
    rgbs = rng.uniform(size=(n, H * W, 3)).astype(np.float32)
    depths_raw = rng.integers(1, 128, size=(n, H * W)).astype(np.float64)
    dataset, info = build_rh_device_dataset(
        cfg, scene, poses, rgbs, depths_raw,
        sensor_ids=np.arange(n) % 2,
        times=np.linspace(0, 10, n),
        img_wh=(W, H),
    )
    assert dataset.n_images == n
    assert set(dataset.depths) == {"RGBD", "USS", "ToF"}
    # USS: one value broadcast over its elliptic FoV = per-image min
    uss = np.asarray(dataset.depths["USS"])
    mask_idx = np.asarray(dataset.uss_mask_idx)
    assert np.isfinite(uss[:, mask_idx]).any()
    for i in range(n):
        vals = uss[i, mask_idx]
        vals = vals[np.isfinite(vals)]
        if vals.size:
            assert np.unique(np.round(vals, 6)).size == 1
    # ToF: finite only on the lattice
    tof = np.asarray(dataset.depths["ToF"])
    lattice = np.asarray(dataset.tof_mask_idx)
    off = np.setdiff1d(np.arange(H * W), lattice)
    assert np.isnan(tof[:, off]).all()

    batch = sample_batch(
        dataset, jax.random.PRNGKey(0), 64,
        {"imgs": "all", "pixs": "random"},
    )
    assert batch.rays_o.shape == (64, 3)
    nrm = np.linalg.norm(np.asarray(batch.rays_d), axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


def _fake_robotathome(tmp_path, n_room=20, n_other=5, depth_val=100):
    """A stub of the external ``robotathome`` package exposing exactly the
    API surface load_rh_dataset uses, backed by generated files."""
    import sys
    import types

    import cv2
    import pandas as pd

    rng = np.random.default_rng(11)
    H, W = 24, 32
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)

    n = n_room + n_other
    ids = np.arange(n)
    files = {}
    for i in ids:
        rgb_f = str(img_dir / f"rgb_{i}.png")
        d_f = str(img_dir / f"d_{i}.png")
        cv2.imwrite(rgb_f, rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
        cv2.imwrite(d_f, np.full((H, W), depth_val, np.uint8))
        files[i] = (rgb_f, d_f)

    # scrambled timestamps: the reader must sort; half in another room
    ts = rng.permutation(n).astype(np.float64)
    df = pd.DataFrame({
        "id": ids,
        "home_id": [1] * n,
        "room_id": [7] * n_room + [8] * n_other,
        "sensor_id": (ids % 2).astype(np.int64),
        "timestamp": ts,
        "sensor_pose_x": rng.normal(size=n),
        "sensor_pose_y": rng.normal(size=n),
        "sensor_pose_z": rng.normal(size=n),
        "sensor_pose_yaw": rng.uniform(-np.pi, np.pi, n),
        "sensor_pose_pitch": np.zeros(n),
        "sensor_pose_roll": np.zeros(n),
    })

    class RobotAtHome:
        def __init__(self, rh_path, wspc_path, db_filename):
            assert db_filename == "rh.db"

        def get_sensor_observations(self, kind):
            assert kind == "lblrgbd"
            return df.copy()

        def name2id(self, name, kind):
            return {
                ("anto", "h"): 1,
                ("anto_livingroom1", "r"): 7,
                ("cam_a", "s"): 0,
            }[(name, kind)]

        def get_RGBD_files(self, obs_id):
            return files[int(obs_id)]

        def get_scene_points(self, home_id, room_id):
            assert (home_id, room_id) == (1, 7)
            return rng.uniform(-3, 3, size=(2000, 3))

    mod = types.ModuleType("robotathome")
    mod.RobotAtHome = RobotAtHome
    return mod, (H, W)


def test_load_rh_dataset_raw_reader(tmp_path, monkeypatch):
    """Drives the real load_rh_dataset reader end-to-end against a faked
    robotathome package: room filtering, timestamp sort, persistent
    interleaved split, image decode at the reference's raw 0-255 depth
    scale (cv2 IMREAD_UNCHANGED, not mpimg's [0,1] rescale), keep_sensor
    and keep_N filters (reference: datasets/dataset_rh.py:229-433)."""
    import sys

    from virus_nerf_tpu.data.rays import get_ray_directions
    from virus_nerf_tpu.data.rh import load_rh_dataset

    mod, (H, W) = _fake_robotathome(tmp_path)
    monkeypatch.setitem(sys.modules, "robotathome", mod)

    cfg = Config()
    cfg.dataset.sensors = ["RGBD", "USS", "ToF"]
    cfg.tof.matrix = [4, 4]
    cfg.rh2.dataset_dir = str(tmp_path)
    cfg.rh2.home = "anto"
    cfg.rh2.room = "livingroom1"

    dataset, scene, info = load_rh_dataset(cfg, split="train")
    # 20 in-room obs, 2 sensors x 10 each, 0.8/0.1/0.1 -> 8 train per sensor
    assert dataset.n_images == 16
    assert np.all(np.diff(np.asarray(dataset.times)) >= 0)  # sorted
    # split persisted where the reference keeps it
    split_f = (tmp_path / "files" / "rgbd" / "session_2" / "anto"
               / "livingroom1" / "split_subsession_1.csv")
    assert split_f.exists()

    # raw depth scale: invert the cube conversion back to the 0-255 value
    K = rh_intrinsics()
    dirs = get_ray_directions(H, W, K)
    dz = np.sqrt(1 - dirs[:, 0] ** 2 - dirs[:, 1] ** 2)
    w2c_scale = scene.w2c(1.0, only_scale=True)
    d = np.asarray(dataset.depths["RGBD"])
    raw_rec = d / w2c_scale * dz[None, :] * 128.0 / 5.0
    np.testing.assert_allclose(
        raw_rec[np.isfinite(raw_rec)], 100.0, rtol=1e-4
    )

    # keep_sensor: only the 8 train obs of sensor 'cam_a' (id 0) survive
    cfg2 = Config()
    cfg2.dataset.sensors = ["RGBD", "USS", "ToF"]
    cfg2.tof.matrix = [4, 4]
    cfg2.rh2.dataset_dir = str(tmp_path)
    cfg2.rh2.home = "anto"
    cfg2.rh2.room = "livingroom1"
    cfg2.dataset.keep_sensor = "cam_a"
    ds2, _, _ = load_rh_dataset(cfg2, split="train", scene=scene)
    assert ds2.n_images == 8

    # keep_N_observations truncates after the split
    cfg2.dataset.keep_sensor = "all"
    cfg2.dataset.keep_N_observations = 4
    ds3, _, _ = load_rh_dataset(cfg2, split="train", scene=scene)
    assert ds3.n_images == 4
