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
