"""ETHZ loader tests against a synthesized on-disk fixture replicating the
reference's directory layout (datasets/dataset_ethz.py:24-132), plus
pcl_tools-equivalent unit tests (PCD I/O, SE3, meas2depth)."""

import os

import numpy as np
import pytest

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data.pcl import (
    SE3,
    load_pcd,
    matrix_to_quat,
    quat_to_matrix,
    save_pcd,
    tof_meas2depth,
    uss_meas2depth,
)


class TestPCD:
    def test_binary_round_trip(self, tmp_path, rng):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "cloud.pcd")
        save_pcd(p, xyz, binary=True)
        back = load_pcd(p)
        np.testing.assert_allclose(back, xyz, rtol=1e-6)

    def test_ascii_round_trip(self, tmp_path, rng):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "cloud.pcd")
        save_pcd(p, xyz, binary=False)
        back = load_pcd(p)
        np.testing.assert_allclose(back, xyz, rtol=1e-5)

    def test_extra_fields_binary(self, tmp_path):
        # PCD with intensity field: xyz extraction must skip it
        n = 10
        header = (
            "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
            "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 10\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 10\nDATA binary\n"
        )
        data = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
        p = tmp_path / "c.pcd"
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(data.tobytes())
        xyz = load_pcd(str(p))
        np.testing.assert_allclose(xyz, data[:, :3])


class TestSE3:
    def test_quat_matrix_round_trip(self, rng):
        for _ in range(10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            R = quat_to_matrix(q)
            # valid rotation
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert np.isclose(np.linalg.det(R), 1.0)
            q2 = matrix_to_quat(R)
            # q and -q are the same rotation
            assert np.allclose(q2, q, atol=1e-9) or np.allclose(
                q2, -q, atol=1e-9
            )

    def test_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation

        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            quat_to_matrix(q), Rotation.from_quat(q).as_matrix(), atol=1e-12
        )
        ang = rng.uniform(-np.pi, np.pi, 3)
        from virus_nerf_tpu.data.pcl import euler_to_matrix

        np.testing.assert_allclose(
            euler_to_matrix(ang, "xyz"),
            Rotation.from_euler("xyz", ang).as_matrix(),
            atol=1e-12,
        )

    def test_inverse_compose_apply(self, rng):
        t = rng.normal(size=3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        T = SE3(t=t, q=q)
        pts = rng.normal(size=(20, 3))
        back = T.inverse().apply(T.apply(pts))
        np.testing.assert_allclose(back, pts, atol=1e-10)
        # compose: (A ∘ B)(x) == A(B(x))
        B = SE3(t=rng.normal(size=3), q=[0, 0, 0, 1])
        AB = T.compose(B, apply_first_other=True)
        np.testing.assert_allclose(
            AB.apply(pts), T.apply(B.apply(pts)), atol=1e-10
        )


class TestMeas2Depth:
    def test_uss(self):
        # >= 50000 counts is 'no echo' -> 0; else counts/5000 meters
        # (reference: pcl_creator.py:149-163)
        np.testing.assert_allclose(
            uss_meas2depth([10000, 50000, 60000, 2500]),
            [2.0, 0.0, 0.0, 0.5],
        )

    def test_tof_orientation_and_units(self):
        # mm -> m, <= 0.1 m invalid, fixed flip/transpose chain
        # (reference: pcl_creator.py:182-202)
        meas = np.arange(64, dtype=np.float64) * 100 + 200  # 0.3..6.5 m
        depth = tof_meas2depth(meas)
        assert depth.shape == (8, 8)
        ref = 0.001 * (np.arange(64).reshape(8, 8) * 100 + 200)
        ref = ref[:, ::-1].T
        ref = ref[::-1, ::-1]
        np.testing.assert_allclose(depth, ref)

    def test_tof_invalid(self):
        meas = np.full(64, 50.0)  # 0.05 m < depth_min
        assert np.all(np.isnan(tof_meas2depth(meas)))

    def test_tof_batched(self):
        meas = np.tile(np.arange(64.0) * 100 + 200, (3, 1))
        d = tof_meas2depth(meas)
        assert d.shape == (3, 8, 8)
        np.testing.assert_allclose(d[0], d[2])


# ---------------------------------------------------------------- fixture
W, H = 16, 12
N_IMGS = 6


@pytest.fixture(scope="module")
def ethz_dir(tmp_path_factory):
    """Synthesize a miniature ETHZ room on disk."""
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("ethz")
    room = root / "commonroom"
    meas = room / "measurements"
    (meas / "CAM1_color_image_raw").mkdir(parents=True)
    (meas / "CAM1_aligned_depth_to_color_image_raw").mkdir(parents=True)
    (room / "poses").mkdir()
    (room / "maps").mkdir()

    # intrinsics
    fx = fy = 10.0
    with open(root / "camera_intrinsics.CSV", "w") as f:
        f.write("cam_id,fx,fy,cx,cy\n")
        f.write(f"CAM1,{fx},{fy},{W/2},{H/2}\n")

    # images + depth
    for i in range(N_IMGS):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(meas / "CAM1_color_image_raw" / f"img{i}.png"), img)
        depth_mm = rng.uniform(500, 3000, (H, W))
        np.save(
            str(
                meas
                / "CAM1_aligned_depth_to_color_image_raw"
                / f"img{i}.npy"
            ),
            depth_mm,
        )

    # poses (identity rotation, translated along x)
    with open(room / "poses" / "poses_cam_balm_sync1.csv", "w") as f:
        f.write("time,x,y,z,qx,qy,qz,qw\n")
        for i in range(N_IMGS):
            f.write(f"{100.0 + i},{0.1 * i},0.0,0.3,0,0,0,1\n")
    with open(room / "poses" / "poses_lidar_balm_sync1.csv", "w") as f:
        f.write("time,x,y,z,qx,qy,qz,qw\n")
        for i in range(N_IMGS):
            f.write(f"{100.0 + i},{0.1 * i},0.0,0.5,0,0,0,1\n")

    # USS / ToF measurements
    with open(meas / "USS1.csv", "w") as f:
        f.write("time,meas\n")
        for i in range(N_IMGS):
            f.write(f"{100.0 + i},{5000 * (i + 1)}\n")  # 1..6 m
    with open(meas / "TOF1.csv", "w") as f:
        cols = (
            ["time"]
            + [f"meas_{i}" for i in range(64)]
            + [f"stds_{i}" for i in range(64)]
        )
        f.write(",".join(cols) + "\n")
        for i in range(N_IMGS):
            frame = rng.uniform(300, 4000, 64)
            f.write(
                ",".join(
                    [f"{100.0 + i}"]
                    + [f"{v:.1f}" for v in frame]
                    + ["10.0"] * 64
                )
                + "\n"
            )

    # GT map
    pts = rng.uniform([-3, -3, -0.4], [15, 9, 1.2], (5000, 3))
    save_pcd(str(room / "maps" / "map_balm.pcd"), pts)
    return str(root)


class TestETHZLoader:
    def _cfg(self, ethz_dir):
        cfg = Config()
        cfg.dataset.name = "ETHZ"
        cfg.dataset.split_ratio = {"train": 0.5, "val": 0.25, "test": 0.25}
        cfg.ethz.dataset_dir = ethz_dir
        cfg.ethz.room = "commonroom"
        cfg.ethz.cam_ids = ["CAM1"]
        return cfg

    def test_load_train_split(self, ethz_dir):
        from virus_nerf_tpu.data.ethz import load_ethz_dataset

        cfg = self._cfg(ethz_dir)
        ds, scene, info = load_ethz_dataset(cfg, split="train")
        n = ds.n_images
        assert n == int(0.5 * N_IMGS)
        assert ds.rgbs.shape == (n, W * H, 3)
        assert ds.directions.shape == (1, W * H, 3)
        assert set(ds.depths) == {"RGBD", "USS", "ToF"}
        # poses in cube coords: inside the unit cube
        assert np.all(np.abs(np.asarray(ds.poses)[:, :, 3]) <= 0.5)
        assert info["img_wh"] == (W, H)

    def test_uss_depth_values(self, ethz_dir):
        """USS counts -> meters -> cube units broadcast over the FoV mask."""
        from virus_nerf_tpu.data.ethz import load_ethz_dataset

        cfg = self._cfg(ethz_dir)
        ds, scene, info = load_ethz_dataset(cfg, split="train")
        w2c = scene.w2c(1.0, only_scale=True)
        uss = np.asarray(ds.depths["USS"])  # (n, H*W)
        mask = info["sensor_models"]["USS"].mask
        # inside mask: exactly one broadcast value per image, in cube units
        vals = uss[:, mask]
        assert np.all(~np.isnan(vals))
        per_img = vals[:, 0]
        assert np.allclose(vals, per_img[:, None])
        # value must be k meters * w2c for some integer k in 1..6
        meters = per_img / w2c
        assert np.allclose(meters, np.round(meters), atol=1e-5)
        assert np.all((meters >= 1 - 1e-6) & (meters <= 6 + 1e-6))
        # outside mask: NaN
        assert np.all(np.isnan(uss[:, ~mask]))

    def test_split_persistent_and_disjoint(self, ethz_dir):
        from virus_nerf_tpu.data.ethz import load_ethz_dataset

        cfg = self._cfg(ethz_dir)
        tr, _, _ = load_ethz_dataset(cfg, split="train")
        te, _, _ = load_ethz_dataset(cfg, split="test")
        va, _, _ = load_ethz_dataset(cfg, split="val")
        assert tr.n_images + te.n_images + va.n_images == N_IMGS
        # reloading gives the identical split (persisted CSV)
        tr2, _, _ = load_ethz_dataset(cfg, split="train")
        np.testing.assert_allclose(
            np.asarray(tr.times), np.asarray(tr2.times)
        )

    def test_trains_end_to_end(self, ethz_dir):
        """The loaded dataset drops into the standard Trainer."""
        import jax.numpy as jnp

        from virus_nerf_tpu.data.ethz import load_ethz_dataset
        from virus_nerf_tpu.training import Trainer

        cfg = self._cfg(ethz_dir)
        cfg.model.grid_type = "occ"
        cfg.model.grid_size = 16
        cfg.model.hash_levels = 4
        cfg.model.hash_log2_T = 12
        cfg.model.hash_max_res = 32
        cfg.training.batch_size = 64
        cfg.training.max_samples_per_ray = 16
        cfg.training.march_candidates = 64
        cfg.training.sensors = ["USS", "ToF"]
        cfg.occ_grid.batch_size = 32
        ds, scene, _ = load_ethz_dataset(cfg, split="train")
        tr = Trainer(cfg, ds, scene=scene)
        st = tr.init_state()
        step = tr._get("train_step", tr._make_train_step)
        st, m = step(st, ds, jnp.float32(0.0))
        assert np.isfinite(float(m["loss"]))
