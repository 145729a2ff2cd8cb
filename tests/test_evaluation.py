"""Evaluation-suite tests: NN metrics vs naive implementations, SSIM/PSNR vs
closed-form cases, FoV masking, and an end-to-end depth evaluation on the
synthetic scene where the GT scan compares against itself."""

import os

import numpy as np
import pytest

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data import make_synthetic_dataset
from virus_nerf_tpu.evaluation import (
    Evaluator,
    create_scan_rays,
    find_nearest_neighbour,
    limit_fov,
    mae,
    mare,
    nn_metrics,
    psnr,
    rmse,
    ssim,
)


class TestNearestNeighbour:
    def test_matches_naive(self, rng):
        a = rng.normal(size=(40, 2)).astype(np.float32)
        b = rng.normal(size=(60, 2)).astype(np.float32)
        idxs, dists = find_nearest_neighbour(a, b)
        for i in range(a.shape[0]):
            d = np.linalg.norm(b - a[i], axis=1)
            assert idxs[i] == np.argmin(d)
            assert np.isclose(dists[i], d.min(), rtol=1e-5)

    def test_nan_handling(self, rng):
        a = rng.normal(size=(10, 2)).astype(np.float32)
        b = rng.normal(size=(20, 2)).astype(np.float32)
        a[3] = np.nan
        b[5] = np.nan
        idxs, dists = find_nearest_neighbour(a, b, ignore_nan=True)
        assert idxs[3] == -1 and np.isnan(dists[3])
        assert np.all(idxs[np.arange(10) != 3] >= 0)
        assert not np.any(idxs == 5)  # NaN reference row never matched

    def test_empty_reference(self):
        a = np.zeros((4, 2), np.float32)
        b = np.full((3, 2), np.nan, np.float32)
        idxs, dists = find_nearest_neighbour(a, b, ignore_nan=True)
        assert np.all(idxs == -1) and np.all(np.isnan(dists))

    def test_batched_equals_unbatched(self, rng):
        a = rng.normal(size=(33, 2)).astype(np.float32)
        b = rng.normal(size=(17, 2)).astype(np.float32)
        i1, d1 = find_nearest_neighbour(a, b)
        i2, d2 = find_nearest_neighbour(a, b, batch_size=8)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2)


class TestScanRays:
    def test_shapes_and_angles(self):
        o = np.array([[1.0, 2.0, 0.5], [0.0, 0.0, 0.3]])
        rays_o, rays_d = create_scan_rays(o, angle_res=8)
        assert rays_o.shape == (16, 3) and rays_d.shape == (16, 3)
        np.testing.assert_allclose(rays_o[:8], np.tile(o[0], (8, 1)))
        # planar unit directions
        np.testing.assert_allclose(np.linalg.norm(rays_d, axis=1), 1.0, rtol=1e-6)
        assert np.all(rays_d[:, 2] == 0)
        # first angle = -pi
        np.testing.assert_allclose(rays_d[0, :2], [-1.0, 0.0], atol=1e-6)


class TestZoneMetrics:
    def test_rmse_mae_mare(self):
        zones = {"z1": (0.0, 1.0), "z3": (0.0, 100.0)}
        gt = np.array([0.5, 0.8, 2.0, 4.0])
        pred = gt + np.array([0.1, -0.1, 0.5, -1.0])
        r = rmse(pred, gt, zones)
        assert np.isclose(r["z1"], np.mean([0.01, 0.01]))
        assert np.isclose(r["z3"], np.mean([0.01, 0.01, 0.25, 1.0]))
        m = mae(pred, gt, zones)
        assert np.isclose(m["z1"], 0.1)
        a = mare(pred, gt, zones)
        assert np.isclose(a["z1"], np.mean([0.1 / 0.5, 0.1 / 0.8]))

    def test_nn_metrics_identical_points(self, rng):
        # prediction == GT: zero distance, all inliers
        N, K = 2, 32
        pos = rng.normal(size=(N * K, 2))
        depths = np.abs(rng.normal(size=N * K)) + 0.1
        zones = {"zone3": (0.0, 100.0)}
        nn_dists, mean, median, inlier, too_close = nn_metrics(
            pos, pos, depths, depths, N, True, zones, 0.1
        )
        assert np.allclose(nn_dists, 0.0)
        assert mean["zone3"] == 0.0 and inlier["zone3"] == 1.0
        assert too_close["zone3"] == 0.0

    def test_nn_metrics_offset(self):
        # uniform 0.05 offset: mean NN distance = 0.05, all inliers at 0.1
        N, K = 1, 16
        pos_gt = np.stack([np.linspace(0, 10, K), np.zeros(K)], 1)
        pos = pos_gt + np.array([0.0, 0.05])
        depths = np.linalg.norm(pos_gt, axis=1)
        zones = {"zone3": (0.0, 100.0)}
        _, mean, _, inlier, _ = nn_metrics(
            pos, pos_gt, depths, depths, N, True, zones, 0.1
        )
        assert np.isclose(mean["zone3"], 0.05, atol=1e-6)
        assert inlier["zone3"] == 1.0


class TestImageMetrics:
    def test_psnr_known_value(self):
        a = np.zeros((1, 8, 8, 3))
        b = np.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20
        assert np.isclose(psnr(a, b), 20.0)

    def test_ssim_identical_is_one(self, rng):
        img = rng.uniform(size=(1, 32, 32, 3))
        assert np.isclose(ssim(img, img), 1.0, atol=1e-9)

    def test_ssim_noise_lowers(self, rng):
        img = rng.uniform(size=(1, 32, 32, 3))
        noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
        assert ssim(img, noisy) < 0.9


class TestLimitFov:
    def test_360_keeps_all(self, rng):
        N, M = 2, 16
        pos = rng.normal(size=(N * M, 2))
        fov = {"cam": np.tile([[-np.pi, np.pi]], (N, 1))}
        robot = {"cam": np.zeros((N, 2))}
        p, _ = limit_fov(pos, pos.copy(), fov, N, robot)
        assert not np.any(np.isnan(p))

    def test_half_plane(self):
        # FoV [-pi/2, pi/2] from origin keeps only x > 0 points
        N, M = 1, 8
        ang = np.linspace(-np.pi, np.pi, M, endpoint=False)
        pos = np.stack([np.cos(ang), np.sin(ang)], 1)
        fov = {"cam": np.array([[-np.pi / 2 + 1e-6, np.pi / 2 - 1e-6]])}
        robot = {"cam": np.zeros((1, 2))}
        p, _ = limit_fov(pos, pos.copy(), fov, N, robot)
        kept = ~np.isnan(p[:, 0])
        np.testing.assert_array_equal(kept, pos[:, 0] > 1e-9)


class TestEvaluatorEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        import jax.numpy as jnp

        from virus_nerf_tpu.training import Trainer

        cfg = Config()
        cfg.model.grid_type = "occ"
        cfg.model.grid_size = 32
        cfg.model.hash_levels = 8
        cfg.model.hash_log2_T = 15
        cfg.model.hash_max_res = 128
        cfg.training.batch_size = 256
        cfg.training.max_samples_per_ray = 48
        cfg.training.march_candidates = 256
        cfg.training.sensors = ["USS", "ToF"]
        cfg.training.sampling_strategy = {
            "imgs": "all",
            "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
        }
        cfg.evaluation.res_map = 128
        cfg.evaluation.res_angular = 64
        cfg.evaluation.batch_size = 512
        cfg.evaluation.max_samples_per_ray = 64
        ds, scene, info = make_synthetic_dataset(n_images=6, img_wh=(32, 24))
        trainer = Trainer(cfg, ds, scene=scene)
        state = trainer.init_state()
        ev = Evaluator(trainer.model, cfg, ds, scene, img_wh=info["img_wh"])
        return cfg, ds, scene, trainer, state, ev

    def test_gt_scan_self_consistent(self, setup):
        """GT scan data: depths positive, positions on the GT map."""
        cfg, ds, scene, trainer, state, ev = setup
        rays_o, rays_d, depths = ev._get_gt_data(np.array([0, 3]))
        assert rays_o.shape == (2 * 64, 3)
        valid = ~np.isnan(depths)
        assert valid.mean() > 0.9  # inside a closed room, almost all rays hit
        assert np.all(depths[valid] > 0)

    def test_sensor_data_height_filter(self, setup):
        cfg, ds, scene, trainer, state, ev = setup
        rays_o, rays_d, depths = ev._get_sensor_data(np.array([0, 1]), "ToF")
        valid = ~np.isnan(depths)
        assert valid.any()
        # all kept points lie within the height band
        dz = depths[valid] * rays_d[valid][:, 2]
        assert np.all(np.abs(dz) <= cfg.evaluation.height_tolerance + 1e-9)

    def test_depth_eval_sensor_vs_gt(self, setup):
        """Measured ToF depths are exact -> tight NN accuracy vs the GT scan."""
        cfg, ds, scene, trainer, state, ev = setup
        metrics, data = ev.evaluate_depth(
            state.params, state.grid.occ_bool, np.array([0, 3]),
            sensors=("ToF",),
        )
        mnn = metrics["ToF"]["nn_mean"]["zone3"]
        # exact sensor depths on the exact GT raster: centimetre agreement
        assert mnn < 0.15, f"ToF-vs-GT mean NND too large: {mnn}"
        # coverage direction exists and is finite
        assert np.isfinite(metrics["ToF"]["nn_mean_inv_360"]["zone3"])

    def test_evaluate_num_color_pts_zero(self, setup):
        """num_color_pts=0 — the reference's PSO eval protocol
        (reference: run_optimization.py:29-33) — must skip color eval and
        still produce the NND metrics the PSO scores on (regression: the
        empty render list crashed np.stack)."""
        cfg, ds, scene, trainer, state, ev = setup
        metrics = ev.evaluate(
            state.params, state.grid.occ_bool,
            color_img_idxs=np.array([], int),
            depth_img_idxs=np.array([0]),
            sensors=("GT", "NeRF"),
        )
        assert np.isfinite(metrics["NeRF"]["nn_mean"]["zone3"])
        assert np.isnan(metrics["NeRF"]["psnr"])

    def test_default_fov_limits_gt(self, setup):
        """evaluate_depth computes per-image robot FoV from poses by default
        (reference: training/trainer.py:401-434 + dataset getFieldOfView):
        the ToF accuracy/coverage directions compare against a GT scan
        masked to the ~45-degree sensor cone, while _inv_360 keeps all of
        it — on a 360-degree GT the two references must differ."""
        cfg, ds, scene, trainer, state, ev = setup
        idxs = np.array([0, 3])

        fov, robot_pos, orientation = ev.get_field_of_view(idxs)
        name = next(iter(orientation))
        half = 0.5 * np.deg2rad(cfg.tof.angle_of_view[0])
        # ToF range is orientation +- half AoV (up to the [-pi,pi] wrap)
        lo = fov["ToF"][name][:, 0]
        w = (fov["ToF"][name][:, 1] - lo) % (2 * np.pi)
        np.testing.assert_allclose(w, 2 * half, atol=1e-6)
        assert fov["NeRF"][name][0, 0] == -np.pi

        _, data = ev.evaluate_depth(
            state.params, state.grid.occ_bool, idxs, sensors=("ToF",),
        )
        gt_valid = ~np.isnan(data["GT"]["pos"]).any(axis=1)
        lim_valid = ~np.isnan(data["ToF"]["pos_gt"]).any(axis=1)
        # the 45-degree cone keeps roughly 1/8 of the 360-degree scan
        assert lim_valid.sum() < 0.5 * gt_valid.sum(), (
            int(lim_valid.sum()), int(gt_valid.sum()),
        )
        assert lim_valid.sum() > 0
        # all surviving GT points lie inside the per-image angular range
        N, M = idxs.shape[0], data["GT"]["pos"].shape[0] // idxs.shape[0]
        o = np.repeat(robot_pos[name], M, axis=0)
        ang = np.arctan2(*(data["GT"]["pos"] - o).T[::-1])
        rel = (ang - np.repeat(lo, M)) % (2 * np.pi)
        assert np.all(rel[lim_valid] <= np.repeat(w, M)[lim_valid] + 1e-6)

        # fov={} disables the limiting entirely
        _, data_off = ev.evaluate_depth(
            state.params, state.grid.occ_bool, idxs, sensors=("ToF",),
            fov={},
        )
        off_valid = ~np.isnan(data_off["ToF"]["pos_gt"]).any(axis=1)
        assert off_valid.sum() == gt_valid.sum()

    def test_full_evaluate_and_csv(self, setup, tmp_path):
        cfg, ds, scene, trainer, state, ev = setup
        out = ev.evaluate(
            state.params, state.grid.occ_bool,
            color_img_idxs=np.array([0]),
            depth_img_idxs=np.array([0]),
            sensors=("NeRF", "ToF"),
            save_dir=str(tmp_path),
        )
        assert "NeRF" in out and "ToF" in out
        assert np.isfinite(out["NeRF"]["psnr"])
        csv_path = tmp_path / "metrics.csv"
        assert csv_path.exists()
        text = csv_path.read_text()
        assert "NeRF" in text and "nn_mean" in text
        # per-image render export (reference: training/trainer.py:358-370)
        renders = tmp_path / "renders"
        for name in ("rgb_000.png", "rgb_gt_000.png", "depth_000.png"):
            assert (renders / name).exists(), name
        from PIL import Image

        im = np.asarray(Image.open(renders / "rgb_000.png"))
        gt = np.asarray(Image.open(renders / "rgb_gt_000.png"))
        assert im.shape == gt.shape and im.shape[2] == 3

    def test_density_slice(self, setup):
        """Density-slice inference (reference interfereDensityMap parity):
        right shape, finite, threshold map binary."""
        cfg, ds, scene, trainer, state, ev = setup
        dmap, dthr = ev.density_slice(
            state.params, res_map=16, height_w=0.5,
            num_avg_heights=3, tolerance_w=0.05, threshold=5.0,
        )
        assert dmap.shape == (16, 16) and dthr.shape == (16, 16)
        assert np.all(np.isfinite(dmap)) and dmap.min() >= 0
        assert set(np.unique(dthr)).issubset({0.0, 1.0})
        np.testing.assert_array_equal(dthr, (dmap >= 5.0).astype(np.float32))


class TestLidarPacking:
    def test_pack_lidar_scans(self, rng):
        from virus_nerf_tpu.evaluation import Evaluator

        # two images; cloud 0 has points in the band, cloud 1 empty
        cloud0 = np.array(
            [[1.0, 0.0, 0.0], [0.0, 2.0, 0.02], [5.0, 5.0, 3.0]]
        )
        cloud1 = np.zeros((0, 3))
        poses = np.zeros((2, 3, 4))
        poses[:, :3, :3] = np.eye(3)
        heights = np.array([0.0, 0.0])
        rays_o, rays_d, depths = Evaluator.pack_lidar_scans(
            [cloud0, cloud1], poses, heights, height_tolerance=0.1
        )
        # K = 2 in-band points of cloud0
        assert depths.shape == (4,)
        valid = ~np.isnan(depths)
        assert valid.sum() == 2
        np.testing.assert_allclose(
            np.sort(depths[valid]), [1.0, np.sqrt(4.0 + 0.02**2)], rtol=1e-6
        )
        # unit directions
        np.testing.assert_allclose(
            np.linalg.norm(rays_d[valid], axis=1), 1.0, rtol=1e-6
        )


class TestSyncIdxs:
    def test_cross_stack_matching(self):
        import jax.numpy as jnp

        from virus_nerf_tpu.data import make_synthetic_dataset
        from virus_nerf_tpu.data.dataset import get_sync_idxs

        ds, _, _ = make_synthetic_dataset(n_images=6, img_wh=(16, 12))
        # fake two stacks with interleaved times
        ds = ds._replace(
            sensor_ids=jnp.asarray([1, 3, 1, 3, 1, 3]),
            times=jnp.asarray([0.0, 0.01, 1.0, 1.05, 2.0, 5.0]),
        )
        sync = get_sync_idxs(ds, [0, 2, 4])
        # stack order = sorted unique ids = [1, 3]
        np.testing.assert_array_equal(sync[0], [0, 1])  # 0.0 ~ 0.01
        np.testing.assert_array_equal(sync[1], [2, 3])  # 1.0 ~ 1.05
        np.testing.assert_array_equal(sync[2], [4, 4])  # no partner near 2.0


class TestPointcloudExport:
    def test_export_writes_pcd(self, tmp_path):
        import jax

        from virus_nerf_tpu.configs.config import Config
        from virus_nerf_tpu.data import make_synthetic_dataset
        from virus_nerf_tpu.data.pcl import load_pcd
        from virus_nerf_tpu.evaluation import Evaluator
        from virus_nerf_tpu.models import NGPModel

        cfg = Config()
        cfg.evaluation.res_angular = 16
        cfg.evaluation.batch_size = 128
        cfg.evaluation.max_samples_per_ray = 32
        cfg.training.march_candidates = 256
        ds, scene, info = make_synthetic_dataset(n_images=4, img_wh=(16, 12))
        model = NGPModel(
            scale=0.5, levels=4, log2_T=12, max_res=32, grid_size=16
        )
        params = model.init(jax.random.PRNGKey(0))
        occ = np.ones((1, 16**3), bool)
        ev = Evaluator(model, cfg, ds, scene)
        path = str(tmp_path / "cloud.pcd")
        pts = ev.export_nerf_pointcloud(
            params, jax.numpy.asarray(occ),
            rays_o_w=np.zeros((2, 3)), save_path=path,
            min_opacity=0.0,
        )
        assert os.path.exists(path)
        back = load_pcd(path)
        assert back.shape == pts.shape
