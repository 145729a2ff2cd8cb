"""Entry-script tests: train_and_evaluate end to end, ablation restart
safety, optimization CLI loop, and the plot suite writing files."""

import os

import numpy as np
import pytest

from virus_nerf_tpu.configs.config import Config


def _tiny_cfg():
    cfg = Config()
    cfg.dataset.name = "synthetic"
    cfg.model.grid_type = "occ"
    cfg.model.grid_size = 16
    cfg.model.hash_levels = 4
    cfg.model.hash_log2_T = 12
    cfg.model.hash_max_res = 32
    cfg.training.batch_size = 128
    cfg.training.max_steps = 8
    cfg.training.max_time = 60.0
    cfg.training.max_samples_per_ray = 16
    cfg.training.march_candidates = 64
    cfg.training.sensors = ["USS", "ToF"]
    cfg.training.sampling_strategy = {
        "imgs": "all", "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.occ_grid.batch_size = 64
    cfg.evaluation.res_map = 64
    cfg.evaluation.res_angular = 32
    cfg.evaluation.batch_size = 256
    cfg.evaluation.max_samples_per_ray = 32
    cfg.evaluation.num_color_pts = 1
    cfg.evaluation.num_depth_pts = 2
    cfg.evaluation.eval_every_n_steps = 4
    cfg.evaluation.sensors = ["GT", "NeRF", "ToF"]
    return cfg


@pytest.fixture(scope="module")
def shared_datasets():
    from virus_nerf_tpu.data import make_synthetic_dataset

    train = make_synthetic_dataset(n_images=4, img_wh=(24, 18))
    return train, train


class TestRun:
    def test_train_and_evaluate(self, tmp_path, shared_datasets):
        from virus_nerf_tpu.run import train_and_evaluate

        out = str(tmp_path / "run")
        metrics = train_and_evaluate(
            _tiny_cfg(), datasets=shared_datasets, save_dir=out, plot=True
        )
        assert "NeRF" in metrics and "ToF" in metrics
        assert np.isfinite(metrics["NeRF"]["psnr"])
        for f in ("metrics.csv", "model.npz", "logs.csv", "hparams.json",
                  "curves.png", "metrics.png",
                  os.path.join("occgrids", "occgrid.png"),
                  os.path.join("maps", "map0.png")):
            assert os.path.exists(os.path.join(out, f)), f


class TestAblation:
    def test_restart_safe(self, tmp_path, shared_datasets, monkeypatch):
        import virus_nerf_tpu.run_ablation as ra

        calls = []

        def fake_tae(cfg, datasets=None, save_dir=None):
            calls.append(cfg.seed)
            os.makedirs(save_dir, exist_ok=True)
            with open(os.path.join(save_dir, "metrics.csv"), "w") as f:
                f.write("done\n")
            return {}

        monkeypatch.setattr(ra, "train_and_evaluate", fake_tae)
        monkeypatch.setattr(
            ra, "make_dataset", lambda cfg, split, scene=None: shared_datasets[0]
        )
        base = str(tmp_path / "abl")
        n = ra.run_ablation(_tiny_cfg(), base, num_trainings=3, base_seed=5)
        assert n == 3 and calls == [5, 6, 7]
        # second invocation skips everything
        calls.clear()
        n = ra.run_ablation(_tiny_cfg(), base, num_trainings=3, base_seed=5)
        assert n == 3 and calls == []


class TestOptimizationCLI:
    def test_loop_with_stub_objective(self, tmp_path, monkeypatch):
        import virus_nerf_tpu.run_optimization as ro

        def fake_tae(cfg, datasets=None, save_dir=None):
            # pretend quality improves with tof_loss_w near 100
            s = abs(cfg.training.tof_loss_w - 100.0) / 400.0
            return {"NeRF": {"nn_mean": {"zone3": s}}}

        monkeypatch.setattr(ro, "train_and_evaluate", fake_tae)
        monkeypatch.setattr(
            ro, "make_dataset", lambda cfg, split, scene=None: (None, None, None)
        )
        pso = ro.main([
            "--save-dir", str(tmp_path / "pso"),
            "--T", "1000", "--max-iters", "12",
        ])
        assert pso.pso.state.t == 12
        assert np.isfinite(pso.best_score)


class TestPlots:
    def test_plot_suite_writes_files(self, tmp_path, rng):
        from virus_nerf_tpu.evaluation.plots import (
            plot_nnd_summary,
            plot_occ_grid_slice,
            plot_scan_maps,
            plot_training_curves,
        )

        gs = 16
        grid = rng.random((1, gs**3)).astype(np.float32)
        gt = rng.random((32, 32)) > 0.8
        p1 = str(tmp_path / "occ.png")
        sl = plot_occ_grid_slice(grid, gs, gt_slice=gt, path=p1)
        assert sl.shape == (gs, gs) and os.path.exists(p1)

        data = {
            "GT": {"pos": rng.normal(size=(64, 2))},
            "NeRF": {"pos": rng.normal(size=(64, 2))},
        }
        p2 = str(tmp_path / "scan.png")
        plot_scan_maps(data, ["NeRF"], path=p2)
        assert os.path.exists(p2)

        metrics = {
            "NeRF": {
                "nn_mean": {"zone1": 0.1, "zone3": 0.2},
                "nn_mean_inv": {"zone1": 0.3, "zone3": 0.4},
                "nn_mean_inv_360": {"zone1": 0.5, "zone3": 0.6},
            }
        }
        p3 = str(tmp_path / "nnd.png")
        plot_nnd_summary(metrics, zones=("zone1", "zone3"), path=p3)
        assert os.path.exists(p3)

        logs = {"step": [0, 1, 2], "loss": [3.0, 2.0, 1.0],
                "psnr": [10, 11, 12], "mnn": [0.5, 0.4, 0.3]}
        p4 = str(tmp_path / "curves.png")
        plot_training_curves(logs, path=p4)
        assert os.path.exists(p4)

    def test_plot_pointclouds(self, tmp_path, rng):
        """Counterpart of plotting/training/plot_pointclouds.py: PCD dirs
        in, one top-down scatter out (via the repo's own PCD I/O)."""
        from virus_nerf_tpu.data.pcl import save_pcd
        from virus_nerf_tpu.evaluation.plots import plot_pointclouds

        d = tmp_path / "maps" / "nerf_pcl"
        d.mkdir(parents=True)
        pts = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(3)]
        for i, p in enumerate(pts):
            save_pcd(str(d / f"{i}.0.pcd"), p)
        out = str(tmp_path / "pcl.png")
        xyz = plot_pointclouds(str(tmp_path / "maps"), path=out)
        assert os.path.exists(out) and xyz.shape == (150, 3)
        np.testing.assert_allclose(xyz, np.concatenate(pts), rtol=1e-6)
