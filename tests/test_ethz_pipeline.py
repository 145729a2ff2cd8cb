"""End-to-end ETHZ pipeline test: synthesize a room on disk in the reference
layout (tools/make_ethz_fixture.py), then run the verbatim reference config
through run.py's train -> evaluate -> metrics.csv/renders/plots path
(reference: run.py:8-14 + training/trainer.py:167-224)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from tools.make_ethz_fixture import generate_ethz_fixture

    out = str(tmp_path_factory.mktemp("ethz_fix"))
    return generate_ethz_fixture(
        out, n_images=10, img_wh=(48, 36), n_gt_points=30_000
    )


def test_fixture_layout(fixture_root):
    room = os.path.join(fixture_root, "commonroom")
    assert os.path.exists(
        os.path.join(fixture_root, "camera_intrinsics.CSV")
    )
    for cam in ("CAM1", "CAM3"):
        assert os.path.exists(
            os.path.join(
                room, "measurements", f"{cam}_color_image_raw", "img0.png"
            )
        )
    for sid in (1, 3):
        assert os.path.exists(
            os.path.join(room, "poses", f"poses_cam_balm_sync{sid}.csv")
        )
        assert os.path.exists(
            os.path.join(room, "measurements", f"USS{sid}.csv")
        )
    assert os.path.exists(os.path.join(room, "maps", "map_balm.pcd"))


def test_fixture_depths_consistent(fixture_root):
    """The loader's reconstructed USS/ToF/RGBD depths must agree with a
    raycast at the loaded poses — i.e. the measurement-convention inversion
    (counts, mm frames, orientation chain) round-trips through the real
    loader."""
    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data.ethz import load_ethz_dataset
    from virus_nerf_tpu.data.synthetic import _raycast
    from tools.make_ethz_fixture import _BOXES, _BOX_COLORS

    cfg = Config()
    cfg.dataset.name = "ETHZ"
    cfg.ethz.dataset_dir = fixture_root
    cfg.ethz.cam_ids = ["CAM1", "CAM3"]
    cfg.dataset.split_ratio = {"train": 0.8, "val": 0.1, "test": 0.1}
    ds, scene, info = load_ethz_dataset(cfg, split="train")
    assert ds.n_images >= 12  # 80% of 2 cams x 10 images

    w2c = scene.w2c(1.0, only_scale=True)
    from virus_nerf_tpu.data.ethz import ETHZ_ROOM_BOUNDS

    lo, hi = (np.array(b, float) for b in ETHZ_ROOM_BOUNDS["commonroom"])
    i = 0
    cam = int(np.asarray(ds.cam_idx[i]))
    dirs = np.asarray(ds.directions[cam])
    pose_c = np.asarray(ds.poses[i], np.float64)
    rays_d = dirs @ pose_c[:3, :3].T
    o_w = scene.c2w(pose_c[None, :, 3])[0]
    depth, _ = _raycast(
        np.broadcast_to(o_w, rays_d.shape), rays_d, _BOXES, _BOX_COLORS,
        room_min=lo, room_max=hi,
    )
    # RGBD: cube-units distance along the ray (noise ~2 mm + mm rounding)
    rgbd = np.asarray(ds.depths["RGBD"][i], np.float64)
    # pixels beyond the 6 m realsense range clip are NaN (big room)
    ok = ~np.isnan(rgbd)
    assert ok.mean() > 0.6
    err_m = np.abs(rgbd[ok] / w2c - depth[ok])
    assert np.nanmedian(err_m) < 0.02, np.nanmedian(err_m)
    # USS: broadcast cone minimum (3% multiplicative noise)
    uss = np.asarray(ds.depths["USS"][i], np.float64)
    uss_mask = info["sensor_models"]["USS"].mask
    if not np.isnan(uss[uss_mask][0]):
        m_loaded = uss[uss_mask][0] / w2c
        m_true = np.nanmin(depth[uss_mask])
        assert abs(m_loaded - m_true) < 0.15 * m_true + 0.02
    # ToF: zone depths at the lattice pixels (2 cm noise)
    tof = np.asarray(ds.depths["ToF"][i], np.float64)
    tof_mask = info["sensor_models"]["ToF"].mask
    tv = tof[tof_mask] / w2c
    dv = depth[tof_mask]
    ok = ~np.isnan(tv) & (dv <= 4.0)
    assert ok.sum() > 32
    assert np.nanmedian(np.abs(tv[ok] - dv[ok])) < 0.08


def test_run_py_reference_config_end_to_end(fixture_root, tmp_path):
    """run.py with the unmodified reference experiment JSON (only
    dataset_dir + scale knobs overridden) trains, evaluates, and writes
    metrics.csv, renders, and the checkpoint."""
    from virus_nerf_tpu.run import main

    save = str(tmp_path / "run")
    metrics = main([
        "--config", "/root/reference/args/ethz_usstof_not_optimized_gpu.json",
        "--save-dir", save,
        "--override", f"ethz.dataset_dir={fixture_root}",
        "--override", "training.max_steps=8",
        "--override", "training.max_time=1e9",
        "--override", "training.batch_size=256",
        "--override", "model.grid_size=32",
        "--override", "model.hash_levels=8",
        "--override", "model.hash_log2_T=15",
        "--override", "model.hash_max_res=128",
        "--override", "training.max_samples_per_ray=32",
        "--override", "training.march_candidates=256",
        "--override", "occ_grid.batch_size=64",
        "--override", "occ_grid.update_interval=4",
        "--override", "evaluation.res_angular=64",
        "--override", "evaluation.res_map=32",
        "--override", "evaluation.batch_size=512",
        "--override", "evaluation.max_samples_per_ray=48",
        "--override", "evaluation.num_color_pts=1",
        "--override", "evaluation.num_depth_pts=1",
        "--override", "evaluation.eval_every_n_steps=100",
    ])
    assert "NeRF" in metrics
    assert np.isfinite(metrics["NeRF"]["psnr"])
    assert np.isfinite(metrics["NeRF"]["nn_mean"]["zone3"])
    assert os.path.exists(os.path.join(save, "metrics.csv"))
    assert os.path.exists(os.path.join(save, "renders", "rgb_000.png"))
    assert os.path.exists(os.path.join(save, "model.npz"))
