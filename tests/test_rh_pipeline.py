"""End-to-end RH2 pipeline test: synthesize a Robot@Home2 room on disk with
its drop-in ``robotathome`` reader (tools/make_rh_fixture.py), then run the
UNMODIFIED loader + run.py train -> evaluate path at ``model.scale = 1.0``
— the multi-cascade / ``exp_step_factor = 1/256`` config family the ETHZ
path never exercises (reference: args/args.py:84,
datasets/dataset_rh.py:229-504)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def rh_root(tmp_path_factory):
    from tools.make_rh_fixture import make_fixture

    # >= 10 trajectory points so the per-sensor modulo-10 interleave
    # yields a non-empty test split (8/1/1 of each sensor's 10 obs)
    out = str(tmp_path_factory.mktemp("rh_fix"))
    make_fixture(out, n_times=10, seed=3)
    return out


@pytest.fixture(autouse=True)
def _rh_on_path(rh_root, monkeypatch):
    # the fixture dir provides the 'robotathome' reader module
    monkeypatch.syspath_prepend(rh_root)
    sys.modules.pop("robotathome", None)
    yield
    sys.modules.pop("robotathome", None)


def _cfg(rh_root):
    from virus_nerf_tpu.configs.config import Config

    cfg = Config()
    cfg.dataset.name = "RH2"
    cfg.rh2.dataset_dir = rh_root
    cfg.dataset.split_ratio = {"train": 0.8, "val": 0.1, "test": 0.1}
    return cfg


def test_loader_depths_match_raycast(rh_root):
    """The real load_rh_dataset (stub package, real reader code) must
    reproduce raycast depths at the loaded poses: png z-depth decode,
    Euler pose assembly, and the RGBD->USS/ToF sensor simulation all
    round-trip (reference: datasets/dataset_rh.py:269-504)."""
    from tools.make_rh_fixture import _BOXES, _BOX_COLORS, ROOM_MAX, ROOM_MIN
    from virus_nerf_tpu.data.rh import load_rh_dataset
    from virus_nerf_tpu.data.synthetic import _raycast

    ds, scene, info = load_rh_dataset(_cfg(rh_root), "train")
    assert ds.n_images == 32  # 8/10 of 4 x 10 obs
    w2c = scene.w2c(1.0, only_scale=True)

    i = 1
    dirs = np.asarray(ds.directions[0], np.float64)
    pose_c = np.asarray(ds.poses[i], np.float64)
    rays_d = dirs @ pose_c[:3, :3].T
    o_w = scene.c2w(pose_c[None, :, 3])[0]
    depth, _ = _raycast(
        np.broadcast_to(o_w, rays_d.shape), rays_d, _BOXES, _BOX_COLORS,
        ROOM_MIN, ROOM_MAX,
    )
    rgbd = np.asarray(ds.depths["RGBD"][i], np.float64)
    m = np.isfinite(rgbd)
    assert m.mean() > 0.9
    # depth png quantization is 5/128 m ~ 3.9 cm; pose jitter adds ~1 cm
    err = np.abs(rgbd[m] / w2c - depth[m])
    assert np.median(err) < 0.06, np.median(err)

    # USS: scalar min-depth over the elliptic FoV, broadcast to the mask
    uss = np.asarray(ds.depths["USS"][i], np.float64)
    mu = np.isfinite(uss)
    assert 0.2 < mu.mean() < 0.8
    assert np.nanstd(uss) < 1e-6 or np.unique(
        np.round(uss[mu], 6)
    ).size == 1  # single broadcast value
    assert np.nanmin(uss) <= np.nanmin(rgbd[m & mu]) + 1e-6

    # ToF: 8x8 lattice of valid pixels agreeing with RGBD depth nearby
    tof = np.asarray(ds.depths["ToF"][i], np.float64)
    nt = np.isfinite(tof).sum()
    assert 32 <= nt <= 64


def test_split_is_persistent_and_disjoint(rh_root):
    from virus_nerf_tpu.data.rh import load_rh_dataset

    cfg = _cfg(rh_root)
    tr, scene, _ = load_rh_dataset(cfg, "train")
    te, _, _ = load_rh_dataset(cfg, "test", scene=scene)
    assert tr.n_images == 32 and te.n_images == 4
    split_csv = os.path.join(rh_root, "files", "rgbd", "session_2",
                             "anto", "livingroom1",
                             "split_subsession_1.csv")
    assert os.path.exists(split_csv)


def test_run_py_rh_end_to_end_multicascade(rh_root, tmp_path):
    """One command through the full RH2 pipeline at model.scale=1.0:
    cascades=2, exp_step_factor=1/256 — the hierarchical multi-cascade
    march runs end to end (march/renderer fallback path), metrics.csv and
    renders are written."""
    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.run import main

    probe = Config()
    probe.model.scale = 1.0
    assert probe.exp_step_factor > 0 and probe.cascades == 2

    save = str(tmp_path / "run")
    metrics = main([
        "--save-dir", save,
        "--override", "dataset.name=RH2",
        "--override", f"rh2.dataset_dir={rh_root}",
        "--override", "model.scale=1.0",
        "--override", "training.max_steps=8",
        "--override", "training.max_time=1e9",
        "--override", "training.batch_size=256",
        "--override", "model.grid_size=32",
        "--override", "model.hash_levels=8",
        "--override", "model.hash_log2_T=15",
        "--override", "model.hash_max_res=128",
        "--override", "training.max_samples_per_ray=32",
        "--override", "training.march_candidates=512",
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
