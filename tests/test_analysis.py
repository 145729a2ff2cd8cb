"""Offline analysis plots (reference: plotting/ tree) against synthesized
experiment data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from virus_nerf_tpu.analysis import (  # noqa: E402
    load_experiment_csv,
    plot_angular_characterization,
    plot_calibration_error,
    plot_pointclouds,
    plot_sensor_comparison,
    plot_tilted_object,
)
from virus_nerf_tpu.analysis.uss_experiments import (  # noqa: E402
    correct_measurement,
    lin_interpolate,
)

SENSORS = ("HC-SR04", "URM37", "MB1603")
OBJECTS = ("large", "medium", "small")
SURFACES = ("cardboard", "plexiglas")


@pytest.fixture(scope="module")
def experiment_dir(tmp_path_factory):
    """Synthesize the reference's USS lab-experiment CSV layout
    (helpers/uss_experiments_fcts.py loadData): per-campaign folders,
    one file per sensor/object/surface, one column per (dist, angle)."""
    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("uss_exp")
    campaigns = {
        "firstMeasurement": (
            [0.25, 0.5, 1.0, 2.0],
            [-40, -30, -20, -10, 0, 10, 20, 30, 40],
            0.04,
        ),
        "secondMeasurement": ([0.25, 0.5, 1.0, 2.0], [0], 0.005),
        "thirdMeasurement": ([1.0, 2.0], [0, 22, 45, 67, 90], 0.005),
    }
    for cdir, (dists, angles, offset) in campaigns.items():
        d = root / cdir
        d.mkdir()
        for sensor in SENSORS:
            for obj in OBJECTS:
                for surf in SURFACES:
                    name = f"{sensor}_{obj}"
                    if surf == "plexiglas":
                        name += "_plex"
                    cols, vals = [], []
                    for dist in dists:
                        for ang in angles:
                            ds = "%g" % dist
                            cols.append(f"{ds}m_{int(ang)}deg")
                            # true distance + offset + small noise, worse
                            # off-axis (beam-pattern-like)
                            err = 0.002 * abs(ang) / 10.0
                            vals.append(
                                dist + offset
                                + err * rng.standard_normal(25)
                                + 0.001 * rng.standard_normal(25)
                            )
                    arr = np.stack(vals, axis=1)
                    with open(d / f"{name}.csv", "w") as f:
                        f.write(",".join(cols) + "\n")
                        for row in arr:
                            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    return str(root)


def test_load_and_correct(experiment_dir):
    data = load_experiment_csv(
        experiment_dir, "MB1603", "large", "cardboard", "second"
    )
    meas = data.get(1.0, 0)
    assert meas is not None and meas.size == 25
    corrected = correct_measurement(meas, first_meas=False)
    # offset removal recovers the true distance to noise accuracy
    assert abs(np.mean(corrected) - 1.0) < 0.01
    # plexiglas file name carries the _plex suffix
    dp = load_experiment_csv(
        experiment_dir, "MB1603", "large", "plexiglas", "second"
    )
    assert dp.get(2.0, 0) is not None


def test_lin_interpolate_invalid_spans():
    out = lin_interpolate([1.0, 0.0, 2.0], num_fills=4)
    assert out.shape == (8,)
    assert np.all(out[:4] == 0) and np.all(out[4:] == 0)
    out2 = lin_interpolate([1.0, 2.0], num_fills=5,
                           check_for_invalid_data=False)
    assert np.allclose(out2, np.linspace(1, 2, 5))


def test_uss_experiment_figures(experiment_dir, tmp_path):
    p1 = plot_angular_characterization(
        experiment_dir, "MB1603", str(tmp_path / "mb1603.png")
    )
    p2 = plot_sensor_comparison(
        experiment_dir, str(tmp_path / "all_sensors.png")
    )
    p3 = plot_tilted_object(
        experiment_dir, str(tmp_path / "tilted.png")
    )
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 10_000


def test_calibration_error_chart(tmp_path):
    p = plot_calibration_error(str(tmp_path / "calib.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 10_000
    # data-driven override
    p2 = plot_calibration_error(
        str(tmp_path / "calib2.png"),
        error_deg=[0, 1],
        mnn=[0.1, 0.2],
        convergence_s={"50%": [10, 20]},
    )
    assert os.path.exists(p2)


def test_pointcloud_map(tmp_path):
    from virus_nerf_tpu.data.pcl import save_pcd

    d = tmp_path / "run" / "nerf_pcl"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        save_pcd(str(d / f"{100 + i}.pcd"),
                 rng.standard_normal((500, 3)).astype(np.float32))
    p = plot_pointclouds(str(tmp_path / "run"))
    assert os.path.exists(p) and os.path.getsize(p) > 10_000
    with pytest.raises(FileNotFoundError):
        plot_pointclouds(str(tmp_path / "run"), pcl_subdir="missing")
