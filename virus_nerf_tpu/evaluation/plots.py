"""Result plotting: occupancy-grid slices, scan maps, NND summaries, curves.

Counterpart of the reference TrainerPlot suite
(reference: training/trainer_plot.py:17-473) on matplotlib's Agg backend
(file output only — the framework never blocks on a GUI).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from virus_nerf_tpu.utils.helpers import combine_imgs  # noqa: E402


def plot_occ_grid_slice(
    occ_grid_cart: np.ndarray,
    grid_size: int,
    height_idx: Optional[int] = None,
    gt_slice: Optional[np.ndarray] = None,
    path: Optional[str] = None,
    threshold: float = 0.5,
):
    """Horizontal slice of the occupancy probability grid, optionally
    overlaid with the GT slice map
    (reference: training/trainer_plot.py:44-153)."""
    grid = np.asarray(occ_grid_cart).reshape(-1)[: grid_size**3]
    grid = grid.reshape(grid_size, grid_size, grid_size)
    h = grid_size // 2 if height_idx is None else height_idx
    sl = grid[:, :, h]

    fig, axes = plt.subplots(1, 2 if gt_slice is not None else 1,
                             figsize=(10, 5), squeeze=False)
    im = axes[0, 0].imshow(sl.T, origin="lower", vmin=0, vmax=1)
    axes[0, 0].set_title(f"occupancy grid slice z={h}")
    fig.colorbar(im, ax=axes[0, 0])
    if gt_slice is not None:
        occ_bin = sl > threshold
        gt = np.asarray(gt_slice) > 0.5
        # resize gt raster onto grid resolution by nearest sampling
        if gt.shape != occ_bin.shape:
            yi = (np.arange(grid_size) * gt.shape[0]) // grid_size
            xi = (np.arange(grid_size) * gt.shape[1]) // grid_size
            gt = gt[np.ix_(yi, xi)]
        overlay = combine_imgs([gt, occ_bin], ["grey", "red"])
        axes[0, 1].imshow(np.transpose(overlay, (1, 0, 2)), origin="lower")
        axes[0, 1].set_title("GT (grey) vs occupied (red)")
    fig.tight_layout()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=120)
    plt.close(fig)
    return sl


def plot_scan_maps(
    data_dict: Dict[str, dict],
    sensors: Sequence[str],
    path: Optional[str] = None,
    extent: Optional[Sequence[float]] = None,
):
    """Per-sensor 2-D scan point overlays vs the GT scan
    (reference: training/trainer_plot.py:155-298)."""
    n = len(sensors)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 5), squeeze=False)
    gt_pos = data_dict["GT"]["pos"]
    for i, sensor in enumerate(sensors):
        ax = axes[0, i]
        pos = data_dict[sensor]["pos"]
        ax.scatter(gt_pos[:, 0], gt_pos[:, 1], s=1, c="grey", label="GT")
        ax.scatter(pos[:, 0], pos[:, 1], s=1, c="red", label=sensor)
        ax.set_title(sensor)
        ax.set_aspect("equal")
        ax.legend(markerscale=8)
        if extent is not None:
            ax.set_xlim(extent[0], extent[1])
            ax.set_ylim(extent[2], extent[3])
    fig.tight_layout()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_nnd_summary(
    metrics_dict: Dict[str, dict],
    zones: Sequence[str] = ("zone1", "zone2", "zone3"),
    path: Optional[str] = None,
):
    """9-panel bar summary of the three NND directions per zone
    (reference: training/trainer_plot.py:300-394)."""
    directions = ["nn_mean", "nn_mean_inv", "nn_mean_inv_360"]
    titles = ["accuracy", "coverage (FoV)", "coverage (360°)"]
    sensors = [s for s in metrics_dict if "nn_mean" in metrics_dict[s]]
    fig, axes = plt.subplots(
        len(zones), len(directions),
        figsize=(4 * len(directions), 3 * len(zones)), squeeze=False,
    )
    for zi, zone in enumerate(zones):
        for di, (d, t) in enumerate(zip(directions, titles)):
            ax = axes[zi, di]
            vals = [metrics_dict[s][d].get(zone, np.nan) for s in sensors]
            ax.bar(sensors, vals)
            ax.set_title(f"{t} — {zone}")
            ax.set_ylabel("mean NND [m]")
    fig.tight_layout()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_training_curves(
    logs: Dict[str, list], path: Optional[str] = None
):
    """Loss / PSNR / mnn training curves
    (reference: training/trainer_plot.py:396-472)."""
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    steps = logs.get("step", range(len(logs.get("loss", []))))
    for ax, key, label in zip(
        axes, ("loss", "psnr", "mnn"), ("loss", "PSNR [dB]", "mean NND [m]")
    ):
        vals = np.asarray(logs.get(key, []), float)
        ax.plot(list(steps)[: len(vals)], vals)
        ax.set_xlabel("step")
        ax.set_ylabel(label)
        if key == "loss" and np.all(np.asarray(vals)[np.isfinite(vals)] > 0):
            ax.set_yscale("log")
    fig.tight_layout()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=120)
    plt.close(fig)
