"""PSO result analysis plots.

Counterpart of the reference's offline PSO plotters
(reference: optimization/plotter_ethz.py, optimization/plotter_metric.py),
rebuilt on the new single-file state: everything is derived from the
``pso_history.csv`` written by :class:`PSOCheckpointed` (one row per
evaluation: iteration, particle, exploring flag, score, elapsed time, and
the denormalized hyper-parameter values).

All plots write files (Agg backend); nothing blocks on a GUI.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_history(save_dir: str) -> Dict[str, np.ndarray]:
    """Read ``pso_history.csv`` into arrays.

    Returns a dict with keys 'iteration', 'particle', 'exploring', 'score',
    'time' plus one entry per hyper-parameter column.
    """
    path = os.path.join(save_dir, "pso_history.csv")
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [r for r in reader if r]
    cols = {h: np.array([r[i] for r in rows], np.float64)
            for i, h in enumerate(header)}
    for k in ("iteration", "particle", "exploring"):
        cols[k] = cols[k].astype(np.int64)
    return cols


def hparam_names(history: Dict[str, np.ndarray]) -> List[str]:
    meta = {"iteration", "particle", "exploring", "score", "time"}
    return [k for k in history if k not in meta]


def plot_convergence(
    save_dir: str,
    out_path: Optional[str] = None,
    score_min: Optional[float] = None,
    score_max: Optional[float] = None,
) -> str:
    """Per-particle score traces + running global best vs evaluation count
    (reference: optimization/plotter_metric.py convergence view).

    ``score_min``/``score_max`` clamp the y-axis the way the reference's
    plot bounds do (optimization/plotter_ethz.py:16-17).
    """
    h = load_history(save_dir)
    out_path = out_path or os.path.join(save_dir, "pso_convergence.png")
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))

    for p in np.unique(h["particle"]):
        m = h["particle"] == p
        ax1.plot(h["iteration"][m], h["score"][m], marker=".", lw=0.8,
                 label=f"particle {p}")
    ax1.set_xlabel("evaluation")
    ax1.set_ylabel("score")
    ax1.set_title("per-particle score")
    ax1.legend(fontsize=7)

    order = np.argsort(h["iteration"])
    best = np.minimum.accumulate(h["score"][order])
    ax2.plot(h["iteration"][order], best, lw=1.5)
    ax2.set_xlabel("evaluation")
    ax2.set_ylabel("running best score")
    ax2.set_title("global best (lower is better)")
    for ax in (ax1, ax2):
        if score_min is not None or score_max is not None:
            ax.set_ylim(score_min, score_max)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_hparam_scores(
    save_dir: str,
    out_path: Optional[str] = None,
    params: Optional[Sequence[str]] = None,
    max_cols: int = 4,
) -> str:
    """Score vs each hyper-parameter, one panel per parameter — shows which
    regions of each axis the swarm found good
    (reference: optimization/plotter_ethz.py per-parameter panels)."""
    h = load_history(save_dir)
    names = list(params) if params else hparam_names(h)
    out_path = out_path or os.path.join(save_dir, "pso_hparam_scores.png")
    n = len(names)
    ncols = min(max_cols, max(n, 1))
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3.2 * ncols, 2.8 * nrows), squeeze=False
    )
    ibest = int(np.argmin(h["score"]))
    for i, name in enumerate(names):
        ax = axes[i // ncols][i % ncols]
        sc = ax.scatter(
            h[name], h["score"], c=h["iteration"], cmap="viridis", s=14
        )
        ax.scatter([h[name][ibest]], [h["score"][ibest]], marker="*",
                   s=120, color="red", zorder=3)
        ax.set_xlabel(name, fontsize=8)
        ax.set_ylabel("score", fontsize=8)
        ax.grid(alpha=0.3)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if n:
        fig.colorbar(sc, ax=axes.ravel().tolist(), label="evaluation",
                     shrink=0.7)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_hparam_trajectories(
    save_dir: str,
    out_path: Optional[str] = None,
    pairs: Optional[Sequence[Tuple[str, str]]] = None,
    max_pairs: int = 6,
) -> str:
    """2-D projections of the swarm's trajectory through hyper-parameter
    space, per-particle paths + score-colored points, best starred
    (reference: optimization/plotter_ethz.py trajectory slices)."""
    h = load_history(save_dir)
    names = hparam_names(h)
    if pairs is None:
        pairs = [
            (names[i], names[j])
            for i in range(len(names))
            for j in range(i + 1, len(names))
        ][:max_pairs]
    out_path = out_path or os.path.join(save_dir, "pso_trajectories.png")
    n = len(pairs)
    ncols = min(3, max(n, 1))
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3.6 * ncols, 3.2 * nrows), squeeze=False
    )
    ibest = int(np.argmin(h["score"]))
    for i, (a, b) in enumerate(pairs):
        ax = axes[i // ncols][i % ncols]
        for p in np.unique(h["particle"]):
            m = h["particle"] == p
            o = np.argsort(h["iteration"][m])
            ax.plot(h[a][m][o], h[b][m][o], lw=0.5, alpha=0.5)
        sc = ax.scatter(h[a], h[b], c=h["score"], cmap="plasma", s=14)
        ax.scatter([h[a][ibest]], [h[b][ibest]], marker="*", s=140,
                   color="lime", edgecolor="k", zorder=3)
        ax.set_xlabel(a, fontsize=8)
        ax.set_ylabel(b, fontsize=8)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if n:
        fig.colorbar(sc, ax=axes.ravel().tolist(), label="score",
                     shrink=0.7)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_all(save_dir: str, **kwargs) -> List[str]:
    """Write the full analysis suite next to the PSO state files."""
    return [
        plot_convergence(save_dir, **{
            k: v for k, v in kwargs.items()
            if k in ("score_min", "score_max")
        }),
        plot_hparam_scores(save_dir),
        plot_hparam_trajectories(save_dir),
    ]
