"""Train + evaluate one experiment: ``python -m virus_nerf_tpu.run``.

Counterpart of the reference's run.py:1-14, upgraded with a CLI (the
reference bakes the config file name into the script).  The config JSON
uses the reference schema — the reference's ``args/*.json`` files load
verbatim.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional, Tuple

import numpy as np

from virus_nerf_tpu.configs.config import (
    Config,
    apply_cli_overrides,
    load_config,
)
from virus_nerf_tpu.data import make_dataset
from virus_nerf_tpu.evaluation import Evaluator
from virus_nerf_tpu.training import Trainer


def train_and_evaluate(
    cfg: Config,
    datasets: Optional[Tuple] = None,
    save_dir: Optional[str] = None,
    plot: Optional[bool] = None,
) -> Dict[str, dict]:
    """Full experiment: build datasets (unless shared ones are passed),
    train, evaluate, and persist metrics/checkpoint/plots
    (reference: run.py:8-12 + training/trainer.py:167-224).

    Args:
        datasets: optional ((train_ds, scene, info), (test_ds, scene, info))
            to reuse across runs (reference: run_optimization.py:44-52).
    Returns:
        metrics dict keyed by sensor (evaluation layer contract).
    """
    if datasets is None:
        train = make_dataset(cfg, "train")
        test = make_dataset(cfg, "test", scene=train[1])
    else:
        train, test = datasets
    train_ds, scene, info = train
    test_ds, _, test_info = test

    trainer = Trainer(
        cfg, train_ds, test_dataset=test_ds, scene=scene,
        img_wh=test_info.get("img_wh"),
    )
    state = trainer.train()

    evaluator = Evaluator(
        trainer.model, cfg, test_ds, scene,
        img_wh=test_info.get("img_wh"),
    )
    occ_bool = state.grid.occ_bool
    do_plot = plot if plot is not None else cfg.evaluation.plot_results
    metrics = evaluator.evaluate(
        state.params, occ_bool, save_dir=save_dir, plot=bool(do_plot),
    )

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        trainer.save_checkpoint(state, os.path.join(save_dir, "model.npz"))
        trainer.save_logs(os.path.join(save_dir, "logs.csv"))
        cfg.save_json(os.path.join(save_dir, "hparams.json"))
        if do_plot:
            from virus_nerf_tpu.evaluation.plots import (
                plot_occ_grid_slice,
                plot_training_curves,
            )

            plot_training_curves(
                trainer.logs, os.path.join(save_dir, "curves.png")
            )
            if hasattr(state.grid, "occ_3d_grid"):
                from virus_nerf_tpu.grids.occupancy_grid import (
                    occ_grid_refresh_bitfield,
                )

                # the hot loop leaves the Morton bitfield stale; refresh
                # before plotting its round-trip check
                grid = occ_grid_refresh_bitfield(
                    state.grid, trainer.occ_hp
                )
                state = state._replace(grid=grid)
                gs = cfg.model.grid_size
                height_c = float(np.mean(np.asarray(train_ds.poses)[:, 2, 3]))
                h_idx = int(np.clip(
                    round((height_c + cfg.model.scale)
                          / (2 * cfg.model.scale) * (gs - 1)), 0, gs - 1,
                ))
                gt_slice = scene.get_slice_map(
                    float(scene.c2w(np.array([[0, 0, height_c]]))[0, 2]),
                    gs, cfg.evaluation.height_tolerance,
                    height_in_world_coord=True,
                )
                extent = scene.c2w(
                    np.array([[-cfg.model.scale, -cfg.model.scale],
                              [cfg.model.scale, cfg.model.scale]])
                ).T.flatten()
                plot_occ_grid_slice(
                    np.asarray(state.grid.occ_3d_grid), gs,
                    height_idx=h_idx, gt_slice=gt_slice,
                    path=os.path.join(save_dir, "occgrids", "occgrid.png"),
                    extent=extent,
                    bitfield=np.asarray(state.grid.bitfield),
                    occ_bool=np.asarray(state.grid.occ_bool),
                )
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="experiment JSON")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--override", action="append", default=[], metavar="GROUP.KEY=VALUE",
        help="config override, e.g. ethz.dataset_dir=/data/ethz "
             "(repeatable; values parsed as JSON when possible)",
    )
    args = p.parse_args(argv)

    # persistent compile cache: the scan-fused train chunk is a large XLA
    # program; repeated CLI runs (ablations, PSO particles) reuse the
    # serialized executable instead of recompiling for minutes
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    cfg = load_config(args.config) if args.config else Config()
    if args.seed is not None:
        cfg.seed = args.seed
    apply_cli_overrides(cfg, args.override)
    save_dir = args.save_dir or cfg.make_save_dir()
    metrics = train_and_evaluate(cfg, save_dir=save_dir)
    nerf = metrics.get("NeRF", {})
    mnn = nerf.get("nn_mean", {}).get("zone3", np.nan)
    print(
        f"evaluation: psnr={nerf.get('psnr', np.nan):.2f} | "
        f"ssim={nerf.get('ssim', np.nan):.3f} | depth_mnn={mnn:.3f}"
    )
    return metrics


if __name__ == "__main__":
    main()
