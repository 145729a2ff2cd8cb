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

from virus_nerf_tpu.configs.config import Config, load_config
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
    metrics = evaluator.evaluate(
        state.params, occ_bool, save_dir=save_dir
    )

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        trainer.save_checkpoint(state, os.path.join(save_dir, "model.npz"))
        trainer.save_logs(os.path.join(save_dir, "logs.csv"))
        cfg.save_json(os.path.join(save_dir, "hparams.json"))
        if plot if plot is not None else cfg.evaluation.plot_results:
            from virus_nerf_tpu.evaluation.plots import (
                plot_training_curves,
            )

            plot_training_curves(
                trainer.logs, os.path.join(save_dir, "curves.png")
            )
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="experiment JSON")
    p.add_argument("--save-dir", default=None)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else Config()
    if args.seed is not None:
        cfg.seed = args.seed
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
