"""Seeded ablation runs: ``python -m virus_nerf_tpu.run_ablation``.

Counterpart of the reference's run_ablation.py:12-68: N seeded runs into
``<base_dir>/seed_<k>``, restart-safe (completed seed directories are
skipped), stopping early when device memory runs low.
"""

from __future__ import annotations

import argparse
import os

from virus_nerf_tpu.configs.config import Config, load_config
from virus_nerf_tpu.data import make_dataset
from virus_nerf_tpu.run import train_and_evaluate
from virus_nerf_tpu.utils import check_device_memory


def run_ablation(
    cfg: Config,
    base_dir: str,
    num_trainings: int = 10,
    base_seed: int = 21,
):
    """Run the remaining seeds of an ablation
    (reference: run_ablation.py:19-65).  A seed directory containing
    ``metrics.csv`` counts as done."""
    os.makedirs(base_dir, exist_ok=True)

    # datasets built once, shared across seeds
    train = make_dataset(cfg, "train")
    test = make_dataset(cfg, "test", scene=train[1])

    done = 0
    for i in range(num_trainings):
        seed = base_seed + i
        save_dir = os.path.join(base_dir, f"seed_{seed}")
        if os.path.exists(os.path.join(save_dir, "metrics.csv")):
            done += 1
            continue
        run_cfg = cfg.replace(seed=seed)
        train_and_evaluate(
            run_cfg, datasets=(train, test), save_dir=save_dir
        )
        done += 1
        if check_device_memory():
            print("stopping ablation: device memory low")
            break
    return done


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None)
    p.add_argument("--base-dir", required=True)
    p.add_argument("--num-trainings", type=int, default=10)
    p.add_argument("--base-seed", type=int, default=21)
    args = p.parse_args(argv)
    cfg = load_config(args.config) if args.config else Config()
    n = run_ablation(cfg, args.base_dir, args.num_trainings, args.base_seed)
    print(f"ablation: {n}/{args.num_trainings} seeds complete")


if __name__ == "__main__":
    main()
