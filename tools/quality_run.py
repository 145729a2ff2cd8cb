"""Quality-parity run: train the bench synthetic scene to convergence and
record PSNR/SSIM + zone NND (all three directions) next to the throughput
row in BASELINE.md.

Mirrors the reference's score definition (run_optimization.py:123-125:
mean NND of the NeRF scan, zone3) and its headline budget config
(ethz_usstof_not_optimized_gpu.json shapes).  Writes one JSON file; the
BASELINE.md table is updated by hand from it.

Usage:  python tools/quality_run.py [--steps 2000] [--out /tmp/quality.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out", default="/tmp/quality.json")
    p.add_argument("--eval-every", type=int, default=25)
    p.add_argument("--hash-variant", default="additive",
                   choices=["additive", "xor"],
                   help="additive-vs-XOR quality ablation knob")
    p.add_argument("--samples-per-ray", type=int, default=32,
                   help="compaction budget / ray (subsampling ablation: "
                        "32 vs 64 vs 128=exact)")
    p.add_argument("--max-samples", type=int, default=128,
                   help="march per-ray cap S (speed/quality ablation: "
                        "64 halves the heavy-tail rays' sample count)")
    p.add_argument("--march-resolution", type=int, default=1024,
                   help="marching quadrature dt = sqrt(3)/res (1024 = "
                        "reference parity; 512 doubles dt and halves "
                        "sample counts)")
    p.add_argument("--batch-size", type=int, default=4096,
                   help="rays per step (throughput-scaling ablation; "
                        "steps are scaled down to keep total rays fixed)")
    p.add_argument("--hash-levels", type=int, default=8,
                   help="hash-table layout A/B (roofline route 1): "
                        "levels x feats at fixed L*F keeps the embedding "
                        "width; fewer levels halve the gather count")
    p.add_argument("--hash-feats", type=int, default=4,
                   help="features per level (see --hash-levels)")
    p.add_argument("--hash-log2t", type=int, default=19,
                   help="log2 rows per hashed level (capacity knob for "
                        "layout A/Bs)")
    p.add_argument("--seed", type=int, default=21)
    p.add_argument("--save-renders", default=None, metavar="DIR",
                   help="export per-test-image rgb/depth pngs (reference: "
                        "training/trainer.py:358-370)")
    p.add_argument("--eval-occ", default="grid",
                   choices=["grid", "ones", "both"],
                   help="occupancy used for TEST rendering: the trained "
                        "grid (parity), all-ones (diagnostic A/B that "
                        "isolates grid-coverage holes from the color "
                        "path), or both (headline metrics from the grid + "
                        "a color-only A/B row)")
    p.add_argument("--force-full-hier", action="store_true",
                   help="disable march probe compaction (_FORCE_FULL_HIER "
                        "quality A/B validating _PROBE_BUDGET)")
    p.add_argument("--curve-every", type=int, default=0, metavar="STEPS",
                   help="time-to-quality mode: train in STEPS-sized "
                        "segments and record (step, cumulative train "
                        "seconds, NeRF nn_mean zone3) after each — eval "
                        "time excluded from the clock (reference budget "
                        "enforcement: training/trainer.py:95,159-160)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data import make_synthetic_dataset
    from virus_nerf_tpu.evaluation import Evaluator
    from virus_nerf_tpu.training import Trainer

    if args.force_full_hier:
        from virus_nerf_tpu.ops import ray_march as _rm

        _rm._FORCE_FULL_HIER = True

    cfg = Config()
    cfg.seed = args.seed
    cfg.model.hash_variant = args.hash_variant
    cfg.model.grid_type = "occ"
    cfg.model.grid_size = 128
    cfg.model.hash_levels = args.hash_levels
    cfg.model.hash_features_per_level = args.hash_feats
    cfg.model.hash_log2_T = args.hash_log2t
    cfg.model.hash_max_res = 1024
    cfg.training.batch_size = args.batch_size
    cfg.training.max_samples_per_ray = args.max_samples
    cfg.training.march_candidates = args.march_resolution
    cfg.training.march_resolution = args.march_resolution
    cfg.training.sample_budget = args.batch_size * args.samples_per_ray
    # larger batches train the same TOTAL rays in fewer steps so the
    # wall-clock-vs-quality comparison stays ray-for-ray fair
    cfg.training.max_steps = max(1, args.steps * 4096 // args.batch_size)
    cfg.training.max_time = 1e9
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.training.sensors = ["USS", "ToF"]
    cfg.occ_grid.batch_size = 1024
    cfg.occ_grid.update_interval = 8
    cfg.evaluation.eval_every_n_steps = args.eval_every
    cfg.evaluation.num_depth_pts_per_step = 0  # no mid-train eval: pure speed
    cfg.evaluation.res_angular = 512
    cfg.evaluation.res_map = 256
    cfg.evaluation.batch_size = 8192
    cfg.evaluation.max_samples_per_ray = 256

    # one pose orbit, every 3rd image held out for evaluation
    dataset, scene, info = make_synthetic_dataset(n_images=24, img_wh=(160, 120))
    sel_train = np.arange(24) % 3 != 0
    sel_test = ~sel_train

    def subset(ds, sel):
        idx = np.where(sel)[0]
        return ds._replace(
            poses=ds.poses[idx], cam_idx=ds.cam_idx[idx], rgbs=ds.rgbs[idx],
            depths={k: v[idx] for k, v in ds.depths.items()},
            times=ds.times[idx], sensor_ids=ds.sensor_ids[idx],
        )

    train_ds = subset(dataset, sel_train)
    test_ds = subset(dataset, sel_test)

    trainer = Trainer(cfg, train_ds, scene=scene, img_wh=info["img_wh"])
    ev = Evaluator(trainer.model, cfg, test_ds, scene, img_wh=info["img_wh"])
    curve = []
    if args.curve_every > 0:
        # segmented training: the train clock accumulates only training
        # wall time; evaluations between segments are off the clock.  The
        # first segment carries the one-time jit compile (reported so the
        # table can show compile-inclusive and exclusive numbers).
        total_steps = cfg.training.max_steps
        state = trainer.init_state()
        train_s = 0.0
        seg = max(1, args.curve_every * 4096 // args.batch_size)
        while int(state.step) < total_steps:
            cfg.training.max_steps = min(int(state.step) + seg, total_steps)
            tic = time.time()
            state = trainer.train(state)
            train_s += time.time() - tic
            m, _ = ev.evaluate_depth(
                state.params, state.grid.occ_bool,
                np.arange(test_ds.n_images), sensors=("GT", "NeRF"),
            )
            curve.append({
                "step": int(state.step),
                "train_seconds": round(train_s, 2),
                "nn_mean_zone3": float(m["NeRF"]["nn_mean"]["zone3"]),
            })
            print(json.dumps(curve[-1]), flush=True)
        cfg.training.max_steps = total_steps
        steps = int(state.step)
        rays_per_sec = steps * cfg.training.batch_size / train_s
    else:
        tic = time.time()
        state = trainer.train()
        train_s = time.time() - tic
        steps = int(state.step)
        rays_per_sec = steps * cfg.training.batch_size / train_s
    eval_occ = (
        jnp.ones_like(state.grid.occ_bool)
        if args.eval_occ == "ones"
        else state.grid.occ_bool
    )
    metrics = ev.evaluate(
        state.params, eval_occ,
        depth_img_idxs=np.arange(test_ds.n_images),
        sensors=("GT", "NeRF", "ToF", "USS"),
        save_dir=args.save_renders,
    )
    color_ones = None
    if args.eval_occ == "both":
        save2 = (
            os.path.join(args.save_renders, "renders_ones")
            if args.save_renders else None
        )
        color_ones = ev.evaluate_color(
            state.params, jnp.ones_like(state.grid.occ_bool),
            np.arange(test_ds.n_images), save_dir=save2,
        )

    out = {
        "hash_variant": args.hash_variant,
        "hash_levels": args.hash_levels,
        "hash_feats": args.hash_feats,
        "hash_log2t": args.hash_log2t,
        "samples_per_ray": args.samples_per_ray,
        "max_samples": args.max_samples,
        "march_resolution": args.march_resolution,
        "batch_size": args.batch_size,
        "seed": args.seed,
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "train_rays_per_sec": round(rays_per_sec, 1),
        "psnr": float(metrics["NeRF"]["psnr"]),
        "ssim": float(metrics["NeRF"]["ssim"]),
        "eval_occ": args.eval_occ,
        "force_full_hier": bool(args.force_full_hier),
    }
    if color_ones is not None:
        out["psnr_occ_ones"] = float(color_ones["psnr"])
        out["ssim_occ_ones"] = float(color_ones["ssim"])
    if curve:
        out["quality_curve"] = curve
    for sensor in ("NeRF", "ToF", "USS"):
        if sensor not in metrics:
            continue
        m = metrics[sensor]
        out[sensor] = {
            "nn_mean_zone3": float(m["nn_mean"]["zone3"]),
            "nn_median_zone3": float(m["nn_median"]["zone3"]),
            "nn_inlier_zone3": float(m["nn_inlier"]["zone3"]),
            "nn_mean_inv_zone3": float(m["nn_mean_inv"]["zone3"]),
            "nn_mean_inv_360_zone3": float(m["nn_mean_inv_360"]["zone3"]),
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
