"""Benchmark: steady-state training throughput (rays/sec) on one chip.

Mirrors the reference's headline budget: ETHZ camera+USS+ToF config
(batch 4096 rays, VIRUS occupancy grid updated every 8 steps, full-size
model — /root/reference/args/ethz_usstof_not_optimized_gpu.json), whose
500 steps / 45 s cap implies ~45.5k rays/s on the reference's CUDA GPU
(BASELINE.md).  Grid updates are included in the timing — this is the real
train-loop throughput, not a kernel microbenchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# implied reference throughput: 500 steps x 4096 rays / 45 s (BASELINE.md)
BASELINE_RAYS_PER_SEC = 500 * 4096 / 45.0


def main():
    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data import make_synthetic_dataset
    from virus_nerf_tpu.training import Trainer

    cfg = Config()
    cfg.model.grid_type = "occ"
    cfg.model.grid_size = 128
    cfg.model.hash_levels = 16
    cfg.model.hash_log2_T = 19
    cfg.model.hash_max_res = 1024
    cfg.training.batch_size = 4096
    cfg.training.max_samples_per_ray = 128
    cfg.training.march_candidates = 1024
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.training.sensors = ["USS", "ToF"]
    cfg.occ_grid.batch_size = 1024
    cfg.occ_grid.update_interval = 8

    dataset, scene, _ = make_synthetic_dataset(n_images=16, img_wh=(160, 120))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.init_state()

    train_step = trainer._get("train_step", trainer._make_train_step)
    occ_update = trainer._get("occ_update", trainer._make_occ_update)
    t0 = jnp.float32(0.0)

    # warmup: compile + let the occupancy grid reach steady-state sparsity
    warmup_steps = 120
    for step in range(warmup_steps):
        if step % cfg.occ_grid.update_interval == 0:
            state = occ_update(state, dataset, t0)
        state, metrics = train_step(state, dataset, t0)
    jax.block_until_ready(state.params)

    # timed run, grid updates included
    n_steps = 200
    tic = time.perf_counter()
    for step in range(n_steps):
        if step % cfg.occ_grid.update_interval == 0:
            state = occ_update(state, dataset, t0)
        state, metrics = train_step(state, dataset, t0)
    jax.block_until_ready(state.params)
    toc = time.perf_counter()

    rays_per_sec = n_steps * cfg.training.batch_size / (toc - tic)
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
