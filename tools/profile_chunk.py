"""Per-op profile of the scan-fused train chunk on the bench config.

Warm up past the occupancy grid's steady state (~step 200), trace ONE
chunk with jax.profiler, and print device-op durations normalized to
ms/step.  This is the tool behind the step budgets in PERF_NOTES.md —
trust it for per-op costs; trust bench.py for end-to-end deltas (stubbing
pieces moves XLA fusion boundaries, see PERF_NOTES "measurement traps").

Usage:
    python tools/profile_chunk.py [--max-samples 128] [--samples-per-ray 32]
                                  [--chunk 24] [--top 45]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-samples", type=int, default=128,
                   help="march per-ray cap S")
    p.add_argument("--samples-per-ray", type=int, default=32,
                   help="compaction budget per ray (stream = batch * this)")
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--hash-levels", type=int, default=8)
    p.add_argument("--hash-feats", type=int, default=4)
    p.add_argument("--chunk", type=int, default=24)
    p.add_argument("--top", type=int, default=45)
    p.add_argument("--trace-dir", default="/tmp/jaxtrace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data import make_synthetic_dataset
    from virus_nerf_tpu.training import Trainer

    cfg = Config()
    cfg.model.grid_type = "occ"
    cfg.model.grid_size = 128
    cfg.model.hash_levels = args.hash_levels
    cfg.model.hash_features_per_level = args.hash_feats
    cfg.model.hash_log2_T = 19
    cfg.model.hash_max_res = 1024
    cfg.training.batch_size = args.batch_size
    cfg.training.max_samples_per_ray = args.max_samples
    cfg.training.march_candidates = 1024
    cfg.training.sample_budget = args.batch_size * args.samples_per_ray
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.training.sensors = ["USS", "ToF"]
    cfg.occ_grid.batch_size = 1024
    cfg.occ_grid.update_interval = 8

    dataset, scene, _ = make_synthetic_dataset(n_images=16, img_wh=(160, 120))
    trainer = Trainer(cfg, dataset, scene=scene)
    chunk = trainer._make_train_chunk(args.chunk)
    state = trainer.init_state()
    t0 = jnp.float32(0.0)

    # warmup to the grid's ~2.5% steady state (timing earlier measures the
    # dense transient, PERF_NOTES "steady-state sample statistics")
    for _ in range(max(1, 200 // args.chunk)):
        state, met = chunk(state, dataset, t0)
    float(met["loss"][-1])

    with jax.profiler.trace(args.trace_dir):
        state, met = chunk(state, dataset, t0)
        float(met["loss"][-1])
    print("trace done", flush=True)

    files = sorted(
        glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    dur = collections.Counter()
    meta = {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            dur[name] += e["dur"]
            a = e.get("args")
            if a:
                # merge: later events may carry hlo_category / long_name the
                # first one lacked (events without args would otherwise drop
                # the op from the category rollup)
                m = meta.setdefault(name, {})
                for k, v in a.items():
                    m.setdefault(k, v)
    total = sum(dur.values())
    print(f"config: S={args.max_samples} spr={args.samples_per_ray} "
          f"batch={args.batch_size} chunk={args.chunk}")
    print(f"{'ms/step':>9}  op")
    for name, d in dur.most_common(args.top):
        a = meta.get(name, {})
        # surface whatever source attribution the trace carries for fusions
        extra = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        cat = a.get("hlo_category") or ""
        line = f"{d / 1e3 / args.chunk:9.3f}  {name[:60]}"
        if cat:
            line += f"  [{cat}]"
        if extra:
            line += f"  {str(extra)[:160]}"
        print(line, flush=True)
    print(f"(sum of all events {total / 1e3 / args.chunk:.1f} ms/step — "
          f"includes host rows; read the top device ops, not the sum)")

    # category rollup over device-lane ops only (those with hlo_category):
    # the long tail below --top hides here
    by_cat = collections.Counter()
    n_cat = collections.Counter()
    for name, d in dur.items():
        cat = (meta.get(name) or {}).get("hlo_category")
        if cat:
            by_cat[cat] += d
            n_cat[cat] += 1
    dev_total = sum(by_cat.values())
    print(f"\ndevice ops by hlo_category ({dev_total / 1e3 / args.chunk:.1f} "
          f"ms/step total):")
    for cat, d in by_cat.most_common():
        print(f"{d / 1e3 / args.chunk:9.3f}  {n_cat[cat]:5d} distinct ops  "
              f"{cat}")


if __name__ == "__main__":
    main()
