#!/bin/bash
# Real-training PSO pass, scaled to one chip (the reference's flagship
# 10-hour workflow, run_optimization.py:66-139, at fixture scale): every
# particle evaluation is a full 500-step train + evaluate on the on-disk
# ETHZ fixture, scored by the real mapping NND (NeRF nn_mean zone3).
#
# Two workers ALTERNATE as separate processes over the shared leased swarm
# state (MultiWorkerPSO) — exercising the claim/complete/lease protocol
# with real evaluations while respecting the one-TPU-process rule (two
# CONCURRENT processes would deadlock on the chip; over DCN with one chip
# per worker they would run truly in parallel).
#
# Structural hyper-parameters (occ_grid.update_interval, ToF.tof_pix_size)
# change compiled program shapes; the persistent XLA compile cache makes
# repeated values cheap, first-seen values pay one compile.
#
# Usage: tools/pso_real_run.sh [SAVE_DIR] [ROUNDS] [EVALS_PER_ROUND]
set -e
SAVE=${1:-results/pso_real}
ROUNDS=${2:-8}
PER=${3:-5}
FIXTURE=${FIXTURE:-/tmp/ethz_fixture_pso}

if [ ! -d "$FIXTURE" ]; then
    python tools/make_ethz_fixture.py --out "$FIXTURE" --n-images 60
fi

for i in $(seq 1 "$ROUNDS"); do
    W="w$((i % 2))"
    echo "=== round $i worker $W ==="
    python -m virus_nerf_tpu.run_optimization \
        --config /root/reference/args/ethz_usstof_not_optimized_gpu.json \
        --save-dir "$SAVE" \
        --worker-id "$W" --max-iters "$PER" --T 1e9 --lease-ttl 1200 \
        --hparams-lims tools/pso_real_lims.json \
        --override ethz.dataset_dir="$FIXTURE" \
        --override training.max_steps=500 \
        --override training.max_time=1e9 \
        --override evaluation.plot_results=false
done
echo "=== history ==="
tail -n +1 "$SAVE/pso_history.csv"
