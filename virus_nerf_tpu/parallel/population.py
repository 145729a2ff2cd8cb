"""Population parallelism: evaluate a whole PSO swarm concurrently.

The reference evaluates one particle at a time — a full train+eval per PSO
step on the single GPU (run_optimization.py:105-127), 10 hours per room.
On TPU the swarm is embarrassingly parallel: every particle's training run
is an independent program, so with P devices (pod slice or the virtual CPU
mesh) all N particles of a batch-synchronous PSO iteration
(optimization/pso.py ask_all/tell_all) run AT THE SAME TIME, one device
each (SURVEY.md §5.8 — DCN-level population parallelism; within each
particle the ICI data-parallel chunk of data_parallel.py can still shard
rays, the two compose).

Mechanically: each particle gets its own Trainer (hyper-parameters patch
STATIC properties — sampling slot counts, update intervals — so particles
are distinct XLA programs, not a vmap), its dataset copy and program are
pinned to its device, and dispatches are ASYNCHRONOUS — the host launches
all N training scans before blocking on any result.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.ops.common import pallas_kernels

logger = logging.getLogger("virus_nerf_tpu")


def population_devices(n: Optional[int] = None) -> List[jax.Device]:
    """Devices for population parallelism — default platform, falling back
    to the virtual CPU mesh like parallel.make_mesh."""
    devices = jax.devices()
    if n is not None and len(devices) < n:
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []
        if len(cpus) >= n:
            devices = cpus
    return list(devices if n is None else devices[:n])


def make_population_eval(
    base_cfg: Config,
    space,
    datasets: Tuple,
    devices: Optional[Sequence[jax.Device]] = None,
    score_fn: Optional[Callable] = None,
) -> Callable[[np.ndarray], np.ndarray]:
    """Build the ``batch_eval`` hook of ``run_optimization(batch_mode)``.

    Args:
        base_cfg: experiment config; each particle patches it via
            ``apply_hparams`` (same rules as the serial path).
        space: ``HParamSpace`` mapping swarm positions to hparam groups.
        datasets: ((train_ds, scene, info), (test_ds, scene, info)) shared
            across particles (reference: run_optimization.py:44-52).
        devices: one per concurrent particle (cycled if the swarm is
            bigger).  Default: ``population_devices()``.
        score_fn: metrics -> float; default mapping score (mean NeRF NND,
            zone3 — run_optimization.py:123-125).
    Returns:
        batch_eval: (N, M) positions -> (N,) scores.
    """
    from virus_nerf_tpu.evaluation.evaluator import Evaluator
    from virus_nerf_tpu.optimization.runner import (
        apply_hparams,
        score_from_metrics,
    )
    from virus_nerf_tpu.training.trainer import Trainer

    if score_fn is None:
        score_fn = score_from_metrics
    train, test = datasets
    train_ds, scene, _ = train
    test_ds, _, test_info = test
    if devices is None:
        devices = population_devices()
    devices = list(devices)

    call_count = [0]

    def batch_eval(positions: np.ndarray) -> np.ndarray:
        n = positions.shape[0]
        call_count[0] += 1

        # setup: one Trainer + init + jitted chunk per particle, pinned to
        # its device
        parts = []
        for i in range(n):
            dev = devices[i % len(devices)]
            group_dict = space.to_group_dict(positions[i])
            cfg = apply_hparams(base_cfg, group_dict)
            cfg.seed = base_cfg.seed + 1000 * call_count[0] + i
            chunk_steps = max(
                1, min(cfg.training.max_steps,
                       cfg.evaluation.eval_every_n_steps)
            )
            n_chunks = -(-cfg.training.max_steps // chunk_steps)
            with jax.default_device(dev):
                ds_i = jax.device_put(train_ds, dev)
                trainer = Trainer(cfg, ds_i, scene=scene)
                state = trainer.init_state()
                jitted = jax.jit(trainer._make_chunk_body(chunk_steps))

                def chunk(*a, _f=jitted, _tpu=dev.platform == "tpu"):
                    # Pallas gate follows the particle's device platform,
                    # not jax.default_backend() (see ops/common.py)
                    with pallas_kernels(_tpu):
                        return _f(*a)
            parts.append(
                dict(dev=dev, trainer=trainer, ds=ds_i, state=state,
                     chunk=chunk, n_chunks=n_chunks, metrics=None)
            )

        # launch phase: dispatch chunk k of EVERY particle before chunk
        # k+1 of any — all dispatches are asynchronous, each device's queue
        # drains concurrently with the others; the host never blocks until
        # every particle's last chunk is in flight
        for k in range(max(p["n_chunks"] for p in parts)):
            for p in parts:
                if k >= p["n_chunks"]:
                    continue
                with jax.default_device(p["dev"]):
                    p["state"], p["metrics"] = p["chunk"](
                        p["state"], p["ds"], jnp.float32(0.0)
                    )

        # harvest phase: block on each device's result, then score
        scores = np.full(n, np.inf)
        for i, p in enumerate(parts):
            loss = float(p["metrics"]["loss"][-1])
            if not np.isfinite(loss):
                logger.warning(f"particle {i}: non-finite loss, score=inf")
                continue
            with jax.default_device(p["dev"]):
                ev = Evaluator(
                    p["trainer"].model, p["trainer"].cfg,
                    jax.device_put(test_ds, p["dev"]), scene,
                    img_wh=test_info.get("img_wh"),
                )
                metrics, _ = ev.evaluate_depth(
                    p["state"].params, p["state"].grid.occ_bool,
                    np.arange(test_ds.n_images),
                    sensors=("NeRF",),
                )
            scores[i] = score_fn(metrics)
        return scores

    return batch_eval
