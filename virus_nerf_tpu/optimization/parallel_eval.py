"""Population-parallel PSO evaluation: the whole swarm in ONE SPMD program.

The reference evaluates PSO particles strictly sequentially — one full
training run per particle per iteration (reference:
run_optimization.py:105-125), with ``watch_optimization.py`` merely
relaunching the same sequential loop after a crash.  On TPU the natural
shape is data parallelism over the POPULATION: continuous hyper-parameters
(the sensor-fusion loss weights) enter the jitted train loop as traced
scalars, so the swarm evaluates as one ``vmap``-over-particles program
whose particle axis is sharded across the device mesh — N tiny training
runs, one dispatch, each device training its own particle concurrently.

Structural hyper-parameters (occ-grid update interval, ToF pixel size,
pixel-sampling proportions) change program *shapes*, so they cannot ride
the vmap axis; sweeps over those run one process per device group over DCN
instead — the ``PSOWrapper``'s atomic-JSON state makes every worker
independently resumable (optimization/pso.py).

Feed the returned callable to ``run_optimization(..., batch_eval=...)``
(optimization/runner.py) to drive the batch-synchronous swarm.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_WEIGHT_FIELDS = ("color", "rgbd", "tof", "uss")


def make_population_eval(
    trainer,
    dataset,
    *,
    steps: int = 32,
    mesh: Optional[Mesh] = None,
    weight_fields: Sequence[str] = _WEIGHT_FIELDS,
    score_key: str = "loss",
    score_tail: int = 8,
):
    """Build a ``batch_eval`` callable: (N, M) positions -> (N,) scores.

    Each particle's position vector holds values for ``weight_fields`` of
    the trainer's :class:`~virus_nerf_tpu.training.loss.LossWeights` (in
    order; extra columns are ignored).  Every particle trains ``steps``
    steps from its own seeded init inside a single jitted program; its
    score is the mean of the last ``score_tail`` per-step ``score_key``
    metrics (lower is better, matching the PSO's minimization).

    Args:
        trainer: a :class:`~virus_nerf_tpu.training.Trainer` whose config
            defines the (tiny) per-particle training run.
        dataset: the shared :class:`DeviceDataset` (built once for the
            whole swarm, reference run_optimization.py:44-52).
        steps: train steps per particle per evaluation.
        mesh: optional device mesh.  1-D: the particle axis is sharded
            over its first axis so devices train particles concurrently.
            2-D ``(pop, data)``: the particle axis is sharded over the
            first (pop) axis AND each particle's training run is itself
            ray-batch data-parallel over the second (data) axis — the
            whole swarm runs as ONE SPMD program over ``pop * data``
            chips, composing the Trainer's own data-parallel body
            (psum-ed grads / grid evidence over the data axis, see
            parallel/data_parallel.py) under a vmap over local particles.
            With ``None`` the vmap still batches all particles in one
            program on the default device.
        weight_fields: LossWeights fields taken from position columns.
        score_key: per-step metric to average ("loss", "depth_loss", ...).
        score_tail: how many trailing steps the score averages over.
    """
    base_weights = trainer.loss_weights
    n_fields = len(weight_fields)

    def _make_run_one(axis_name=None, n_shards=1):
        def run_one(position, seed):
            # rebuild the chunk body under per-particle traced loss
            # weights; `distortion` stays a static python float (it gates
            # `need_ws` branch structure at trace time, trainer.py loss_fn)
            replace = {
                f: position[i] for i, f in enumerate(weight_fields)
            }
            trainer.loss_weights = base_weights._replace(**replace)
            try:
                chunk = trainer._make_chunk_body(
                    steps, axis_name=axis_name, n_shards=n_shards
                )
                init = trainer._get("init_state", trainer._make_init_state)
                state = init(seed)
                state, metrics = chunk(state, dataset, jnp.float32(0.0))
            finally:
                trainer.loss_weights = base_weights
            tail = metrics[score_key][-min(score_tail, steps):]
            return jnp.mean(tail)

        return run_one

    if mesh is not None and len(mesh.axis_names) >= 2:
        # 2-D (pop, data) mesh: shard_map over BOTH axes; each device
        # holds its pop-block of particles (replicated along data), vmaps
        # over them, and the Trainer's own data-parallel body binds its
        # psums to the data axis — particle states stay replicated across
        # the data axis by construction, so out_specs=P(pop) is exact.
        from virus_nerf_tpu.parallel.data_parallel import _shard_map

        pop_ax, data_ax = mesh.axis_names[0], mesh.axis_names[1]
        n_data = mesh.shape[data_ax]
        inner = jax.vmap(
            _make_run_one(axis_name=data_ax, n_shards=n_data),
            in_axes=(0, 0),
        )
        fn = jax.jit(_shard_map(
            inner, mesh,
            in_specs=(PartitionSpec(pop_ax), PartitionSpec(pop_ax)),
            out_specs=PartitionSpec(pop_ax),
        ))
        n_dev = mesh.shape[pop_ax]
    elif mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, PartitionSpec(axis))
        fn = jax.jit(
            jax.vmap(_make_run_one(), in_axes=(0, 0)),
            in_shardings=(shard, shard),
            out_shardings=shard,
        )
        n_dev = int(np.prod(mesh.devices.shape))
    else:
        fn = jax.jit(jax.vmap(_make_run_one(), in_axes=(0, 0)))
        n_dev = 1

    # Pallas gate follows the mesh's platform, not jax.default_backend()
    # (the TPU plugin stays registered when evaluating on the CPU mesh)
    from virus_nerf_tpu.ops.common import pallas_kernels

    mesh_on_tpu = (
        mesh.devices.flat[0].platform == "tpu"
        if mesh is not None
        else jax.default_backend() == "tpu"
    )

    def batch_eval(positions: np.ndarray) -> np.ndarray:
        positions = np.asarray(positions, np.float32)
        if positions.ndim != 2 or positions.shape[1] < n_fields:
            raise ValueError(
                f"positions must be (N, >={n_fields}), "
                f"got {positions.shape}"
            )
        n = positions.shape[0]
        pad = (-n) % n_dev
        if pad:
            positions = np.concatenate(
                [positions, np.repeat(positions[-1:], pad, axis=0)]
            )
        seeds = jnp.arange(positions.shape[0], dtype=jnp.int32)
        with pallas_kernels(mesh_on_tpu):
            scores = np.asarray(fn(jnp.asarray(positions), seeds))
        return scores[:n].astype(np.float64)

    return batch_eval
