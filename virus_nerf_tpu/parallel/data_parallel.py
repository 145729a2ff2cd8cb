"""Ray-batch data parallelism over a TPU mesh.

The reference trains on exactly one GPU — no torch.distributed anywhere
(SURVEY.md §2.7).  The TPU framework scales the embarrassingly-parallel axis
(rays) across chips with ``shard_map`` over a 1-D mesh:

- model/optimizer/grid state is replicated,
- each device samples its own ray sub-batch (PRNG key folded with the mesh
  axis index),
- gradients are ``psum``-ed over ICI, the optimizer step is computed
  identically on every device, so replication is preserved by construction,
- the VIRUS occupancy-grid update is sharded too: each device computes the
  log-odds evidence of its shard of the update rays, evidence is psum-ed
  over ICI, and the Bayes application runs replicated,
- the running USS min-depth tracker folds the all-gathered batch, so the
  'closest' sampling strategy sees identical stats on every device.

All of it is the Trainer's OWN step/chunk code (trainer._make_chunk_body)
with an ``axis_name`` threaded through — the multi-chip path cannot drift
from single-chip semantics.  This mirrors the plan in SURVEY.md §5.8: ICI
for ray-parallel training, DCN (process-level) for PSO population
parallelism.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P


def _shard_map(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions (>=0.8 keyword-only API without
    check_rep; older experimental API with check_rep)."""
    try:
        from jax import shard_map as sm  # jax >= 0.8

        return sm(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as sm

        return sm(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )

from virus_nerf_tpu.ops.common import pallas_kernels
from virus_nerf_tpu.training.trainer import Trainer, TrainState  # noqa: F401


def _jit_for_mesh(mapped, mesh: Mesh):
    """jit a shard_mapped body with the Pallas gate pinned to the MESH's
    platform — `jax.default_backend()` still says "tpu" when the TPU plugin
    is registered but the mesh is the virtual CPU one (dryrun_multichip)."""
    jitted = jax.jit(mapped)
    on_tpu = mesh.devices.flat[0].platform == "tpu"

    def call(*args):
        with pallas_kernels(on_tpu):
            return jitted(*args)

    return call


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "data",
    platform: Optional[str] = None,
) -> Mesh:
    """Build a 1-D device mesh.

    When the default platform has too few devices (e.g. one real TPU chip
    behind a tunnel) but a virtual CPU mesh is available
    (``--xla_force_host_platform_device_count=N``), fall back to the CPU
    devices — this is how the driver validates the multi-chip path.
    """
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices and platform is None:
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= n_devices:
                devices = cpus
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def make_dp_train_step(trainer: Trainer, mesh: Mesh, axis: str = "data"):
    """Build a jitted data-parallel train step from a Trainer.

    The returned function has the same signature as the single-device step:
    ``(state, dataset, elapse_time) -> (state, metrics)`` with state and
    dataset replicated across the mesh.  The body is the Trainer's OWN
    train body (sampling, render, loss, uss_stats) with ``axis_name`` wired
    through — identical semantics to single-chip plus ICI collectives.
    """
    n_dev = mesh.shape[axis]
    body = trainer._make_train_body(axis_name=axis, n_shards=n_dev)
    mapped = _shard_map(
        body, mesh, in_specs=(P(), P(), P()), out_specs=(P(), P())
    )
    return _jit_for_mesh(mapped, mesh)


def make_dp_occ_update(trainer: Trainer, mesh: Mesh, axis: str = "data"):
    """Data-parallel VIRUS occupancy-grid update: each device computes the
    log-odds evidence of its shard of the update batches; evidence is
    psum-ed over ICI; the Bayes application/decay/bitfield rebuild runs
    replicated (grids/occupancy_grid.py occ_grid_delta)."""
    n_dev = mesh.shape[axis]
    body = trainer._make_occ_body(axis_name=axis, n_shards=n_dev)
    mapped = _shard_map(
        body, mesh, in_specs=(P(), P(), P()), out_specs=P()
    )
    return _jit_for_mesh(mapped, mesh)


def make_dp_train_chunk(
    trainer: Trainer, mesh: Mesh, chunk_steps: int, axis: str = "data",
    entry_step_aligned: bool = True,
):
    """The full data-parallel training chunk: ``chunk_steps`` scan-fused
    train steps with the occupancy-grid update folded in every
    ``update_interval`` steps — the multi-chip twin of
    ``Trainer._make_train_chunk`` (one device program per dispatch, grid
    and uss_stats updates INCLUDED, state replicated across the mesh).

    When ``chunk_steps`` is a whole number of update intervals the body
    compiles the cond-free grouped scan (see ``Trainer._make_chunk_body``);
    pass ``entry_step_aligned=False`` when resuming from a state whose step
    is not a multiple of the interval."""
    n_dev = mesh.shape[axis]
    body = trainer._make_chunk_body(chunk_steps, axis_name=axis,
                                    n_shards=n_dev,
                                    entry_step_aligned=entry_step_aligned)
    mapped = _shard_map(
        body, mesh, in_specs=(P(), P(), P()), out_specs=(P(), P())
    )
    return _jit_for_mesh(mapped, mesh)
