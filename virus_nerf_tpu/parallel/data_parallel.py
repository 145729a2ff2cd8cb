"""Ray-batch data parallelism over a TPU mesh.

The reference trains on exactly one GPU — no torch.distributed anywhere
(SURVEY.md §2.7).  The TPU framework scales the embarrassingly-parallel axis
(rays) across chips with ``shard_map`` over a 1-D mesh:

- model/optimizer/grid state is replicated,
- each device samples its own ray sub-batch (PRNG key folded with the mesh
  axis index),
- gradients are ``psum``-ed over ICI, the optimizer step is computed
  identically on every device, so replication is preserved by construction,
- the VIRUS occupancy-grid update runs with the *same* key on every device,
  which keeps the grid replicated without any collective (its Bayes
  scatter-add is deterministic).

This mirrors the plan in SURVEY.md §5.8: ICI for ray-parallel training, DCN
(process-level) for PSO population parallelism.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
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

from virus_nerf_tpu.data.dataset import DeviceDataset, sample_batch
from virus_nerf_tpu.models.renderer import render_rays
from virus_nerf_tpu.training.loss import compute_loss
from virus_nerf_tpu.training.trainer import Trainer, TrainState


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
    """Build a jitted data-parallel train step from a Trainer's config.

    The returned function has the same signature as the single-device step:
    ``(state, dataset, elapse_time) -> (state, metrics)`` with state and
    dataset replicated across the mesh.
    """
    cfg = trainer.cfg
    model = trainer.model
    optimizer = trainer.optimizer
    weights = trainer.loss_weights
    sensors = tuple(cfg.training.sensors)
    strategy = cfg.training.sampling_strategy
    n_dev = mesh.shape[axis]
    local_batch = cfg.training.batch_size // n_dev
    esf = cfg.exp_step_factor
    max_samples = cfg.training.max_samples_per_ray
    n_candidates = cfg.training.march_candidates
    use_time = cfg.training.real_time_simulation

    def dp_step(state: TrainState, dataset: DeviceDataset, elapse_time):
        idx = jax.lax.axis_index(axis)
        key, k_batch, k_render = jax.random.split(state.key, 3)
        k_batch = jax.random.fold_in(k_batch, idx)
        k_render = jax.random.fold_in(k_render, idx)

        batch = sample_batch(
            dataset, k_batch, local_batch, strategy,
            elapse_time=elapse_time if use_time else None,
        )

        def loss_fn(params):
            results = render_rays(
                model, params, state.grid.occ_bool,
                batch.rays_o, batch.rays_d, k_render,
                exp_step_factor=esf, max_samples=max_samples,
                n_candidates=n_candidates,
            )
            loss, loss_dict = compute_loss(results, batch, weights, sensors)
            return loss, loss_dict

        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # all-reduce gradients over ICI; every device then applies the same
        # update, preserving replication
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": jax.lax.pmean(loss, axis),
            **{f"loss_{k}": jax.lax.pmean(v, axis) for k, v in loss_dict.items()},
        }
        new_state = TrainState(
            params=params, opt_state=opt_state, grid=state.grid,
            key=key, step=state.step + 1, uss_stats=state.uss_stats,
        )
        return new_state, metrics

    mapped = _shard_map(
        dp_step, mesh, in_specs=(P(), P(), P()), out_specs=(P(), P())
    )
    return jax.jit(mapped)
