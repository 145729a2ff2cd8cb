"""Trainer: the jitted train step + host orchestration loop.

Counterpart of the reference Trainer/TrainerBase
(reference: training/trainer.py:29-165, training/trainer_base.py:18-322),
redesigned functionally: all mutable state lives in one ``TrainState``
pytree; the hot path (batch sampling -> occupancy-guided render -> fused
loss -> Adam update) is a single jitted pure function; the occupancy-grid
update is a second jitted function invoked every ``grid_update_interval``
steps (reference: training/trainer.py:106-120).  No GradScaler is needed —
compute stays f32/bf16 with f32 accumulation instead of fp16+loss-scaling.
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from virus_nerf_tpu.configs.config import Config
from virus_nerf_tpu.data.dataset import Batch, DeviceDataset, sample_batch
from virus_nerf_tpu.data.scene import Scene
from virus_nerf_tpu.data.uss_stats import uss_stats_init, uss_stats_update
from virus_nerf_tpu.grids.ngp_grid import NGPGridState, ngp_grid_init, ngp_grid_update
from virus_nerf_tpu.grids.occupancy_grid import (
    OccGridHParams,
    OccGridState,
    occ_grid_init,
    occ_grid_update,
)
from virus_nerf_tpu.models.ngp import NGPModel
from virus_nerf_tpu.models.renderer import render_rays
from virus_nerf_tpu.ops.common import MAX_SAMPLES
from virus_nerf_tpu.ops.fused_adam import fused_adam
from virus_nerf_tpu.training.loss import LossWeights, compute_loss
from virus_nerf_tpu.utils.logging import make_logger

logger = logging.getLogger("virus_nerf_tpu")


class TrainState(NamedTuple):
    params: Any  # NGPParams
    opt_state: Any
    grid: Any  # OccGridState | NGPGridState
    key: jax.Array
    step: jax.Array  # () int32
    # running per-image USS minimum-depth tracker, present iff the sampling
    # strategy uses 'closest' (reference: datasets/sensor_uss.py:113-217)
    uss_stats: Any = None


class Trainer:
    """Host-side orchestration around the jitted step functions."""

    def __init__(
        self,
        cfg: Config,
        train_dataset: DeviceDataset,
        test_dataset: Optional[DeviceDataset] = None,
        scene: Optional[Scene] = None,
        img_wh: Optional[tuple] = None,
    ):
        self.cfg = cfg
        self.train_dataset = train_dataset
        self.test_dataset = test_dataset
        self.scene = scene
        self.img_wh = img_wh
        self.logger = make_logger(cfg)
        self._evaluator = None
        self._eval_rng = np.random.default_rng(cfg.seed)

        self.model = NGPModel(
            scale=cfg.model.scale,
            pos_encoder_type=cfg.model.encoder_type,
            hash_variant=cfg.model.hash_variant,
            levels=cfg.model.hash_levels,
            feature_per_level=cfg.model.hash_features_per_level,
            log2_T=cfg.model.hash_log2_T,
            base_res=cfg.model.hash_base_res,
            max_res=cfg.model.hash_max_res,
            xyz_net_width=cfg.model.xyz_net_width,
            xyz_net_depth=cfg.model.xyz_net_depth,
            xyz_net_out_dim=cfg.model.xyz_net_out_dim,
            rgb_net_width=cfg.model.rgb_net_width,
            rgb_net_depth=cfg.model.rgb_net_depth,
            grid_size=cfg.model.grid_size,
            compute_dtype=cfg.model.dtype,
        )

        # metric->cube conversions (reference: training/loss.py:29,
        # modules/occupancy_grid.py:55-58)
        w2c_scale = scene.w2c(1.0, only_scale=True) if scene is not None else 1.0
        self.loss_weights = LossWeights(
            color=cfg.training.color_loss_w,
            rgbd=cfg.training.rgbd_loss_w,
            tof=cfg.training.tof_loss_w,
            uss=cfg.training.uss_loss_w,
            uss_depth_tol=float(0.03 * w2c_scale),
            distortion=cfg.training.distortion_loss_w,
        )
        self.occ_hp = OccGridHParams(
            grid_size=cfg.model.grid_size,
            scale=cfg.model.scale,
            false_detection_prob_every_m=float(
                cfg.occ_grid.false_detection_prob_every_m / w2c_scale
            ),
            std_every_m=float(cfg.occ_grid.std_every_m * w2c_scale),
            nerf_pos_noise_every_m=float(
                cfg.occ_grid.nerf_pos_noise_every_m * w2c_scale
            ),
            nerf_threshold_max=cfg.occ_grid.nerf_threshold_max,
            nerf_threshold_slope=cfg.occ_grid.nerf_threshold_slope,
            decay_warmup_steps=cfg.occ_grid.decay_warmup_steps,
            update_interval=cfg.occ_grid.update_interval,
        )
        # reference: training/trainer_base.py:84-90
        self.grid_update_interval = (
            cfg.occ_grid.update_interval
            if cfg.model.grid_type == "occ"
            else cfg.ngp_grid.update_interval
        )

        # fused_adam == optax.adam(lr, eps) semantics; the big-leaf update
        # runs as one Pallas pass on TPU (reference uses torch Adam with
        # eps=1e-15, training/trainer.py:49-57)
        self.optimizer = fused_adam(cfg.training.lr, eps=1e-15)

        if cfg.training.debug_mode:
            self._debug_validate_dataset()
        self.logs: Dict[str, list] = {
            "time": [], "step": [], "loss": [], "color_loss": [],
            "depth_loss": [], "psnr": [], "mnn": [],
        }
        self._compiled = {}

    # ------------------------------------------------------------------ init
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        """Jitted as one function of the seed — eager op-by-op init costs a
        compile round trip per op on a remote-tunnel TPU backend."""
        init = self._get("init_state", self._make_init_state)
        return init(
            jnp.int32(self.cfg.seed if seed is None else seed)
        )

    def _make_init_state(self):
        model = self.model
        optimizer = self.optimizer
        grid_type = self.cfg.model.grid_type
        occ_hp = self.occ_hp

        uses_closest = self._uses_closest()
        n_imgs = self.train_dataset.n_images
        center_pix = (
            int(np.asarray(
                self.train_dataset.uss_mask_idx[
                    self.train_dataset.uss_mask_idx.shape[0] // 2
                ]
            ))
            if uses_closest
            else 0
        )

        @jax.jit
        def init(seed) -> TrainState:
            key = jax.random.PRNGKey(seed)
            k_model, k_grid, k_state = jax.random.split(key, 3)
            params = model.init(k_model)
            if grid_type == "occ":
                grid = occ_grid_init(k_grid, occ_hp)
            else:
                grid = ngp_grid_init(model.cascades, model.grid_size)
            opt_state = optimizer.init(params)
            return TrainState(
                params=params, opt_state=opt_state, grid=grid, key=k_state,
                step=jnp.int32(0),
                uss_stats=(
                    uss_stats_init(n_imgs, center_pix)
                    if uses_closest
                    else None
                ),
            )

        return init

    def _uses_closest(self) -> bool:
        pixs = self.cfg.training.sampling_strategy.get("pixs", "random")
        if isinstance(pixs, str):
            return pixs == "closest"
        return "closest" in pixs

    # ------------------------------------------------------------- train step
    def _make_train_body(self, axis_name: Optional[str] = None,
                         n_shards: int = 1):
        """The unjitted single-step body, shared by the per-step jit, the
        scan-fused multi-step loop, and the data-parallel shard_map.

        Under ``axis_name`` (inside shard_map over an ``n_shards``-device
        mesh) each device samples its own ``batch_size/n_shards`` rays with
        an axis-index-folded key, gradients/metrics are all-reduced over ICI,
        and the (replicated) optimizer step preserves replication by
        construction — the TPU-native shape of data parallelism for the
        reference's single-GPU loop (SURVEY.md §5.8)."""
        cfg = self.cfg
        model = self.model
        optimizer = self.optimizer
        weights = self.loss_weights
        sensors = tuple(cfg.training.sensors)
        strategy = cfg.training.sampling_strategy
        assert cfg.training.batch_size % n_shards == 0
        batch_size = cfg.training.batch_size // n_shards
        esf = cfg.exp_step_factor
        max_samples = cfg.training.max_samples_per_ray
        n_candidates = cfg.training.march_candidates
        march_resolution = cfg.training.march_resolution
        sample_budget = cfg.training.sample_budget
        if sample_budget is None:
            # framework default ("auto"): for constant-dt configs
            # (exp_step_factor == 0) compact the (batch, S) layout to 32
            # samples/ray before the model runs — the exact no-compaction
            # anchor lands inside the spr=32 seed band on every metric
            # (BASELINE.md knob table), and uncompacted dense layouts cost
            # up to S/32 x in encoder gathers.  Exponential-stepping
            # configs (scale > 0.5) stay DENSE by default: their rays carry
            # ~100+ lattice samples and cutting them measurably
            # redistributes mapping accuracy (RH2 sweep, BASELINE.md round
            # 5 — zone2 degrades ~1.6-1.9x while zone3 improves, at 2-4x
            # speed).  sample_budget is the explicit speed knob either way;
            # 0 opts out of compaction entirely.
            if esf == 0.0:
                sample_budget = cfg.training.batch_size * min(32, max_samples)
            else:
                sample_budget = 0
        if sample_budget <= 0:
            sample_budget = None
        else:
            sample_budget = max(1, sample_budget // n_shards)
        use_time = cfg.training.real_time_simulation

        uses_closest = self._uses_closest()

        def train_step(state: TrainState, dataset: DeviceDataset, elapse_time):
            key, k_batch, k_render = jax.random.split(state.key, 3)
            if axis_name is not None:
                idx = jax.lax.axis_index(axis_name)
                k_batch = jax.random.fold_in(k_batch, idx)
                k_render = jax.random.fold_in(k_render, idx)
            batch = sample_batch(
                dataset, k_batch, batch_size, strategy,
                elapse_time=elapse_time if use_time else None,
                uss_stats_pix=(
                    state.uss_stats.min_pix if uses_closest else None
                ),
            )

            def loss_fn(params):
                results = render_rays(
                    model, params, state.grid.occ_bool,
                    batch.rays_o, batch.rays_d, k_render,
                    exp_step_factor=esf, max_samples=max_samples,
                    n_candidates=n_candidates, sample_budget=sample_budget,
                    march_resolution=march_resolution,
                    need_ws=weights.distortion > 0.0,
                )
                loss, loss_dict = compute_loss(results, batch, weights, sensors)
                return loss, (loss_dict, results)

            (loss, (loss_dict, results)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if axis_name is not None:
                # all-reduce gradients over ICI; every device then applies
                # the same update, preserving replication
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = optimizer.update(grads, state.opt_state)
            params = optax.apply_updates(state.params, updates)

            metrics = {
                "loss": loss,
                **{f"loss_{k}": v for k, v in loss_dict.items()},
                "psnr": -10.0 * jnp.log10(
                    jnp.mean((results["rgb"] - batch.rgb) ** 2)
                ),
                "rm_samples": results["rm_samples"],
                "vr_samples": results["vr_samples"],
                "overflow": results.get("overflow", jnp.int32(0)),
            }
            if axis_name is not None:
                metrics = {
                    k: (
                        jax.lax.psum(v, axis_name)
                        if k in ("rm_samples", "vr_samples", "overflow")
                        else jax.lax.pmean(v, axis_name)
                    )
                    for k, v in metrics.items()
                }
            uss_stats = state.uss_stats
            if uses_closest:
                uss_mask = (
                    jnp.zeros((dataset.n_pixels,), bool)
                    .at[dataset.uss_mask_idx]
                    .set(True)
                )
                img_idxs, pix_idxs, depths = (
                    batch.img_idxs, batch.pix_idxs, results["depth"],
                )
                if axis_name is not None:
                    # gather the full batch (a few KB) so every device folds
                    # identical values -> uss_stats stays replicated
                    img_idxs = jax.lax.all_gather(
                        img_idxs, axis_name, tiled=True
                    )
                    pix_idxs = jax.lax.all_gather(
                        pix_idxs, axis_name, tiled=True
                    )
                    depths = jax.lax.all_gather(depths, axis_name, tiled=True)
                uss_stats = uss_stats_update(
                    uss_stats, img_idxs, pix_idxs, depths, uss_mask,
                )
            return (
                TrainState(
                    params=params, opt_state=opt_state, grid=state.grid,
                    key=key, step=state.step + 1, uss_stats=uss_stats,
                ),
                metrics,
            )

        return train_step

    def _make_train_step(self):
        return jax.jit(self._make_train_body())

    # ------------------------------------------------------------ grid update
    def _make_occ_update(self):
        return jax.jit(self._make_occ_body())

    def _make_occ_body(self, axis_name: Optional[str] = None,
                       n_shards: int = 1):
        """Under ``axis_name`` each device samples a 1/n_shards shard of the
        update batches and the log-odds evidence is psum-ed over ICI before
        one replicated application (occupancy_grid.occ_grid_delta)."""
        cfg = self.cfg
        model = self.model
        hp = self.occ_hp
        sensors = cfg.training.sensors
        b = cfg.occ_grid.batch_size
        b_ray = int(b * cfg.occ_grid.batch_ratio_ray_update)
        b_nerf = b - b_ray
        b_ray = max(1, b_ray // n_shards)
        b_nerf = max(1, b_nerf // n_shards)
        use_time = cfg.training.real_time_simulation

        # sensor cascade RGBD -> ToF/USS
        # (reference: modules/occupancy_grid.py:107-180)
        if "RGBD" in sensors:
            ray_sel, nerf_sel = ("random", "RGBD"), ("random", "RGBD")
        elif "ToF" in sensors and "USS" in sensors:
            ray_sel, nerf_sel = ("valid_tof", "ToF"), ("valid_uss", "USS")
        elif "ToF" in sensors:
            ray_sel, nerf_sel = ("valid_tof", "ToF"), ("valid_tof", "ToF")
        elif "USS" in sensors:
            ray_sel, nerf_sel = ("valid_uss", "USS"), ("valid_uss", "USS")
        else:
            raise ValueError("occupancy grid needs at least one depth sensor")

        def occ_update(state: TrainState, dataset: DeviceDataset, elapse_time):
            key, k1, k2, k3 = jax.random.split(state.key, 4)
            if axis_name is not None:
                idx = jax.lax.axis_index(axis_name)
                k1 = jax.random.fold_in(k1, idx)
                k2 = jax.random.fold_in(k2, idx)
                k3 = jax.random.fold_in(k3, idx)
            et = elapse_time if use_time else None
            ray_b = sample_batch(
                dataset, k1, b_ray, {"imgs": "all", "pixs": ray_sel[0]}, et
            )
            nerf_b = sample_batch(
                dataset, k2, b_nerf, {"imgs": "all", "pixs": nerf_sel[0]}, et
            )
            density_fn = lambda x: model.density(state.params, x)
            grid = occ_grid_update(
                state.grid, hp, density_fn, k3,
                ray_batch={
                    "rays_o": ray_b.rays_o, "rays_d": ray_b.rays_d,
                    "meas": ray_b.depths[ray_sel[1]],
                },
                nerf_batch={
                    "rays_o": nerf_b.rays_o, "rays_d": nerf_b.rays_d,
                    "meas": nerf_b.depths[nerf_sel[1]],
                },
                axis_name=axis_name,
            )
            return state._replace(grid=grid, key=key)

        return occ_update

    def _make_ngp_body(self, warmup: bool):
        """Unjitted NGP grid-update body (reference: modules/ngp_grid.py
        :110-152).  The bitfield stays stale in-train (lazy Morton rebuild,
        same design as the VIRUS grid) — refresh via
        ``ngp_grid_refresh_bitfield`` at export time."""
        model = self.model
        density_threshold = 0.01 * MAX_SAMPLES / 3**0.5
        # reference: training/trainer.py:110

        def ngp_update(state: TrainState, dataset: DeviceDataset, elapse_time):
            key, k = jax.random.split(state.key)
            density_fn = lambda x: model.density(state.params, x)
            grid = ngp_grid_update(
                state.grid, density_fn, k, warmup=warmup,
                density_threshold=density_threshold,
                cascades=model.cascades, grid_size=model.grid_size,
                scale=model.scale, rebuild_bitfield=False,
            )
            return state._replace(grid=grid, key=key)

        return ngp_update

    def _make_ngp_update(self, warmup: bool):
        return jax.jit(self._make_ngp_body(warmup))

    def _make_train_chunk(self, chunk_steps: int,
                          entry_step_aligned: bool = True):
        """Fuse ``chunk_steps`` train steps (with the occupancy-grid update
        folded in as a ``lax.cond`` on ``step % update_interval``, per the
        plan in SURVEY.md §7) into ONE jitted dispatch via ``lax.scan``.

        This is the TPU-native shape of the reference's Python train loop
        (training/trainer.py:95-160): a single device program per chunk
        instead of per step, which removes all per-step host round trips —
        decisive on a remote-tunnel backend where every dispatch pays
        per-buffer HTTP latency.  Both grid types fuse: the VIRUS grid
        always, the NGP grid post-warmup (its warmup pass evaluates every
        cell — different shapes — and stays on the per-step path).
        """
        return jax.jit(
            self._make_chunk_body(chunk_steps,
                                  entry_step_aligned=entry_step_aligned)
        )

    def _make_chunk_body(self, chunk_steps: int,
                         axis_name: Optional[str] = None, n_shards: int = 1,
                         entry_step_aligned: bool = True):
        """Unjitted chunk body (scan of cond-grid-update + train step) —
        jitted directly for single-chip, or wrapped in shard_map over the
        data-parallel mesh (parallel/data_parallel.py), so the multi-chip
        path runs the IDENTICAL training semantics plus ICI collectives."""
        train_body = self._make_train_body(axis_name, n_shards)
        if self.cfg.model.grid_type == "occ":
            occ_body = self._make_occ_body(axis_name, n_shards)
        else:
            # post-warmup NGP update: static shapes, fuses like the VIRUS
            # grid (warmup stays on the per-step path — see train())
            occ_body = self._make_ngp_body(warmup=False)
        interval = self.grid_update_interval
        # When the chunk is a whole number of update intervals AND the host
        # loop keeps chunk entry steps interval-aligned (it does: training
        # starts at step 0 and advances by chunk_steps per dispatch), every
        # grid-update position is known at trace time — scan over
        # interval-sized groups with the update hoisted to the group head.
        # This removes the per-step lax.cond, whose untaken branch forces
        # XLA to thread (copy) the multi-megabyte grid state through every
        # step (measured ~11 ms/step for the march/grid cond pair,
        # tools/PERF_NOTES.md).  Callers resuming from a state whose step is
        # NOT a multiple of the interval must pass
        # ``entry_step_aligned=False`` to keep the general cond path.
        aligned = entry_step_aligned and chunk_steps % interval == 0

        def train_chunk(state: TrainState, dataset: DeviceDataset, elapse_time):
            # a scalar elapse_time is frozen for the whole chunk; the host
            # loop passes a (chunk_steps,) vector extrapolated from the
            # measured per-step duration so real_time_simulation advances
            # within the fused chunk
            ets = jnp.broadcast_to(
                jnp.asarray(elapse_time, jnp.float32), (chunk_steps,)
            )

            if aligned:
                def group(state, ets_group):
                    state = occ_body(state, dataset, ets_group[0])
                    return jax.lax.scan(
                        lambda s, et: train_body(s, dataset, et),
                        state, ets_group,
                    )

                state, metrics = jax.lax.scan(
                    group, state, ets.reshape(-1, interval)
                )
                metrics = jax.tree.map(
                    lambda x: x.reshape((chunk_steps,) + x.shape[2:]),
                    metrics,
                )
                return state, metrics

            def body(state, et):
                state = jax.lax.cond(
                    state.step % interval == 0,
                    lambda s: occ_body(s, dataset, et),
                    lambda s: s,
                    state,
                )
                return train_body(state, dataset, et)

            state, metrics = jax.lax.scan(body, state, ets)
            return state, metrics  # metrics stacked over the chunk

        return train_chunk

    def _get(self, name, factory):
        if name not in self._compiled:
            self._compiled[name] = factory()
        return self._compiled[name]

    # ------------------------------------------------------------------ train
    def train(self, state: Optional[TrainState] = None) -> TrainState:
        """Run the training loop (reference: training/trainer.py:87-165):
        stops at max_steps or max_time, grid update every
        grid_update_interval steps, periodic logging."""
        cfg = self.cfg
        if state is None:
            state = self.init_state()

        self.logger.info("----- START TRAINING -----")
        tic = time.time()

        if cfg.model.grid_type == "occ":
            state, steps_done = self._train_fused(state, tic)
        else:
            # NGP grid: per-step only while the warmup pass (full-grid
            # evaluation, different shapes) can still fire; once past the
            # first interval-aligned post-warmup step, the same scan-fused
            # chunk loop as the occ grid takes over (VERDICT r2 item 8)
            interval = self.grid_update_interval
            w = cfg.ngp_grid.warmup_steps
            switch = min(cfg.training.max_steps, -(-w // interval) * interval)
            state, steps_done = self._train_stepwise(state, tic, until=switch)
            if (
                steps_done < cfg.training.max_steps
                and time.time() - tic <= cfg.training.max_time
            ):
                state, steps_done = self._train_fused(state, tic)

        jax.block_until_ready(state.params)
        self.logger.info(
            f"----- FINISHED TRAINING ----- {time.time() - tic:.2f}s, "
            f"iter: {steps_done}"
        )
        return state

    def _train_fused(self, state: TrainState, tic: float):
        """Scan-fused loop: one device dispatch per
        ``eval_every_n_steps``-sized chunk (grid updates inside).  All
        per-step metrics of the chunk are logged (the scan already returns
        them stacked); once per chunk an intermediate depth evaluation on
        test images fills the ``mnn`` column
        (reference: training/trainer.py:274-302)."""
        cfg = self.cfg
        start0 = int(state.step)
        chunk = max(1, min(cfg.evaluation.eval_every_n_steps,
                           cfg.training.max_steps - start0))
        # round the chunk DOWN to a whole number of grid-update intervals
        # when possible: the cond-free grouped chunk body needs it (and the
        # host loop then keeps every chunk entry step aligned)
        interval = self.grid_update_interval
        entry_aligned = start0 % interval == 0
        if entry_aligned and chunk >= interval:
            chunk -= chunk % interval
        def get_chunk(n):
            return self._get(
                f"train_chunk_{n}_{entry_aligned}",
                partial(self._make_train_chunk, n,
                        entry_step_aligned=entry_aligned),
            )

        step = start0
        profiled = False
        dt_est = 0.0  # measured per-step duration for real_time_simulation
        # Pure-speed path (no per-chunk depth eval, no debug invariants):
        # stack the chunk metrics into ONE device array (a single host
        # fetch instead of one ~RTT round trip per metric leaf — the axon
        # tunnel's RTT is ~tens of ms) and drain it one chunk LATE, so the
        # fetch and the host-side logging overlap the next chunk's device
        # execution instead of serializing with it.  debug_mode and
        # intermediate evaluation need the metrics/state of the chunk just
        # run, so those paths stay synchronous.
        pipelined = (
            int(cfg.evaluation.num_depth_pts_per_step) <= 0
            and not cfg.training.debug_mode
        )
        pending = None  # (first_step, keys, stacked_dev, n, chunk_tic)

        def drain(p):
            nonlocal dt_est
            p_step, keys, stacked, n, p_tic = p
            vals = np.asarray(stacked)  # ONE transfer for all metrics
            m = {k: vals[i] for i, k in enumerate(keys)}
            if p_step > start0:  # first chunk's wall time is compile-bound
                dt_est = max(time.time() - p_tic, 0.0) / n
            mnn = self._intermediate_eval(state, time.time() - tic)
            self._log_chunk(p_step, m, tic, mnn)
            return m

        while step < cfg.training.max_steps:
            # a shorter tail chunk lands exactly on max_steps (the rounded
            # main chunk need not divide it); full-chunk entry alignment is
            # preserved because the tail only ever runs last
            this_chunk = min(chunk, cfg.training.max_steps - step)
            train_chunk = get_chunk(this_chunk)
            ets = jnp.asarray(
                time.time() - tic + dt_est * np.arange(this_chunk),
                jnp.float32,
            )
            if cfg.training.profile_dir and not profiled and step > 0:
                # profile the second chunk (first is compile + warmup)
                if pending is not None:
                    drain(pending)
                    pending = None
                with jax.profiler.trace(cfg.training.profile_dir):
                    state, metrics = train_chunk(
                        state, self.train_dataset, ets
                    )
                    jax.block_until_ready(state.params)
                profiled = True
                step += this_chunk
                continue
            chunk_tic = time.time()
            state, metrics = train_chunk(state, self.train_dataset, ets)
            keys = list(metrics)
            stacked = jnp.stack(  # dispatched async, fetched at drain time
                [metrics[k].astype(jnp.float32) for k in keys]
            )
            cur = (step, keys, stacked, this_chunk, chunk_tic)
            if pipelined:
                if pending is not None:
                    drain(pending)
                pending = cur
            else:
                m = drain(cur)
                if cfg.training.debug_mode:
                    self._debug_check_state(
                        state, {k: float(v[-1]) for k, v in m.items()},
                        step + this_chunk,
                    )
            step += this_chunk
            if time.time() - tic > cfg.training.max_time:
                self.logger.info(f"max_time reached at step {step}")
                break
        if pending is not None:
            drain(pending)
        return state, step

    # ------------------------------------------------------------ debug mode
    def _debug_check_state(self, state: TrainState, m: Dict[str, float],
                           step: int):
        """debug_mode invariant net — the TPU shape of the reference's
        pervasive debug assertions (NaN probability checks,
        modules/occupancy_grid.py:424-426; bitfield round-trip,
        training/trainer_plot.py:74-86; ray norms,
        datasets/dataset_base.py:236-241).  Fetches a handful of scalars
        per logged chunk; raises on violation."""
        if not np.isfinite(m["loss"]):
            raise FloatingPointError(f"debug_mode: non-finite loss at {step}")
        if not bool(jnp.all(jnp.isfinite(state.params.pos_table))):
            raise FloatingPointError(
                f"debug_mode: non-finite hash table at {step}"
            )
        if hasattr(state.grid, "occ_3d_grid"):
            g = state.grid.occ_3d_grid
            lo, hi = float(jnp.min(g)), float(jnp.max(g))
            if not (0.0 <= lo and hi <= 1.0):
                raise FloatingPointError(
                    f"debug_mode: occupancy probs out of [0,1] at {step}: "
                    f"[{lo}, {hi}]"
                )
            # bitfield consistency: occ_bool must be the thresholding of
            # the probability grid
            mismatch = int(
                jnp.sum(state.grid.occ_bool.reshape(-1)
                        != (g.reshape(-1) > self.occ_hp.threshold))
            )
            if mismatch:
                raise AssertionError(
                    f"debug_mode: occ_bool/prob mismatch at {step}: "
                    f"{mismatch} cells"
                )

    def _debug_validate_dataset(self):
        """Ray directions rotate to unit world rays (reference ray-norm
        check, datasets/dataset_base.py:236-241)."""
        d = np.asarray(self.train_dataset.directions)
        norms = np.linalg.norm(d, axis=-1)
        if not np.allclose(norms, 1.0, atol=1e-4):
            raise AssertionError(
                "debug_mode: camera direction table not unit-norm "
                f"(range [{norms.min()}, {norms.max()}])"
            )

    def _train_stepwise(self, state: TrainState, tic: float,
                        until: Optional[int] = None):
        """Per-step loop for the NGP grid warmup phase (its warmup pass
        changes shapes, reference: modules/ngp_grid.py:36-64).  ``until``
        bounds the stepwise phase; train() then continues on the fused
        chunk loop."""
        cfg = self.cfg
        end = (
            cfg.training.max_steps
            if until is None
            else min(until, cfg.training.max_steps)
        )
        train_step = self._get("train_step", self._make_train_step)
        start = int(state.step)
        step = start - 1
        for step in range(start, end):
            elapse = jnp.float32(time.time() - tic)
            if step % self.grid_update_interval == 0:
                warmup = step < cfg.ngp_grid.warmup_steps
                upd = self._get(
                    f"ngp_update_{warmup}",
                    partial(self._make_ngp_update, warmup),
                )
                state = upd(state, self.train_dataset, elapse)
            state, metrics = train_step(state, self.train_dataset, elapse)
            mnn = (
                self._intermediate_eval(state, time.time() - tic)
                if step % cfg.evaluation.eval_every_n_steps == 0
                else np.nan
            )
            self._log_chunk(
                step,
                {k: np.asarray([v], np.float64) for k, v in metrics.items()},
                tic, mnn,
                quiet=step % cfg.evaluation.eval_every_n_steps != 0,
            )
            if time.time() - tic > cfg.training.max_time:
                self.logger.info(f"max_time reached at step {step}")
                break
        return state, step + 1

    # ------------------------------------------------------------- logging
    def _get_evaluator(self):
        if self._evaluator is None:
            from virus_nerf_tpu.evaluation.evaluator import Evaluator

            self._evaluator = Evaluator(
                self.model, self.cfg, self.test_dataset, self.scene,
                img_wh=self.img_wh,
            )
        return self._evaluator

    def _intermediate_eval(self, state: TrainState, elapse: float) -> float:
        """Periodic depth evaluation during training
        (reference: training/trainer.py:274-302): render 360° scans for
        ``num_depth_pts_per_step`` random test images and return the NeRF
        mean NND in zone3 (the ``mnn`` log column).  NaN without a test
        set."""
        if self.test_dataset is None or self.scene is None:
            return float("nan")
        n_pts = int(self.cfg.evaluation.num_depth_pts_per_step)
        if n_pts <= 0:
            return float("nan")
        idxs = np.arange(self.test_dataset.n_images)
        if self.cfg.training.real_time_simulation:
            t = np.asarray(self.test_dataset.times)
            seen = idxs[t <= elapse]
            if seen.size:
                idxs = seen
        sel = self._eval_rng.choice(idxs, size=min(n_pts, idxs.size),
                                    replace=True)
        ev = self._get_evaluator()
        metrics, _ = ev.evaluate_depth(
            state.params, state.grid.occ_bool, sel, sensors=("NeRF",),
        )
        return float(metrics["NeRF"]["nn_mean"]["zone3"])

    def _log_chunk(self, first_step: int, m: Dict[str, np.ndarray],
                   tic: float, mnn: float = np.nan, quiet: bool = False):
        """Append one logs row PER STEP of the chunk (logs.csv row count ==
        steps, reference: training/trainer.py:246-268); ``mnn`` lands on the
        chunk's last row as in the reference (logs['mnn'][-1])."""
        n = len(m["loss"])
        now = time.time() - tic
        nans = np.full(n, np.nan)
        for j in range(n):
            self.logs["time"].append(now)
            self.logs["step"].append(first_step + j)
            self.logs["loss"].append(float(m["loss"][j]))
            self.logs["color_loss"].append(
                float(m.get("loss_color", nans)[j])
            )
            self.logs["depth_loss"].append(
                float(m.get("loss_depth", nans)[j])
            )
            self.logs["psnr"].append(float(m["psnr"][j]))
            self.logs["mnn"].append(mnn if j == n - 1 else np.nan)
        if not quiet:
            last = {k: float(v[-1]) for k, v in m.items()}
            self.logger.info(
                f"step {first_step + n - 1:5d} | loss {last['loss']:.4f} | "
                f"psnr {last['psnr']:.2f} | mnn {mnn:.3f} | "
                f"rm {int(last['rm_samples'])} | "
                f"vr {int(last['vr_samples'])}"
            )

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, state: TrainState, path: str):
        """Save full train state (model + optimizer + grid + step) — richer
        than the reference's weights-only torch.save
        (training/trainer_base.py:155-168).  Leaves are keyed by their tree
        path so a load against a drifted config fails loudly instead of
        deserializing into the wrong leaves."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat, treedef = jax.tree_util.tree_flatten_with_path(state)
        arrays = {
            f"leaf{i}:{jax.tree_util.keystr(p)}": np.asarray(x)
            for i, (p, x) in enumerate(flat)
        }
        np.savez(path, __treedef__=np.asarray(str(treedef)), **arrays)
        with open(path + ".json", "w") as f:
            json.dump(self.cfg.to_dict(), f, indent=2)

    def load_checkpoint(self, path: str, template: TrainState) -> TrainState:
        """Load a checkpoint, validating the stored tree structure and every
        leaf's path/shape/dtype against ``template`` (built from the current
        config) — a config drift between save and load raises ValueError
        instead of silently loading into the wrong leaves."""
        data = np.load(path, allow_pickle=False)
        flat_t, treedef_p = jax.tree_util.tree_flatten_with_path(template)
        treedef = jax.tree_util.tree_structure(template)

        if "__treedef__" in data.files:
            stored_td = str(data["__treedef__"])
            if stored_td != str(treedef_p):
                raise ValueError(
                    f"checkpoint treedef mismatch (config drift?):\n"
                    f"  stored: {stored_td}\n  expected: {treedef_p}"
                )
            leaves = []
            for i, (p, t) in enumerate(flat_t):
                key = f"leaf{i}:{jax.tree_util.keystr(p)}"
                if key not in data.files:
                    raise ValueError(
                        f"checkpoint missing leaf {key} (config drift?)"
                    )
                a = data[key]
                if tuple(a.shape) != tuple(jnp.shape(t)):
                    raise ValueError(
                        f"checkpoint leaf {key}: shape {a.shape} != "
                        f"expected {jnp.shape(t)} (config drift?)"
                    )
                leaves.append(jnp.asarray(a, dtype=jnp.asarray(t).dtype))
            return jax.tree_util.tree_unflatten(treedef, leaves)

        # legacy arr_N layout (pre round-3): positional, but the stored
        # treedef string still catches structural drift
        if "treedef" in data.files and str(data["treedef"]) != str(treedef):
            raise ValueError(
                "legacy checkpoint treedef mismatch (config drift?)"
            )
        flat = [data[f"arr_{i}"] for i in range(len(data.files) - 1)]
        if len(flat) != len(flat_t):
            raise ValueError(
                f"legacy checkpoint has {len(flat)} leaves, expected "
                f"{len(flat_t)}"
            )
        for (p, t), a in zip(flat_t, flat):
            if tuple(a.shape) != tuple(jnp.shape(t)):
                raise ValueError(
                    f"legacy checkpoint leaf {jax.tree_util.keystr(p)}: "
                    f"shape {a.shape} != expected {jnp.shape(t)}"
                )
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in flat]
        )

    def save_logs(self, path: str):
        """logs.csv parity (reference: training/trainer_base.py:170-181)."""
        import csv

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            keys = list(self.logs.keys())
            w.writerow(keys)
            for row in zip(*[self.logs[k] for k in keys]):
                w.writerow(row)
