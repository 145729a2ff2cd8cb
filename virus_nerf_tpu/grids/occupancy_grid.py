"""The VIRUS occupancy grid: Bayesian sensor-fused probability grid.

Reference: modules/occupancy_grid.py:12-496 — the core novelty of VIRUS-NeRF.
The grid holds per-cell occupancy probabilities updated from two sources:

- **Depth-Update**: an explicit probabilistic sensor model of USS/ToF/RGBD
  range measurements (constant false-positive density + distance-proportional
  Gaussian around the measurement, with "not-detected-earlier" survival terms
  integrated numerically, floors at ``prob_min``),
- **NeRF-Update**: rendered density converted to occupancy probability via a
  log-space sigmoid around an adaptive threshold,

followed by a Bayes posterior update, a warmup decay toward 0.5, and a
bitfield rebuild.

TPU-native redesign: the state is an immutable pytree and the whole update is
one pure jitted function.  The per-cell Bayes posterior
``p' = p*Po / (p*Po + (1-p)*Pe)`` is applied in log-odds space as
``logit(p') = logit(p) + log(Po/Pe)`` — algebraically identical per update,
but it turns the scatter into a deterministic segment-sum so duplicate cell
indices within a batch fuse multiplicatively instead of racing (the reference
relies on last-write-wins scatter semantics, modules/occupancy_grid.py:428-430).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.grids.base import bitfield_from_grid


class OccGridHParams(NamedTuple):
    """Static hyper-parameters (all distances in cube units — the trainer
    converts the per-meter config values via ``scene.w2c``, reference:
    modules/occupancy_grid.py:55-58)."""

    grid_size: int
    scale: float
    M: int = 32  # cells sampled along each ray
    I: int = 32  # integration points of the survival term
    prob_min: float = 0.03
    false_detection_prob_every_m: float = 0.3
    std_every_m: float = 0.2
    nerf_pos_noise_every_m: float = 0.2
    nerf_threshold_max: float = 5.91
    nerf_threshold_slope: float = 0.01
    decay_warmup_steps: int = 80
    update_interval: int = 8
    threshold: float = 0.5
    occ_init_max: float = 0.51

    @property
    def grid_decay(self) -> float:
        """Warmup decay per update, floored to 3 decimals
        (reference: modules/occupancy_grid.py:50-52)."""
        if self.decay_warmup_steps <= 0:
            return 1.0  # decay never applied
        decay_num_steps = self.decay_warmup_steps / self.update_interval
        d = (self.threshold / self.occ_init_max) ** (1.0 / decay_num_steps)
        return float(np.floor(d * 1000.0) / 1000.0)

    @property
    def cell_size(self) -> float:
        return 2.0 * self.scale / self.grid_size


class OccGridState(NamedTuple):
    occ_3d_grid: jax.Array  # (gs, gs, gs) f32 occupancy probabilities
    occ_bool: jax.Array  # (1, gs^3) bool for the ray march
    bitfield: jax.Array  # (gs^3 / 8,) uint8, Morton order
    update_step: jax.Array  # () int32


def occ_grid_init(key, hp: OccGridHParams) -> OccGridState:
    """Init probabilities uniformly in (threshold, occ_init_max] so every
    cell starts marchable (reference: modules/occupancy_grid.py:38-42)."""
    gs = hp.grid_size
    u = jax.random.uniform(key, (gs, gs, gs), jnp.float32)
    grid = hp.threshold + (hp.occ_init_max - hp.threshold) * u
    flat = grid.reshape(1, -1)
    return OccGridState(
        occ_3d_grid=grid,
        occ_bool=flat > hp.threshold,
        bitfield=bitfield_from_grid(flat, hp.threshold, gs),
        update_step=jnp.int32(0),
    )


def dist_to_cube_border(rays_o, rays_d, cube_min: float, cube_max: float):
    """Distance along each (unit) ray to the cube boundary
    (reference: helpers/geometric_fcts.py:151-171)."""
    pos_d = (cube_max - rays_o) / rays_d
    neg_d = (cube_min - rays_o) / rays_d
    dists = jnp.where(rays_d > 0, pos_d, jnp.where(rays_d < 0, neg_d, jnp.inf))
    return jnp.min(dists, axis=-1)


def _c2idx(pos, hp: OccGridHParams):
    """Cube coords -> grid indices, round-to-nearest convention
    (reference: modules/occupancy_grid.py:467-480)."""
    idx = (hp.grid_size - 1) * (pos + hp.scale) / (2.0 * hp.scale)
    return jnp.clip(jnp.round(idx).astype(jnp.int32), 0, hp.grid_size - 1)


def _cell_positions(rays_o, rays_d, hp: OccGridHParams, noise=None):
    """Sample M cells equidistantly from each origin to the cube border
    (reference: modules/occupancy_grid.py:292-335).

    Returns cell_dists (N, M), cell_pos (N, M, 3), cell_idxs (N, M, 3).
    """
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    border = dist_to_cube_border(rays_o, rays_d, -hp.scale, hp.scale)  # (N,)
    steps = jnp.linspace(0.0, 1.0, hp.M)  # (M,)
    cell_dists = steps[None, :] * border[:, None]  # (N, M)
    cell_pos = rays_o[:, None, :] + rays_d[:, None, :] * cell_dists[..., None]
    if noise is not None:
        cell_pos = cell_pos + hp.nerf_pos_noise_every_m * cell_dists[..., None] * noise
    cell_idxs = _c2idx(cell_pos, hp)
    return cell_dists, cell_pos, cell_idxs


def _sensor_occupied_pdf(meas, dists, hp: OccGridHParams):
    """P[meas = dist | cell occupied]: Gaussian around the measurement with
    distance-proportional sigma (reference: modules/occupancy_grid.py:448-465)."""
    stds = hp.std_every_m * dists + 1e-5
    return jnp.exp(-0.5 * (meas - dists) ** 2 / stds**2)


def ray_measurement_probs(meas, dists, hp: OccGridHParams):
    """Sensor model: P[meas@dist | occ] and P[meas@dist | emp]
    (reference: modules/occupancy_grid.py:337-389).

    Args:
        meas: (N,) measured distances (cube units).
        dists: (N, M) cell distances along each ray.
    Returns:
        probs_occ, probs_emp: (N, M).
    """
    probs_equal_emp = jnp.full_like(dists, hp.false_detection_prob_every_m)
    probs_equal_occ = probs_equal_emp + _sensor_occupied_pdf(
        meas[:, None], dists, hp
    )

    probs_notless_emp = jnp.maximum(1.0 - probs_equal_emp * dists, hp.prob_min)

    # survival integral over y in [0, meas] with I points
    y = jnp.linspace(0.0, 1.0, hp.I)[None, :] * meas[:, None]  # (N, I)
    integrand = _sensor_occupied_pdf(y[:, None, :], dists[:, :, None], hp)
    integral = jnp.sum(integrand, axis=2) * (meas / hp.I)[:, None]  # (N, M)
    probs_notless_occ = jnp.maximum(probs_notless_emp - integral, hp.prob_min)

    probs_emp = probs_equal_emp * probs_notless_emp
    probs_occ = probs_equal_occ * probs_notless_occ
    return probs_occ, probs_emp


def nerf_density_probs(density, hp: OccGridHParams, mean_density=None):
    """Convert rendered density to occupancy probability via a log-space
    sigmoid around an adaptive threshold
    (reference: modules/occupancy_grid.py:391-408, including its
    ``h_thr = -log(threshold)`` convention).  ``mean_density`` overrides the
    batch mean (used for the globally-pmeaned threshold under DP)."""
    if mean_density is None:
        mean_density = jnp.mean(density)
    threshold_nerf = jnp.minimum(hp.nerf_threshold_max, mean_density)
    h_thr = -jnp.log(threshold_nerf)
    h = jnp.log(density)
    probs_occ = jax.nn.sigmoid(hp.nerf_threshold_slope * (h - h_thr))
    return probs_occ, 1.0 - probs_occ


def _logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def occ_grid_delta(
    hp: OccGridHParams,
    density_fn: Callable,
    key,
    ray_batch: Optional[dict] = None,
    nerf_batch: Optional[dict] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Log-odds evidence of one update batch, as a dense (gs^3,) vector.

    The Bayes posterior ``p' = p*Po / (p*Po + (1-p)*Pe)`` is
    ``logit(p') = logit(p) + log(Po/Pe)`` — the evidence term is independent
    of the current grid, so data-parallel shards can each compute the delta
    of their ray sub-batch and ``psum`` it over ICI before one application
    (`occ_grid_apply_delta`), which keeps the grid bit-replicated across
    devices while splitting the sensor-model/NeRF-query work.

    ``axis_name`` names the mesh axis for the NeRF adaptive threshold (a
    *global* mean density, reference: modules/occupancy_grid.py:391-408).
    """
    gs = hp.grid_size
    delta = jnp.zeros((gs * gs * gs,), jnp.float32)

    if ray_batch is not None:
        valid = ~jnp.isnan(ray_batch["meas"])
        meas = jnp.where(valid, ray_batch["meas"], 1.0)
        dists, _, idxs = _cell_positions(
            ray_batch["rays_o"], ray_batch["rays_d"], hp
        )
        p_occ, p_emp = ray_measurement_probs(meas, dists, hp)
        weight = jnp.broadcast_to(
            valid[:, None].astype(jnp.float32), dists.shape
        ).reshape(-1)
        delta = _evidence_scatter(
            delta, gs, idxs.reshape(-1, 3),
            p_occ.reshape(-1), p_emp.reshape(-1), weight,
        )

    if nerf_batch is not None:
        key, k_noise = jax.random.split(key)
        valid = ~jnp.isnan(nerf_batch["meas"])
        b = nerf_batch["rays_o"].shape[0]
        noise = (
            jax.random.uniform(k_noise, (b, hp.M, 3), jnp.float32) * 2.0 - 1.0
        )
        _, pos, idxs = _cell_positions(
            nerf_batch["rays_o"], nerf_batch["rays_d"], hp, noise=noise
        )
        density = density_fn(pos.reshape(-1, 3))
        mean_density = jnp.mean(density)
        if axis_name is not None:
            mean_density = jax.lax.pmean(mean_density, axis_name)
        p_occ, p_emp = nerf_density_probs(density, hp, mean_density)
        weight = jnp.broadcast_to(
            valid[:, None].astype(jnp.float32), (b, hp.M)
        ).reshape(-1)
        delta = _evidence_scatter(
            delta, gs, idxs.reshape(-1, 3), p_occ, p_emp, weight
        )
    return delta


def _evidence_scatter(delta, gs, cell_idxs, probs_occ, probs_emp, weight):
    d = jnp.log(jnp.clip(probs_occ, 1e-30, None)) - jnp.log(
        jnp.clip(probs_emp, 1e-30, None)
    )
    lin = (cell_idxs[:, 0] * gs + cell_idxs[:, 1]) * gs + cell_idxs[:, 2]
    return delta.at[lin].add(d * weight)


def occ_grid_apply_delta(
    state: OccGridState, hp: OccGridHParams, delta
) -> OccGridState:
    """Apply accumulated log-odds evidence, warmup decay, bitfield rebuild
    (reference: modules/occupancy_grid.py:94-106)."""
    gs = hp.grid_size
    p = jnp.clip(state.occ_3d_grid, 1e-6, 1.0 - 1e-6)
    logits = _logit(p).reshape(-1) + delta
    grid = jax.nn.sigmoid(logits).reshape(gs, gs, gs)

    # warmup decay toward 0.5 (reference: modules/occupancy_grid.py:94-98)
    update_step = state.update_step + 1
    grid = jnp.where(
        update_step <= hp.decay_warmup_steps, grid * hp.grid_decay, grid
    )

    flat = grid.reshape(1, -1)
    return OccGridState(
        occ_3d_grid=grid,
        occ_bool=flat > hp.threshold,
        # the packed Morton bitfield is NOT rebuilt in the hot loop: the
        # TPU march reads ``occ_bool`` directly, and the cartesian->Morton
        # permute is a 2M-row gather (~15 ms/update measured on v5e).  It
        # is refreshed lazily (``occ_grid_refresh_bitfield``) at export /
        # plot / deployment time — the only consumers of Morton packing.
        bitfield=state.bitfield,
        update_step=update_step,
    )


def occ_grid_refresh_bitfield(
    state: OccGridState, hp: OccGridHParams
) -> OccGridState:
    """Recompute the packed Morton bitfield from the probability grid
    (reference: modules/occupancy_grid.py:100-105).  Call before reading
    ``state.bitfield`` — the hot loop leaves it stale (see
    ``occ_grid_apply_delta``)."""
    flat = state.occ_3d_grid.reshape(1, -1)
    return state._replace(
        bitfield=bitfield_from_grid(flat, hp.threshold, hp.grid_size)
    )


def occ_grid_update(
    state: OccGridState,
    hp: OccGridHParams,
    density_fn: Callable,
    key,
    ray_batch: Optional[dict] = None,
    nerf_batch: Optional[dict] = None,
    axis_name: Optional[str] = None,
) -> OccGridState:
    """One full VIRUS grid update (reference: modules/occupancy_grid.py:64-106).

    Batches are dicts with 'rays_o' (B,3), 'rays_d' (B,3), 'meas' (B,) —
    NaN measurements are masked into no-ops (the reference filters them
    dynamically, modules/occupancy_grid.py:216-222; here the shapes stay
    static).  ``density_fn`` maps (P, 3) positions to (P,) densities.

    Under ``axis_name`` (inside shard_map) the batches are per-device shards:
    evidence is all-reduced before the (replicated) application.
    """
    delta = occ_grid_delta(
        hp, density_fn, key, ray_batch, nerf_batch, axis_name
    )
    if axis_name is not None:
        delta = jax.lax.psum(delta, axis_name)
    return occ_grid_apply_delta(state, hp, delta)
