"""Instant-NGP density grid as a pure functional update, TPU-native.

Reference: modules/ngp_grid.py:15-152.  Differences by design:

- state is an immutable pytree; the update is one jitted pure function,
- the density grid lives in cartesian linear order (Morton only for the
  export bitfield),
- "sample M occupied cells" becomes a static-shape categorical draw over the
  occupancy mask (no dynamic ``nonzero``),
- the EMA scatter uses deterministic ``.at[].max`` instead of relying on
  last-write-wins duplicate behavior.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from virus_nerf_tpu.grids.base import bitfield_from_grid, occ_bool_from_grid
from virus_nerf_tpu.ops.common import NEAR_DISTANCE


class NGPGridState(NamedTuple):
    density_grid: jax.Array  # (cascades, gs^3) f32; -1 marks invisible cells
    occ_bool: jax.Array  # (cascades, gs^3) bool for the ray march
    bitfield: jax.Array  # (cascades * gs^3 / 8,) uint8, Morton order
    threshold: jax.Array  # () f32 current binarization threshold


def ngp_grid_init(cascades: int, grid_size: int) -> NGPGridState:
    n = grid_size**3
    return NGPGridState(
        density_grid=jnp.zeros((cascades, n), jnp.float32),
        occ_bool=jnp.zeros((cascades, n), jnp.bool_),
        bitfield=jnp.zeros((cascades * n // 8,), jnp.uint8),
        threshold=jnp.float32(0.5),
    )


def _cell_coords(idx, grid_size: int):
    """Linear cartesian index -> integer (x, y, z)."""
    x = idx // (grid_size * grid_size)
    y = (idx // grid_size) % grid_size
    z = idx % grid_size
    return jnp.stack([x, y, z], axis=-1)


def _cells_to_world(coords, cascade: int, grid_size: int, scale: float):
    """Cell coords -> world positions at a cascade
    (reference: modules/ngp_grid.py:127-131)."""
    s = min(2.0 ** (cascade - 1), scale)
    half = s / grid_size
    return (coords.astype(jnp.float32) / (grid_size - 1) * 2.0 - 1.0) * (s - half), half


def ngp_grid_update(
    state: NGPGridState,
    density_fn: Callable,
    key,
    *,
    warmup: bool,
    density_threshold: float,
    cascades: int,
    grid_size: int,
    scale: float,
    decay: float = 0.95,
    rebuild_bitfield: bool = True,
) -> NGPGridState:
    """One grid update (reference: modules/ngp_grid.py:110-152).

    warmup=True evaluates every cell; otherwise gs^3/4 uniform + gs^3/4
    occupied-sampled cells per cascade (modules/ngp_grid.py:36-64).
    ``warmup`` is static — trainers jit two variants.

    ``rebuild_bitfield=False`` leaves the packed Morton bitfield stale (the
    TPU march reads ``occ_bool`` directly and the cartesian->Morton permute
    is a 2M-row gather — same design as the VIRUS grid's lazy bitfield);
    call :func:`ngp_grid_refresh_bitfield` before exporting it.
    """
    n = grid_size**3
    grid = state.density_grid

    new_grid = grid * decay
    for c in range(cascades):
        key, k_uni, k_occ, k_jit = jax.random.split(key, 4)
        if warmup:
            idx = jnp.arange(n, dtype=jnp.int32)
        else:
            m = n // 4
            # uniform cells (reference draws coords uniform in [0, gs)^3,
            # modules/ngp_grid.py:48-51 — equivalent to uniform linear idx)
            idx_uni = jax.random.randint(k_uni, (m,), 0, n, jnp.int32)
            # occupied cells: categorical over the occupancy mask (static
            # shape; falls back to uniform when nothing is occupied yet)
            occ_mask = grid[c] > density_threshold
            logits = jnp.where(occ_mask, 0.0, -1e9)
            idx_occ = jax.random.categorical(k_occ, logits, shape=(m,)).astype(
                jnp.int32
            )
            idx = jnp.concatenate([idx_uni, idx_occ])
        coords = _cell_coords(idx, grid_size)
        xyz, half = _cells_to_world(coords, c, grid_size, scale)
        xyz = xyz + (jax.random.uniform(k_jit, xyz.shape) * 2.0 - 1.0) * half
        sigma = density_fn(xyz)
        # EMA floor at the fresh density, invisible (-1) cells stay pinned
        # (reference: modules/ngp_grid.py:138-141)
        new_grid = new_grid.at[c, idx].max(
            jnp.where(grid[c, idx] < 0.0, grid[c, idx], sigma)
        )
    new_grid = jnp.where(grid < 0.0, grid, new_grid)

    pos = new_grid > 0.0
    mean_density = jnp.sum(jnp.where(pos, new_grid, 0.0)) / jnp.maximum(
        jnp.sum(pos), 1
    )
    threshold = jnp.minimum(mean_density, density_threshold)

    occ_bool = occ_bool_from_grid(new_grid, threshold)
    bitfield = (
        bitfield_from_grid(new_grid, threshold, grid_size)
        if rebuild_bitfield
        else state.bitfield
    )
    return NGPGridState(
        density_grid=new_grid,
        occ_bool=occ_bool,
        bitfield=bitfield,
        threshold=threshold,
    )


def ngp_grid_refresh_bitfield(state: NGPGridState, grid_size: int) -> NGPGridState:
    """Recompute the packed Morton bitfield from the density grid at the
    current threshold — call before reading ``state.bitfield`` when the
    update loop ran with ``rebuild_bitfield=False``."""
    return state._replace(
        bitfield=bitfield_from_grid(
            state.density_grid, state.threshold, grid_size
        )
    )


def mark_invisible_cells(
    state: NGPGridState,
    K,
    poses,
    img_wh,
    *,
    cascades: int,
    grid_size: int,
    scale: float,
) -> NGPGridState:
    """Pin cells not covered by any camera at density -1
    (reference: modules/ngp_grid.py:66-108; utility — the reference trainer
    never calls it either)."""
    n = grid_size**3
    idx = jnp.arange(n, dtype=jnp.int32)
    coords = _cell_coords(idx, grid_size)
    w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)  # (N_cams, 3, 3)
    w2c_T = -w2c_R @ poses[:, :3, 3:]  # (N_cams, 3, 1)
    grid = state.density_grid
    for c in range(cascades):
        xyz, _ = _cells_to_world(coords, c, grid_size, scale)
        xyz_c = w2c_R @ xyz.T[None] + w2c_T  # (N_cams, 3, n)
        uvd = K @ xyz_c
        uv = uvd[:, :2] / uvd[:, 2:]
        in_image = (
            (uvd[:, 2] >= 0)
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < img_wh[0])
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < img_wh[1])
        )
        covered = (uvd[:, 2] >= NEAR_DISTANCE) & in_image
        count = covered.sum(0)
        too_near = ((uvd[:, 2] < NEAR_DISTANCE) & in_image).any(0)
        valid = (count > 0) & (~too_near)
        grid = grid.at[c].set(jnp.where(valid, 0.0, -1.0))
    return state._replace(density_grid=grid)
