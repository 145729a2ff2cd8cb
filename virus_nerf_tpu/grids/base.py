"""Shared occupancy-grid machinery: layouts, Morton views, bitfields.

TPU-native counterpart of the reference's Grid base class
(reference: modules/grid.py:16-270).  Key layout decision: the ray-march hot
path consumes a ``(cascades, grid_size^3)`` boolean grid in *cartesian*
row-major order ``lin = (x*gs + y)*gs + z`` — equivalent information to the
reference's Morton bitfield but gatherable without bit interleaving.  The
Morton-ordered uint8 bitfield is still produced (deployment export parity,
reference: modules/utils.py:230-253) via a precomputed permutation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.ops.morton import morton3d, morton3d_invert, packbits, unpackbits


def _expand_bits_np(v: np.ndarray) -> np.ndarray:
    """numpy mirror of ops.morton._expand_bits — pure host math so the
    permutation tables build eagerly even inside a jit trace."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


@lru_cache(maxsize=8)
def _morton_of_linear(grid_size: int) -> np.ndarray:
    """morton_code[linear_cell] for all cells, row-major [x, y, z]."""
    idx = np.arange(grid_size**3, dtype=np.int64)
    x = idx // (grid_size * grid_size)
    y = (idx // grid_size) % grid_size
    z = idx % grid_size
    code = (
        _expand_bits_np(x)
        | (_expand_bits_np(y) << np.uint32(1))
        | (_expand_bits_np(z) << np.uint32(2))
    )
    return code.astype(np.int64)


@lru_cache(maxsize=8)
def _linear_of_morton(grid_size: int) -> np.ndarray:
    """linear_cell[morton_code] — inverse permutation."""
    m = _morton_of_linear(grid_size)
    inv = np.empty_like(m)
    inv[m] = np.arange(grid_size**3, dtype=m.dtype)
    return inv


def cartesian_to_morton(grid_cart, grid_size: int):
    """Reorder a (..., gs^3) cartesian-linear grid into Morton order
    (reference: modules/grid.py:154-170)."""
    perm = jnp.asarray(_linear_of_morton(grid_size))
    return grid_cart[..., perm]


def morton_to_cartesian(grid_morton, grid_size: int):
    """Inverse of :func:`cartesian_to_morton`
    (reference: modules/grid.py:172-189)."""
    perm = jnp.asarray(_morton_of_linear(grid_size))
    return grid_morton[..., perm]


def bitfield_from_grid(grid_cart, threshold, grid_size: int):
    """Cartesian (C, gs^3) float grid -> Morton uint8 bitfield
    (C * gs^3 / 8,) (reference: modules/grid.py:128-151,192-211)."""
    morton = cartesian_to_morton(grid_cart, grid_size)
    return packbits(morton.reshape(-1), threshold)


def grid_from_bitfield(bitfield, cascades: int, grid_size: int):
    """Morton bitfield -> cartesian (C, gs^3) bool grid (round trip check,
    reference: modules/grid.py:213-233 + training/trainer_plot.py:74-86)."""
    bits = unpackbits(bitfield).reshape(cascades, grid_size**3)
    return morton_to_cartesian(bits, grid_size)


def occ_bool_from_grid(grid_cart, threshold):
    """Threshold a (C, gs^3) cartesian grid into the march's boolean layout."""
    return grid_cart > threshold


class GridState(NamedTuple):
    """Minimal grid state shared by both grid variants."""

    occ_bool: jax.Array  # (cascades, gs^3) bool, cartesian linear order


def cell_centers(grid_size: int, scale: float, cascade: int):
    """World positions of all cell centers for one cascade
    (reference: modules/ngp_grid.py:127-131 coordinate convention)."""
    idx = np.arange(grid_size, dtype=np.float32)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), axis=-1).reshape(-1, 3)
    s = min(2.0 ** (cascade - 1), scale)
    half = s / grid_size
    return jnp.asarray((g / (grid_size - 1) * 2 - 1) * (s - half))
