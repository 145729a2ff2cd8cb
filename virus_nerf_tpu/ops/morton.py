"""Morton (Z-order) codes and occupancy bitfield packing, pure XLA int ops.

TPU-native replacements for the reference's Taichi kernels
(reference: modules/utils.py:95-169).  Bit interleaving is plain vectorized
integer arithmetic on the VPU; packbits is a reshape + weighted sum — no
custom kernels required.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v):
    """Spread the low 10 bits of v so they occupy every 3rd bit
    (reference: modules/utils.py:96-101)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords):
    """Interleave xyz integer coords into Morton codes.

    Args:
        coords: (..., 3) non-negative int array (each < 1024).
    Returns:
        (...,) int32 Morton codes (reference: modules/utils.py:104-107).
    """
    e = _expand_bits(coords.astype(jnp.uint32))
    code = e[..., 0] | (e[..., 1] << jnp.uint32(1)) | (e[..., 2] << jnp.uint32(2))
    return code.astype(jnp.int32)


def _compact_bits(x):
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> jnp.uint32(2))) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> jnp.uint32(4))) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> jnp.uint32(8))) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> jnp.uint32(16))) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(codes):
    """Morton codes -> (..., 3) int32 xyz coords
    (reference: modules/utils.py:110-127)."""
    c = codes.astype(jnp.uint32)
    x = _compact_bits(c)
    y = _compact_bits(c >> jnp.uint32(1))
    z = _compact_bits(c >> jnp.uint32(2))
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def packbits(grid, threshold):
    """Pack a (N*8,) occupancy grid into a (N,) uint8 bitfield; bit i of byte n
    is set iff grid[8n+i] > threshold (reference: modules/utils.py:157-169)."""
    occ = (grid.reshape(-1, 8) > threshold).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, :]
    return jnp.sum(occ * weights, axis=1, dtype=jnp.uint8)


def unpackbits(bitfield):
    """Inverse of :func:`packbits`: (N,) uint8 -> (N*8,) bool
    (reference: modules/grid.py:213-233)."""
    bits = (bitfield[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None, :]) & jnp.uint8(1)
    return bits.reshape(-1).astype(jnp.bool_)
