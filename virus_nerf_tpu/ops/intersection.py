"""Ray / axis-aligned-cube slab intersection, vectorized XLA.

Reference: modules/intersection.py:8-55 (Taichi kernel) — here a handful of
fused elementwise ops over the whole ray batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from virus_nerf_tpu.ops.common import NEAR_DISTANCE


def ray_aabb_intersect(rays_o, rays_d, scale: float):
    """Intersect rays with the cube ``[-scale, scale]^3``.

    Args:
        rays_o: (N, 3) origins.
        rays_d: (N, 3) directions (need not be normalized).
        scale: half side length of the cube.
    Returns:
        hits_t: (N, 2) entry/exit distances ``(max(t1, NEAR_DISTANCE), t2)``,
        or ``(-1, -1)`` for rays that miss (reference:
        modules/intersection.py:29-37).
    """
    inv_d = 1.0 / rays_d
    t_min = (-scale - rays_o) * inv_d
    t_max = (scale - rays_o) * inv_d
    t1 = jnp.max(jnp.minimum(t_min, t_max), axis=-1)
    t2 = jnp.min(jnp.maximum(t_min, t_max), axis=-1)
    hit = t2 > 0.0
    near = jnp.maximum(t1, NEAR_DISTANCE)
    return jnp.stack(
        [jnp.where(hit, near, -1.0), jnp.where(hit, t2, -1.0)], axis=-1
    )
