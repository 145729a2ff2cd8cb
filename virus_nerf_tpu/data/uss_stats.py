"""Running per-image USS minimum-depth statistics (functional).

Counterpart of the reference's stateful USS tracker
(reference: datasets/sensor_uss.py:113-217): during training, track for
every image the pixel (inside the USS field of view) whose rendered depth is
currently the smallest.  The ``closest`` pixel-sampling strategy draws that
pixel (reference: training/sampler.py:125-262) so the USS cone-minimum hinge
loss supervises the pixel most likely to have produced the echo.

The reference mutates per-sensor dicts; here the state is a small pytree
updated by a pure function inside the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class USSStats(NamedTuple):
    min_depth: jax.Array  # (N_imgs,) current minimum rendered depth
    min_pix: jax.Array  # (N_imgs,) pixel index of that minimum
    counts: jax.Array  # (N_imgs,) number of updates


def uss_stats_init(n_imgs: int, center_pix: int = 0) -> USSStats:
    return USSStats(
        min_depth=jnp.full((n_imgs,), jnp.inf, jnp.float32),
        min_pix=jnp.full((n_imgs,), center_pix, jnp.int32),
        counts=jnp.zeros((n_imgs,), jnp.int32),
    )


def uss_stats_update(
    stats: USSStats,
    img_idxs,
    pix_idxs,
    depths,
    uss_mask,
) -> USSStats:
    """Fold a batch of rendered depths into the per-image minima
    (reference: datasets/sensor_uss.py:142-217).

    Update rule (as in the reference): if the batch minimum for an image
    lands on the currently tracked pixel, the stored depth is *refreshed*
    (it may increase — the scene estimate changed); otherwise the stored
    depth only decreases.  The tracked pixel moves whenever the batch
    minimum is at least as small as the stored one.

    Args:
        stats: current stats (N_imgs arrays).
        img_idxs, pix_idxs: (B,) batch sample coordinates.
        depths: (B,) rendered depths.
        uss_mask: (H*W,) bool FoV mask of the USS sensor.
    """
    n_imgs = stats.min_depth.shape[0]
    in_fov = uss_mask[pix_idxs]
    d = jnp.where(in_fov, depths, jnp.inf)

    batch_min = (
        jnp.full((n_imgs,), jnp.inf, jnp.float32).at[img_idxs].min(d)
    )
    has_batch = jnp.isfinite(batch_min)
    # pixel achieving the per-image batch minimum (ties: any)
    is_min = in_fov & (d <= batch_min[img_idxs])
    batch_pix = (
        jnp.zeros((n_imgs,), jnp.int32)
        .at[jnp.where(is_min, img_idxs, n_imgs)]
        .set(pix_idxs.astype(jnp.int32), mode="drop")
    )

    same_pix = has_batch & (batch_pix == stats.min_pix)
    new_depth = jnp.where(
        same_pix,
        batch_min,
        jnp.minimum(jnp.where(has_batch, batch_min, jnp.inf), stats.min_depth),
    )
    improved = has_batch & (batch_min <= stats.min_depth)
    new_pix = jnp.where(improved, batch_pix, stats.min_pix)
    return USSStats(
        min_depth=new_depth,
        min_pix=new_pix,
        counts=stats.counts + has_batch.astype(jnp.int32),
    )
