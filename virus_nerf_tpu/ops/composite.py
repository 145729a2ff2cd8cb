"""Front-to-back alpha compositing over the static sample layout.

Replaces the reference's per-ray sequential Taichi kernel + Taichi-autodiff
backward (reference: modules/volume_train.py:6-48,160-175) with a vectorized
log-space transmittance formulation that JAX differentiates analytically:

    alpha_i = 1 - exp(-sigma_i * delta_i)
    T_i     = prod_{j<i} (1 - alpha_j) = exp(-cumsum_{j<i} sigma_j delta_j)
    w_i     = alpha_i * T_i

Early termination (stop compositing once T <= T_threshold,
modules/volume_train.py:38) becomes a weight mask, which also zeroes the
corresponding gradients exactly as the reference's ``if T_ > T_threshold``
guard does.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeResults(NamedTuple):
    opacity: jax.Array  # (N,)
    depth: jax.Array  # (N,)
    rgb: jax.Array  # (N, 3)
    ws: jax.Array  # (N, S) per-sample weights
    vr_samples: jax.Array  # (N,) contributing samples per ray


class CompactCompositeResults(NamedTuple):
    opacity: jax.Array  # (N,)
    depth: jax.Array  # (N,)
    rgb: jax.Array  # (N, 3)
    vr_samples: jax.Array  # (N,) contributing samples per ray


def composite_rays_compact(
    sigmas, rgbs, deltas, ts, valid, ray_id, n_rays: int,
    T_threshold: float = 1e-4,
) -> CompactCompositeResults:
    """Composite a ray-major COMPACTED sample stream (budgeted layout).

    Identical math to :func:`composite_rays` but over the (budget,)-shaped
    valid-sample stream the renderer's compaction produces, so the model's
    sigma/rgb never have to be scattered back into the (n_rays, S) layout
    (two large scatters saved) and every cumsum runs over ~4x fewer
    elements.  Requires the stream to be ray-major ordered (stable
    compaction guarantees it); entries with ``valid == False`` may appear
    at the tail and contribute nothing.

    Args:
        sigmas/deltas/ts/valid: (B,) per-sample stream.
        rgbs: (B, 3).
        ray_id: (B,) int32 owning ray per sample, non-decreasing over the
            valid prefix.
        n_rays: number of rays N.
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)  # (B,)
    cs = jnp.cumsum(sd)
    # per-ray segment starts: ray_id is sorted, so starts[r] = first stream
    # position of ray r (B is small enough that searchsorted is cheap here)
    starts = jnp.searchsorted(
        ray_id, jnp.arange(n_rays, dtype=ray_id.dtype), method="sort"
    )  # (N,)
    cs_pad = jnp.concatenate([jnp.zeros(1, cs.dtype), cs])
    ray_start_cs = cs_pad[starts]  # (N,)
    # mode="clip": tail entries carry a sentinel ray_id == n_rays; the
    # default fill mode would inject NaN whose exp() poisons the backward
    tau_excl = (cs - sd) - jnp.take(ray_start_cs, ray_id, mode="clip")  # (B,)
    T = jnp.exp(-tau_excl)
    alpha = 1.0 - jnp.exp(-sd)
    live = valid & (T > T_threshold)
    w = jnp.where(live, alpha * T, 0.0)

    def seg_sums(x):
        c = jnp.cumsum(x, axis=0)
        c_pad = jnp.concatenate([jnp.zeros((1,) + x.shape[1:], x.dtype), c])
        c_starts = c_pad[starts]
        c_ends = jnp.concatenate([c_starts[1:], c[-1:]])
        return c_ends - c_starts  # (N, ...)

    opacity = seg_sums(w)
    depth = seg_sums(w * ts)
    rgb = seg_sums(w[:, None] * rgbs)
    vr_samples = seg_sums(live.astype(jnp.int32))
    return CompactCompositeResults(
        opacity=opacity, depth=depth, rgb=rgb, vr_samples=vr_samples
    )


def composite_rays(
    sigmas, rgbs, deltas, ts, valid, T_threshold: float = 1e-4
) -> CompositeResults:
    """Composite per-sample sigma/rgb into per-ray opacity/depth/color.

    Args:
        sigmas: (N, S) densities.
        rgbs: (N, S, 3) colors.
        deltas: (N, S) marching deltas.
        ts: (N, S) sample distances.
        valid: (N, S) bool sample validity from the ray march.
        T_threshold: transmittance early-stop threshold
            (reference: modules/rendering.py:18).
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)  # (N, S)
    # exclusive cumulative optical depth -> transmittance before each sample
    tau = jnp.cumsum(sd, axis=1) - sd
    T = jnp.exp(-tau)
    alpha = 1.0 - jnp.exp(-sd)
    live = valid & (T > T_threshold)
    w = jnp.where(live, alpha * T, 0.0)

    opacity = jnp.sum(w, axis=1)
    depth = jnp.sum(w * ts, axis=1)
    rgb = jnp.sum(w[..., None] * rgbs, axis=1)
    vr_samples = jnp.sum(live, axis=1).astype(jnp.int32)
    return CompositeResults(
        opacity=opacity, depth=depth, rgb=rgb, ws=w, vr_samples=vr_samples
    )
