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
