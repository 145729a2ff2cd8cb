"""Ray rendering: AABB intersect -> occupancy-guided march -> model -> composite.

Counterpart of the reference render dispatcher
(reference: modules/rendering.py:12-228).  One static-shape path serves both
training and testing: the reference's test-time adaptive "alive rays"
wavefront (modules/rendering.py:61-158) is a GPU latency optimization that
maps poorly onto XLA — on TPU the whole batch marches with a fixed per-ray
budget and early-terminated samples are masked out by the compositor, which
is algebraically identical (weights past the transmittance threshold are
zero).  Test rendering simply calls this with a larger ``max_samples`` and no
gradient.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from virus_nerf_tpu.models.ngp import NGPModel, NGPParams
from virus_nerf_tpu.ops.composite import composite_rays
from virus_nerf_tpu.ops.intersection import ray_aabb_intersect
from virus_nerf_tpu.ops.ray_march import march_rays_train


def render_rays(
    model: NGPModel,
    params: NGPParams,
    occ_bool,
    rays_o,
    rays_d,
    key,
    *,
    exp_step_factor: float = 0.0,
    T_threshold: float = 1e-4,
    max_samples: int = 256,
    n_candidates: int = 1024,
    jitter: bool = True,
    sample_budget: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Render a batch of rays.

    Returns a results dict matching the reference's contract
    (modules/rendering.py:200-228): 'opacity', 'depth', 'rgb', 'ws',
    'deltas', 'ts', 'rays_a' analogue via 'valid', plus sample counters
    'rm_samples' / 'vr_samples'.

    Background color: white when exp_step_factor == 0, else black
    (reference: modules/rendering.py:219-226).
    """
    n_rays = rays_o.shape[0]
    hits_t = ray_aabb_intersect(rays_o, rays_d, model.scale)
    noise = (
        jax.random.uniform(key, (n_rays,))
        if jitter
        else jnp.zeros((n_rays,))
    )

    march = march_rays_train(
        rays_o,
        rays_d,
        hits_t,
        occ_bool,
        noise,
        cascades=model.cascades,
        grid_size=model.grid_size,
        scale=model.scale,
        exp_step_factor=exp_step_factor,
        max_samples=max_samples,
        n_candidates=n_candidates,
    )

    if sample_budget is None:
        sigmas, rgbs = model.forward(params, march.xyzs, march.dirs)
        sigmas = jnp.where(march.valid, sigmas, 0.0)
    else:
        # Global sample compaction: with the occupancy grid converged most
        # of the (n_rays, max_samples) layout is empty, so gather the valid
        # samples (valid-first stable ordering) into a static
        # ``sample_budget``-sized buffer, run the model only on those, and
        # scatter sigmas/rgbs back.  Overflowing samples (rare when the
        # budget covers the typical occupancy; see 'overflow' counter) are
        # dropped.  TPU analogue of the reference's atomic sample
        # compaction (modules/ray_march.py:77-82) with static shapes.
        ns = n_rays * max_samples
        flat_valid = march.valid.reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)
        sel = order[:sample_budget]
        sel_valid = flat_valid[sel]
        pts = march.xyzs.reshape(-1, 3)[sel]
        drs = march.dirs.reshape(-1, 3)[sel]
        sig_c, rgb_c = model.forward(params, pts, drs)
        sig_c = jnp.where(sel_valid, sig_c, 0.0)
        sigmas = (
            jnp.zeros((ns,), sig_c.dtype)
            .at[sel].set(sig_c, unique_indices=True)
            .reshape(n_rays, max_samples)
        )
        rgbs = (
            jnp.zeros((ns, 3), rgb_c.dtype)
            .at[sel].set(rgb_c, unique_indices=True)
            .reshape(n_rays, max_samples, 3)
        )

    comp = composite_rays(
        sigmas, rgbs, march.deltas, march.ts, march.valid, T_threshold
    )

    rgb_bg = 1.0 if exp_step_factor == 0.0 else 0.0
    rgb = comp.rgb + rgb_bg * (1.0 - comp.opacity)[:, None]

    return {
        "opacity": comp.opacity,
        "depth": comp.depth,
        "rgb": rgb,
        "ws": comp.ws,
        "deltas": march.deltas,
        "ts": march.ts,
        "valid": march.valid,
        "rm_samples": march.total_samples,
        "vr_samples": jnp.sum(comp.vr_samples),
        # samples beyond the compaction budget (0 when budget disabled)
        "overflow": (
            jnp.maximum(jnp.sum(march.valid) - sample_budget, 0)
            if sample_budget is not None
            else jnp.int32(0)
        ),
    }
