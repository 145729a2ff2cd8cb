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
from virus_nerf_tpu.ops.composite import composite_rays, composite_stream
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
    march_resolution: int = 1024,
    jitter: bool = True,
    sample_budget: Optional[int] = None,
    need_ws: bool = False,
) -> Dict[str, jax.Array]:
    """Render a batch of rays.

    Returns a results dict matching the reference's contract
    (modules/rendering.py:200-228): 'opacity', 'depth', 'rgb', 'ws',
    'deltas', 'ts', 'rays_a' analogue via 'valid', plus sample counters
    'rm_samples' / 'vr_samples'.  With ``sample_budget`` set, the dense
    per-sample 'ws' is produced only when ``need_ws`` (it costs a scatter
    back to the (n_rays, max_samples) layout).

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
        march_resolution=march_resolution,
    )

    out: Dict[str, jax.Array] = {
        "deltas": march.deltas,
        "ts": march.ts,
        "valid": march.valid,
        "rm_samples": march.total_samples,
    }
    if sample_budget is None:
        sigmas, rgbs = model.forward(params, march.xyzs, march.dirs)
        sigmas = jnp.where(march.valid, sigmas, 0.0)
        comp = composite_rays(
            sigmas, rgbs, march.deltas, march.ts, march.valid, T_threshold
        )
        opacity, depth, rgb_fg = comp.opacity, comp.depth, comp.rgb
        out["ws"] = comp.ws
        out["vr_samples"] = jnp.sum(comp.vr_samples)
        out["overflow"] = jnp.int32(0)
    else:
        # Global sample compaction: with the occupancy grid converged most
        # of the (n_rays, max_samples) layout is empty, so gather the valid
        # samples (valid-first stable ordering -> ray-major, ascending t)
        # into a static ``sample_budget``-sized stream, run the model only
        # on those, and composite DIRECTLY on the stream via segmented
        # prefix sums — no scatter-back of sigma/rgb (TPU scatter costs
        # ~49 ns/row, ~5x a gather).  TPU analogue of the reference's atomic
        # sample compaction (modules/ray_march.py:77-82), static shapes.
        #
        # When the batch's valid samples exceed the budget, every ray is
        # proportionally stride-subsampled (per-ray target k_i =
        # slots_i*B/total, deltas scaled by represented count — the same
        # closed-form rank selection the march uses for its per-ray cap,
        # ops/ray_march._rank_select) INSTEAD of letting the stream
        # truncation drop whole tail-of-batch rays: truncation would leave
        # the last ~overflow/avg rays of the batch unsupervised, a silent
        # effective-batch-size cut.  At the steady state of the headline
        # config total < B and this is the identity.
        slots0 = jnp.minimum(march.n_samples, max_samples)  # (N,)
        total0 = jnp.sum(slots0)
        need = total0 > sample_budget
        k = jnp.where(
            need,
            jnp.maximum(
                (slots0 * sample_budget) // jnp.maximum(total0, 1),
                jnp.minimum(slots0, 1),  # nonempty rays keep >= 1
            ),
            slots0,
        )  # (N,) per-ray keep target; sum <= B + (#rays bumped to 1)
        s_idx = jnp.arange(max_samples, dtype=jnp.int32)[None, :]
        c = slots0[:, None]
        kk = k[:, None]
        cg = jnp.maximum(c, 1)
        kg = jnp.maximum(kk, 1)
        f0 = (s_idx * kk + cg - 1) // cg  # ceil(j*k/c)
        f1 = ((s_idx + 1) * kk + cg - 1) // cg
        kept = (f1 > f0) & (f0 < kk)  # exactly k slots of the first c
        nxt = jnp.minimum(((f0 + 1) * cg) // kg, c)
        rep = jnp.maximum(nxt - s_idx, 1).astype(march.deltas.dtype)
        sub = need & (c > kk)  # rays actually subsampled
        valid_b = march.valid & jnp.where(sub, kept, march.valid)
        deltas_b = march.deltas * jnp.where(sub, rep, 1.0)

        flat_valid = valid_b.reshape(-1)
        n_flat = flat_valid.shape[0]
        # one stable valid-first sort carrying the source index AND the
        # deltas as payloads (deltas must be fetched, not reconstructed:
        # overflowing rays carry subsample represented-count scaling even
        # on the constant-dt lattice, ops/ray_march._rank_select; riding
        # the sort replaces a ~2.8 ms 131k-row flat gather)
        iota = jnp.arange(n_flat, dtype=jnp.int32)
        _, order, dt_all = jax.lax.sort(
            [(~flat_valid).astype(jnp.int32), iota,
             deltas_b.reshape(-1)],
            dimension=0, num_keys=1, is_stable=True,
        )
        sel = order[:sample_budget]
        dt_c = dt_all[:sample_budget]
        # valid-first ordering: the first sum(valid) stream slots are the
        # valid ones — no per-slot gather of the validity mask needed
        sel_valid = (
            jnp.arange(sample_budget, dtype=jnp.int32)
            < jnp.sum(flat_valid, dtype=jnp.int32)
        )
        pts = march.xyzs.reshape(-1, 3)[sel]
        ray_id = (sel // max_samples).astype(jnp.int32)
        # per-ray tables: gathers over (n_rays, 3) hit few distinct rows
        # and are far cheaper than re-gathering the flat (n_rays*S, ...)
        drs = rays_d[ray_id]
        sig_c, rgb_c = model.forward(params, pts, drs)
        sig_c = jnp.where(sel_valid, sig_c, 0.0)
        # reconstruct t from the gathered position (exact to f32 rounding;
        # avoids another 4-byte gather over the flat layout)
        ts_c = jnp.sum((pts - rays_o[ray_id]) * drs, axis=1)

        slots = k  # valid slots per ray after the proportional subsample
        starts = jnp.cumsum(slots) - slots  # (N,)
        cnt = (
            jnp.minimum(starts + slots, sample_budget)
            - jnp.minimum(starts, sample_budget)
        )
        starts = jnp.minimum(starts, sample_budget - 1)
        opacity, depth, rgb_fg, vr_total, w_stream = composite_stream(
            sig_c, rgb_c, dt_c, ts_c, sel_valid, ray_id, starts, cnt,
            T_threshold,
        )
        out["vr_samples"] = vr_total
        # samples shaved by the proportional subsample (plus the rare
        # truncation remainder from the keep>=1 bump)
        out["overflow"] = jnp.maximum(total0 - sample_budget, 0)
        if need_ws:
            # dense per-sample weights only when a consumer (distortion
            # regularizer) asks — costs one scatter back to (N, S)
            out["ws"] = (
                jnp.zeros((n_rays * max_samples,), w_stream.dtype)
                .at[sel].set(w_stream, unique_indices=True)
                .reshape(n_rays, max_samples)
            )

    rgb_bg = 1.0 if exp_step_factor == 0.0 else 0.0
    out["opacity"] = opacity
    out["depth"] = depth
    out["rgb"] = rgb_fg + rgb_bg * (1.0 - opacity)[:, None]
    return out
