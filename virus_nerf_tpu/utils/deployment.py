"""Deployment export + density-slice inference.

Counterparts of the reference's model-export and density-probe utilities
(reference: modules/utils.py:230-253, training/trainer_base.py:92-140).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.grids.base import bitfield_from_grid
from virus_nerf_tpu.models.ngp import NGPModel, NGPParams


def save_deployment_model(
    model: NGPModel,
    params: NGPParams,
    occ_grid_cart,
    poses,
    save_dir: str,
    threshold: float = 0.5,
) -> str:
    """Pack poses + Morton density bitfield + flattened MLP/hash parameters
    into ``deployment.npy`` (reference: modules/utils.py:230-253).

    The rgb output layer is zero-padded from 3 to 16 rows exactly as the
    reference does (modules/utils.py:231-233) so downstream consumers see
    the same tensor layout.
    """
    rgb_out = np.asarray(params.rgb_w[-1]).T  # (3, width) torch layout
    padding = np.zeros((13, rgb_out.shape[1]), rgb_out.dtype)
    rgb_out = np.concatenate([rgb_out, padding], axis=0)

    xyz_flat = np.concatenate(
        [np.asarray(w).T.reshape(-1) for w in params.xyz_w]
    )
    rgb_flat = np.concatenate(
        [np.asarray(w).T.reshape(-1) for w in params.rgb_w[:-1]]
        + [rgb_out.reshape(-1)]
    )
    bitfield = np.asarray(
        bitfield_from_grid(
            jnp.asarray(occ_grid_cart, jnp.float32),
            threshold,
            model.grid_size,
        )
    )
    payload = {
        "poses": np.asarray(poses),
        "model.density_bitfield": bitfield,
        "model.hash_encoder.params": np.asarray(params.pos_table).reshape(-1),
        "model.per_level_scale": model.hash_spec.log_b,
        "model.xyz_encoder.params": xyz_flat,
        "model.rgb_net.params": rgb_flat,
    }
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "deployment.npy")
    np.save(path, payload)  # dict payload, loaded with allow_pickle=True
    return path


def infer_density_map(
    model: NGPModel,
    params: NGPParams,
    res_map: int,
    height_c: float,
    num_avg_heights: int = 1,
    tolerance_c: float = 0.0,
    height_in_cube: bool = True,
    batch_size: int = 65536,
    threshold: Optional[float] = None,
):
    """Densities on an L x L horizontal probe grid around a slice height,
    averaged over ``num_avg_heights`` sub-slices
    (reference: training/trainer_base.py:92-140 + helpers/geometric_fcts.py:
    119-153).

    Returns the (res_map, res_map) density map (thresholded to {0,1} when
    ``threshold`` is given).
    """
    from virus_nerf_tpu.evaluation.geometry import create_scan_pos

    pos = create_scan_pos(
        res_map, height_c, num_avg_heights, tolerance_c,
        cube_min=-model.scale, cube_max=model.scale,
    )  # (L*L*A, 3)

    density_fn = jax.jit(lambda x: model.density(params, x))
    outs = []
    n = pos.shape[0]
    for i in range(0, n, batch_size):
        chunk = pos[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, 3), np.float32)]
            )
        d = np.asarray(density_fn(jnp.asarray(chunk)))
        outs.append(d[: d.shape[0] - pad] if pad else d)
    density = np.concatenate(outs).reshape(
        res_map, res_map, num_avg_heights
    )
    density = density.mean(axis=2)
    if threshold is not None:
        density = (density > threshold).astype(np.float32)
    return density
