"""Sensor-fusion training loss.

Functional counterpart of the reference Loss class
(reference: training/loss.py:7-198):

    total = color_loss_w * MSE(rgb)
          + rgbd_loss_w * MSE(depth | valid RGBD)
          + tof_loss_w  * MSE(depth | valid ToF)
          + uss_loss_w  * hinge(depth | valid USS)

The USS hinge penalizes only rendered depth *closer* than the cone-minimum
measurement by more than a 3 cm (world) tolerance
(reference: training/loss.py:28-31,186-198) — the USS reading is a lower
bound on scene depth inside its cone, not a per-pixel depth.

All masked means are NaN-free static-shape reductions: sum(mask * err) /
max(count, 1), matching the reference's behavior of returning 0 when no
pixel is valid (training/loss.py:162-164,190-194).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    color: float = 1.0
    rgbd: float = 100.0
    tof: float = 50.0
    uss: float = 50.0
    uss_depth_tol: float = 0.03 / 2.1  # 3 cm world -> cube units (set by trainer)
    distortion: float = 0.0


def _masked_mse(pred, target, mask):
    err = jnp.where(mask, (pred - target) ** 2, 0.0)
    count = jnp.sum(mask)
    return jnp.sum(err) / jnp.maximum(count, 1)


def compute_loss(
    results: Dict[str, jax.Array],
    batch,
    weights: LossWeights,
    sensors: Tuple[str, ...] = ("USS", "ToF"),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + per-term dict (reference: training/loss.py:34-77).

    Args:
        results: renderer output ('rgb' (B,3), 'depth' (B,), optionally
            'ws'/'ts'/'valid' for the distortion regularizer).
        batch: Batch with 'rgb' and per-sensor 'depths' (NaN = invalid).
        sensors: training depth sensors (config training.sensors).
    """
    loss_dict = {}

    color = jnp.mean((results["rgb"] - batch.rgb) ** 2) * weights.color
    loss_dict["color"] = color
    total = color

    depth = results["depth"]
    for sensor in sensors:
        meas = batch.depths[sensor]
        valid = ~jnp.isnan(meas)
        meas_safe = jnp.where(valid, meas, 0.0)
        if sensor == "RGBD":
            term = weights.rgbd * _masked_mse(depth, meas_safe, valid)
            loss_dict["rgbd"] = term
        elif sensor == "ToF":
            term = weights.tof * _masked_mse(depth, meas_safe, valid)
            loss_dict["ToF"] = term
        elif sensor == "USS":
            close = depth < meas_safe - weights.uss_depth_tol
            term = weights.uss * _masked_mse(depth, meas_safe, valid & close)
            loss_dict["USS"] = term
        else:
            raise ValueError(f"unknown training sensor {sensor}")
        total = total + term

    if weights.distortion > 0.0 and "ws" in results:
        # distortion regularizer (Mip-NeRF 360) — TPU addition, off by
        # default; encourages compact weight distributions along rays.
        w = results["ws"]
        t = results["ts"]
        intra = jnp.sum(
            w[:, :, None] * w[:, None, :] * jnp.abs(t[:, :, None] - t[:, None, :]),
            axis=(1, 2),
        )
        term = weights.distortion * jnp.mean(intra)
        loss_dict["distortion"] = term
        total = total + term

    loss_dict["depth"] = total - color
    loss_dict["total"] = total
    return total, loss_dict
