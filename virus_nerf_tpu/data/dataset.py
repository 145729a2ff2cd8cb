"""Device-resident dataset + pure batch sampling.

TPU-native counterpart of the reference's in-memory tensor dataset with a
callable batching interface (reference: datasets/dataset_base.py:23-98) and
the Sampler's image/pixel strategies (reference: training/sampler.py:9-262).
The dataset is a pytree of jnp arrays passed as an argument into the jitted
train step; batch sampling is one pure function of a PRNG key, so the whole
"dataloader" lives on device and fuses into the step.

Strategies (reference: training/sampler.py:94-262):
- images: "all" (uniform over valid images) | "same" (one image per batch),
- pixels: "random" | "valid_uss" | "valid_tof" | "entire_img" | "closest",
  mixable as {strategy: share} with the remainder going to "random".
  The ``valid_*`` strategies draw uniformly over precomputed FoV-mask index
  tables; "closest" draws the per-image running-minimum USS pixel
  (see training/uss_stats.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset(NamedTuple):
    """All tensors of one split, device-resident.

    NaN marks invalid depths throughout (reference convention).
    """

    poses: jax.Array  # (N_imgs, 3, 4) camera-to-world
    directions: jax.Array  # (n_cams, H*W, 3) unit directions, camera frame
    cam_idx: jax.Array  # (N_imgs,) int32 index into directions
    rgbs: jax.Array  # (N_imgs, H*W, 3) in [0, 1]
    depths: Dict[str, jax.Array]  # sensor -> (N_imgs, H*W), cube units
    times: jax.Array  # (N_imgs,) seconds since start
    uss_mask_idx: jax.Array  # (K_uss,) pixel indices inside the USS FoV
    tof_mask_idx: jax.Array  # (K_tof,) pixel indices on the ToF lattice
    sensor_ids: jax.Array  # (N_imgs,) int32 stack/camera identity

    @property
    def n_images(self) -> int:
        return self.poses.shape[0]

    @property
    def n_pixels(self) -> int:
        return self.rgbs.shape[1]


class Batch(NamedTuple):
    img_idxs: jax.Array  # (B,)
    pix_idxs: jax.Array  # (B,)
    rays_o: jax.Array  # (B, 3)
    rays_d: jax.Array  # (B, 3) unit norm
    rgb: jax.Array  # (B, 3)
    depths: Dict[str, jax.Array]  # sensor -> (B,)
    times: jax.Array  # (B,)


def _strategy_slots(pix_strategy, batch_size: int):
    """Convert a pixel-strategy spec into static per-strategy slot counts
    (reference: training/sampler.py:139-171)."""
    if isinstance(pix_strategy, str):
        pix_strategy = {pix_strategy: 1.0}
    slots = []
    used = 0
    for name, share in pix_strategy.items():
        b = int(share * batch_size)
        slots.append((name, b))
        used += b
    if batch_size - used > 0:
        slots.append(("random", batch_size - used))
    return slots


def sample_img_idxs(
    dataset: DeviceDataset,
    key,
    batch_size: int,
    img_strategy: str = "all",
    elapse_time: Optional[jax.Array] = None,
):
    """Image-index sampling (reference: training/sampler.py:94-123).

    With ``elapse_time`` set, only images with ``times <= elapse_time`` are
    drawn (real-time simulation, training/sampler.py:70-92) — implemented as
    a categorical over the validity mask so shapes stay static.
    """
    n = dataset.n_images
    if elapse_time is None:
        if img_strategy == "all":
            return jax.random.randint(key, (batch_size,), 0, n, jnp.int32)
        if img_strategy == "same":
            i = jax.random.randint(key, (), 0, n, jnp.int32)
            return jnp.full((batch_size,), i, jnp.int32)
    else:
        valid = dataset.times <= elapse_time
        logits = jnp.where(valid, 0.0, -1e9)
        if img_strategy == "all":
            return jax.random.categorical(key, logits, shape=(batch_size,)).astype(
                jnp.int32
            )
        if img_strategy == "same":
            i = jax.random.categorical(key, logits).astype(jnp.int32)
            return jnp.full((batch_size,), i, jnp.int32)
    raise ValueError(f"unknown image strategy {img_strategy}")


def sample_pix_idxs(
    dataset: DeviceDataset,
    key,
    batch_size: int,
    pix_strategy,
    uss_stats_pix: Optional[jax.Array] = None,
    img_idxs: Optional[jax.Array] = None,
):
    """Pixel-index sampling (reference: training/sampler.py:125-262)."""
    if pix_strategy == "entire_img":
        return jnp.arange(dataset.n_pixels, dtype=jnp.int32)
    slots = _strategy_slots(pix_strategy, batch_size)
    keys = jax.random.split(key, len(slots))
    parts = []
    offset = 0
    for (name, b), k in zip(slots, keys):
        if b == 0:
            continue
        if name == "random":
            parts.append(
                jax.random.randint(k, (b,), 0, dataset.n_pixels, jnp.int32)
            )
        elif name == "valid_uss":
            j = jax.random.randint(k, (b,), 0, dataset.uss_mask_idx.shape[0])
            parts.append(dataset.uss_mask_idx[j].astype(jnp.int32))
        elif name == "valid_tof":
            j = jax.random.randint(k, (b,), 0, dataset.tof_mask_idx.shape[0])
            parts.append(dataset.tof_mask_idx[j].astype(jnp.int32))
        elif name == "closest":
            if uss_stats_pix is None or img_idxs is None:
                raise ValueError("'closest' needs USS stats and img_idxs")
            parts.append(
                uss_stats_pix[img_idxs[offset : offset + b]].astype(jnp.int32)
            )
        else:
            raise ValueError(f"unknown pixel strategy {name}")
        offset += b
    return jnp.concatenate(parts)


def gather_batch(dataset: DeviceDataset, img_idxs, pix_idxs) -> Batch:
    """Assemble rays + targets for sampled (image, pixel) pairs
    (reference: datasets/dataset_base.py:50-76,194-243)."""
    cam = dataset.cam_idx[img_idxs]  # (B,)
    dirs_cam = dataset.directions[cam, pix_idxs]  # (B, 3)
    poses = dataset.poses[img_idxs]  # (B, 3, 4)
    rays_d = jnp.einsum("bij,bj->bi", poses[:, :3, :3], dirs_cam)
    rays_o = poses[:, :3, 3]
    return Batch(
        img_idxs=img_idxs,
        pix_idxs=pix_idxs,
        rays_o=rays_o,
        rays_d=rays_d,
        rgb=dataset.rgbs[img_idxs, pix_idxs],
        depths={
            s: d[img_idxs, pix_idxs] for s, d in dataset.depths.items()
        },
        times=dataset.times[img_idxs],
    )


def get_sync_idxs(
    dataset: DeviceDataset, img_idxs, tolerance: float = 0.1
) -> np.ndarray:
    """Time-synchronous sample pairs across sensor stacks
    (reference: datasets/dataset_base.py:111-136): for each query image,
    return its index plus the closest-in-time image of every OTHER stack
    within ``tolerance`` seconds (its own index when none is close enough).

    Host-side (evaluation only).  Returns (N, n_stacks) int indices.
    """
    times = np.asarray(dataset.times)
    sids = np.asarray(dataset.sensor_ids)
    img_idxs = np.atleast_1d(np.asarray(img_idxs, int))
    stacks = np.unique(sids)
    out = np.zeros((img_idxs.shape[0], stacks.shape[0]), int)
    for i, q in enumerate(img_idxs):
        for j, s in enumerate(stacks):
            if sids[q] == s:
                out[i, j] = q
                continue
            cand = np.where(sids == s)[0]
            if cand.size == 0:
                out[i, j] = q
                continue
            k = cand[np.argmin(np.abs(times[cand] - times[q]))]
            out[i, j] = k if abs(times[k] - times[q]) < tolerance else q
    return out


def sample_batch(
    dataset: DeviceDataset,
    key,
    batch_size: int,
    sampling_strategy: Dict[str, Any],
    elapse_time: Optional[jax.Array] = None,
    uss_stats_pix: Optional[jax.Array] = None,
) -> Batch:
    """Full batch draw — the functional equivalent of calling the reference
    dataset object (datasets/dataset_base.py:23-76)."""
    k_img, k_pix = jax.random.split(key)
    img_idxs = sample_img_idxs(
        dataset, k_img, batch_size, sampling_strategy.get("imgs", "all"),
        elapse_time,
    )
    pix_idxs = sample_pix_idxs(
        dataset, k_pix, batch_size, sampling_strategy.get("pixs", "random"),
        uss_stats_pix=uss_stats_pix, img_idxs=img_idxs,
    )
    return gather_batch(dataset, img_idxs, pix_idxs)
