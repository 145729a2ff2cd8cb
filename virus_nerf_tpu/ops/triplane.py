"""Tri-plane positional encoder, TPU-native.

Alternative to the hash grid (reference: modules/triplane.py:35-205).
Three axis-aligned feature planes of ``max_res^2`` cells each; a query at
level L bilinearly interpolates the (x,y), (y,z), (z,x) projections on the
level-L lattice, with corner coordinates mapped up onto the shared max-res
plane; the per-(feature, level) output is the product of the three plane
features.  The XLA forward is a batched gather; autodiff provides the
scatter-add backward (the reference uses Taichi autodiff,
modules/triplane.py:185-197).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TriPlaneSpec:
    levels: int
    feat_dim: int
    base_res: int
    max_res: int
    log_b: float
    resolutions: Tuple[int, ...]

    @property
    def out_dim(self) -> int:
        return self.levels * self.feat_dim

    @property
    def total_params(self) -> int:
        return 3 * self.max_res**2 * self.feat_dim

    @staticmethod
    def create(
        base_res: int = 16,
        max_res: int = 2048,
        levels: int = 8,
        feat_dim: int = 4,
    ) -> "TriPlaneSpec":
        log_b = float(np.log(max_res / base_res) / (levels - 1))
        res = tuple(
            int(np.ceil(base_res * np.exp(i * log_b) - 1.0)) + 1
            for i in range(levels)
        )
        return TriPlaneSpec(
            levels=levels,
            feat_dim=feat_dim,
            base_res=base_res,
            max_res=max_res,
            log_b=log_b,
            resolutions=res,
        )

    def init_planes(self, key, dtype=jnp.float32):
        """Uniform[0,1) init (reference: modules/triplane.py:129-136)."""
        import jax

        return jax.random.uniform(
            key, (self.total_params,), dtype=jnp.float32
        ).astype(dtype)


def triplane_encode(planes, xyz, spec: TriPlaneSpec):
    """Encode positions through the tri-plane grid.

    Args:
        planes: flat (3 * max_res^2 * feat_dim,) parameter vector,
            layout [plane][cell][feat] (reference: modules/triplane.py:84-92).
        xyz: (N, 3) positions in [0, 1].
    Returns:
        (N, levels * feat_dim) f32 embedding, ordered [feat][level]
        (reference: modules/triplane.py:43-44 index convention).
    """
    n = xyz.shape[0]
    mr = spec.max_res
    planes3 = planes.reshape(3, mr * mr, spec.feat_dim)

    # plane projections: (x,y), (y,z), (z,x) -> (N, 3, 2)
    proj = jnp.stack(
        [xyz[:, [0, 1]], xyz[:, [1, 2]], xyz[:, [2, 0]]], axis=1
    ).astype(jnp.float32)

    resolutions = jnp.asarray(spec.resolutions, jnp.float32)  # (L,)
    pos = proj[:, None] * (resolutions[None, :, None, None] - 1.0) + 0.5
    pg = jnp.floor(pos)
    frac = pos - pg  # (N, L, 3, 2)
    pg = pg.astype(jnp.float32)

    corner = jnp.arange(4, dtype=jnp.int32)
    corner_off = jnp.stack([(corner >> d) & 1 for d in range(2)], -1)  # (4, 2)
    co = corner_off[None, None, None].astype(jnp.float32)  # (1,1,1,4,2)

    local = pg[:, :, :, None, :] + co  # (N, L, 3, 4, 2)
    w = jnp.where(co == 1, frac[:, :, :, None, :], 1.0 - frac[:, :, :, None, :])
    w = w.prod(-1)  # (N, L, 3, 4)

    # map level-local corner coords up to the shared max-res plane
    # (reference: modules/triplane.py:72-76 — float divide then truncate)
    ori = (local / resolutions[None, :, None, None, None] * (mr - 1)).astype(
        jnp.int32
    )
    cell = ori[..., 0] + ori[..., 1] * mr  # (N, L, 3, 4)

    # gather (N, L, 3, 4, F) per-plane features and bilerp
    plane_idx = jnp.arange(3)[None, None, :, None]
    feats = planes3[plane_idx, cell].astype(jnp.float32)  # (N, L, 3, 4, F)
    plane_feat = jnp.sum(feats * w[..., None], axis=3)  # (N, L, 3, F)

    out = jnp.prod(plane_feat, axis=2)  # (N, L, F)
    # output ordering [feat][level] (sn = j * levels + level)
    return jnp.transpose(out, (0, 2, 1)).reshape(n, spec.out_dim)
