"""Instant-NGP model: hash/triplane encoder + tiny MLPs + SH directions.

Functional counterpart of the reference's torch module
(reference: modules/networks.py:32-191): parameters are one NamedTuple
pytree, the model object holds only static configuration, and every method is
a pure function ready for jit/grad/shard_map.

Architecture parity:
- xyz net: 1 hidden layer x 64, no bias, 16 outputs; sigma = TruncExp(out[0])
  (modules/networks.py:91-97,134-148),
- rgb net: 2 hidden layers x 64, no bias, sigmoid output, input = SH(dir) ++
  xyz features (modules/networks.py:99-112,150-164),
- degree-4 SH on (d+1)/2 with d normalized (modules/networks.py:160-161).

TPU notes: the MLPs are (batch, 32..64) x (64, 64) matmuls — sized for VMEM
residency; compute dtype is configurable (bf16 keeps the MXU fed, params and
accumulation stay f32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.ops.common import trunc_exp
from virus_nerf_tpu.ops.hash_encoder import (
    HashGridSpec,
    hash_encode,
    hash_encode_xor,
)
from virus_nerf_tpu.ops.sh import sh_encode
from virus_nerf_tpu.ops.triplane import TriPlaneSpec, triplane_encode


class NGPParams(NamedTuple):
    pos_table: jax.Array  # hash table (T,) or triplane planes (3, R, R, F)
    xyz_w: Tuple[jax.Array, ...]  # xyz MLP weights, (in, out) each, no bias
    rgb_w: Tuple[jax.Array, ...]  # rgb MLP weights


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@dataclass(frozen=True)
class NGPModel:
    """Static model configuration (hashable, safe to close over in jit)."""

    scale: float = 0.5
    pos_encoder_type: str = "hash"  # "hash" | "triplane"
    # "additive": fused-corner hash, 1 widened-row gather per sample-level
    # (production; ops/hash_encoder.py module doc).  "xor": the reference's
    # per-corner XOR fast-hash, bit-matching modules/hash_encoder.py:43-62
    # — 8 gathers per sample-level; used for the quality ablation.
    hash_variant: str = "additive"
    levels: int = 16
    feature_per_level: int = 2
    log2_T: int = 19
    base_res: int = 16
    max_res: int = 2048
    xyz_net_width: int = 64
    xyz_net_depth: int = 1
    xyz_net_out_dim: int = 16
    rgb_net_width: int = 64
    rgb_net_depth: int = 2
    grid_size: int = 128
    # "float32": everything f32.  "bfloat16": table PARAMS and matmuls bf16
    # (the reference's half_opt table, modules/hash_encoder_half.py).
    # "mixed": params stay f32, compute (table gathers + matmuls) casts to
    # bf16 — the TPU shape of the reference's fp16 autocast training
    # (training/trainer.py:104); no GradScaler needed, bf16 has f32 range.
    compute_dtype: str = "float32"  # "float32" | "bfloat16" | "mixed"

    @property
    def cascades(self) -> int:
        # reference: modules/networks.py:65
        return max(1 + int(np.ceil(np.log2(2.0 * self.scale))), 1)

    @property
    def hash_spec(self) -> HashGridSpec:
        return HashGridSpec.create(
            levels=self.levels,
            feat_dim=self.feature_per_level,
            base_res=self.base_res,
            max_res=self.max_res,
            max_params=2**self.log2_T,
        )

    @property
    def triplane_spec(self) -> TriPlaneSpec:
        # reference picks 8 levels x 4 features for triplane
        # (modules/networks.py:81-87)
        return TriPlaneSpec.create(max_res=self.max_res, feat_dim=4)

    @property
    def pos_out_dim(self) -> int:
        if self.pos_encoder_type == "hash":
            return self.hash_spec.out_dim
        return self.triplane_spec.out_dim

    @property
    def _dtype(self):
        if self.compute_dtype in ("bfloat16", "mixed"):
            return jnp.bfloat16
        return jnp.float32

    @property
    def _param_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    # ------------------------------------------------------------------ init
    def init(self, key) -> NGPParams:
        k_table, *ks = jax.random.split(key, 7)
        if self.pos_encoder_type == "hash":
            table = self.hash_spec.init_table(k_table, dtype=self._param_dtype)
        elif self.pos_encoder_type == "triplane":
            table = self.triplane_spec.init_planes(
                k_table, dtype=self._param_dtype
            )
        else:
            raise ValueError(f"unknown pos_encoder_type {self.pos_encoder_type}")

        dims_xyz = (
            [self.pos_out_dim]
            + [self.xyz_net_width] * self.xyz_net_depth
            + [self.xyz_net_out_dim]
        )
        xyz_w = tuple(
            _xavier_uniform(ks[i], (dims_xyz[i], dims_xyz[i + 1]))
            for i in range(len(dims_xyz) - 1)
        )
        rgb_in = 16 + self.xyz_net_out_dim  # SH(16) ++ xyz features
        dims_rgb = [rgb_in] + [self.rgb_net_width] * self.rgb_net_depth + [3]
        rgb_w = tuple(
            _xavier_uniform(ks[3 + i], (dims_rgb[i], dims_rgb[i + 1]))
            for i in range(len(dims_rgb) - 1)
        )
        return NGPParams(pos_table=table, xyz_w=xyz_w, rgb_w=rgb_w)

    # ----------------------------------------------------------------- apply
    def _encode_pos(self, params: NGPParams, x_unit):
        # "mixed": f32 params gathered/combined in bf16 — the cast sits
        # inside the differentiated graph, so table grads come back through
        # it to f32 (bf16-rounded values, like the reference's fp16
        # autocast backward)
        table = params.pos_table.astype(self._dtype)
        if self.pos_encoder_type == "hash":
            if self.hash_variant == "xor":
                return hash_encode_xor(table, x_unit, self.hash_spec)
            return hash_encode(table, x_unit, self.hash_spec)
        return triplane_encode(table, x_unit, self.triplane_spec)

    def _mlp(self, weights, x, final_activation=None):
        dt = self._dtype
        h = x.astype(dt)
        for i, w in enumerate(weights):
            h = jnp.dot(h, w.astype(dt), preferred_element_type=jnp.float32)
            if i < len(weights) - 1:
                h = jax.nn.relu(h)
            h = h.astype(dt)
        h = h.astype(jnp.float32)
        return final_activation(h) if final_activation else h

    def density(self, params: NGPParams, x, return_feat: bool = False):
        """Density at positions x in [-scale, scale]^3
        (reference: modules/networks.py:134-148)."""
        shape = x.shape[:-1]
        x_unit = (x.reshape(-1, 3) + self.scale) / (2.0 * self.scale)
        emb = self._encode_pos(params, x_unit)
        h = self._mlp(params.xyz_w, emb)
        sigma = trunc_exp(h[:, 0]).reshape(shape)
        if return_feat:
            return sigma, h.reshape(*shape, self.xyz_net_out_dim)
        return sigma

    def forward(self, params: NGPParams, x, d):
        """Density + color (reference: modules/networks.py:150-164).

        Args:
            x: (..., 3) positions in [-scale, scale]^3.
            d: (..., 3) view directions (any norm).
        Returns:
            sigma: (...), rgb: (..., 3).
        """
        shape = x.shape[:-1]
        sigma, feat = self.density(params, x, return_feat=True)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sh = sh_encode((d.reshape(-1, 3) + 1.0) / 2.0)
        rgb_in = jnp.concatenate([sh, feat.reshape(-1, self.xyz_net_out_dim)], -1)
        rgb = self._mlp(params.rgb_w, rgb_in, final_activation=jax.nn.sigmoid)
        return sigma, rgb.reshape(*shape, 3)
