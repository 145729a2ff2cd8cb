"""Multiresolution hash-grid encoder, TPU-native.

Replicates the reference's table layout and indexing exactly
(reference: modules/hash_encoder.py:44-145,183-207; modules/utils.py:19-42):

- per-level scale ``base_res * exp(level * log_b) - 1`` with
  ``log_b = ln(max_res/base_res)/(levels-1)``,
- per-level table size ``min(2^log2_T, align8(res^3))`` packed into one flat
  parameter vector via cumulative offsets,
- dense ("under hash") indexing below ``begin_fast_hash_level`` and
  XOR-prime hashing (primes 1, 2654435761, 805459861) above it,
- trilinear interpolation over the 8 cell corners.

The forward is a batched XLA gather over (N, levels, 8) corner rows; JAX
autodiff derives the backward as a scatter-add into the table — the exact
gradient the reference gets from Taichi autodiff
(modules/hash_encoder.py:264-277).  The table may be bf16 (the TPU-native
equivalent of the reference's fp16 variant, modules/hash_encoder_half.py);
interpolation always accumulates in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


def _align_to(x: int, y: int) -> int:
    # reference: modules/utils.py:41-42
    return int((x + y - 1) // y) * y


@dataclass(frozen=True)
class HashGridSpec:
    """Static layout of the multiresolution hash table."""

    levels: int
    feat_dim: int
    base_res: float
    log_b: float
    offsets: Tuple[int, ...]  # per-level row offset into the flat table
    sizes: Tuple[int, ...]  # per-level number of rows
    scales: Tuple[float, ...]  # per-level grid scale (res - 1 before ceil)
    resolutions: Tuple[int, ...]
    begin_fast_hash_level: int
    total_rows: int

    @property
    def out_dim(self) -> int:
        return self.levels * self.feat_dim

    @property
    def total_params(self) -> int:
        return self.total_rows * self.feat_dim

    @staticmethod
    def create(
        levels: int = 16,
        feat_dim: int = 2,
        base_res: float = 16.0,
        max_res: float = 2048.0,
        max_params: int = 2**19,
    ) -> "HashGridSpec":
        # reference: modules/utils.py:31-39, modules/hash_encoder.py:183-207
        log_b = float(np.log(float(max_res) / float(base_res)) / float(levels - 1))
        offsets, sizes, scales, resolutions = [], [], [], []
        offset = 0
        begin_fast = levels
        for i in range(levels):
            scale = float(base_res) * float(np.exp(i * log_b)) - 1.0
            res = int(np.ceil(scale)) + 1
            full_size = res**3
            full_aligned = _align_to(full_size, 8)
            size_i = min(int(max_params), full_aligned)
            offsets.append(offset)
            sizes.append(size_i)
            scales.append(scale)
            resolutions.append(res)
            if full_size > size_i and begin_fast == levels:
                begin_fast = i
            offset += size_i
        return HashGridSpec(
            levels=levels,
            feat_dim=feat_dim,
            base_res=float(base_res),
            log_b=log_b,
            offsets=tuple(offsets),
            sizes=tuple(sizes),
            scales=tuple(scales),
            resolutions=tuple(resolutions),
            begin_fast_hash_level=begin_fast,
            total_rows=offset,
        )

    def init_table(self, key, dtype=jnp.float32):
        """Uniform[0,1) init, matching torch.nn.init.uniform_ defaults
        (reference: modules/hash_encoder.py:220-227)."""
        import jax

        return jax.random.uniform(
            key, (self.total_params,), dtype=jnp.float32
        ).astype(dtype)


def hash_corner_indices(spec: HashGridSpec, xyz):
    """Compute per-level, per-corner flat table row indices and trilerp weights.

    Layout is batch-minor ``(L, 8, N)``: the batch axis N sits in the
    TPU lane dimension so every intermediate tiles onto (8, 128) vregs
    without padding.  The naive ``(N, L, 8)``/``(N, L, 8, F)`` layout puts a
    tiny axis (8 or feat_dim=2) in the lanes and inflates HBM footprint by
    up to 64x (observed: 16 GB OOM for a 0.4 GB logical footprint).

    Args:
        spec: static layout.
        xyz: (N, 3) positions normalized to [0, 1].
    Returns:
        rows: (L, 8, N) int32 absolute row indices into the flat table.
        weights: (L, 8, N) f32 trilinear weights.
    """
    scales = jnp.asarray(spec.scales, jnp.float32)[:, None, None]  # (L,1,1)
    resolutions = jnp.asarray(spec.resolutions, jnp.uint32)[:, None, None]
    sizes = jnp.asarray(spec.sizes, jnp.uint32)[:, None, None]
    offsets = jnp.asarray(spec.offsets, jnp.int32)[:, None, None]

    xyzT = xyz.T.astype(jnp.float32)  # (3, N)
    pos = xyzT[None, :, :] * scales + 0.5  # (L, 3, N)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # (L, 3, N)
    pos_grid = pos_grid.astype(jnp.uint32)

    # 8 corners: bit d of corner idx selects low/high along dim d
    corner = jnp.arange(8, dtype=jnp.uint32)
    corner_offset = jnp.stack(
        [(corner >> d) & jnp.uint32(1) for d in range(3)], axis=-1
    )  # (8, 3)

    # (L, 8, 3, N) per-corner grid coords and trilerp factors
    grid_local = pos_grid[:, None, :, :] + corner_offset[None, :, :, None]
    # trilinear weight: prod over dims of (frac if high else 1-frac)
    w = jnp.where(
        corner_offset[None, :, :, None] == 1,
        frac[:, None, :, :],
        1.0 - frac[:, None, :, :],
    ).prod(axis=2)  # (L, 8, N)

    # dense indexing (levels below begin_fast_hash_level)
    under = (
        grid_local[:, :, 0]
        + grid_local[:, :, 1] * resolutions
        + grid_local[:, :, 2] * resolutions * resolutions
    )
    # XOR-prime fast hash (reference: modules/hash_encoder.py:43-51)
    fast = (
        grid_local[:, :, 0] * jnp.uint32(_PRIMES[0])
        ^ grid_local[:, :, 1] * jnp.uint32(_PRIMES[1])
        ^ grid_local[:, :, 2] * jnp.uint32(_PRIMES[2])
    )
    level_is_dense = (
        jnp.arange(spec.levels, dtype=jnp.int32) < spec.begin_fast_hash_level
    )[:, None, None]
    idx = jnp.where(level_is_dense, under, fast) % sizes
    rows = offsets + idx.astype(jnp.int32)
    return rows, w


def _row_gather_encode(table, rows, w, spec: HashGridSpec):
    """Forward math shared by primal and VJP: per-level row gathers.

    One ``take`` per level over that level's (rows, F) slab: row gathers cost
    ~6 ns/op on TPU regardless of width (measured), so fetching F features
    per gather — instead of F scalar gathers — halves the op count, and the
    16 independent per-level gathers can overlap in the schedule.
    """
    table2d = table.reshape(spec.total_rows, spec.feat_dim)
    outs = []
    n = rows.shape[-1]
    for lvl in range(spec.levels):
        feats = jnp.take(
            table2d, rows[lvl].reshape(-1), axis=0, mode="clip"
        )  # (8N, F)
        feats = feats.reshape(8, n, spec.feat_dim).astype(jnp.float32)
        outs.append(jnp.einsum("cnf,cn->nf", feats, w[lvl]))  # (N, F)
    return jnp.concatenate(outs, axis=1)  # (N, L*F)


def _segment_rows_sum(vals, rows_local, n_rows: int, force_sort=None):
    """Dense per-row sums of ``vals`` grouped by ``rows_local`` WITHOUT a
    scatter: sort by row, cumsum, subtract at segment boundaries.

    XLA's scatter-add costs ~42 ns/element on TPU vs ~4 ns/element for a
    sort (measured 16 ms / 4.2M keys+payload), so this is the fast path for
    the hash-table gradient.  The boundary positions are found with one
    ``searchsorted`` over the level-LOCAL row range (n_rows <= 2^19).

    Args:
        vals: (K, F) f32 values.
        rows_local: (K,) int32 row ids in [0, n_rows).
    Returns:
        (n_rows, F) f32 dense sums.
    """
    K, F = vals.shape
    use_sort = (
        force_sort
        if force_sort is not None
        else jax.default_backend() == "tpu"
    )
    if not use_sort:
        # CPU/GPU: the native scatter-add is faster than the sort pipeline
        return (
            jnp.zeros((n_rows, F), jnp.float32).at[rows_local].add(vals)
        )
    sk, *svs = jax.lax.sort(
        [rows_local] + [vals[:, f] for f in range(F)], num_keys=1
    )
    starts = jnp.searchsorted(
        sk, jnp.arange(n_rows, dtype=rows_local.dtype), method="sort"
    )
    outs = []
    for sv in svs:
        cs = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(sv)])
        cs_starts = cs[starts]
        # ends[r] == starts[r+1] (and K for the last row), so cs[ends] is
        # just a shift of cs[starts] — one boundary gather, not two
        cs_ends = jnp.concatenate([cs_starts[1:], cs[-1:]])
        outs.append(cs_ends - cs_starts)
    return jnp.stack(outs, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table, xyz, spec: HashGridSpec):
    """Encode positions through the multiresolution hash grid.

    Custom VJP: the gradient flows only into the table (sample positions
    come from the non-differentiable ray march, exactly as in the reference
    where Taichi autodiff only produces table grads,
    modules/hash_encoder.py:264-277); the backward builds the dense table
    gradient with the sort+cumsum segment reduction above.

    Args:
        table: (total_rows * feat_dim,) flat parameter vector (f32 or bf16).
        xyz: (N, 3) positions in [0, 1].
        spec: static layout.
    Returns:
        (N, levels * feat_dim) f32 embedding.
    """
    rows, w = hash_corner_indices(spec, xyz)  # (L, 8, N) each
    return _row_gather_encode(table, rows, w, spec)


def _hash_encode_fwd(table, xyz, spec: HashGridSpec):
    rows, w = hash_corner_indices(spec, xyz)
    out = _row_gather_encode(table, rows, w, spec)
    # zero-size carrier for the table dtype (residuals must be arrays)
    return out, (rows, w, jnp.zeros((0,), table.dtype))


def _hash_encode_bwd(spec: HashGridSpec, res, g):
    rows, w, dtype_carrier = res  # rows/w: (L, 8, N)
    table_dtype = dtype_carrier.dtype
    n = rows.shape[-1]
    g = g.reshape(n, spec.levels, spec.feat_dim)  # (N, L, F)
    slabs = []
    for lvl in range(spec.levels):
        # d out / d feats[c] = w[c]  ->  corner grad = w (8, N) x g_l (N, F)
        gv = (
            w[lvl][:, :, None] * g[:, lvl, :][None, :, :]
        ).reshape(8 * n, spec.feat_dim)
        local = rows[lvl].reshape(-1) - spec.offsets[lvl]
        slabs.append(_segment_rows_sum(gv, local, spec.sizes[lvl]))
    # level ranges partition [0, total_rows): concatenate the per-level slabs
    grad_table = jnp.concatenate(slabs, axis=0)
    return (grad_table.reshape(-1).astype(table_dtype), None)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)
