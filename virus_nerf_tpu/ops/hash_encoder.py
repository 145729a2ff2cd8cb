"""Multiresolution hash-grid encoder, TPU-native (fused-corner design).

Mirrors the reference's table *layout* exactly (per-level scale
``base_res * exp(level*log_b) - 1``, table size ``min(2^log2_T,
align8(res^3))`` packed into one flat vector, dense indexing below
``begin_fast_hash_level``; reference: modules/hash_encoder.py:44-145,183-207,
modules/utils.py:19-42) but replaces the XOR-prime hash of the fast levels
with an **additive** hash

    idx = (x + y*P2 + z*P3) mod size        (P2, P3 the reference's primes)

so that ALL eight trilinear corners of a sample sit at fixed per-level row
offsets {0, 1, Cy, Cy+1, Cz, Cz+1, Cy+Cz, Cy+Cz+1} (mod size) from the base
corner — for dense levels this is bit-exact with the reference's
``under_hash`` (Cy=res, Cz=res^2 including its boundary wrap-around), for
hashed levels it is a different but statistically equivalent hash (additive
lattice hashing; collision structure is a sheared lattice instead of the
XOR folding — both are translation-structured).  Measured (BASELINE.md
quality table, 2000-step convergence on the same seed vs the
``hash_encode_xor`` reference-parity variant below): converged mapping
quality is equivalent (mean NND z3 0.200 vs 0.193 m, identical median /
inlier / PSNR / SSIM) while the additive forward trains ~4-6x faster
(1 gather per sample-level instead of 8).

Why: on TPU the encoder's cost is gather-bound, and XLA's gather cost is
per-ROW, not per-byte (measured ~5-9 ns/row in the scan-fused train step
regardless of 8-64 B width).  The additive hash lets one row of a derived
**widened table** ``W[r] = [T[r+o_0], ..., T[r+o_7]]`` (eight rolls of the
level slab, rebuilt per step for ~1 ms of bandwidth) serve a full trilerp:
ONE gathered row per (sample, level) instead of eight — an 8x reduction of
the dominant cost.  The backward sorts 8x fewer keys for the same reason.
Large slabs are additionally gathered through a PACKED bf16 view — eight
widened rows per 128-lane row, so the gather takes the fast contiguous
row-major form instead of 8F scattered col-major fetches
(``_gather_rows_packed_bf16``; 45.2k -> 60.3k rays/s on the bench).

Forward is a single batched gather + einsum; backward (`jax.custom_vjp`,
table-gradient only, like the reference where Taichi autodiff produces only
table grads, modules/hash_encoder.py:264-277) is a per-level sort-based
segment reduction into the widened-gradient, folded back onto the base
table with eight inverse rolls.
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.ops.common import tpu_kernels_enabled
from virus_nerf_tpu.ops.segment_sum_pallas import (
    fuse_applicable,
    group_segment_sum_t,
    group_segment_sum_t_sorted,
    group_segment_sum_ts_sorted,
    group_segment_sum_tsf_sorted,
    kernel_applicable,
    stream_dtype,
    transposed_stream,
    ts_applicable,
)

# the reference's hashing primes (modules/hash_encoder.py:43-51); prime for
# x is 1, so the additive variant keeps x-stride exactly 1
_PRIME_Y = 2654435761
_PRIME_Z = 805459861


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
    stride_y: Tuple[int, ...]  # per-level row stride of a +1 step in y
    stride_z: Tuple[int, ...]  # per-level row stride of a +1 step in z

    @property
    def out_dim(self) -> int:
        return self.levels * self.feat_dim

    @property
    def total_params(self) -> int:
        return self.total_rows * self.feat_dim

    @property
    def corner_offsets(self) -> np.ndarray:
        """(L, 8) row offsets of the 8 trilerp corners from the base corner
        (corner bit d selects the +1 step along dim d)."""
        out = np.zeros((self.levels, 8), np.int64)
        for lvl in range(self.levels):
            s = self.sizes[lvl]
            cy, cz = self.stride_y[lvl], self.stride_z[lvl]
            for c in range(8):
                o = (c & 1) * 1 + ((c >> 1) & 1) * cy + ((c >> 2) & 1) * cz
                out[lvl, c] = o % s
        return out

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
        stride_y, stride_z = [], []
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
            dense = full_size <= size_i
            stride_y.append(res if dense else _PRIME_Y % size_i)
            stride_z.append(res * res if dense else _PRIME_Z % size_i)
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
            stride_y=tuple(stride_y),
            stride_z=tuple(stride_z),
        )

    def init_table(self, key, dtype=jnp.float32):
        """Uniform[0,1) init, matching torch.nn.init.uniform_ defaults
        (reference: modules/hash_encoder.py:220-227).

        Shaped (total_rows, feat_dim): keeping the table 2-D end to end
        (params, Adam state, gradients) lets XLA keep its preferred
        column-major {0,1:T(2,128)} layout for narrow tables through the
        whole step — the flat<->2-D reshapes at the encode boundaries
        measured ~17 ms/step of pure relayout copies (tools/PERF_NOTES.md).
        """
        return jax.random.uniform(
            key, (self.total_rows, self.feat_dim), dtype=jnp.float32
        ).astype(dtype)


def hash_base_rows(spec: HashGridSpec, xyz):
    """Base-corner rows and trilinear weights for every (sample, level).

    Layout is batch-minor: the sample axis N sits in the TPU lane dimension
    so every intermediate tiles onto (8, 128) vregs without padding (a
    batch-major (N, L, 8) layout puts a tiny axis in the lanes and inflates
    HBM footprint up to 64x).

    Args:
        spec: static layout.
        xyz: (N, 3) positions normalized to [0, 1].
    Returns:
        rows: (L, N) int32 absolute base rows into the flat table.
        weights: (L, 8, N) f32 trilinear weights (corner bit d = +1 along d).
    """
    scales = jnp.asarray(spec.scales, jnp.float32)[:, None, None]  # (L,1,1)
    sizes = jnp.asarray(spec.sizes, jnp.uint32)[:, None]
    offsets = jnp.asarray(spec.offsets, jnp.int32)[:, None]
    sy = jnp.asarray(spec.stride_y, jnp.uint32)[:, None]
    sz = jnp.asarray(spec.stride_z, jnp.uint32)[:, None]

    xyzT = xyz.T.astype(jnp.float32)  # (3, N)
    pos = xyzT[None, :, :] * scales + 0.5  # (L, 3, N)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid  # (L, 3, N)
    pg = pos_grid.astype(jnp.uint32)

    # additive hash of the base (floor) corner; uint32 wrap-around is fine
    # because the strides are already reduced mod size and sizes are powers
    # of two for hashed levels / exact for dense levels
    base = (pg[:, 0] + pg[:, 1] * sy + pg[:, 2] * sz) % sizes  # (L, N)
    rows = offsets + base.astype(jnp.int32)

    corner = jnp.arange(8, dtype=jnp.uint32)
    corner_sel = jnp.stack(
        [(corner >> d) & jnp.uint32(1) for d in range(3)], axis=-1
    )  # (8, 3)
    w = jnp.where(
        corner_sel.T[None, :, :, None] == 1,  # (1, 3, 8, 1)
        frac[:, :, None, :],  # (L, 3, 1, N)
        1.0 - frac[:, :, None, :],
    ).prod(axis=1)  # (L, 8, N)
    return rows, w


def _same_size_level_groups(spec: HashGridSpec):
    """Contiguous runs of levels sharing (size, stride_y, stride_z) — the
    hashed levels all share them (stride = PRIME % size), so the big group
    batches into one tensor.  Sizes are nondecreasing, so equal-size levels
    are always contiguous in the table."""
    groups = []  # (lvl_start, lvls list)
    for lvl in range(spec.levels):
        key = (spec.sizes[lvl], spec.stride_y[lvl], spec.stride_z[lvl])
        if groups and groups[-1][0] == key:
            groups[-1][1].append(lvl)
        else:
            groups.append((key, [lvl]))
    return [(k[0], k[1], k[2], ls) for k, ls in groups]


class PackedCI:
    """A packed bf16 gather slab emitted by the widen-pack Pallas kernel:
    (size/8, 128) rows, CORNER-major lane layout [c, i, f] (see
    ops/widen_pack_pallas.py module doc).  Wrapped so the gather path can
    tell it apart from a plain (size, 8F) wide slab."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr


class PackedRows:
    """A ready-made packed bf16 gather slab: (size/P, 128) rows in the
    plain q = r // P row order with lanes [j, c, f] (j = r % P) — the
    exact layout `_gather_rows_packed_bf16` derives from a wide slab, but
    built directly in packed space (`_packed_slab_direct`)."""

    __slots__ = ("arr", "wdt")

    def __init__(self, arr, wdt):
        self.arr = arr
        self.wdt = wdt


def _packed_slab_direct(slab, spec: HashGridSpec, lvl: int):
    """Build the packed bf16 gather slab for one packable level WITHOUT
    the wide (s, 8F) intermediate and its row-major pack relayout.

    Target layout (what `_gather_rows_packed_bf16` reads):
        out[q, j*8F + c*F + f] = bf16(T[(P*q + j + o_c) mod s, f])
    Construction: cast the narrow slab to bf16, reshape to the packed
    narrow view npk (s/P, P*F) (a relayout of s*F elements — 1/8 of the
    wide relayout this replaces), then per corner offset o_c = P*a + b:
    lanes j < P-b read roll(npk, -a) at lane block j+b, lanes j >= P-b
    read roll(npk, -(a+1)) at lane block j+b-P — two row-rolls + one
    static lane concat per corner, and a static [c,j,f] -> [j,c,f] lane
    interleave at the end.  Pure permutations of the same bf16 values as
    the roll-built wide slab: BIT-identical by construction (tested).
    """
    s = spec.sizes[lvl]
    F = spec.feat_dim
    wdt = 8 * F
    P = 128 // wdt
    npk = slab.astype(jnp.bfloat16).reshape(s // P, P * F)
    corners = []
    for c in range(8):
        o = int(spec.corner_offsets[lvl, c])
        a, b = o // P, o % P
        A = jnp.roll(npk, -a, axis=0)
        if b == 0:
            corners.append(A)
        else:
            B = jnp.roll(npk, -(a + 1), axis=0)
            corners.append(
                jnp.concatenate([A[:, b * F:], B[:, : b * F]], axis=1)
            )
    blocks = []
    for j in range(P):
        blocks.extend(cc[:, j * F : (j + 1) * F] for cc in corners)
    return PackedRows(jnp.concatenate(blocks, axis=1), wdt)


def _pack_direct_on() -> bool:
    # Default OFF: bit-identical to the wide build + pack, but FALSIFIED
    # in-train (100.6k vs 176.4k rays/s on the 8x4 bench config) — the
    # narrow-view double row-roll + static lane concat + [c,j,f]->[j,c,f]
    # interleave are each relayouts of the SAME (size/P, 128) slab, and
    # XLA cannot fuse them into the consuming gather, so the "skipped"
    # wide intermediate is replaced by ~3 materialized packed-space
    # copies.  Same lesson as widen-pack (round 4): the in-scan wide
    # build+pack is already ~1.2 ms of well-fused work; layout tricks
    # that add unfusable permutations lose.  tools/PERF_NOTES.md round 5.
    return (
        tpu_kernels_enabled()
        and os.environ.get("VNERF_PACK_DIRECT", "0") == "1"
    )


def _pack_kernel_on() -> bool:
    # Default OFF: the widen-pack kernel is bit-exact but LOSES in-train
    # (58.2k vs 116.9k rays/s on the bench config) — the int32 bit-pair
    # output must cross an XLA bitcast+reshape boundary whose 16-bit
    # relayout (lane-paired pairs vs the TPU's row-paired bf16 tiles)
    # fully materializes once the gathers consume the slab.  Kept as an
    # env-gated experiment; see tools/PERF_NOTES.md round 4.
    return (
        tpu_kernels_enabled()
        and os.environ.get("VNERF_PACK_KERNEL", "0") == "1"
    )


def build_wide_slabs(table, spec: HashGridSpec):
    """Derive per-level widened slabs W_l (size_l, 8*F): row r holds the
    features of the 8 corner rows {r + o_k mod size_l}.

    Eight rolls of each level slab — pure bandwidth (~0.5 GB for the
    full-size table), rebuilt inside the step whenever the table changed.
    Kept as a list (not one concatenated array): per-level gathers measure
    ~7x faster than one global gather of the same rows on TPU, and a
    batched (G, s, 8F) group build measured ~1.5% SLOWER end to end — the
    per-level `wide[j]` slices feeding the gathers re-materialize the slabs
    (tools/PERF_NOTES.md r3).

    On TPU, levels served by the packed bf16 gather skip the wide
    intermediate entirely: a same-size group builds its `PackedCI` slabs
    in ONE Pallas pass straight from the narrow table rows
    (ops/widen_pack_pallas.py), eliminating the per-level copy+reshape
    pack relayouts (~4.6 ms/step on the bench config, round-3 profile).
    """
    from virus_nerf_tpu.ops.widen_pack_pallas import (
        pack_kernel_applicable,
        packed_slabs_group,
    )

    F = spec.feat_dim
    # 2-D tables pass through untouched; flat ones (legacy/test callers)
    # pay the row-major unflatten here
    table2d = table if table.ndim == 2 else table.reshape(spec.total_rows, F)
    use_pack_kernel = _pack_kernel_on() and table2d.dtype == jnp.float32
    use_pack_direct = _pack_direct_on()
    corner_offs = spec.corner_offsets if use_pack_kernel else None
    slabs = [None] * spec.levels
    for size, _sy, _sz, lvls in _same_size_level_groups(spec):
        if (
            use_pack_kernel
            and _packable_size(size, F)
            and pack_kernel_applicable(size, F)
        ):
            packed = packed_slabs_group(
                table2d,
                spec.offsets[lvls[0]],
                size,
                len(lvls),
                corner_offs[lvls[0]],
            )
            for j, lvl in enumerate(lvls):
                slabs[lvl] = PackedCI(packed[j])
            continue
        for lvl in lvls:
            s = spec.sizes[lvl]
            o = spec.offsets[lvl]
            slab = jax.lax.dynamic_slice_in_dim(table2d, o, s, axis=0)
            if (
                use_pack_direct
                and slab.dtype == jnp.float32
                and _packable_size(s, F)
            ):
                slabs[lvl] = _packed_slab_direct(slab, spec, lvl)
                continue
            if slab.dtype == jnp.float32 and _packable_size(s, F):
                # levels served by the packed bf16 gather build their
                # widened slab in bf16 from the start: rolls are pure
                # permutations, so this is BIT-IDENTICAL to casting after
                # the build while halving the build and pack-relayout
                # bandwidth
                slab = slab.astype(jnp.bfloat16)
            # Doubling tree: corner offset o_c = (c&1)*1 + ((c>>1)&1)*cy +
            # ((c>>2)&1)*cz, so three widen-by-roll steps produce all eight
            # corners in corner order (x fastest).  A padded 2-D roll costs
            # one full-tile pass regardless of logical width, so 3 rolls
            # beat 7.
            wide = slab
            for stride in (1, spec.stride_y[lvl], spec.stride_z[lvl]):
                wide = jnp.concatenate(
                    [wide, jnp.roll(wide, -int(stride % s), axis=0)], axis=1
                )
            slabs[lvl] = wide  # (s, 8F)
    return slabs


_PACK_MIN_ROWS = 1 << 17  # pack only big slabs: small ones gather fast
# (VMEM promotion + index locality); the packed path pays a relayout


def _gather_rows_packed_bf16(slab, rows_local):
    """Packed-row bf16 gather for large widened slabs.

    XLA lays the roll-built (s, 8F) slab out column-major (table axis in
    lanes), so a row gather issues 8F scattered fetches (~25-35 ns/row
    measured on v5e).  Packing P = 128/(8F) consecutive rows into one
    128-lane bf16 row yields a naturally ROW-major (s/P, 128) array whose
    256-byte rows gather in the fast contiguous form (~8.7 ns/row); the
    wanted row is then selected with a one-hot einsum.  Measured 27%
    faster than the col-major f32 gather per level in the HBM regime
    (tools/PERF_NOTES.md e9) — at the cost of bf16-rounded features
    (precedent: the reference's fp16 encoder variant,
    modules/hash_encoder_half.py; converged-quality parity validated in
    BASELINE.md).  An f32-VIEW packing (halved relayout elements, 512-B
    rows) measured 16% slower in-train — falsified, tools/PERF_NOTES.md
    round 3.
    """
    s, wdt = slab.shape
    P = 128 // wdt
    n = rows_local.shape[0]
    packed = slab.astype(jnp.bfloat16).reshape(s // P, P * wdt)
    q = rows_local // P
    j = rows_local % P
    gp = jnp.take(packed, q, axis=0, mode="clip")  # (N, 128)
    sel = (
        j[:, None] == jnp.arange(P, dtype=jnp.int32)
    ).astype(jnp.bfloat16)  # (N, P)
    return jnp.einsum("nj,njf->nf", sel, gp.reshape(n, P, wdt))


def _gather_rows_prebuilt(pr: "PackedRows", rows_local):
    """Row gather from a `PackedRows` slab (same one-hot select as
    `_gather_rows_packed_bf16`, minus the pack construction)."""
    wdt = pr.wdt
    P = 128 // wdt
    n = rows_local.shape[0]
    q = rows_local // P
    j = rows_local % P
    gp = jnp.take(pr.arr, q, axis=0, mode="clip")  # (N, 128)
    sel = (
        j[:, None] == jnp.arange(P, dtype=jnp.int32)
    ).astype(jnp.bfloat16)  # (N, P)
    return jnp.einsum("nj,njf->nf", sel, gp.reshape(n, P, wdt))


def _gather_rows_packed_ci(packed, rows_local, F: int):
    """Row gather from a kernel-built `PackedCI` slab.

    Same fast contiguous row-major gather as `_gather_rows_packed_bf16`,
    but the 128-lane rows are corner-major ([c, i, f]) in the widen-pack
    kernel's band-permuted row order — `packed_ci_rows` is the row map
    (ops/widen_pack_pallas.py module doc).  Returns (N, 8F) bf16 in the
    c-major column order the trilerp expects.
    """
    from virus_nerf_tpu.ops.widen_pack_pallas import packed_ci_rows

    P = 8
    n = rows_local.shape[0]
    q, j = packed_ci_rows(rows_local, packed.shape[0])
    gp = jnp.take(packed, q, axis=0, mode="clip")  # (N, 128)
    sel = (
        j[:, None] == jnp.arange(P, dtype=jnp.int32)
    ).astype(jnp.bfloat16)  # (N, P)
    out = jnp.einsum(
        "ni,ncif->ncf", sel, gp.reshape(n, 8, P, F)
    )  # (N, 8, F) corner-major
    return out.reshape(n, 8 * F)


def _packable_size(size: int, F: int) -> bool:
    wdt = 8 * F
    return (
        wdt <= 64
        and 128 % wdt == 0
        and size % (128 // wdt) == 0
        and size >= _PACK_MIN_ROWS
    )


def _packable(slab, size: int, F: int) -> bool:
    return (
        slab.dtype in (jnp.float32, jnp.bfloat16)
        and _packable_size(size, F)
    )


def _gather_rows_f32view(slab, rows_local):
    """Gather rows of a widened slab through an f32 view.

    TPU gathers of sub-32-bit dtypes lower poorly (~2-5x slower measured);
    bf16 slabs are bitcast to half-width f32 rows for the gather and back
    after.
    """
    if slab.dtype == jnp.bfloat16:
        s, w = slab.shape
        view = jax.lax.bitcast_convert_type(
            slab.reshape(s, w // 2, 2), jnp.float32
        )  # (s, w//2)
        g = jnp.take(view, rows_local, axis=0, mode="clip")
        return jax.lax.bitcast_convert_type(g, jnp.bfloat16).reshape(
            rows_local.shape[0], w
        )
    return jnp.take(slab, rows_local, axis=0, mode="clip")


def _fused_gather_combine(slabs, rows, w, spec: HashGridSpec):
    """Per-level gathers of widened rows + trilerp combine."""
    F = spec.feat_dim
    n = rows.shape[-1]
    outs = []
    for lvl in range(spec.levels):
        local = rows[lvl] - spec.offsets[lvl]
        if isinstance(slabs[lvl], PackedRows):
            g = _gather_rows_prebuilt(slabs[lvl], local)
        elif isinstance(slabs[lvl], PackedCI):
            g = _gather_rows_packed_ci(slabs[lvl].arr, local, F)
        elif _packable(slabs[lvl], spec.sizes[lvl], F):
            g = _gather_rows_packed_bf16(slabs[lvl], local)  # (N, 8F) bf16
        else:
            g = _gather_rows_f32view(slabs[lvl], local)  # (N, 8F)
        g = g.reshape(n, 8, F).astype(jnp.float32)
        outs.append(jnp.einsum("ncf,cn->nf", g, w[lvl]))
    return jnp.concatenate(outs, axis=1)  # (N, L*F)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(table, xyz, spec: HashGridSpec):
    """Encode positions through the multiresolution hash grid.

    Custom VJP: the gradient flows only into the table (sample positions
    come from the non-differentiable ray march, exactly as in the reference,
    modules/hash_encoder.py:264-277).

    Args:
        table: (total_rows, feat_dim) parameter table (f32 or bf16); a
            flat (total_rows * feat_dim,) vector is also accepted (its
            gradient comes back flat too, at the cost of a relayout).
        xyz: (N, 3) positions in [0, 1].
        spec: static layout.
    Returns:
        (N, levels * feat_dim) f32 embedding.
    """
    rows, w = hash_base_rows(spec, xyz)
    slabs = build_wide_slabs(table, spec)
    return _fused_gather_combine(slabs, rows, w, spec)


def _hash_encode_fwd(table, xyz, spec: HashGridSpec):
    rows, w = hash_base_rows(spec, xyz)
    slabs = build_wide_slabs(table, spec)
    out = _fused_gather_combine(slabs, rows, w, spec)
    # zero-size carrier preserving the table's dtype AND rank (residuals
    # must be arrays; the bwd shapes its gradient like the input table)
    return out, (rows, w, table[:0])


_HIST_LO = 512  # lane-width bucket of the MXU histogram


def _mxu_starts(rows_local, n_rows: int):
    """Exclusive cumulative histogram of row ids via one-hot matmuls.

    ``starts[r] = #{i : rows[i] < r}`` — the segment-start positions in the
    sorted key order.  A searchsorted over all n_rows queries costs ~10 ms
    per level on TPU; counting instead with a bucketed one-hot contraction
    ``hist[hi, lo] = sum_i [rows_i//LO == hi][rows_i%LO == lo]`` runs on the
    MXU in well under a millisecond (bf16 one-hots, exact f32 accumulation —
    counts are integers < 2^24), and the exclusive cumsum of the flattened
    histogram is the starts vector.

    Args:
        rows_local: (G, K) int32 row ids in [0, n_rows).
    Returns:
        (G, n_rows) int32 starts.
    """
    G, K = rows_local.shape
    n_hi = -(-n_rows // _HIST_LO)  # ceil
    hi = rows_local // _HIST_LO  # (G, K)
    lo = rows_local % _HIST_LO
    A = (hi[:, :, None] == jnp.arange(n_hi, dtype=jnp.int32)).astype(
        jnp.bfloat16
    )  # (G, K, n_hi)
    B = (lo[:, :, None] == jnp.arange(_HIST_LO, dtype=jnp.int32)).astype(
        jnp.bfloat16
    )  # (G, K, LO)
    hist = jnp.einsum(
        "gkh,gkl->ghl", A, B, preferred_element_type=jnp.float32
    ).reshape(G, n_hi * _HIST_LO)
    starts = jnp.cumsum(hist, axis=1) - hist  # exclusive
    return starts[:, :n_rows].astype(jnp.int32)


def _batched_segment_rows_sum(vals, rows_local, n_rows: int):
    """Segment sums for a GROUP of same-size levels at once.

    Pipeline: one batched sort of (keys, iota); value permutation and the
    boundary lookup as per-level ``jnp.take`` calls (the fast gather form on
    TPU — take_along_axis on the batched layout measures 4-7x slower);
    segment starts from the MXU histogram above instead of searchsorted.

    Args:
        vals: (G, K, F) f32 per-level gradient rows.
        rows_local: (G, K) int32 row ids in [0, n_rows).
    Returns:
        (G, n_rows, F) f32 dense sums.
    """
    G, K, F = vals.shape
    pi = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (G, K))
    _, sp = jax.lax.sort([rows_local, pi], dimension=1, num_keys=1)
    sv = jnp.stack(
        [jnp.take(vals[g], sp[g], axis=0) for g in range(G)]
    )  # (G, K, F)
    cs = jnp.concatenate(
        [jnp.zeros((G, 1, F), jnp.float32), jnp.cumsum(sv, axis=1)], axis=1
    )  # (G, K+1, F)
    starts = _mxu_starts(rows_local, n_rows)  # (G, n_rows)
    cs_starts = jnp.stack(
        [jnp.take(cs[g], starts[g], axis=0) for g in range(G)]
    )  # (G, n_rows, F)
    # ends[r] == starts[r+1] (and K for the last row): shift, no 2nd gather
    cs_ends = jnp.concatenate([cs_starts[:, 1:], cs[:, -1:]], axis=1)
    return cs_ends - cs_starts


def _fold_wide(dt, sy: int, sz: int, s: int):
    """Fold a row-major widened gradient (..., s, 8F) -> (..., s, F):
    dT[r] += dW[(r - o_k) mod s, k], inverting the build's doubling tree
    (3 halve-by-roll steps, not 7 individual rolls — each padded 2-D roll
    costs one full-tile pass).  Batched over any leading axes (same-size
    level groups fold as ONE tensor)."""
    for stride in (sz, sy, 1):
        half = dt.shape[-1] // 2
        dt = dt[..., :half] + jnp.roll(
            dt[..., half:], int(stride % s), axis=-2
        )
    return dt


def _fold_wide_t(dt, sy: int, sz: int, s: int):
    """Fold a TRANSPOSED widened gradient (..., 8F, s) -> (..., F, s) —
    same doubling tree, but the rolls ride the lane axis of a lane-dense
    array instead of the sublane axis of an 8x lane-padded one.  Batched
    over any leading axes."""
    for stride in (sz, sy, 1):
        half = dt.shape[-2] // 2
        dt = dt[..., :half, :] + jnp.roll(
            dt[..., half:, :], int(stride % s), axis=-1
        )
    return dt


def _fold_wide_t_fmajor(dt, sy: int, sz: int, s: int, F: int):
    """`_fold_wide_t` for the FUSED kernel's F-major row order (row
    f*8 + c, see `_tsf_kernel`): each f-block of 8 rows is a pure-corner
    axis, folded with the same three halve-by-roll steps.  Per-block
    8-row-aligned slices instead of a (..., F, 8, s) reshape — the
    sublane-split reshape measured as a 1.3 ms/step layout copy on the
    bench config."""
    outs = []
    for f in range(F):
        blk = dt[..., 8 * f: 8 * f + 8, :]
        for stride in (sz, sy, 1):
            half = blk.shape[-2] // 2
            blk = blk[..., :half, :] + jnp.roll(
                blk[..., half:, :], int(stride % s), axis=-1
            )
        outs.append(blk)  # (..., 1, s)
    return jnp.concatenate(outs, axis=-2)  # (..., F, s)


def _hash_encode_bwd(spec: HashGridSpec, res, g):
    rows, w, table_carrier = res  # rows: (L, N); w: (L, 8, N)
    table_dtype = table_carrier.dtype
    F = spec.feat_dim
    n = rows.shape[-1]
    g = g.reshape(n, spec.levels, F)  # (N, L, F)

    use_kernel = tpu_kernels_enabled()
    use_ts = use_kernel and transposed_stream() and ts_applicable(8 * F)
    # fused factor stream (VNERF_WSS_FUSE): hand the kernel the raw
    # sorted (8 + F)-row weight/gradient factors and form the
    # outer-product values on the VPU inside it (`_tsf_kernel`) — the
    # XLA-side (K, 8F) wide-gradient build, its permute and its pad/copy
    # all disappear.  bf16-stream mode only (the product would need the
    # hi/lo split applied after the multiply).  Default OFF: bit-exact vs
    # the unfused path but measured NEUTRAL in-train (115.4k vs 116.9k
    # rays/s at the bench config) — the per-level chains it removes were
    # already fused into the per-row-bound permute gathers by XLA, so
    # only the kernel-boundary layout differences remain (tools/
    # PERF_NOTES.md round 4).
    use_fuse = (
        use_ts
        and fuse_applicable(F)
        and stream_dtype() == jnp.bfloat16
        and os.environ.get("VNERF_WSS_FUSE", "0") == "1"
        # the in-kernel bf16(w) x bf16(g) product is precision-equivalent
        # to the early factor cast — require that mode explicitly
        and os.environ.get("VNERF_WSS_EARLY_BF16", "0") == "1"
    )
    # the kernel consumes the gradient stream in bf16 (VNERF_WSS_HILO=0
    # default).  WHERE the bf16 rounding happens matters for quality:
    # pre-casting the FACTORS (w, g) to bf16 double-rounds — bf16(w) x
    # bf16(g), the trilinear weights themselves losing 16 mantissa bits —
    # while an f32 outer product rounded ONCE at the kernel boundary
    # keeps the product exact to the final rounding.  A 5-seed-per-arm
    # converged study (BASELINE.md round 4) found the two modes
    # statistically indistinguishable (0.239 +- 0.024 vs 0.246 +- 0.014
    # mean NND z3) and the early cast's bandwidth saving inside the
    # in-train noise band (117.3 vs 116.6k rays/s) — boundary rounding
    # is the default on principle (round once, late), with the early
    # cast opt-in via VNERF_WSS_EARLY_BF16=1.  Gated on kernel
    # APPLICABILITY, not just
    # availability: with feat_dim > 8 every group takes the XLA fallback,
    # which would consume pre-rounded bf16 products for no bandwidth
    # benefit (ADVICE r3)
    kernel_any = use_kernel and kernel_applicable(max(spec.sizes), 8 * F)
    early_bf16 = os.environ.get("VNERF_WSS_EARLY_BF16", "0") == "1"
    sdt = stream_dtype() if (kernel_any and early_bf16) else jnp.float32
    w_s = w.astype(sdt)
    g_s = g.astype(sdt)

    # d out / d W[base, kF+f] = w[k] * g[l, f]  ->  per-level (N, 8F) wide
    # grads, built lazily per level: materializing the (L, N, 8F) stack and
    # re-slicing it measured ~4.8 ms/step of pure relayout (copy of the
    # stacked layout + a 16-way slice fusion) on the bench config
    def gv_level(lvl):
        return (
            w_s[lvl].T[:, :, None] * g_s[:, lvl, None, :]
        ).reshape(n, 8 * F)

    local = rows - jnp.asarray(spec.offsets, jnp.int32)[:, None]  # (L, N)

    # group CONTIGUOUS same-(size, strides) level runs (the hashed levels
    # share all three) so each group reduces AND folds as ONE batched op;
    # the key sort batches across ALL levels regardless of size (sorting is
    # per-row independent) — one (L, N) sort instead of one per group
    pi = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), (spec.levels, n)
    )
    sk_all, sp_all = jax.lax.sort([local, pi], dimension=1, num_keys=1)

    def _take_sorted(lvl):
        return jnp.take(gv_level(lvl), sp_all[lvl], axis=0)  # (K, 8F)

    def _take_sorted_t(lvl):
        # transposed (8F, K) stream: one bf16 sublane tile tall, so the
        # kernel DMAs (8F, W) chunks with no 128-lane pad
        return _take_sorted(lvl).T

    def _take_sorted_wgt(lvl):
        # fused FACTOR stream (16, K): the level's sorted corner weights
        # stacked over its sorted gradient features — the kernel builds
        # the outer product itself, so no (K, 8F) value matrix exists.
        # Zero-padded to the 16-row bf16 sublane tile BEFORE the gather:
        # a (K, 8+F) take + transpose at 10 rows is sublane-misaligned
        # and measured ~2.4 ms/step slower than the aligned 16-row form
        # (gather cost is per-ROW, so the 6 dead lanes are free)
        pad = jnp.zeros((n, 16 - 8 - F), sdt)
        return jnp.take(
            jnp.concatenate([w_s[lvl].T, g_s[:, lvl], pad], axis=1),
            sp_all[lvl],
            axis=0,
        ).T

    def _emit_group(dwt, sy, sz, size, blocks):
        ft = _fold_wide_t(dwt, sy, sz, size)  # (G, F, size)
        blocks.append(
            ft.transpose(0, 2, 1).reshape(dwt.shape[0] * size, F)
        )

    def _emit_group_f(dwt, sy, sz, size, blocks):
        # F-major row order from the fused kernel
        ft = _fold_wide_t_fmajor(dwt, sy, sz, size, F)  # (G, F, size)
        blocks.append(
            ft.transpose(0, 2, 1).reshape(dwt.shape[0] * size, F)
        )

    def _emit_merged(buf, blocks):
        """One kernel call for a RUN of consecutive single-level groups
        (the small dense levels): each level's stream is key-sorted and the
        per-level base offsets ascend with level order, so the concatenated
        stream is globally sorted — M pallas_calls (each with its own pad,
        searchsorted, and launch overhead) collapse into one over the
        concatenated Sum(size) output rows."""
        if len(buf) == 1:
            size, sy, sz, lvl = buf[0]
            if use_fuse:
                dwt = group_segment_sum_tsf_sorted(
                    _take_sorted_wgt(lvl)[None], sk_all[lvl][None], size, F
                )
                _emit_group_f(dwt, sy, sz, size, blocks)
            elif use_ts:
                dwt = group_segment_sum_ts_sorted(
                    _take_sorted_t(lvl)[None], sk_all[lvl][None], size
                )
                _emit_group(dwt, sy, sz, size, blocks)
            else:
                dwt = group_segment_sum_t_sorted(
                    _take_sorted(lvl)[None], sk_all[lvl][None], size
                )
                _emit_group(dwt, sy, sz, size, blocks)
            return
        bases = np.cumsum([0] + [b[0] for b in buf])
        total = int(bases[-1])
        sk_m = jnp.concatenate(
            [sk_all[b[3]] + jnp.int32(bases[i]) for i, b in enumerate(buf)]
        )
        if use_fuse:
            sv_m = jnp.concatenate(
                [_take_sorted_wgt(b[3]) for b in buf], axis=1
            )
            out = group_segment_sum_tsf_sorted(
                sv_m[None], sk_m[None], total, F
            )
            for i, (size, sy, sz, lvl) in enumerate(buf):
                b0 = int(bases[i])
                _emit_group_f(out[:, :, b0:b0 + size], sy, sz, size, blocks)
            return
        if use_ts:
            sv_m = jnp.concatenate(
                [_take_sorted_t(b[3]) for b in buf], axis=1
            )
            out = group_segment_sum_ts_sorted(sv_m[None], sk_m[None], total)
        else:
            sv_m = jnp.concatenate(
                [_take_sorted(b[3]) for b in buf], axis=0
            )
            out = group_segment_sum_t_sorted(sv_m[None], sk_m[None], total)
        for i, (size, sy, sz, lvl) in enumerate(buf):
            b0 = int(bases[i])
            _emit_group(out[:, :, b0:b0 + size], sy, sz, size, blocks)

    blocks = []  # per-group (G*size, F) grad blocks, level order
    merge_buf = []  # pending run of single-level kernel-path groups
    for size, sy, sz, lvls in _same_size_level_groups(spec):
        G = len(lvls)
        eligible = use_kernel and kernel_applicable(size, 8 * F)
        if eligible and G == 1:
            merge_buf.append((size, sy, sz, lvls[0]))
            continue
        if merge_buf:
            _emit_merged(merge_buf, blocks)
            merge_buf = []
        idx = jnp.asarray(lvls, jnp.int32)
        if eligible:
            # windowed MXU segment-sum kernel, transposed layout end to end
            # (segment_sum_pallas module doc): (G, 8F, size) dense sums,
            # ONE batched lane-roll fold for the whole group, one
            # (G, F, size) -> (G, size, F) transpose
            if use_fuse:
                svt = jnp.stack([_take_sorted_wgt(lvl) for lvl in lvls])
                dwt = group_segment_sum_tsf_sorted(
                    svt, sk_all[idx], size, F
                )
                _emit_group_f(dwt, sy, sz, size, blocks)
            elif use_ts:
                svt = jnp.stack([_take_sorted_t(lvl) for lvl in lvls])
                dwt = group_segment_sum_ts_sorted(svt, sk_all[idx], size)
                _emit_group(dwt, sy, sz, size, blocks)
            else:
                sv = jnp.stack([_take_sorted(lvl) for lvl in lvls])
                dwt = group_segment_sum_t_sorted(sv, sk_all[idx], size)
                _emit_group(dwt, sy, sz, size, blocks)
        else:
            gv_g = jnp.stack(
                [gv_level(lvl) for lvl in lvls]
            ).astype(jnp.float32)
            dws = _batched_segment_rows_sum(gv_g, local[idx], size)
            folded = _fold_wide(dws, sy, sz, size)  # (G, size, F)
            blocks.append(folded.reshape(G * size, F))
    if merge_buf:
        _emit_merged(merge_buf, blocks)

    grad_table = jnp.concatenate(blocks, axis=0)  # (total_rows, F)
    if table_carrier.ndim == 1:  # flat-table caller
        grad_table = grad_table.reshape(-1)
    return (grad_table.astype(table_dtype), None)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# --------------------------------------------------------------------------
# Reference XOR fast-hash variant
# --------------------------------------------------------------------------
# Bit-matches the reference's per-corner indexing
# (modules/hash_encoder.py:43-62: under_hash below begin_fast_hash_level,
# ``(x*1 ^ y*2654435761 ^ z*805459861) % size`` above).  The XOR hash has
# no fixed corner->base offsets, so each corner is its own gather (8 rows
# per sample-level vs the additive variant's 1 widened row) — kept as a
# selectable variant for the additive-vs-XOR quality ablation and for
# bit-parity with the reference, not as the production path.


def xor_corner_rows(spec: HashGridSpec, xyz):
    """Per-corner absolute rows + trilinear weights under the reference
    hash.

    Returns:
        rows: (L, 8, N) int32 absolute rows into the flat table.
        weights: (L, 8, N) f32 (corner bit d selects the +1 step along d).
    """
    scales = jnp.asarray(spec.scales, jnp.float32)[:, None, None]
    sizes = jnp.asarray(spec.sizes, jnp.uint32)[:, None]
    offsets = jnp.asarray(spec.offsets, jnp.int32)[:, None]
    res = jnp.asarray(spec.resolutions, jnp.uint32)[:, None]
    dense = jnp.asarray(
        [lvl < spec.begin_fast_hash_level for lvl in range(spec.levels)],
        bool,
    )[:, None]

    xyzT = xyz.T.astype(jnp.float32)  # (3, N)
    pos = xyzT[None, :, :] * scales + 0.5  # (L, 3, N)
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pg = pos_grid.astype(jnp.uint32)  # (L, 3, N)

    rows, weights = [], []
    primes = (jnp.uint32(1), jnp.uint32(_PRIME_Y), jnp.uint32(_PRIME_Z))
    for c in range(8):
        sel = [(c >> d) & 1 for d in range(3)]
        corner = [pg[:, d] + jnp.uint32(sel[d]) for d in range(3)]  # (L, N)
        under = (
            corner[0]
            + corner[1] * res
            + corner[2] * res * res
        )
        fast = (
            corner[0] * primes[0]
            ^ corner[1] * primes[1]
            ^ corner[2] * primes[2]
        )
        idx = jnp.where(dense, under, fast) % sizes  # (L, N)
        rows.append(offsets + idx.astype(jnp.int32))
        w = jnp.ones_like(frac[:, 0])
        for d in range(3):
            w = w * jnp.where(sel[d] == 1, frac[:, d], 1.0 - frac[:, d])
        weights.append(w)
    return jnp.stack(rows, axis=1), jnp.stack(weights, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_xor(table, xyz, spec: HashGridSpec):
    """Reference-hash encode: 8 per-corner gathers per level
    (modules/hash_encoder.py:115-141 semantics, batched)."""
    out, _ = _hash_encode_xor_fwd(table, xyz, spec)
    return out


def _xor_gather_combine(table2d, rows, w, spec: HashGridSpec):
    F = spec.feat_dim
    n = rows.shape[-1]
    outs = []
    for lvl in range(spec.levels):
        g = _gather_rows_f32view(
            table2d, rows[lvl].reshape(-1)
        ).reshape(8, n, F).astype(jnp.float32)
        outs.append(jnp.einsum("cnf,cn->nf", g, w[lvl]))
    return jnp.concatenate(outs, axis=1)


def _hash_encode_xor_fwd(table, xyz, spec: HashGridSpec):
    rows, w = xor_corner_rows(spec, xyz)
    table2d = (
        table if table.ndim == 2
        else table.reshape(spec.total_rows, spec.feat_dim)
    )
    out = _xor_gather_combine(table2d, rows, w, spec)
    return out, (rows, w, table[:0])


def _hash_encode_xor_bwd(spec: HashGridSpec, res, g):
    rows, w, table_carrier = res  # (L, 8, N), (L, 8, N)
    F = spec.feat_dim
    n = rows.shape[-1]
    g = g.reshape(n, spec.levels, F)

    # d out / d T[rows[l,c,n], f] = w[l,c,n] * g[n,l,f]
    gv = (
        w[:, :, :, None] * g.transpose(1, 0, 2)[:, None, :, :]
    ).reshape(spec.levels, 8 * n, F)
    local = (
        rows - jnp.asarray(spec.offsets, jnp.int32)[:, None, None]
    ).reshape(spec.levels, 8 * n)

    groups = {}
    for lvl in range(spec.levels):
        groups.setdefault(spec.sizes[lvl], []).append(lvl)

    slabs = [None] * spec.levels
    for size, lvls in groups.items():
        idx = jnp.asarray(lvls, jnp.int32)
        dws = group_segment_sum_t(gv[idx], local[idx], size)  # (G, F, size)
        for j, lvl in enumerate(lvls):
            slabs[lvl] = dws[j].T
    grad_table = jnp.concatenate(slabs, axis=0)
    if table_carrier.ndim == 1:
        grad_table = grad_table.reshape(-1)
    return (grad_table.astype(table_carrier.dtype), None)


hash_encode_xor.defvjp(_hash_encode_xor_fwd, _hash_encode_xor_bwd)
