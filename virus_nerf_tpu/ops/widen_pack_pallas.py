"""Packed widened-slab build as a Pallas TPU kernel.

The hash-encoder forward gathers ONE widened row per (sample, level)
(ops/hash_encoder.py module doc); for large levels that row is read from a
PACKED bf16 view — eight widened rows per 128-lane row — because the
packed (s/8, 128) row-major layout gathers ~27% faster than the col-major
(s, 8F) f32 form (tools/PERF_NOTES.md e9).  In XLA the packed view costs a
copy + reshape relayout pair per level every step (~4.6 ms/step over the
bench config's packed levels, round-3 profile): the roll-built wide slab
lives in XLA's column-major layout and the (s/8, 128) view is row-major.

STATUS: FALSIFIED IN-TRAIN, kept env-gated (VNERF_PACK_KERNEL=1) as a
measured experiment.  The kernel itself is bit-exact and fast (~2 ms
in-scan for the 10-level bench group), but its int32 bit-pair output
must cross an XLA bitcast+reshape boundary whose 16-bit relayout
(feature pairs packed across LANES vs the TPU bf16 tile's packing
across ROWS) fully materializes once the gathers consume the slab:
in-train bench 58.2k vs 116.9k rays/s baseline.  Emitting a bf16
output directly would need the same 16-bit cross-register surgery
inside the kernel.  See tools/PERF_NOTES.md round 4.

This kernel emits the packed gather rows DIRECTLY from the narrow table
slab, skipping the wide intermediate entirely.  Levels of one same-size
group share (size, stride_y, stride_z) — the group key of
`_same_size_level_groups` — so the eight corner offsets o_c are
compile-time constants and the group's levels are CONTIGUOUS rows of the
table: the input is one bf16 cast + int32-pair bitcast of a single table
slice (1/8 the elements of the wide relayout it replaces), VMEM-resident
per level.

Layout: everything is int32 bit-PAIRS (one int32 = the two bf16 features
of one table row) in the flat (s/128, 128) row-major view — Mosaic DMA
slices must be 128-lane aligned, which rules out any (rows, 8)-shaped
staging.  Per 8192-table-row block the kernel materializes eight flat
corner slices

    C_c[v, l] = pair[(t0 + 128*v + l + o_c) mod s],   (64, 128) int32

each as one static lane-roll of a (65, 128) window of the VMEM slab plus a
cross-row select (the roll crosses row boundaries; a head-replica pad past
row s/128 absorbs the mod-s wrap).  The output rows are then assembled
with STATIC 8-lane slice concatenations only, by emitting them in a
band-permuted row order the consumer absorbs into its row-index math
(`hash_encoder._gather_rows_packed_ci`):

    out[64*w + v, 64*h + 8*c + i] = C_c[v, 16*w + 8*h + i]

i.e. the bf16 gather row holding base row r's eight corners sits at packed
row  q = 1024*(r>>13) + 128*((r>>4)&7) + 2*((r>>7)&63) + ((r>>3)&1)  with
the corner features at lanes [16c + 2i + f], i = r & 7 — same corner-major
[c, i, f] lane layout as a plain q = r//8 packing, only the row order
differs.  Any within-band assembly that needed source lanes varying with
the output SUBLANE (the naive q = r//8 order does) would force
per-sublane lane shifts, which the VPU cannot do cheaply.

Everything inside the kernel stays int32: the values are bit-pairs of
bf16 features, and FP select/multiply on reinterpreted bits flushes
denormal patterns to zero (tools/PERF_NOTES.md round 3, the f32-view fwd
pack hazard).  Bitcasts at the XLA boundary are free layout no-ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BLOCK_ROWS = 8192  # table rows per grid step (one (512, 128) out block)


def pack_kernel_applicable(size: int, feat_dim: int) -> bool:
    """Kernel eligibility for one level group: F=2 packing (8 table rows
    per 128-lane bf16 row) with whole blocks."""
    return feat_dim == 2 and size % _BLOCK_ROWS == 0 and size >= 2 * _BLOCK_ROWS


def packed_ci_rows(rows, packed_rows: int):
    """Map base table rows -> (packed row, within-row index) of the
    kernel's band-permuted layout.  Pure integer math, usable on any
    backend (the CPU tests cover it against the layout contract)."""
    b = rows >> 13
    v = (rows >> 7) & 63
    w = (rows >> 4) & 7
    h = (rows >> 3) & 1
    q = (b << 10) + (w << 7) + (v << 1) + h
    return jnp.minimum(q, packed_rows - 1), rows & 7


def _wp_kernel(pn_hbm, out_ref, slab, sem, *, s128: int, offs: tuple,
               units: int):
    """Grid (G, n_blocks); each step emits `units` 8192-row band units
    (the grid is per-step-overhead bound: 8192-row steps measured
    ~6.6 us/step flat across ablations of every compute stage).  slab
    scratch holds level g's int32 row-pairs in flat (s/128, 128) layout
    plus a 72-row head replica so every corner window [r0, r0 + 65) reads
    contiguously across the mod-s wrap."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        cp1 = pltpu.make_async_copy(
            pn_hbm.at[g], slab.at[pl.ds(0, s128), :], sem.at[0]
        )
        cp2 = pltpu.make_async_copy(
            pn_hbm.at[g, pl.ds(0, 72)],
            slab.at[pl.ds(s128, 72), :],
            sem.at[1],
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

    s = s128 * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
    for u in range(units):
        t0 = (b * units + u) * _BLOCK_ROWS
        cols = []  # C_c (64, 128) flat corner slices
        for o in offs:
            o = int(o)
            r0 = jax.lax.rem(t0 + o, s) // 128
            d = o % 128
            A = slab[pl.ds(r0, 72), :]
            if d == 0:
                cols.append(A[:64, :])
            else:
                # roll by 128-d == roll by -d (Mosaic requires a
                # non-negative shift): R[v, l] = A[v, (l+d) % 128]; lanes
                # that wrapped read the NEXT row (the mod-128 carry of
                # the flat index)
                R = pltpu.roll(A[:65, :], 128 - d, axis=1)
                cols.append(
                    jnp.where(lane < 128 - d, R[:64, :], R[1:65, :])
                )

        for w in range(8):
            pieces = [c_[:, 16 * w: 16 * w + 8] for c_ in cols]
            pieces += [c_[:, 16 * w + 8: 16 * w + 16] for c_ in cols]
            out_ref[0, pl.ds(512 * u + 64 * w, 64), :] = jnp.concatenate(
                pieces, axis=1
            )


def packed_slabs_group(table2d, row_offset: int, size: int, g_levels: int,
                       corner_offsets):
    """Packed bf16 gather slabs for a run of same-size F=2 levels.

    Args:
        table2d: (total_rows, 2) f32 parameter table.
        row_offset: first level's row offset into the table.
        size: rows per level.
        g_levels: number of contiguous levels sharing size/strides.
        corner_offsets: the 8 static corner row offsets (ints, mod size).
    Returns:
        (g_levels, size // 8, 128) bf16 packed slabs in the band-permuted
        corner-major layout (`packed_ci_rows` maps base rows into it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s128 = size // 128
    units = 8
    while size % (_BLOCK_ROWS * units):
        units //= 2
    n_blocks = size // (_BLOCK_ROWS * units)
    slab = jax.lax.dynamic_slice_in_dim(
        table2d, row_offset, g_levels * size, axis=0
    )
    pn = jax.lax.bitcast_convert_type(
        slab.astype(jnp.bfloat16).reshape(g_levels, s128, 128, 2), jnp.int32
    )  # (G, s/128, 128) — one int32 bit-pair per table row

    out = pl.pallas_call(
        partial(
            _wp_kernel,
            s128=s128,
            offs=tuple(int(o) for o in corner_offsets),
            units=units,
        ),
        grid=(g_levels, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (1, 512 * units, 128), lambda g, b: (g, b, 0),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (g_levels, (size // _BLOCK_ROWS) * 512, 128), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((s128 + 72, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(pn)
    return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(
        g_levels, size // 8, 128
    )
