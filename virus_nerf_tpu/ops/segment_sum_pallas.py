"""Dense segment sum over sorted streams as a Pallas TPU kernel.

The hash-encoder backward needs ``dW[r] = sum_{i: key_i == r} val_i`` for
every dense table row r (reference: the Taichi-autodiff scatter of
modules/hash_encoder.py:269-277).  The XLA formulation (cumsum + monotone
dense gather of cs at segment starts) is bound by the gather engine at
~7 ns/row — ~40 ms/step over the full-size table (tools/PERF_NOTES.md).

This kernel exploits that the stream is SORTED by key: the samples
contributing to a 2048-row block of the output are one contiguous window of
the stream.  Per grid step it DMAs successive (window, 128) value chunks
into VMEM and contracts them against a one-hot key-match matrix on the MXU
— no dense gather at all.  Cost is ~linear in samples + blocks instead of
table rows.

Two layout rules learned the hard way (tools/PERF_NOTES.md):

- the OUTPUT must be transposed, ``(F, n_rows)`` with the big axis in TPU
  lanes: a ``(n_rows, F)`` result with F < 128 is stored lane-padded in
  HBM (8x traffic for F=16) and poisons every downstream op.  The kernel
  therefore computes ``V^T A^T`` ((128, W) x (W, B) -> (128, B)) instead of
  ``A V`` — the measured end-to-end win of the transposed pipeline over the
  XLA path is 48.4 -> 34.8 ms for the 10-level hashed group (v5e);
- the gradient stream enters as bf16 (one-hot weights are exact 0/1 and
  accumulation is f32, so only the per-sample values round; converged
  quality is unaffected — BASELINE.md).  An optional hi/lo split
  (``VNERF_WSS_HILO=1``: ``v = hi + lo``, both bf16, ~16 mantissa bits)
  recombines in-register before the output write for full-precision A/Bs;
  its accuracy beats the f32-cumsum formulation (which cancels against
  growing prefix sums): rel90 4.5e-6 vs 3.7e-5 against a float64 oracle.

The per-block sample ranges arrive via scalar prefetch; a dynamic
``fori_loop`` walks ceil(range/window) chunks, so arbitrarily skewed key
distributions (every sample in one block) stay exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from virus_nerf_tpu.ops.common import tpu_kernels_enabled

import os as _os

_B = int(_os.environ.get("VNERF_WSS_B", "2048"))  # output rows per grid step
_W = int(_os.environ.get("VNERF_WSS_W", "1024"))  # stream samples / DMA chunk
_SUB = int(_os.environ.get("VNERF_WSS_SUB", "128"))  # compute sub-block
# within a chunk (swept on v5e: (B, SUB) of (2048,128) 13.4 ms <
# (2048,256) 14.4 < (4096,128) 15.3 < (4096,256) 15.4 for the 10-level
# bench group — finer skip granularity wins, bigger output blocks lose to
# the per-block DMA-chunk minimum)
# Small tables (few output blocks) walk nearly the WHOLE stream per block:
# their cost is per-chunk overhead (~1.5-2.5 us of semaphores + branch
# machinery), so they take a much larger DMA chunk — the block-boundary
# waste that rules W out for big tables (avg block range ~K*B/n_rows
# samples) is absent when every block's range IS the stream.
_W_SMALL = int(_os.environ.get("VNERF_WSS_WSMALL", "1024"))
# hi/lo split on the gradient stream: "0" (default) sends bf16-rounded
# gradients (exact 0/1 one-hot, f32 accumulation) — the isolated kernel is
# unchanged, but dropping the barrier'd hi round + residual + 2F concat on
# the XLA side measured 101.9 -> 109.1k rays/s in-train at converged
# quality parity (BASELINE.md 2026-08-20: nn_mean z3 0.217 vs 0.216;
# precedent: the reference's fp16-gradient encoder variant,
# modules/hash_encoder_half.py).  "1" keeps ~16 mantissa bits via two
# bf16 halves for full-precision A/Bs.
_HILO = _os.environ.get("VNERF_WSS_HILO", "0") == "1"
_SMALL_BLOCKS = int(_os.environ.get("VNERF_WSS_SMALL_BLOCKS", "16"))
# transposed gradient stream: the caller hands the stream as (G, VF, K) —
# samples in LANES — instead of (G, K, VF).  The (K, VF) form must be
# lane-padded to 128 before DMA (Mosaic rejects sub-128 lane slices), an
# 8x inflation of both the XLA-side pad copy and the per-chunk DMA bytes
# for VF=16; the (VF, K) form is exactly one bf16 sublane tile tall and
# slices natively along lanes.  The dot flips to the MXU-native
# (VF, SUB) x (SUB, B) form with a (SUB, B) one-hot.
_TS = _os.environ.get("VNERF_WSS_T", "1") == "1"


def transposed_stream() -> bool:
    """True when the hash backward should hand the kernel a (G, VF, K)
    sample-in-lanes gradient stream (see `_TS` above)."""
    return _TS


def stream_dtype():
    """Element type the kernel consumes the gradient stream in: bf16 by
    default (exact 0/1 one-hot, f32 accumulation), f32 when the hi/lo
    split is on so the residual can be formed."""
    return jnp.float32 if _HILO else jnp.bfloat16
# FALSIFIED (2026-08-19, v5e; tools/PERF_NOTES.md): a FACTORED one-hot —
# hi = key >> 7 selecting the 128-lane output block via per-hi sample
# masks, lo = key & 127 in ONE (128, SUB) one-hot — measured 12.7 ms vs
# 8.1 ms for the plain (B, SUB) build on the 10-level bench group (the
# B/128 skinny dots + mask-mults cost more than the big one-hot), and
# 20.7 ms with per-hi pl.when range skipping (scalar branch machinery
# dominates).  The plain one-hot below is the measured optimum.


def _t_kernel(starts_ref, sk_hbm, sv_hbm, out_ref, sk_vmem, sv_vmem,
              acc_ref, sems, *, F: int, Kp: int, n_blocks: int, G: int,
              B: int, W: int, SUB: int, VF: int):
    """Cross-block-pipelined DMA + sub-block-skipped MXU compute.

    DMA granularity stays at the aligned W-sample chunk (Mosaic dynamic
    slices must be tile-aligned; rounding the window start down is safe —
    leading samples belong to earlier blocks and match no one-hot row).
    Compute runs per SUB-sample sub-block and SKIPS sub-blocks outside the
    block's [start, end) key range: the average block has ~K*B/R samples,
    so most of a full chunk would be one-hot/matmul padding.

    The pipeline crosses GRID steps: each linearized step owns the slot
    pair {2*(lin%2), 2*(lin%2)+1} (lin = g*n_blocks + b) and starts the
    NEXT step's chunk-0 copy into the other pair as soon as its own chunk
    0 is in flight — without this, every one of the G * n_blocks grid
    steps exposes a full ~1 us HBM latency on its first chunk (measured
    14.2 -> 11.3 ms for the 10-level bench group; slicing the value
    operand to its 2F live lanes before the dot cuts the (128, B) f32
    product to (2F, B) for another 11.3 -> 9.3 ms).  The pair parity MUST
    follow the LINEARIZED step, not b alone: with n_blocks odd, b-parity
    gives a group's last block and the NEXT group's block 0 the same pair,
    so the cross-group prefetch starts a copy into the slot/semaphore the
    current block is still reading (wrong gradients; ADVICE r3).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    b = pl.program_id(1)
    p0 = starts_ref[g, b]
    p1 = starts_ref[g, b + 1]
    c0 = (p0 // W) * W
    # EMPTY blocks (p0 == p1, common on skewed march keys) must see
    # n_chunks == 0: the predecessor's prefetch guard (np1 > np0) skips
    # them, so a wait here would hang on a never-started copy
    n_chunks = jnp.where(p1 > p0, (p1 - c0 + W - 1) // W, 0)

    def copies(gg, c0x, c, slot):
        off = pl.multiple_of(c0x + c * W, W)
        # keys live in ONE flat vector: a (G, K) int32 array cannot be
        # sliced to a single row (sublane tile is 8)
        koff = pl.multiple_of(gg * Kp + off, W)
        return (
            pltpu.make_async_copy(
                sk_hbm.at[pl.ds(koff, W)],
                sk_vmem.at[pl.ds(slot * W, W)],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                sv_hbm.at[gg, pl.ds(off, W)], sv_vmem.at[slot],
                sems.at[slot, 1],
            ),
        )

    # slot-pair parity of the LINEARIZED step (see docstring: b-parity
    # races across group boundaries when n_blocks is odd)
    base = 2 * jax.lax.rem(g * n_blocks + b, 2)

    # the very first block has no predecessor to prefetch its chunk 0
    @pl.when((g == 0) & (b == 0) & (n_chunks > 0))
    def _():
        for cp in copies(g, c0, 0, base):
            cp.start()

    # prefetch the NEXT step's chunk 0 into the OTHER slot pair (it waits
    # on its own semaphores, so ordering with this block's compute is safe)
    nb = b + 1
    ng = jnp.where(nb == n_blocks, g + 1, g)
    nbb = jnp.where(nb == n_blocks, 0, nb)

    @pl.when(ng < G)
    def _():
        np0 = starts_ref[ng, nbb]
        np1 = starts_ref[ng, nbb + 1]
        nc0 = (np0 // W) * W

        @pl.when(np1 > np0)
        def _():
            for cp in copies(ng, nc0, 0, 2 - base):
                cp.start()

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(c, carry):
        slot = base + jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in copies(g, c0, c + 1, base + jax.lax.rem(c + 1, 2)):
                cp.start()

        for cp in copies(g, c0, c, slot):
            cp.wait()
        off = pl.multiple_of(c0 + c * W, W)
        sk_view = sk_vmem.at[pl.ds(slot * W, W)]
        sv_view = sv_vmem.at[slot]
        for sub in range(W // SUB):
            lo = off + sub * SUB

            @pl.when((lo + SUB > p0) & (lo < p1))
            def _():
                local = sk_view[pl.ds(sub * SUB, SUB)] - b * B
                # rows outside [0, B) (padded tail / other blocks) match
                # nothing
                A = (
                    jax.lax.broadcasted_iota(jnp.int32, (B, SUB), 0)
                    == local[None, :]
                ).astype(jnp.bfloat16)
                # contract the sample axis of both operands:
                # (SUB,2F)^T x (SUB,B) on the MXU, result (2F, B) — the
                # table axis lands in LANES; slicing the live 2F value
                # lanes shrinks the f32 product 4x (same MXU tiles)
                prod = jax.lax.dot_general(
                    sv_view[pl.ds(sub * SUB, SUB), pl.ds(0, VF)], A,
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                # hi + lo halves recombine in-register: output stays F-wide
                if VF == F:  # bf16-only stream (VNERF_WSS_HILO=0)
                    acc_ref[:] += prod
                else:
                    acc_ref[:] += prod[:F, :] + prod[F:2 * F, :]

        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0] = acc_ref[:]


def _ts_kernel(starts_ref, sk_hbm, sv_hbm, out_ref, sk_vmem, sv_vmem,
               acc_ref, sems, *, F: int, Kp: int, n_blocks: int, G: int,
               B: int, W: int, SUB: int, VF: int):
    """Transposed-stream variant of `_t_kernel` (see `_TS`): the value
    stream arrives (VF, K) with samples in LANES, so each DMA chunk is
    (VF, W) — 8x fewer bytes than the lane-padded (W, 128) form for
    VF=16 — and the dot is the MXU-native (VF, SUB) x (SUB, B) with a
    (SUB, B) one-hot.  Pipelining/skip logic is identical to `_t_kernel`,
    including the linearized-parity slot pairing (see `_t_kernel` docstring
    for the odd-n_blocks cross-group race it prevents).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    b = pl.program_id(1)
    p0 = starts_ref[g, b]
    p1 = starts_ref[g, b + 1]
    c0 = (p0 // W) * W
    n_chunks = jnp.where(p1 > p0, (p1 - c0 + W - 1) // W, 0)

    def copies(gg, c0x, c, slot):
        off = pl.multiple_of(c0x + c * W, W)
        koff = pl.multiple_of(gg * Kp + off, W)
        return (
            pltpu.make_async_copy(
                sk_hbm.at[pl.ds(koff, W)],
                sk_vmem.at[pl.ds(slot * W, W)],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                sv_hbm.at[gg, :, pl.ds(off, W)], sv_vmem.at[slot],
                sems.at[slot, 1],
            ),
        )

    base = 2 * jax.lax.rem(g * n_blocks + b, 2)

    @pl.when((g == 0) & (b == 0) & (n_chunks > 0))
    def _():
        for cp in copies(g, c0, 0, base):
            cp.start()

    nb = b + 1
    ng = jnp.where(nb == n_blocks, g + 1, g)
    nbb = jnp.where(nb == n_blocks, 0, nb)

    @pl.when(ng < G)
    def _():
        np0 = starts_ref[ng, nbb]
        np1 = starts_ref[ng, nbb + 1]
        nc0 = (np0 // W) * W

        @pl.when(np1 > np0)
        def _():
            for cp in copies(ng, nc0, 0, 2 - base):
                cp.start()

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(c, carry):
        slot = base + jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in copies(g, c0, c + 1, base + jax.lax.rem(c + 1, 2)):
                cp.start()

        for cp in copies(g, c0, c, slot):
            cp.wait()
        off = pl.multiple_of(c0 + c * W, W)
        sk_view = sk_vmem.at[pl.ds(slot * W, W)]
        sv_view = sv_vmem.at[slot]
        for sub in range(W // SUB):
            lo = off + sub * SUB

            @pl.when((lo + SUB > p0) & (lo < p1))
            def _():
                local = sk_view[pl.ds(sub * SUB, SUB)] - b * B
                # (SUB, B) one-hot: samples in sublanes, output rows in
                # lanes — the dot below is then the native (M,K)x(K,N)
                # MXU form with no operand transpose
                A = (
                    local[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (SUB, B), 1)
                ).astype(jnp.bfloat16)
                prod = jax.lax.dot_general(
                    sv_view[:, pl.ds(sub * SUB, SUB)], A,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (VF, B)
                if VF == F:
                    acc_ref[:] += prod
                else:
                    acc_ref[:] += prod[:F, :] + prod[F:2 * F, :]

        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0] = acc_ref[:]


def _tsf_kernel(starts_ref, sk_hbm, sv_hbm, out_ref, sk_vmem, sv_vmem,
                acc_ref, sems, *, F: int, Kp: int, n_blocks: int, G: int,
                B: int, W: int, SUB: int, RV: int, FEAT: int):
    """FUSED-stream variant of `_ts_kernel`: the stream carries the RAW
    per-sample factors — rows 0..7 the eight trilinear corner weights,
    rows 8..8+FEAT the gradient features, both key-sorted — and the
    kernel forms the outer-product value matrix ``V[f*8+c, k] =
    w[c, k] * g[f, k]`` on the VPU right before the MXU contraction.

    This removes the XLA-side per-level value-prep chains entirely (the
    materialized (K, 8F) wide-gradient stream, its permute-gather, and
    its pad/copy — ~7 ms/step on the bench config, r3 profile): only the
    (8+FEAT)-row factor stream is permuted and streamed.  The product is
    the same bf16 x bf16 multiply the XLA prep performs, so results are
    bit-identical to the unfused VNERF_WSS_HILO=0 path.

    Output rows are F-MAJOR (row f*8+c), the natural order of the
    in-kernel build (corner-major would need a sublane interleave of the
    per-feature products); the hash backward folds it with
    `_fold_wide_t_fmajor`.  Pipelining/skip logic is identical to
    `_ts_kernel`, including the linearized-parity slot pairing.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    b = pl.program_id(1)
    p0 = starts_ref[g, b]
    p1 = starts_ref[g, b + 1]
    c0 = (p0 // W) * W
    n_chunks = jnp.where(p1 > p0, (p1 - c0 + W - 1) // W, 0)

    def copies(gg, c0x, c, slot):
        off = pl.multiple_of(c0x + c * W, W)
        koff = pl.multiple_of(gg * Kp + off, W)
        return (
            pltpu.make_async_copy(
                sk_hbm.at[pl.ds(koff, W)],
                sk_vmem.at[pl.ds(slot * W, W)],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                sv_hbm.at[gg, :, pl.ds(off, W)], sv_vmem.at[slot],
                sems.at[slot, 1],
            ),
        )

    base = 2 * jax.lax.rem(g * n_blocks + b, 2)

    @pl.when((g == 0) & (b == 0) & (n_chunks > 0))
    def _():
        for cp in copies(g, c0, 0, base):
            cp.start()

    nb = b + 1
    ng = jnp.where(nb == n_blocks, g + 1, g)
    nbb = jnp.where(nb == n_blocks, 0, nb)

    @pl.when(ng < G)
    def _():
        np0 = starts_ref[ng, nbb]
        np1 = starts_ref[ng, nbb + 1]
        nc0 = (np0 // W) * W

        @pl.when(np1 > np0)
        def _():
            for cp in copies(ng, nc0, 0, 2 - base):
                cp.start()

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(c, carry):
        slot = base + jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in copies(g, c0, c + 1, base + jax.lax.rem(c + 1, 2)):
                cp.start()

        for cp in copies(g, c0, c, slot):
            cp.wait()
        off = pl.multiple_of(c0 + c * W, W)
        sk_view = sk_vmem.at[pl.ds(slot * W, W)]
        sv_view = sv_vmem.at[slot]
        for sub in range(W // SUB):
            lo = off + sub * SUB

            @pl.when((lo + SUB > p0) & (lo < p1))
            def _():
                local = sk_view[pl.ds(sub * SUB, SUB)] - b * B
                A = (
                    local[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (SUB, B), 1)
                ).astype(jnp.bfloat16)
                ws = sv_view[pl.ds(0, 8), pl.ds(sub * SUB, SUB)]
                # V build: FEAT broadcast-multiplies of the (8, SUB)
                # corner block, concatenated along 8-row-aligned sublanes
                V = jnp.concatenate(
                    [
                        ws * sv_view[pl.ds(8 + f, 1), pl.ds(sub * SUB, SUB)]
                        for f in range(FEAT)
                    ],
                    axis=0,
                )  # (8*FEAT, SUB) bf16, f-major rows
                acc_ref[:] += jax.lax.dot_general(
                    V, A, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (8*FEAT, B)

        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0] = acc_ref[:]


def fuse_applicable(feat_dim: int) -> bool:
    """Fused-stream eligibility: the (8 + F)-row factor stream must fit
    one 16-row bf16 sublane tile and the (8F, B) product one MXU pass."""
    return 8 + feat_dim <= 16 and 8 * feat_dim <= 128


def _sorted_group_segment_sum_tsf_tpu(wgt, sk, n_rows: int, feat_dim: int):
    """Fused-stream entry: wgt (G, 8 + F, K) bf16 — rows 0..7 sorted
    corner weights, rows 8..8+F sorted gradient features."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, RV, K = wgt.shape
    B, SUB = _B, _SUB
    n_pad = ((n_rows + B - 1) // B) * B
    W = _W_SMALL if n_pad // B <= _SMALL_BLOCKS else _W
    svp = wgt.astype(jnp.bfloat16)
    RVp = 16  # bf16 sublane tile (fuse_applicable guarantees RV <= 16)
    Kp = ((K + 1 + W - 1) // W) * W
    svp = jnp.pad(svp, ((0, 0), (0, RVp - RV), (0, Kp - K)))
    skp = jnp.pad(
        sk, ((0, 0), (0, Kp - K)), constant_values=n_rows
    ).reshape(-1)

    n_blocks = n_pad // B
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * B
    starts = jax.vmap(lambda k: jnp.searchsorted(k, block_edges))(sk)

    OF = 8 * feat_dim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, OF, B), lambda g, b, s: (g, 0, b),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((4 * W,), jnp.int32),
            pltpu.VMEM((4, RVp, W), jnp.bfloat16),
            pltpu.VMEM((OF, B), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_tsf_kernel, F=OF, Kp=Kp, n_blocks=n_blocks, G=G,
                B=B, W=W, SUB=SUB, RV=RVp, FEAT=feat_dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, OF, n_pad), jnp.float32),
    )(starts.astype(jnp.int32), skp, svp)
    return out[:, :, :n_rows] if n_pad != n_rows else out


def group_segment_sum_tsf_sorted(wgt, sk, n_rows: int, feat_dim: int):
    """Fused-stream segment sum: consumes the raw sorted FACTOR stream
    (corner weights + gradient features) and forms the outer-product
    values inside the kernel (see `_tsf_kernel`).

    Args:
        wgt: (G, 8 + F, K) factor stream, each level sorted by its key
            (rows 0..7 corner weights, rows 8..8+F gradient features).
        sk: (G, K) int32 sorted row ids in [0, n_rows).
    Returns:
        (G, 8F, n_rows) f32 sums, F-MAJOR rows (row f*8 + c).
    """
    G, RV, K = wgt.shape
    if (
        tpu_kernels_enabled()
        and kernel_applicable(n_rows, 8 * feat_dim)
        and fuse_applicable(feat_dim)
    ):
        return _sorted_group_segment_sum_tsf_tpu(wgt, sk, n_rows, feat_dim)
    # fallback: form V in XLA (f-major) and reuse the windowed oracle
    V = jnp.concatenate(
        [
            wgt[:, :8, :] * wgt[:, 8 + f: 9 + f, :]
            for f in range(feat_dim)
        ],
        axis=1,
    )  # (G, 8F, K)
    out = jnp.stack(
        [
            _windowed_segment_sum_jnp(
                V[g].T.astype(jnp.float32), sk[g], n_rows
            )
            for g in range(G)
        ]
    )
    return out.transpose(0, 2, 1)


def _sorted_group_segment_sum_ts_tpu(svt, sk, n_rows: int):
    """Transposed-stream entry: svt (G, F, K), samples in lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, F, K = svt.shape
    B, SUB = _B, _SUB
    n_pad = ((n_rows + B - 1) // B) * B
    W = _W_SMALL if n_pad // B <= _SMALL_BLOCKS else _W
    if _HILO:
        hi = jax.lax.optimization_barrier(svt.astype(jnp.bfloat16))
        lo = (svt.astype(jnp.float32) - hi.astype(jnp.float32)).astype(
            jnp.bfloat16
        )
        svp = jnp.concatenate([hi, lo], axis=1)  # (G, 2F, K) bf16
    else:
        svp = svt.astype(jnp.bfloat16)
    VF = svp.shape[1]
    # pad the sample axis (LANES) to whole DMA chunks with >=1 sentinel;
    # no 128-lane feature pad exists in this layout — the (VF, K) stream
    # is already tile-exact for VF a multiple of the bf16 sublane tile
    Kp = ((K + 1 + W - 1) // W) * W
    svp = jnp.pad(svp, ((0, 0), (0, 0), (0, Kp - K)))
    skp = jnp.pad(
        sk, ((0, 0), (0, Kp - K)), constant_values=n_rows
    ).reshape(-1)

    n_blocks = n_pad // B
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * B
    starts = jax.vmap(lambda k: jnp.searchsorted(k, block_edges))(sk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, F, B), lambda g, b, s: (g, 0, b),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((4 * W,), jnp.int32),
            pltpu.VMEM((4, VF, W), jnp.bfloat16),
            pltpu.VMEM((F, B), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_ts_kernel, F=F, Kp=Kp, n_blocks=n_blocks, G=G,
                B=B, W=W, SUB=SUB, VF=VF),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, F, n_pad), jnp.float32),
    )(starts.astype(jnp.int32), skp, svp)
    return out[:, :, :n_rows] if n_pad != n_rows else out


def ts_applicable(F: int) -> bool:
    """Transposed-stream eligibility: the (VF, W) DMA block must be
    sublane-tile-exact for bf16 (tile 16) in both the bf16 (VF=F) and
    hi/lo (VF=2F) modes."""
    return F % 16 == 0 and 2 * F <= 128


def group_segment_sum_ts_sorted(svt, sk, n_rows: int):
    """`group_segment_sum_t_sorted` for a TRANSPOSED stream.

    Args:
        svt: (G, F, K) values with samples in lanes, each level sorted by
            its key (any float dtype; bf16 is consumed as-is).
        sk: (G, K) int32 sorted row ids in [0, n_rows).
    Returns:
        (G, F, n_rows) f32 sums.
    """
    G, F, K = svt.shape
    if (
        tpu_kernels_enabled()
        and kernel_applicable(n_rows, F)
        and ts_applicable(F)
    ):
        return _sorted_group_segment_sum_ts_tpu(svt, sk, n_rows)
    out = jnp.stack(
        [
            _windowed_segment_sum_jnp(
                svt[g].T.astype(jnp.float32), sk[g], n_rows
            )
            for g in range(G)
        ]
    )
    return out.transpose(0, 2, 1)


def _sorted_group_segment_sum_t_tpu(sv, sk, n_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, K, F = sv.shape
    # pad the output rows to whole B-blocks: sentinel keys (== n_rows) land
    # in a padding block but carry zero values, so the extra rows sum to
    # zero and are sliced off below.  This admits the DENSE hash levels
    # (8-aligned res^3 sizes, reference modules/hash_encoder.py:183-207),
    # not just the 2^19 hashed group.
    B, SUB = _B, _SUB
    n_pad = ((n_rows + B - 1) // B) * B
    # per-call DMA chunk: small tables' blocks each walk ~the whole stream,
    # so per-chunk overhead dominates and a large chunk wins (see the
    # constants block); big tables keep the boundary-waste-safe default
    W = _W_SMALL if n_pad // B <= _SMALL_BLOCKS else _W
    # bf16 hi/lo split: exact 0/1 one-hot x (hi + lo) in f32 accumulation.
    # The barrier is load-bearing: under jit, XLA's excess-precision rule
    # keeps the f32->bf16 rounding of `hi` in f32 registers, so the
    # residual `sv - hi` folds to zero and the lo half silently vanishes
    # (caught by bench.py's on-TPU kernel CI, 2.1e-2 vs oracle).
    if _HILO:
        hi = jax.lax.optimization_barrier(sv.astype(jnp.bfloat16))
        lo = (sv - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        svp = jnp.concatenate([hi, lo], axis=2)  # (G, K, 2F) bf16
    else:
        svp = sv.astype(jnp.bfloat16)  # (G, K, F) bf16, rounded grads
    VF = svp.shape[2]
    # pad the stream to a whole number of DMA chunks with at least one
    # sentinel row (key n_rows never matches a block row), and the feature
    # axis to the 128-lane tile — Mosaic REJECTS sub-128 lane DMA slices
    # ("Slice shape along dimension 2 must be aligned to tiling (128)",
    # tried 2026-08-19), so the explicit pad + layout copy (~1.7 ms/step)
    # cannot be elided by reading the (W, 2F) logical block directly
    Kp = ((K + 1 + W - 1) // W) * W
    svp = jnp.pad(svp, ((0, 0), (0, Kp - K), (0, 128 - VF)))
    skp = jnp.pad(
        sk, ((0, 0), (0, Kp - K)), constant_values=n_rows
    ).reshape(-1)

    n_blocks = n_pad // B
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * B
    starts = jax.vmap(lambda k: jnp.searchsorted(k, block_edges))(sk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, F, B), lambda g, b, s: (g, 0, b),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((4 * W,), jnp.int32),
            pltpu.VMEM((4, W, 128), jnp.bfloat16),
            pltpu.VMEM((F, B), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_t_kernel, F=F, Kp=Kp, n_blocks=n_blocks, G=G,
                B=B, W=W, SUB=SUB, VF=VF),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, F, n_pad), jnp.float32),
    )(starts.astype(jnp.int32), skp, svp)
    return out[:, :, :n_rows] if n_pad != n_rows else out


def _windowed_segment_sum_jnp(sv, sk, n_rows: int):
    """Reference formulation (cumsum + boundary gather) for non-TPU
    backends and as the test oracle."""
    K, F = sv.shape
    cs = jnp.concatenate(
        [jnp.zeros((1, F), sv.dtype), jnp.cumsum(sv, axis=0)], axis=0
    )
    starts = jnp.searchsorted(sk, jnp.arange(n_rows, dtype=jnp.int32))
    cs_starts = jnp.take(cs, starts, axis=0)
    cs_ends = jnp.concatenate([cs_starts[1:], cs[-1:]], axis=0)
    return cs_ends - cs_starts


def kernel_applicable(n_rows: int, F: int) -> bool:
    """Pallas-path eligibility: the hi/lo split must fit the 128-lane tile
    (arbitrary n_rows is handled by internal block padding)."""
    return 2 * F <= 128


def group_segment_sum_t_sorted(sv, sk, n_rows: int):
    """`group_segment_sum_t` on an ALREADY key-sorted stream.

    Callers with several same-shape groups (the hash backward's
    by-table-size level groups) batch ONE ``lax.sort`` across all levels
    and slice the sorted keys per group — per-group sorts measured
    ~0.8 ms each on v5e while one (16, 131072) sort costs ~2.5 ms total.

    Args:
        sv: (G, K, F) f32 values, each level sorted by its key.
        sk: (G, K) int32 sorted row ids in [0, n_rows).
    Returns:
        (G, F, n_rows) f32 sums — table axis in lanes (see module doc).
    """
    G, K, F = sv.shape
    if tpu_kernels_enabled() and kernel_applicable(n_rows, F):
        return _sorted_group_segment_sum_t_tpu(sv, sk, n_rows)
    out = jnp.stack(
        [_windowed_segment_sum_jnp(sv[g], sk[g], n_rows) for g in range(G)]
    )  # (G, n_rows, F)
    return out.transpose(0, 2, 1)


def group_segment_sum_t(vals, keys, n_rows: int):
    """Dense per-row sums for a group of same-size levels, TRANSPOSED.

    Sorts each level's stream by key (multi-operand ``lax.sort`` of keys +
    positions, then a per-level row-permute gather — the fast gather form
    on TPU) and reduces it with the windowed MXU kernel.

    Args:
        vals: (G, K, F) f32 per-level values (unsorted).
        keys: (G, K) int32 row ids in [0, n_rows).
        n_rows: dense output rows per level.
    Returns:
        (G, F, n_rows) f32 sums — table axis in lanes (see module doc).
    """
    G, K, F = vals.shape
    pi = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (G, K))
    sk, sp = jax.lax.sort([keys, pi], dimension=1, num_keys=1)
    sv = jnp.stack([jnp.take(vals[g], sp[g], axis=0) for g in range(G)])
    return group_segment_sum_t_sorted(sv, sk, n_rows)


def windowed_segment_sum(sv, sk, n_rows: int):
    """Dense per-row sums of a single key-sorted value stream.

    Args:
        sv: (K, F) f32 values, sorted by key.
        sk: (K,) int32 sorted keys in [0, n_rows).
        n_rows: dense output rows.
    Returns:
        (n_rows, F) f32 sums.
    """
    if tpu_kernels_enabled() and kernel_applicable(
        n_rows, sv.shape[1]
    ):
        return _sorted_group_segment_sum_t_tpu(
            sv[None], sk[None], n_rows
        )[0].T
    return _windowed_segment_sum_jnp(sv, sk, n_rows)
