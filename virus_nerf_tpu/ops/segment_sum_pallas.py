"""Dense segment sum over a sorted stream as a Pallas TPU kernel.

The hash-encoder backward needs ``dW[r] = sum_{i: key_i == r} val_i`` for
every dense table row r (reference: the Taichi-autodiff scatter of
modules/hash_encoder.py:269-277).  The XLA formulation (cumsum + monotone
dense gather of cs at segment starts) is bound by the gather engine at
~7 ns/row — ~40 ms/step over the full-size table (tools/PERF_NOTES.md).

This kernel exploits that the stream is SORTED by key: the samples
contributing to a 2048-row block of the output are one contiguous window of
the stream.  Per grid step it DMAs successive (window, F) value chunks into
VMEM and accumulates ``onehot(key - block_base)^T-style`` products on the
MXU — no dense gather at all.  Cost is ~linear in samples + blocks instead
of table rows.

Exactness: the one-hot matrix is exact in bf16 (0/1); values ride as a
bf16 hi/lo split (``v = hi + lo`` with both halves bf16, ~16 mantissa bits)
accumulated in f32 — tighter than the reference's fp16-autocast gradients.

The per-block sample ranges arrive via scalar prefetch; a dynamic
``fori_loop`` walks ceil(range/window) chunks, so arbitrarily skewed key
distributions (every sample in one block) stay exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_B = 2048  # output rows per grid step
_W = 1024  # stream samples per DMA chunk


def _wss_kernel(starts_ref, sk_hbm, sv_hbm, out_ref, sk_vmem, sv_vmem, sem,
                *, F2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    # round the window start down to the DMA tile (Mosaic requires provably
    # aligned dynamic slices); the extra leading samples have keys from
    # earlier blocks and match no one-hot row, so they are harmless
    p0 = (starts_ref[b] // _W) * _W
    p1 = starts_ref[b + 1]
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    n_chunks = (p1 - p0 + _W - 1) // _W

    def body(c, carry):
        off = pl.multiple_of(p0 + c * _W, _W)
        cp_k = pltpu.make_async_copy(sk_hbm.at[pl.ds(off, _W)], sk_vmem, sem)
        cp_k.start()
        cp_k.wait()
        cp_v = pltpu.make_async_copy(
            sv_hbm.at[pl.ds(off, _W)], sv_vmem, sem
        )
        cp_v.start()
        cp_v.wait()
        local = sk_vmem[:] - b * _B  # (W,)
        # rows outside [0, B) (padded tail / other blocks) match nothing
        A = (
            jax.lax.broadcasted_iota(jnp.int32, (_B, _W), 0)
            == local[None, :]
        ).astype(jnp.bfloat16)
        prod = jnp.dot(A, sv_vmem[:], preferred_element_type=jnp.float32)
        # hi + lo halves recombine in-register: the output stays F-wide,
        # halving its (already lane-padded) HBM traffic
        F = F2 // 2
        out_ref[:] += prod[:, :F] + prod[:, F:F2]
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _windowed_segment_sum_tpu(sv, sk, n_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, F = sv.shape
    # bf16 hi/lo split: exact 0/1 one-hot x (hi + lo) in f32 accumulation
    hi = sv.astype(jnp.bfloat16)
    lo = (sv - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    svp = jnp.concatenate([hi, lo], axis=1)  # (K, 2F) bf16
    # pad one full window (sentinel key n_rows never matches a block row)
    # and the feature axis to the 128-lane tile (manual DMA slices must be
    # lane-tile aligned; the MXU runs 128-wide regardless)
    svp = jnp.pad(svp, ((0, _W), (0, 128 - 2 * F)))
    skp = jnp.pad(sk, (0, _W), constant_values=n_rows)

    n_blocks = n_rows // _B
    block_edges = jnp.arange(n_blocks + 1, dtype=jnp.int32) * _B
    starts = jnp.searchsorted(sk, block_edges).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (_B, F), lambda b, s: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_W,), jnp.int32),
            pltpu.VMEM((_W, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        partial(_wss_kernel, F2=2 * F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, F), jnp.float32),
    )(starts, skp, svp)


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


def windowed_segment_sum(sv, sk, n_rows: int):
    """Dense per-row sums of a key-sorted value stream.

    Args:
        sv: (K, F) f32 values, sorted by key.
        sk: (K,) int32 sorted keys in [0, n_rows).
        n_rows: dense output rows; the Pallas path requires
            ``n_rows % 2048 == 0`` (hashed hash-grid levels satisfy this).
    Returns:
        (n_rows, F) f32 sums.
    """
    if jax.default_backend() == "tpu" and n_rows % _B == 0:
        return _windowed_segment_sum_tpu(sv, sk, n_rows)
    return _windowed_segment_sum_jnp(sv, sk, n_rows)
