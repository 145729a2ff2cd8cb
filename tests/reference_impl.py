"""Slow numpy re-implementations of the reference kernels' semantics.

These are written from the behavioral spec in SURVEY.md (reference files
modules/utils.py, modules/hash_encoder.py, modules/ray_march.py,
modules/volume_train.py) as sequential-loop goldens to verify the vectorized
TPU implementations against.  They intentionally mirror the per-thread
control flow of the originals.
"""

from __future__ import annotations

import numpy as np

SQRT3 = 1.7320508075688772


def morton3d_np(x: int, y: int, z: int) -> int:
    code = 0
    for bit in range(10):
        code |= ((x >> bit) & 1) << (3 * bit)
        code |= ((y >> bit) & 1) << (3 * bit + 1)
        code |= ((z >> bit) & 1) << (3 * bit + 2)
    return code


def calc_dt_np(t, esf, grid_size, scale):
    return float(np.clip(t * esf, SQRT3 / 1024, SQRT3 * 2 * scale / grid_size))


def frexp_exp_np(x: float) -> int:
    """ceil(log2(x)) for x>0 (reference frexp_bit semantics)."""
    if x == 0.0:
        return 0
    m, e = np.frexp(np.float32(x))  # m in [0.5, 1)
    # reference normalizes mantissa into [1, 2): exponent = e - 1, +1 if m != 0.5
    if m == 0.5:
        return int(e) - 1
    return int(e)


def mip_from_pos_np(xyz, cascades):
    mx = float(np.max(np.abs(xyz)))
    return int(np.clip(frexp_exp_np(mx) + 1, 0, cascades - 1))


def mip_from_dt_np(dt, grid_size, cascades):
    return int(np.clip(frexp_exp_np(dt * grid_size), 0, cascades - 1))


def hash_encode_np(table, xyz, spec):
    """Sequential multiresolution hash encode (one point, all levels)."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    n = xyz.shape[0]
    out = np.zeros((n, spec.levels * spec.feat_dim), dtype=np.float64)
    table2 = np.asarray(table, np.float64).reshape(-1, spec.feat_dim)
    for i in range(n):
        for level in range(spec.levels):
            scale = spec.scales[level]
            res = spec.resolutions[level]
            size = spec.sizes[level]
            off = spec.offsets[level]
            pos = xyz[i].astype(np.float64) * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            feat = np.zeros(spec.feat_dim)
            for corner in range(8):
                w = 1.0
                local = np.zeros(3, dtype=np.uint64)
                for d in range(3):
                    if (corner >> d) & 1:
                        local[d] = pg[d] + 1
                        w *= frac[d]
                    else:
                        local[d] = pg[d]
                        w *= 1.0 - frac[d]
                if level < spec.begin_fast_hash_level:
                    idx = (
                        local[0] + local[1] * res + local[2] * res * res
                    ) % np.uint64(size)
                else:
                    # additive lattice hash (framework deviation from the
                    # reference's XOR hash — see ops/hash_encoder.py
                    # docstring); uint32 wrap-around then mod size
                    h = np.uint64(0)
                    for d in range(3):
                        h = (h + local[d] * primes[d]) & np.uint64(0xFFFFFFFF)
                    idx = (h & np.uint64(0xFFFFFFFF)) % np.uint64(size)
                feat += w * table2[off + int(idx)]
            out[i, level * spec.feat_dim : (level + 1) * spec.feat_dim] = feat
    return out


def march_ray_np(
    ray_o,
    ray_d,
    t1,
    t2,
    occ_fn,
    cascades,
    grid_size,
    scale,
    esf,
    max_samples,
    noise,
):
    """Per-ray sequential occupancy-guided march (reference
    modules/ray_march.py:28-124 control flow).  occ_fn(mip, cell)->bool."""
    ts, dts = [], []
    if t1 >= 0:
        t1 = t1 + calc_dt_np(t1, esf, grid_size, scale) * noise
    t = t1
    while 0 <= t < t2 and len(ts) < max_samples:
        xyz = ray_o + t * ray_d
        dt = calc_dt_np(t, esf, grid_size, scale)
        mip = max(
            mip_from_pos_np(xyz, cascades), mip_from_dt_np(dt, grid_size, cascades)
        )
        mip_bound = min(2.0 ** (mip - 1), scale)
        nxyz = np.clip(0.5 * (xyz / mip_bound + 1) * grid_size, 0, grid_size - 1.0)
        cell = nxyz.astype(np.int64)
        if occ_fn(mip, cell):
            ts.append(t)
            dts.append(dt)
            t += dt
        else:
            # skip to cell exit, staying on the dt lattice
            txyz = (
                ((cell.astype(np.float64) + 0.5 + 0.5 * np.sign(ray_d))
                 * (1.0 / grid_size) * 2 - 1) * mip_bound - xyz
            ) / ray_d
            t_target = t + max(0.0, txyz.min())
            t += calc_dt_np(t, esf, grid_size, scale)
            while t < t_target:
                t += calc_dt_np(t, esf, grid_size, scale)
    return np.array(ts), np.array(dts)


def composite_np(sigmas, rgbs, deltas, ts, T_threshold):
    """Per-ray sequential front-to-back compositing
    (reference modules/volume_train.py:22-48)."""
    T = 1.0
    rgb = np.zeros(3)
    depth = 0.0
    opacity = 0.0
    ws = np.zeros(len(sigmas))
    count = 0
    for s in range(len(sigmas)):
        if T > T_threshold:
            a = 1.0 - np.exp(-sigmas[s] * deltas[s])
            w = a * T
            rgb += w * rgbs[s]
            depth += w * ts[s]
            opacity += w
            ws[s] = w
            T = T * (1.0 - a)
            count += 1
    return opacity, depth, rgb, ws, count


def hash_encode_xor_np(table, xyz, spec):
    """Sequential encode under the reference's EXACT hash: under_hash below
    begin_fast_hash_level, ``(x*1 ^ y*2654435761 ^ z*805459861) % size``
    above, uint32 multiply wrap-around
    (reference: modules/hash_encoder.py:43-62,115-141)."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    n = xyz.shape[0]
    out = np.zeros((n, spec.levels * spec.feat_dim), dtype=np.float64)
    table2 = np.asarray(table, np.float64).reshape(-1, spec.feat_dim)
    for i in range(n):
        for level in range(spec.levels):
            scale = spec.scales[level]
            res = spec.resolutions[level]
            size = spec.sizes[level]
            off = spec.offsets[level]
            pos = xyz[i].astype(np.float64) * scale + 0.5
            pg = np.floor(pos).astype(np.uint64)
            frac = pos - pg
            feat = np.zeros(spec.feat_dim)
            for corner in range(8):
                w = 1.0
                local = np.zeros(3, dtype=np.uint64)
                for d in range(3):
                    if (corner >> d) & 1:
                        local[d] = pg[d] + 1
                        w *= frac[d]
                    else:
                        local[d] = pg[d]
                        w *= 1.0 - frac[d]
                if level < spec.begin_fast_hash_level:
                    idx = (
                        local[0] + local[1] * res + local[2] * res * res
                    ) % np.uint64(size)
                else:
                    h = np.uint64(0)
                    for d in range(3):
                        h ^= (local[d] * primes[d]) & np.uint64(0xFFFFFFFF)
                    idx = (h & np.uint64(0xFFFFFFFF)) % np.uint64(size)
                feat += w * table2[off + int(idx)]
            out[i, level * spec.feat_dim : (level + 1) * spec.feat_dim] = feat
    return out


def xor_corner_rows_np(xyz, spec):
    """Absolute per-corner rows under the reference hash — the bit-match
    oracle for ops.hash_encoder.xor_corner_rows."""
    primes = np.array([1, 2654435761, 805459861], dtype=np.uint64)
    n = xyz.shape[0]
    rows = np.zeros((spec.levels, 8, n), np.int64)
    for i in range(n):
        for level in range(spec.levels):
            res = spec.resolutions[level]
            size = spec.sizes[level]
            pos = xyz[i].astype(np.float64) * spec.scales[level] + 0.5
            pg = np.floor(pos).astype(np.uint64)
            for corner in range(8):
                local = np.array(
                    [pg[d] + ((corner >> d) & 1) for d in range(3)],
                    np.uint64,
                )
                if level < spec.begin_fast_hash_level:
                    idx = (
                        local[0] + local[1] * res + local[2] * res * res
                    ) % np.uint64(size)
                else:
                    h = np.uint64(0)
                    for d in range(3):
                        h ^= (local[d] * primes[d]) & np.uint64(0xFFFFFFFF)
                    idx = (h & np.uint64(0xFFFFFFFF)) % np.uint64(size)
                rows[level, corner, i] = spec.offsets[level] + int(idx)
    return rows
