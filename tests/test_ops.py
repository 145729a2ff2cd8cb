"""Golden-value unit tests for the core ops vs sequential numpy replicas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virus_nerf_tpu.ops import (
    calc_dt,
    mip_from_dt,
    mip_from_pos,
    morton3d,
    morton3d_invert,
    packbits,
    unpackbits,
    ray_aabb_intersect,
    sh_encode,
    trunc_exp,
)
from virus_nerf_tpu.ops.hash_encoder import HashGridSpec, hash_encode

from reference_impl import (
    calc_dt_np,
    hash_encode_np,
    mip_from_dt_np,
    mip_from_pos_np,
    morton3d_np,
)


def test_morton_roundtrip(rng):
    coords = rng.integers(0, 128, size=(1000, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expected = np.array([morton3d_np(*c) for c in coords])
    np.testing.assert_array_equal(codes, expected)
    inv = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(inv, coords)


def test_packbits_roundtrip(rng):
    grid = rng.random(128 * 8).astype(np.float32)
    bf = np.asarray(packbits(jnp.asarray(grid), 0.5))
    bits = np.asarray(unpackbits(jnp.asarray(bf)))
    np.testing.assert_array_equal(bits, grid > 0.5)
    # golden: byte 0 bit pattern
    manual = sum((1 << i) for i in range(8) if grid[i] > 0.5)
    assert bf[0] == manual


def test_trunc_exp_grad():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    # gradient uses clamped input exp(15), value is exp(20)
    np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)
    np.testing.assert_allclose(trunc_exp(2.0), np.exp(2.0), rtol=1e-6)


def test_sh_encode_partition_of_unity(rng):
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    emb = np.asarray(sh_encode(jnp.asarray((d + 1) / 2)))
    assert emb.shape == (100, 16)
    # golden check of a few coefficients
    x, y, z = ((d + 1) / 2).T
    np.testing.assert_allclose(emb[:, 1], -0.48860251190291987 * y, rtol=1e-5)
    np.testing.assert_allclose(
        emb[:, 6], 0.94617469575755997 * z**2 - 0.31539156525251999, rtol=1e-5
    )
    np.testing.assert_allclose(
        emb[:, 15], 0.59004358992664352 * x * (-(x**2) + 3.0 * y**2), rtol=1e-4
    )


def test_ray_aabb(rng):
    # ray from origin along +x inside cube [-0.5, 0.5]^3
    o = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    hits = np.asarray(ray_aabb_intersect(o, d, 0.5))
    # inside: t1 clamps to NEAR_DISTANCE, t2 = 0.5
    np.testing.assert_allclose(hits[0], [0.01, 0.5], atol=1e-6)
    # behind: miss
    np.testing.assert_allclose(hits[1], [-1.0, -1.0])
    # in front: t1 = 1.5, t2 = 2.5
    np.testing.assert_allclose(hits[2], [1.5, 2.5], atol=1e-6)


def test_calc_dt_and_mips(rng):
    for esf in (0.0, 1.0 / 256.0):
        ts = rng.random(100).astype(np.float32) * 3
        got = np.asarray(calc_dt(jnp.asarray(ts), esf, 128, 0.5))
        want = [calc_dt_np(t, esf, 128, 0.5) for t in ts]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    xyz = (rng.random((200, 3)).astype(np.float32) - 0.5) * 4
    for cascades in (1, 3):
        got = np.asarray(mip_from_pos(jnp.asarray(xyz), cascades))
        want = [mip_from_pos_np(p, cascades) for p in xyz]
        np.testing.assert_array_equal(got, want)
        dts = rng.random(200).astype(np.float32) * 0.1
        got = np.asarray(mip_from_dt(jnp.asarray(dts), 128, cascades))
        want = [mip_from_dt_np(t, 128, cascades) for t in dts]
        np.testing.assert_array_equal(got, want)


class TestHashEncoder:
    def test_spec_layout(self):
        spec = HashGridSpec.create(
            levels=16, feat_dim=2, base_res=16, max_res=1024, max_params=2**19
        )
        # level 0: res 16, dense, 16^3 = 4096 rows
        assert spec.resolutions[0] == 16
        assert spec.sizes[0] == 4096
        assert spec.offsets[0] == 0
        # all sizes 8-aligned and capped
        assert all(s % 8 == 0 for s in spec.sizes)
        assert all(s <= 2**19 for s in spec.sizes)
        # log_b for 16 -> 1024 over 16 levels (reference comment value family)
        np.testing.assert_allclose(spec.log_b, np.log(1024 / 16) / 15)
        # fast hashing starts once res^3 > 2^19 (res >= 81)
        first_fast = next(
            i for i, r in enumerate(spec.resolutions) if r**3 > 2**19
        )
        assert spec.begin_fast_hash_level == first_fast
        assert spec.total_rows == sum(spec.sizes)

    def test_matches_reference_loop(self, rng):
        spec = HashGridSpec.create(
            levels=8, feat_dim=2, base_res=4, max_res=64, max_params=2**10
        )
        table = rng.random(spec.total_params).astype(np.float32)
        xyz = rng.random((32, 3)).astype(np.float32)
        got = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(xyz), spec))
        want = hash_encode_np(table, xyz, spec)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_packed_bf16_gather_matches_row_gather(self, rng, monkeypatch):
        """The packed-row bf16 gather (engaged for slabs >= 2^17 rows in
        production; threshold lowered here so CPU CI covers the packing
        arithmetic) must be exactly take(...).astype(bf16)."""
        import virus_nerf_tpu.ops.hash_encoder as he

        monkeypatch.setattr(he, "_PACK_MIN_ROWS", 64)
        slab = jnp.asarray(rng.random((512, 16)).astype(np.float32))
        rows = jnp.asarray(rng.integers(0, 512, size=257).astype(np.int32))
        assert he._packable(slab, 512, 2)
        got = np.asarray(
            he._gather_rows_packed_bf16(slab, rows).astype(jnp.float32)
        )
        want = np.asarray(jnp.take(slab, rows, axis=0).astype(jnp.bfloat16))
        np.testing.assert_array_equal(got, want)

    def test_packed_forward_within_bf16_tolerance(self, rng, monkeypatch):
        """End-to-end: hash_encode with the packed path engaged on every
        packable level stays within bf16 rounding of the f32 forward."""
        import virus_nerf_tpu.ops.hash_encoder as he

        spec = HashGridSpec.create(
            levels=8, feat_dim=2, base_res=4, max_res=64, max_params=2**10
        )
        table = jnp.asarray(rng.random(spec.total_params).astype(np.float32))
        xyz = jnp.asarray(rng.random((64, 3)).astype(np.float32))
        base = np.asarray(hash_encode(table, xyz, spec))
        monkeypatch.setattr(he, "_PACK_MIN_ROWS", 8)
        packed = np.asarray(hash_encode(table, xyz, spec))
        np.testing.assert_allclose(packed, base, rtol=0, atol=1.0 / 128)

    @pytest.mark.parametrize("levels,feat", [(8, 4), (16, 2), (4, 8)])
    def test_packed_slab_direct_bit_exact(self, rng, levels, feat):
        """`_packed_slab_direct` (VNERF_PACK_DIRECT: packed gather slabs
        built without the wide intermediate) must be BIT-identical to the
        bf16 wide build + pack reshape on every packable level."""
        import virus_nerf_tpu.ops.hash_encoder as he

        spec = HashGridSpec.create(
            levels=levels, feat_dim=feat, base_res=4, max_res=64,
            max_params=2**12,
        )
        table = jnp.asarray(
            rng.random((spec.total_rows, feat)).astype(np.float32)
        )
        wdt = 8 * feat
        P = 128 // wdt
        checked = 0
        for lvl in range(spec.levels):
            s = spec.sizes[lvl]
            if s % P or 128 % wdt:
                continue
            slab = jax.lax.dynamic_slice_in_dim(
                table, spec.offsets[lvl], s, axis=0
            )
            wide = slab.astype(jnp.bfloat16)
            for stride in (1, spec.stride_y[lvl], spec.stride_z[lvl]):
                wide = jnp.concatenate(
                    [wide, jnp.roll(wide, -int(stride % s), axis=0)], axis=1
                )
            want = np.asarray(wide.reshape(s // P, P * wdt))
            got = np.asarray(he._packed_slab_direct(slab, spec, lvl).arr)
            np.testing.assert_array_equal(got, want)
            checked += 1
        assert checked > 0

    def test_pack_direct_encode_matches_packed(self, rng, monkeypatch):
        """End to end with VNERF_PACK_DIRECT=1: hash_encode must equal the
        wide-build packed path exactly (both round to bf16; the direct
        build is a pure permutation of the same values)."""
        import virus_nerf_tpu.ops.hash_encoder as he

        spec = HashGridSpec.create(
            levels=8, feat_dim=4, base_res=4, max_res=64, max_params=2**10
        )
        table = jnp.asarray(
            rng.random((spec.total_rows, 4)).astype(np.float32)
        )
        xyz = jnp.asarray(rng.random((64, 3)).astype(np.float32))
        monkeypatch.setattr(he, "_PACK_MIN_ROWS", 8)
        base = np.asarray(hash_encode(table, xyz, spec))
        monkeypatch.setenv("VNERF_PACK_DIRECT", "1")
        monkeypatch.setattr(he, "tpu_kernels_enabled", lambda: True)
        direct = np.asarray(hash_encode(table, xyz, spec))
        np.testing.assert_array_equal(direct, base)

    def test_packed_ci_gather_matches_wide_gather(self, rng):
        """The corner-major packed gather (`_gather_rows_packed_ci`,
        consuming the widen-pack kernel's [c, i, f] lane layout) must
        select exactly the same widened rows as the plain wide-slab
        gather.  The kernel itself is TPU-only (bench.py check_kernels
        validates it bit-exactly); this covers the consumer arithmetic
        and the layout contract on CPU."""
        import virus_nerf_tpu.ops.hash_encoder as he
        from virus_nerf_tpu.ops.widen_pack_pallas import packed_ci_rows

        size = 2 * 8192
        wide = rng.random((size, 16)).astype(np.float32)
        wide_bf = np.asarray(jnp.asarray(wide).astype(jnp.bfloat16))
        # [c, i, f] lane layout in the kernel's band-permuted row order:
        # scatter every base row through the row map
        qs, js = (
            np.asarray(x)
            for x in packed_ci_rows(
                jnp.arange(size, dtype=jnp.int32), size // 8
            )
        )
        ci = np.zeros((size // 8, 128), dtype=wide_bf.dtype)
        for c in range(8):
            for f in range(2):
                ci[qs, 16 * c + 2 * js + f] = wide_bf[:, 2 * c + f]
        rows = jnp.asarray(rng.integers(0, size, size=257).astype(np.int32))
        got = np.asarray(
            he._gather_rows_packed_ci(
                jnp.asarray(ci), rows, 2
            ).astype(jnp.float32)
        )
        want = np.asarray(
            jnp.take(jnp.asarray(wide_bf), rows, axis=0).astype(jnp.float32)
        )
        np.testing.assert_array_equal(got, want)

    def test_gradient_is_scatter_add(self, rng):
        spec = HashGridSpec.create(
            levels=2, feat_dim=2, base_res=4, max_res=8, max_params=2**9
        )
        table = jnp.asarray(rng.random(spec.total_params).astype(np.float32))
        xyz = jnp.asarray(rng.random((4, 3)).astype(np.float32))

        def loss(tb):
            return jnp.sum(hash_encode(tb, xyz, spec) ** 2)

        g = jax.grad(loss)(table)
        # finite difference check on a few entries
        eps = 1e-3
        idxs = np.asarray(jnp.argsort(-jnp.abs(g))[:5])
        for i in idxs:
            tp = table.at[i].add(eps)
            tm = table.at[i].add(-eps)
            fd = (loss(tp) - loss(tm)) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-3)


class TestSegmentRowsSum:
    def test_batched_sort_path_matches_scatter(self, rng):
        """The TPU batched sort+cumsum segment reduction must equal a plain
        scatter-add."""
        import jax.numpy as jnp

        from virus_nerf_tpu.ops.hash_encoder import _batched_segment_rows_sum

        G, K, R = 3, 4096, 257
        rows = jnp.asarray(rng.integers(0, R, (G, K)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(G, K, 2)).astype(np.float32))
        got = np.asarray(_batched_segment_rows_sum(vals, rows, R))
        for g in range(G):
            want = np.zeros((R, 2), np.float32)
            np.add.at(want, np.asarray(rows[g]), np.asarray(vals[g]))
            np.testing.assert_allclose(got[g], want, atol=1e-3, rtol=1e-4)

    def test_empty_rows_are_zero(self, rng):
        import jax.numpy as jnp

        from virus_nerf_tpu.ops.hash_encoder import _batched_segment_rows_sum

        rows = jnp.asarray([[3, 3, 7]], jnp.int32)
        vals = jnp.ones((1, 3, 2), jnp.float32)
        out = np.asarray(_batched_segment_rows_sum(vals, rows, 10))[0]
        assert out[3, 0] == 2.0 and out[7, 0] == 1.0
        assert np.all(out[[0, 1, 2, 4, 5, 6, 8, 9]] == 0)


class TestFusedAdam:
    def test_matches_optax_adam(self):
        """fused_adam (jnp path on CPU) must track optax.adam step for step."""
        import optax
        from virus_nerf_tpu.ops.fused_adam import fused_adam

        key = jax.random.PRNGKey(0)
        params = {
            "big": jax.random.normal(key, (1000, 16)),
            "small": jax.random.normal(key, (8, 4)),
        }
        lr, eps = 1e-2, 1e-15
        ref_opt = optax.adam(lr, eps=eps)
        new_opt = fused_adam(lr, eps=eps)
        ref_state = ref_opt.init(params)
        new_state = new_opt.init(params)
        p_ref = p_new = params
        for i in range(5):
            g = jax.tree_util.tree_map(
                lambda p: jnp.sin(p * (i + 1)), params
            )
            ur, ref_state = ref_opt.update(g, ref_state)
            un, new_state = new_opt.update(g, new_state)
            p_ref = optax.apply_updates(p_ref, ur)
            p_new = optax.apply_updates(p_new, un)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_new[k]), np.asarray(p_ref[k]), rtol=1e-5, atol=1e-7
            )


class TestWindowedSegmentSum:
    def test_matches_naive(self, rng):
        from virus_nerf_tpu.ops.segment_sum_pallas import windowed_segment_sum

        K, R, F = 3000, 4096, 4
        sk = np.sort(rng.integers(0, R, K).astype(np.int32))
        sv = rng.normal(size=(K, F)).astype(np.float32)
        ref = np.zeros((R, F), np.float64)
        np.add.at(ref, sk, sv.astype(np.float64))
        got = np.asarray(
            windowed_segment_sum(jnp.asarray(sv), jnp.asarray(sk), R)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_empty_and_full_rows(self, rng):
        from virus_nerf_tpu.ops.segment_sum_pallas import windowed_segment_sum

        # all keys in one row; most rows empty
        K, R, F = 512, 2048, 2
        sk = np.full(K, 7, np.int32)
        sv = rng.normal(size=(K, F)).astype(np.float32)
        got = np.asarray(
            windowed_segment_sum(jnp.asarray(sv), jnp.asarray(sk), R)
        )
        np.testing.assert_allclose(got[7], sv.sum(0), rtol=1e-4)
        assert np.all(got[np.arange(R) != 7] == 0)

    def test_fused_factor_stream_matches_dense(self, rng):
        """`group_segment_sum_tsf_sorted` consumes the raw (8+F)-row
        factor stream and must equal the dense scatter of the f-major
        outer products; `_fold_wide_t_fmajor` must then agree with the
        c-major `_fold_wide_t` on the row-reordered tensor (the full
        layout contract of the fused backward path on CPU, where the
        Pallas kernel itself never traces — bench.py check_kernels
        covers that half on TPU)."""
        from virus_nerf_tpu.ops.hash_encoder import (
            _fold_wide_t,
            _fold_wide_t_fmajor,
        )
        from virus_nerf_tpu.ops.segment_sum_pallas import (
            group_segment_sum_tsf_sorted,
        )

        G, K, R, F = 2, 1024, 2048, 2
        sk = np.sort(rng.integers(0, R, (G, K)).astype(np.int32), axis=1)
        wgt = rng.normal(size=(G, 8 + F, K)).astype(np.float32)
        got = np.asarray(
            group_segment_sum_tsf_sorted(
                jnp.asarray(wgt), jnp.asarray(sk), R, F
            )
        )  # (G, 8F, R) f-major
        ref = np.zeros((G, 8 * F, R), np.float64)
        for g in range(G):
            for f in range(F):
                for c in range(8):
                    np.add.at(
                        ref[g, f * 8 + c], sk[g],
                        (wgt[g, c] * wgt[g, 8 + f]).astype(np.float64),
                    )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

        # fold contract: f-major fold == c-major fold after row reorder
        sy, sz = 37, 1005
        dt_f = jnp.asarray(got.astype(np.float32))
        cmajor = np.zeros_like(got)
        for f in range(F):
            for c in range(8):
                cmajor[:, c * F + f] = got[:, f * 8 + c]
        a = np.asarray(_fold_wide_t_fmajor(dt_f, sy, sz, R, F))
        b = np.asarray(_fold_wide_t(jnp.asarray(cmajor.astype(np.float32)), sy, sz, R))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestXorHashVariant:
    """Reference XOR fast-hash bit-parity (VERDICT round-1 item 4: the
    additive production hash deviates on hashed levels; this variant
    bit-matches /root/reference/modules/hash_encoder.py:43-62)."""

    def _spec(self):
        from virus_nerf_tpu.ops.hash_encoder import HashGridSpec

        return HashGridSpec.create(
            levels=8, feat_dim=2, base_res=4, max_res=64, max_params=2**10
        )

    def test_indices_bit_match(self, rng):
        import jax.numpy as jnp

        from virus_nerf_tpu.ops.hash_encoder import xor_corner_rows
        from reference_impl import xor_corner_rows_np

        spec = self._spec()
        assert spec.begin_fast_hash_level < spec.levels  # hashed levels exist
        xyz = rng.random((64, 3)).astype(np.float32)
        rows, _ = xor_corner_rows(spec, jnp.asarray(xyz))
        want = xor_corner_rows_np(xyz, spec)
        np.testing.assert_array_equal(np.asarray(rows), want)

    def test_encode_matches_reference_loop(self, rng):
        import jax.numpy as jnp

        from virus_nerf_tpu.ops.hash_encoder import hash_encode_xor
        from reference_impl import hash_encode_xor_np

        spec = self._spec()
        table = rng.random(spec.total_params).astype(np.float32)
        xyz = rng.random((32, 3)).astype(np.float32)
        got = np.asarray(
            hash_encode_xor(jnp.asarray(table), jnp.asarray(xyz), spec)
        )
        want = hash_encode_xor_np(table, xyz, spec)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_gradient_flows(self, rng):
        import jax
        import jax.numpy as jnp

        from virus_nerf_tpu.ops.hash_encoder import hash_encode_xor

        spec = self._spec()
        table = jnp.asarray(
            rng.random((spec.total_rows, spec.feat_dim)).astype(np.float32)
        )
        xyz = jnp.asarray(rng.random((16, 3)).astype(np.float32))

        def loss(tb):
            return jnp.sum(hash_encode_xor(tb, xyz, spec) ** 2)

        g = jax.grad(loss)(table)
        assert g.shape == table.shape
        assert float(jnp.sum(jnp.abs(g))) > 0
        # numeric check against finite differences on one hot row
        r = int(np.asarray(jnp.argmax(jnp.abs(g[:, 0]))))
        eps = 1e-3
        tp = table.at[r, 0].add(eps)
        tm = table.at[r, 0].add(-eps)
        fd = (loss(tp) - loss(tm)) / (2 * eps)
        np.testing.assert_allclose(float(g[r, 0]), float(fd), rtol=2e-2)
