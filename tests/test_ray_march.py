"""Ray-march + compositing equivalence vs the sequential reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from virus_nerf_tpu.ops import composite_rays, march_rays_train, ray_aabb_intersect

from reference_impl import composite_np, march_ray_np


def _random_occ(rng, cascades, grid_size, p=0.3):
    return rng.random((cascades, grid_size**3)) < p


def _occ_fn(occ, grid_size):
    def fn(mip, cell):
        lin = (cell[0] * grid_size + cell[1]) * grid_size + cell[2]
        return bool(occ[mip, lin])

    return fn


@pytest.mark.parametrize("esf,scale,cascades", [(0.0, 0.5, 1), (1 / 256, 2.0, 3)])
def test_march_matches_reference(rng, esf, scale, cascades):
    grid_size = 32
    n_rays = 16
    occ = _random_occ(rng, cascades, grid_size, p=0.3)

    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * scale
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)

    hits = np.asarray(ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), scale))

    K = 2048 if esf > 0 else 1024
    res = march_rays_train(
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(hits),
        jnp.asarray(occ),
        jnp.asarray(noise),
        cascades=cascades,
        grid_size=grid_size,
        scale=scale,
        exp_step_factor=esf,
        max_samples=K,  # no subsampling -> bit-exact layout
        n_candidates=K,
    )

    for r in range(n_rays):
        ts_ref, dts_ref = march_ray_np(
            o[r].astype(np.float64),
            d[r].astype(np.float64),
            float(hits[r, 0]),
            float(hits[r, 1]),
            _occ_fn(occ, grid_size),
            cascades,
            grid_size,
            scale,
            esf,
            max_samples=K,
            noise=float(noise[r]),
        )
        n = int(res.n_samples[r])
        assert n == len(ts_ref), f"ray {r}: {n} vs {len(ts_ref)}"
        if n:
            np.testing.assert_allclose(
                np.asarray(res.ts[r, :n]), ts_ref, rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(res.deltas[r, :n]), dts_ref, rtol=2e-4, atol=2e-6
            )
            assert bool(np.all(np.asarray(res.valid[r, :n])))
            assert not bool(np.any(np.asarray(res.valid[r, n:])))


def test_march_subsampling_covers_range(rng):
    """With a small budget the stride-subsampled samples must span the same
    t-range and conserve total represented delta."""
    grid_size = 16
    occ = np.ones((1, grid_size**3), dtype=bool)
    o = np.zeros((1, 3), dtype=np.float32)
    d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    hits = np.asarray(ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), 0.5))
    noise = np.zeros(1, dtype=np.float32)

    S = 16
    res = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(hits), jnp.asarray(occ),
        jnp.asarray(noise), cascades=1, grid_size=grid_size, scale=0.5,
        exp_step_factor=0.0, max_samples=S, n_candidates=1024,
    )
    # budget saturated: all S slots valid (n_samples reports the samples
    # actually in the layout — capped, like the reference's N_samples)
    assert int(res.n_samples[0]) == S
    assert bool(np.all(np.asarray(res.valid[0])))
    # represented-count delta scaling conserves the total marched span
    dt = 1.7320508075688772 / 1024
    span = float(hits[0, 1] - hits[0, 0])
    np.testing.assert_allclose(
        float(jnp.sum(res.deltas[0])), span, atol=2 * dt
    )
    # ts increasing and spanning ~[t1, t2]
    ts = np.asarray(res.ts[0])
    assert np.all(np.diff(ts) > 0)
    assert ts[-1] > 0.9 * hits[0, 1]


@pytest.mark.full  # fast-path==exact equivalence also held by the payload-overflow test
def test_hierarchical_matches_exact(rng):
    """The dilated-coarse fast path must reproduce the exact per-candidate
    march bit-for-bit when no ray overflows (K % stride != 0 disables the
    hierarchy, giving the exact-path baseline)."""
    # S == K: even the dilated superset of this (worst-case salt-and-pepper)
    # random grid cannot overflow the budget, so the fast path must be exact
    grid_size, n_rays, S = 32, 32, 1024
    occ = rng.random((1, grid_size**3)) < 0.1
    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 0.4
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), 0.5))

    kw = dict(cascades=1, grid_size=grid_size, scale=0.5,
              exp_step_factor=0.0, max_samples=S)
    fast = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(hits), jnp.asarray(occ),
        jnp.asarray(noise), n_candidates=1024, **kw)
    # 1023 candidates: hierarchy disabled (K % 4 != 0) -> exact path; the
    # dropped last candidate is beyond every test ray's exit
    exact = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(hits), jnp.asarray(occ),
        jnp.asarray(noise), n_candidates=1023, **kw)
    np.testing.assert_array_equal(
        np.asarray(fast.n_samples), np.asarray(exact.n_samples))
    np.testing.assert_array_equal(
        np.asarray(fast.valid), np.asarray(exact.valid))
    np.testing.assert_allclose(
        np.asarray(fast.ts), np.asarray(exact.ts), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fast.deltas), np.asarray(exact.deltas), rtol=1e-6)


def test_composite_matches_reference(rng):
    n_rays, S = 8, 32
    sigmas = rng.random((n_rays, S)).astype(np.float32) * 30
    rgbs = rng.random((n_rays, S, 3)).astype(np.float32)
    deltas = np.full((n_rays, S), 0.01, dtype=np.float32)
    ts = np.cumsum(deltas, axis=1).astype(np.float32)
    n_samples = rng.integers(0, S + 1, size=n_rays)
    valid = np.arange(S)[None, :] < n_samples[:, None]

    out = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(deltas),
        jnp.asarray(ts), jnp.asarray(valid), T_threshold=1e-4,
    )
    for r in range(n_rays):
        n = int(n_samples[r])
        opacity, depth, rgb, ws, count = composite_np(
            sigmas[r, :n], rgbs[r, :n], deltas[r, :n], ts[r, :n], 1e-4
        )
        np.testing.assert_allclose(float(out.opacity[r]), opacity, rtol=1e-4)
        np.testing.assert_allclose(float(out.depth[r]), depth, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.rgb[r]), rgb, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.ws[r, :n]), ws, rtol=1e-4, atol=1e-7
        )
        assert int(out.vr_samples[r]) == count


@pytest.mark.full  # default run keeps the reference-oracle + exactness march tests
def test_super_coarse_preprobe_is_output_invariant(rng, monkeypatch):
    """On the UNCOMPACTED hierarchical path (_FORCE_FULL_HIER) the
    _SUPER_STRIDE pre-probe only masks provably-empty stride-4 probe
    lookups to row 0; replacing its pooled grid with all-ones (mask
    disabled) must leave the march output bit-identical — including rays
    that overflow the budget and subsample the superset.

    The compacted path does NOT share this invariant: there, the pre-probe
    determines which probes count as active and thus which fit
    _PROBE_BUDGET (see the constants block in ops/ray_march.py), so the
    invariant is checked with compaction forced off."""
    from virus_nerf_tpu.ops import ray_march as rm

    monkeypatch.setattr(rm, "_FORCE_FULL_HIER", True)

    grid_size, n_rays, S = 128, 64, 16  # tiny budget: overflow guaranteed
    occ = rng.random((1, grid_size**3)) < 0.03
    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 0.4
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), 0.5)
    args = (jnp.asarray(o), jnp.asarray(d), hits, jnp.asarray(occ),
            jnp.asarray(noise))
    kw = dict(cascades=1, grid_size=grid_size, scale=0.5,
              exp_step_factor=0.0, max_samples=S, n_candidates=1024)

    masked = march_rays_train(*args, **kw)
    real_pool = rm._coarse_pool
    monkeypatch.setattr(
        rm, "_coarse_pool",
        lambda g, gs, f: jnp.ones_like(real_pool(g, gs, f)),
    )
    unmasked = march_rays_train(*args, **kw)

    # the pre-probe must actually fire on this sparse grid (mask non-trivial)
    pooled = np.asarray(real_pool(jnp.asarray(occ), grid_size, 4))
    assert not pooled.all()

    np.testing.assert_array_equal(
        np.asarray(masked.n_samples), np.asarray(unmasked.n_samples))
    np.testing.assert_array_equal(
        np.asarray(masked.valid), np.asarray(unmasked.valid))
    np.testing.assert_array_equal(
        np.asarray(masked.ts), np.asarray(unmasked.ts))
    np.testing.assert_array_equal(
        np.asarray(masked.deltas), np.asarray(unmasked.deltas))


def test_group_payload_table_oracle(rng):
    """build_group_payload row ``a`` must pack the exact occupancy of fine
    cells [4a, 4a+8) per axis under the documented (d, m) bit layout, with
    out-of-grid cells reading 0 (edge anchors padded, not wrapped)."""
    from virus_nerf_tpu.ops import ray_march as rm

    gs = 16
    occ = rng.random((1, gs**3)) < 0.4
    table = np.asarray(rm.build_group_payload(jnp.asarray(occ), gs))
    g4 = gs // 4
    assert table.shape == (g4**3, 16)
    occ3 = occ.reshape(gs, gs, gs)
    anchors = [(0, 0, 0), (g4 - 1, g4 - 1, g4 - 1), (1, 2, 3),
               (g4 - 1, 0, 2)]
    for ax, ay, az in anchors:
        row = table[(ax * g4 + ay) * g4 + az]
        for lx in range(8):
            for ly in range(8):
                for lz in range(8):
                    X, Y, Z = 4 * ax + lx, 4 * ay + ly, 4 * az + lz
                    want = (
                        bool(occ3[X, Y, Z])
                        if X < gs and Y < gs and Z < gs
                        else False
                    )
                    d = (lx >> 2) * 4 + (ly >> 2) * 2 + (lz >> 2)
                    m = (lx & 3) * 16 + (ly & 3) * 4 + (lz & 3)
                    got = bool(
                        (int(row[d * 2 + (m >> 5)]) >> (m & 31)) & 1
                    )
                    assert got == want, (ax, ay, az, lx, ly, lz)


def test_payload_matches_exact_with_overflow(rng, monkeypatch):
    """The payload march must be BIT-identical to the exact per-candidate
    path — including rays that overflow the budget and subsample at
    candidate granularity (unlike the hierarchical path's probe-granular
    superset subsampling, the payload path has no approximation)."""
    from virus_nerf_tpu.ops import ray_march as rm

    grid_size, n_rays, S = 128, 48, 32  # small budget: overflow guaranteed
    occ = rng.random((1, grid_size**3)) < 0.25
    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 0.4
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), 0.5)
    args = (jnp.asarray(o), jnp.asarray(d), hits, jnp.asarray(occ),
            jnp.asarray(noise))
    kw = dict(cascades=1, grid_size=grid_size, scale=0.5,
              exp_step_factor=0.0, max_samples=S, n_candidates=1024)

    calls = []
    real_build = rm.build_group_payload
    monkeypatch.setattr(
        rm, "build_group_payload",
        lambda *a: (calls.append(1), real_build(*a))[1],
    )
    pay = march_rays_train(*args, **kw)
    assert calls, "payload path was not taken (gate vacuous)"

    monkeypatch.setattr(rm, "_DISABLE_PAYLOAD", True)
    monkeypatch.setattr(rm, "_COARSE_STRIDE", 1)  # hier off -> exact path
    exact = march_rays_train(*args, **kw)
    assert int(jnp.max(exact.n_samples)) == S  # overflow actually exercised

    np.testing.assert_array_equal(
        np.asarray(pay.n_samples), np.asarray(exact.n_samples))
    np.testing.assert_array_equal(
        np.asarray(pay.valid), np.asarray(exact.valid))
    np.testing.assert_array_equal(
        np.asarray(pay.ts), np.asarray(exact.ts))
    np.testing.assert_array_equal(
        np.asarray(pay.deltas), np.asarray(exact.deltas))


@pytest.mark.parametrize(
    "scale,cascades,grid_size",
    [(1.0, 2, 128), (2.0, 3, 32), (4.0, 4, 64)],
)
def test_payload_mc_matches_exact(rng, monkeypatch, scale, cascades,
                                  grid_size):
    """The multi-cascade / exponential-stepping payload march must be
    BIT-identical to the exact per-candidate path: mip-mismatched
    candidates and span-infeasible groups take the exact fallback inside
    _payload_mc, so equality must hold even for rays whose absolute t
    rides the dt cap (origins far outside the cube)."""
    from virus_nerf_tpu.ops import ray_march as rm

    esf = 1 / 256
    n_rays = 48
    occ = rng.random((cascades, grid_size**3)) < 0.3
    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * scale
    # far-origin tail: forces clipped mips / large dt (fallback coverage)
    o[n_rays // 2:] += np.sign(o[n_rays // 2:]) * (3.0 * scale + 5.0)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)
    hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), scale)
    args = (jnp.asarray(o), jnp.asarray(d), hits, jnp.asarray(occ),
            jnp.asarray(noise))
    kw = dict(cascades=cascades, grid_size=grid_size, scale=scale,
              exp_step_factor=esf, max_samples=2048, n_candidates=2048)

    calls = []
    real_build = rm.build_group_payload
    monkeypatch.setattr(
        rm, "build_group_payload",
        lambda *a: (calls.append(1), real_build(*a))[1],
    )
    monkeypatch.setenv("VNERF_PAYLOAD_MC", "1")  # env-gated (r5 falsified)
    pay = march_rays_train(*args, **kw)
    assert calls, "payload_mc path was not taken (gate vacuous)"

    monkeypatch.setattr(rm, "_DISABLE_PAYLOAD", True)
    exact = march_rays_train(*args, **kw)
    assert int(exact.total_samples) > 0

    for field in ("n_samples", "valid", "ts", "deltas"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pay, field)),
            np.asarray(getattr(exact, field)),
        )


@pytest.mark.full  # knob sweep; quadrature parity held by test_march_matches_reference
def test_march_resolution_knob(rng):
    """march_resolution=512 doubles dt (sqrt(3)/512) and must produce
    exactly the in-range occupied candidates of the halved lattice — checked
    against a direct numpy recompute — on BOTH the exact path (odd K
    disables the hierarchy) and the stride-2 hierarchical fast path that a
    doubled dt forces ((4-1)*dt no longer fits the radius-1 probe ball)."""
    grid_size, n_rays, scale = 128, 32, 0.5
    occ = rng.random((1, grid_size**3)) < 0.05
    o = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 0.4
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    noise = rng.random(n_rays).astype(np.float32)
    hits = np.asarray(ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), scale))
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(hits),
            jnp.asarray(occ), jnp.asarray(noise))
    kw = dict(cascades=1, grid_size=grid_size, scale=scale,
              exp_step_factor=0.0, march_resolution=512)

    hier = march_rays_train(*args, max_samples=512, n_candidates=512, **kw)
    exact = march_rays_train(*args, max_samples=511, n_candidates=511, **kw)

    dt = np.sqrt(3.0) / 512.0
    for r in range(n_rays):
        t1, t2 = float(hits[r, 0]), float(hits[r, 1])
        ts_ref = []
        if t1 >= 0:
            for k in range(511):
                t = t1 + (float(noise[r]) + k) * dt
                if not (0.0 <= t < t2):
                    continue
                xyz = o[r].astype(np.float64) + t * d[r].astype(np.float64)
                cell = np.clip(
                    0.5 * (xyz / scale + 1.0) * grid_size, 0, grid_size - 1.0
                ).astype(np.int64)
                lin = (cell[0] * grid_size + cell[1]) * grid_size + cell[2]
                if occ[0, lin]:
                    ts_ref.append(t)
        for res in (hier, exact):
            n = int(res.n_samples[r])
            assert n == len(ts_ref), f"ray {r}: {n} vs {len(ts_ref)}"
            if n:
                np.testing.assert_allclose(
                    np.asarray(res.ts[r, :n]), ts_ref, rtol=2e-4, atol=2e-5)
                np.testing.assert_allclose(
                    np.asarray(res.deltas[r, :n]), dt, rtol=1e-6)
