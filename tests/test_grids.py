"""Grid machinery tests: Morton views, bitfield round trip, Bayes sensor
model vs a direct numpy transcription of the reference equations."""

import jax
import jax.numpy as jnp
import numpy as np

from virus_nerf_tpu.grids import (
    bitfield_from_grid,
    cartesian_to_morton,
    morton_to_cartesian,
    ngp_grid_init,
    ngp_grid_update,
    occ_grid_init,
    occ_grid_update,
    OccGridHParams,
)
from virus_nerf_tpu.grids.base import grid_from_bitfield
from virus_nerf_tpu.grids.occupancy_grid import (
    _cell_positions,
    dist_to_cube_border,
    nerf_density_probs,
    ray_measurement_probs,
)


def test_morton_view_roundtrip(rng):
    gs = 16
    g = rng.random((2, gs**3)).astype(np.float32)
    m = cartesian_to_morton(jnp.asarray(g), gs)
    back = morton_to_cartesian(m, gs)
    np.testing.assert_array_equal(np.asarray(back), g)


def test_bitfield_roundtrip(rng):
    """debug_mode invariant of the reference
    (training/trainer_plot.py:74-86): bitfield -> grid must equal
    thresholded grid."""
    gs = 16
    g = rng.random((1, gs**3)).astype(np.float32)
    bf = bitfield_from_grid(jnp.asarray(g), 0.5, gs)
    assert bf.shape == (gs**3 // 8,)
    back = grid_from_bitfield(bf, 1, gs)
    np.testing.assert_array_equal(np.asarray(back), g > 0.5)


def test_dist_to_cube_border():
    o = jnp.array([[0.0, 0.0, 0.0], [0.25, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    dists = np.asarray(dist_to_cube_border(o, d, -0.5, 0.5))
    np.testing.assert_allclose(dists, [0.5, 0.75], atol=1e-6)


def _ray_probs_np(meas, dists, hp):
    """Direct transcription of the sensor-model equations
    (reference: modules/occupancy_grid.py:337-465)."""
    pdf = lambda m, d: np.exp(
        -0.5 * (m - d) ** 2 / (hp.std_every_m * d + 1e-5) ** 2
    )
    pe_eq = np.full_like(dists, hp.false_detection_prob_every_m)
    po_eq = pe_eq + pdf(meas[:, None], dists)
    pe_nl = np.maximum(1 - pe_eq * dists, hp.prob_min)
    y = np.linspace(0, 1, hp.I)[None, :] * meas[:, None]
    integral = pdf(y[:, None, :], dists[:, :, None]).sum(2) * (meas / hp.I)[:, None]
    po_nl = np.maximum(pe_nl - integral, hp.prob_min)
    return po_eq * po_nl, pe_eq * pe_nl


def test_sensor_model_matches_reference(rng):
    hp = OccGridHParams(grid_size=32, scale=0.5)
    n, m = 16, hp.M
    meas = rng.random(n).astype(np.float32) * 0.8 + 0.05
    dists = np.sort(rng.random((n, m)).astype(np.float32), axis=1)
    po, pe = ray_measurement_probs(jnp.asarray(meas), jnp.asarray(dists), hp)
    po_ref, pe_ref = _ray_probs_np(meas, dists, hp)
    np.testing.assert_allclose(np.asarray(po), po_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe), pe_ref, rtol=1e-4, atol=1e-6)
    # sanity: near the measurement, occupied is more likely than empty
    near = np.abs(dists - meas[:, None]) < 0.02
    assert np.all(po_ref[near] > pe_ref[near])


def test_nerf_probs_monotone(rng):
    hp = OccGridHParams(grid_size=32, scale=0.5, nerf_threshold_slope=5.0)
    density = jnp.asarray(np.geomspace(1e-3, 100, 50).astype(np.float32))
    po, pe = nerf_density_probs(density, hp)
    po = np.asarray(po)
    assert np.all(np.diff(po) >= 0)  # higher density -> higher P(occ)
    assert po[0] < 0.5 < po[-1]  # crosses the threshold
    np.testing.assert_allclose(np.asarray(pe), 1 - po, atol=1e-6)


def test_occ_grid_bayes_update_single_cell(rng):
    """A single-ray update must equal the closed-form Bayes posterior."""
    hp = OccGridHParams(grid_size=8, scale=0.5, M=4, decay_warmup_steps=0)
    key = jax.random.PRNGKey(0)
    state = occ_grid_init(key, hp)
    grid0 = np.asarray(state.occ_3d_grid)

    rays_o = jnp.array([[-0.49, 0.01, 0.01]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])
    meas = jnp.array([0.5])
    batch = {"rays_o": rays_o, "rays_d": rays_d, "meas": meas}
    new = occ_grid_update(state, hp, None, key, ray_batch=batch)

    dists, _, idxs = _cell_positions(rays_o, rays_d, hp)
    po, pe = ray_measurement_probs(meas, dists, hp)
    idxs = np.asarray(idxs)[0]
    po, pe = np.asarray(po)[0], np.asarray(pe)[0]
    # pick a cell index that is unique within the batch
    uniq, counts = np.unique(idxs, axis=0, return_counts=True)
    for m_i in range(hp.M):
        mask = np.all(uniq == idxs[m_i], axis=1)
        if counts[mask][0] == 1:
            i, j, k = idxs[m_i]
            p = grid0[i, j, k]
            expected = p * po[m_i] / (p * po[m_i] + (1 - p) * pe[m_i])
            got = float(new.occ_3d_grid[i, j, k])
            np.testing.assert_allclose(got, expected, rtol=1e-4)
            return
    raise AssertionError("no unique cell found")


def test_occ_grid_nan_meas_is_noop(rng):
    hp = OccGridHParams(grid_size=8, scale=0.5, M=4, decay_warmup_steps=0)
    key = jax.random.PRNGKey(1)
    state = occ_grid_init(key, hp)
    batch = {
        "rays_o": jnp.array([[0.0, 0.0, 0.0]]),
        "rays_d": jnp.array([[1.0, 0.0, 0.0]]),
        "meas": jnp.array([jnp.nan]),
    }
    new = occ_grid_update(state, hp, None, key, ray_batch=batch)
    np.testing.assert_allclose(
        np.asarray(new.occ_3d_grid), np.asarray(state.occ_3d_grid), atol=1e-6
    )


def test_occ_grid_decay_warmup():
    hp = OccGridHParams(grid_size=8, scale=0.5, decay_warmup_steps=80,
                        update_interval=8)
    key = jax.random.PRNGKey(2)
    state = occ_grid_init(key, hp)
    new = occ_grid_update(state, hp, None, key)
    np.testing.assert_allclose(
        np.asarray(new.occ_3d_grid),
        np.asarray(state.occ_3d_grid) * hp.grid_decay,
        rtol=1e-6,
    )
    assert int(new.update_step) == 1
    # decay value floored to 3 decimals (reference quirk)
    assert hp.grid_decay == np.floor(
        ((0.5 / 0.51) ** (1 / (80 / 8))) * 1000
    ) / 1000


def test_ngp_grid_update(rng):
    gs, cascades, scale = 16, 1, 0.5

    def density_fn(xyz):
        # dense ball in the center
        return jnp.where(jnp.linalg.norm(xyz, axis=-1) < 0.2, 10.0, 0.0)

    state = ngp_grid_init(cascades, gs)
    key = jax.random.PRNGKey(3)
    state = ngp_grid_update(
        state, density_fn, key, warmup=True, density_threshold=0.01 * 1024 / 3**0.5,
        cascades=cascades, grid_size=gs, scale=scale,
    )
    occ = np.asarray(state.occ_bool.reshape(gs, gs, gs))
    # center occupied, corners empty
    assert occ[gs // 2, gs // 2, gs // 2]
    assert not occ[0, 0, 0]
    # non-warmup keeps shapes and decays
    d0 = np.asarray(state.density_grid).copy()
    state2 = ngp_grid_update(
        state, density_fn, jax.random.PRNGKey(4), warmup=False,
        density_threshold=0.01 * 1024 / 3**0.5,
        cascades=cascades, grid_size=gs, scale=scale,
    )
    d1 = np.asarray(state2.density_grid)
    assert d1.shape == d0.shape
    # unsampled empty cells decayed (or unchanged at 0)
    assert np.all(d1 <= np.maximum(d0, 10.0) + 1e-5)
