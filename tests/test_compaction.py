"""Sample-compaction equivalence: with a budget covering all valid samples,
the compacted render must equal the dense render exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virus_nerf_tpu.models import NGPModel, render_rays


def _setup():
    model = NGPModel(
        scale=0.5, levels=4, log2_T=13, max_res=64, grid_size=32
    )
    params = model.init(jax.random.PRNGKey(0))
    # half-occupied grid so rays have ragged sample counts
    rng = np.random.default_rng(3)
    occ = jnp.asarray(rng.random((1, 32**3)) < 0.3)
    n = 64
    th = np.linspace(0, 2 * np.pi, n)
    rays_o = jnp.zeros((n, 3), jnp.float32)
    rays_d = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), 0.1 * np.sin(3 * th)], 1),
        jnp.float32,
    )
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
    return model, params, occ, rays_o, rays_d


@pytest.mark.full  # default run keeps gradient-flow + payload-overflow compaction tests
def test_budget_covers_all_matches_dense():
    model, params, occ, rays_o, rays_d = _setup()
    key = jax.random.PRNGKey(1)
    kwargs = dict(
        exp_step_factor=0.0, max_samples=32, n_candidates=256, jitter=False
    )
    dense = render_rays(model, params, occ, rays_o, rays_d, key, **kwargs)
    comp = render_rays(
        model, params, occ, rays_o, rays_d, key,
        sample_budget=64 * 32, **kwargs
    )
    assert int(comp["overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(comp["rgb"]), np.asarray(dense["rgb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(comp["depth"]), np.asarray(dense["depth"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(comp["opacity"]), np.asarray(dense["opacity"]), atol=1e-5
    )


def test_budget_covers_all_matches_dense_esf():
    """Exponential-stepping / multi-cascade counterpart of the covering-
    budget equivalence: the compacted stream path must reproduce the dense
    render exactly at exp_step_factor > 0 too (its deltas vary per sample
    and ride the valid-first sort)."""
    model = NGPModel(scale=1.0, levels=4, log2_T=13, max_res=64, grid_size=32)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    occ = jnp.asarray(rng.random((2, 32**3)) < 0.3)
    n = 64
    th = np.linspace(0, 2 * np.pi, n)
    rays_o = jnp.zeros((n, 3), jnp.float32)
    rays_d = jnp.asarray(
        np.stack([np.cos(th), np.sin(th), 0.1 * np.sin(3 * th)], 1),
        jnp.float32,
    )
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=1, keepdims=True)
    key = jax.random.PRNGKey(1)
    kwargs = dict(
        exp_step_factor=1 / 256, max_samples=128, n_candidates=512,
        jitter=False,
    )
    dense = render_rays(model, params, occ, rays_o, rays_d, key, **kwargs)
    comp = render_rays(
        model, params, occ, rays_o, rays_d, key,
        sample_budget=64 * 128, **kwargs
    )
    assert int(comp["overflow"]) == 0
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(
            np.asarray(comp[k]), np.asarray(dense[k]), atol=1e-5
        )


def test_small_budget_overflows_but_finite():
    model, params, occ, rays_o, rays_d = _setup()
    key = jax.random.PRNGKey(1)
    out = render_rays(
        model, params, occ, rays_o, rays_d, key,
        exp_step_factor=0.0, max_samples=32, n_candidates=256,
        jitter=False, sample_budget=64,
    )
    assert int(out["overflow"]) > 0
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_overflow_subsamples_every_ray():
    """Over-budget streams must proportionally subsample EVERY ray (delta-
    scaled stride selection), not silently drop tail-of-batch rays: each
    ray with any valid march sample still composites nonzero opacity
    (trunc-exp density is strictly positive), and its depth stays close to
    the dense render's because the scaled deltas preserve per-ray optical
    depth."""
    model, params, occ, rays_o, rays_d = _setup()
    key = jax.random.PRNGKey(1)
    kwargs = dict(
        exp_step_factor=0.0, max_samples=32, n_candidates=256, jitter=False
    )
    dense = render_rays(model, params, occ, rays_o, rays_d, key, **kwargs)
    # budget of ~half the valid samples of this scene
    comp = render_rays(
        model, params, occ, rays_o, rays_d, key,
        sample_budget=512, **kwargs
    )
    assert int(comp["overflow"]) > 0
    d_op = np.asarray(dense["opacity"])
    c_op = np.asarray(comp["opacity"])
    has = d_op > 1e-6
    assert has.sum() > 16  # the fixture renders most rays
    # the last rays of the batch are supervised too (the truncation-drop
    # failure mode zeroed exactly these)
    assert np.all(c_op[has] > 0.0), (
        f"unsupervised rays at {np.where(has & (c_op == 0))[0]}"
    )
    # represented-count delta scaling keeps accumulated optical depth in
    # the same regime: opacities correlate strongly with the dense render
    assert np.corrcoef(c_op[has], d_op[has])[0, 1] > 0.9


def test_evaluator_budget_matches_dense():
    """evaluation.sample_budget with a covering budget must leave test
    renders exact (the dense parity path is the default; the budget is
    the documented e2e eval-speed knob)."""
    from virus_nerf_tpu.configs.config import Config
    from virus_nerf_tpu.data import make_synthetic_dataset
    from virus_nerf_tpu.evaluation import Evaluator

    model, params, occ, rays_o, rays_d = _setup()
    cfg = Config()
    cfg.model.grid_size = 32
    cfg.evaluation.batch_size = 64
    cfg.evaluation.max_samples_per_ray = 32
    cfg.training.march_candidates = 256
    ds, scene, info = make_synthetic_dataset(n_images=2, img_wh=(16, 12))

    ev = Evaluator(model, cfg, ds, scene, img_wh=info["img_wh"])
    dense = ev.render_batched(
        params, occ, np.asarray(rays_o), np.asarray(rays_d))
    cfg.evaluation.sample_budget = 64 * 32  # covering
    ev2 = Evaluator(model, cfg, ds, scene, img_wh=info["img_wh"])
    comp = ev2.render_batched(
        params, occ, np.asarray(rays_o), np.asarray(rays_d))
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(comp[k], dense[k], atol=1e-5)


def test_gradients_flow_through_compaction():
    model, params, occ, rays_o, rays_d = _setup()
    key = jax.random.PRNGKey(1)

    def loss(p):
        out = render_rays(
            model, p, occ, rays_o, rays_d, key,
            exp_step_factor=0.0, max_samples=32, n_candidates=256,
            jitter=False, sample_budget=64 * 32,
        )
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["depth"] ** 2)

    g = jax.grad(loss)(params)
    gt = np.asarray(g.pos_table)
    assert np.any(gt != 0) and np.all(np.isfinite(gt))
