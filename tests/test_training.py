"""End-to-end training tests on the synthetic dataset: the loss decreases,
depth converges toward ground truth, both grid variants run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virus_nerf_tpu.configs.config import Config, load_config
from virus_nerf_tpu.data import make_synthetic_dataset, sample_batch
from virus_nerf_tpu.models.renderer import render_rays
from virus_nerf_tpu.training import Trainer, compute_loss, LossWeights
from virus_nerf_tpu.training.loss import _masked_mse


class TestLoss:
    def _fake(self, rng, n=64):
        from virus_nerf_tpu.data.dataset import Batch

        depth_gt = rng.random(n).astype(np.float32) + 0.2
        uss = depth_gt.copy()
        uss[: n // 4] = np.nan
        batch = Batch(
            img_idxs=jnp.zeros(n, jnp.int32),
            pix_idxs=jnp.zeros(n, jnp.int32),
            rays_o=jnp.zeros((n, 3)),
            rays_d=jnp.zeros((n, 3)),
            rgb=jnp.asarray(rng.random((n, 3)).astype(np.float32)),
            depths={
                "RGBD": jnp.asarray(depth_gt),
                "ToF": jnp.asarray(uss),
                "USS": jnp.asarray(uss),
            },
            times=jnp.zeros(n),
        )
        results = {
            "rgb": jnp.asarray(rng.random((n, 3)).astype(np.float32)),
            "depth": jnp.asarray(rng.random(n).astype(np.float32) + 0.2),
        }
        return results, batch

    def test_color_and_sensor_terms(self, rng):
        results, batch = self._fake(rng)
        w = LossWeights(color=2.0, rgbd=3.0, tof=5.0, uss=7.0, uss_depth_tol=0.01)
        total, d = compute_loss(results, batch, w, sensors=("RGBD", "ToF", "USS"))
        np.testing.assert_allclose(
            float(d["color"]),
            2.0 * np.mean((np.asarray(results["rgb"]) - np.asarray(batch.rgb)) ** 2),
            rtol=1e-5,
        )
        # rgbd: plain mse (all valid)
        np.testing.assert_allclose(
            float(d["rgbd"]),
            3.0
            * np.mean(
                (np.asarray(results["depth"]) - np.asarray(batch.depths["RGBD"]))
                ** 2
            ),
            rtol=1e-5,
        )
        # tof: masked mse over valid
        tof = np.asarray(batch.depths["ToF"])
        valid = ~np.isnan(tof)
        pred = np.asarray(results["depth"])
        np.testing.assert_allclose(
            float(d["ToF"]),
            5.0 * np.mean((pred[valid] - tof[valid]) ** 2),
            rtol=1e-5,
        )
        # uss hinge: only depth < meas - tol contributes
        uss = np.asarray(batch.depths["USS"])
        close = valid & (pred < uss - 0.01)
        expect = (
            7.0 * np.mean((pred[close] - uss[close]) ** 2) if close.any() else 0.0
        )
        np.testing.assert_allclose(float(d["USS"]), expect, rtol=1e-5)
        np.testing.assert_allclose(
            float(total),
            float(d["color"]) + float(d["rgbd"]) + float(d["ToF"]) + float(d["USS"]),
            rtol=1e-5,
        )

    def test_all_invalid_gives_zero(self, rng):
        results, batch = self._fake(rng)
        batch.depths["ToF"] = jnp.full_like(batch.depths["ToF"], jnp.nan)
        w = LossWeights()
        total, d = compute_loss(results, batch, w, sensors=("ToF",))
        assert float(d["ToF"]) == 0.0
        assert np.isfinite(float(total))


def _tiny_config(grid_type="occ", **training_overrides):
    cfg = Config()
    cfg.dataset.name = "synthetic"
    cfg.model.grid_type = grid_type
    cfg.model.grid_size = 32
    cfg.model.hash_levels = 8
    cfg.model.hash_log2_T = 15
    cfg.model.hash_max_res = 128
    cfg.training.batch_size = 256
    cfg.training.max_steps = 30
    cfg.training.max_time = 300.0
    cfg.training.max_samples_per_ray = 48
    cfg.training.march_candidates = 512
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.4, "valid_tof": 0.4},
    }
    cfg.training.sensors = ["USS", "ToF"]
    cfg.evaluation.eval_every_n_steps = 10
    cfg.occ_grid.batch_size = 128
    cfg.occ_grid.update_interval = 4
    cfg.ngp_grid.update_interval = 4
    cfg.ngp_grid.warmup_steps = 8
    for k, v in training_overrides.items():
        setattr(cfg.training, k, v)
    return cfg


def test_sample_budget_auto_default(monkeypatch):
    """sample_budget=None resolves to the auto default (batch * min(spr,
    S)), 0 opts out to the dense path, explicit values pass through —
    pinned by observing what render_rays receives from the chunk body."""
    import virus_nerf_tpu.training.trainer as tr_mod

    seen = {}
    real_render = tr_mod.render_rays

    def spy(*a, **kw):
        seen["sample_budget"] = kw.get("sample_budget")
        return real_render(*a, **kw)

    monkeypatch.setattr(tr_mod, "render_rays", spy)
    dataset, scene, info = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    for budget, scale, expect in [
        (None, 0.5, 256 * 32),  # auto, constant-dt (S=48 > 32 -> spr 32)
        (None, 1.0, None),  # auto, exponential stepping: dense (ref parity)
        (0, 0.5, None),  # explicit opt-out: dense path
        (512, 0.5, 512),  # explicit value passes through
    ]:
        cfg = _tiny_config("occ", max_steps=1, sample_budget=budget)
        cfg.model.scale = scale
        trainer = Trainer(cfg, dataset, scene=scene)
        trainer.train()
        assert seen["sample_budget"] == expect, (budget, scale, seen)


@pytest.mark.parametrize("grid_type", ["occ", "ngp"])
def test_train_loop_decreases_loss(grid_type):
    # the ngp variant runs the slower per-step path (its warmup pass changes
    # shapes): fewer steps + a generous wall cap keep it robust on loaded
    # CPU test machines
    overrides = {"max_steps": 12, "max_time": 900.0} if grid_type == "ngp" else {}
    cfg = _tiny_config(grid_type, **overrides)
    dataset, scene, info = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.train()
    assert int(state.step) == cfg.training.max_steps
    losses = trainer.logs["loss"]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses[-1])


@pytest.mark.full  # RGBD loss unit-tested; the USS/ToF mapping-quality floor runs every time
def test_train_depth_converges():
    """After training with depth supervision, rendered depth along training
    rays should approach the RGBD ground truth."""
    cfg = _tiny_config("occ", max_steps=300)
    cfg.training.sensors = ["RGBD"]
    cfg.training.sampling_strategy = {"imgs": "all", "pixs": "random"}
    dataset, scene, info = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.train()

    batch = sample_batch(
        dataset, jax.random.PRNGKey(123), 512, {"imgs": "all", "pixs": "random"}
    )
    out = render_rays(
        trainer.model, state.params, state.grid.occ_bool,
        batch.rays_o, batch.rays_d, jax.random.PRNGKey(7),
        max_samples=cfg.training.max_samples_per_ray,
        n_candidates=cfg.training.march_candidates, jitter=False,
    )
    gt = np.asarray(batch.depths["RGBD"])
    pred = np.asarray(out["depth"])
    err = np.abs(pred - gt)
    # median depth error below ~7% of the mean scene depth
    assert np.median(err) < 0.07 * np.mean(gt), (
        np.median(err), np.mean(gt))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_config("occ", max_steps=3)
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.train()
    path = str(tmp_path / "ckpt.npz")
    trainer.save_checkpoint(state, path)
    template = trainer.init_state()
    restored = trainer.load_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored.params.pos_table), np.asarray(state.params.pos_table)
    )
    assert int(restored.step) == int(state.step)


def test_checkpoint_config_drift_fails(tmp_path):
    """Loading a checkpoint against a template built from a drifted config
    must raise (VERDICT r2 item 10), never deserialize silently into the
    wrong leaves."""
    import pytest as _pytest

    cfg = _tiny_config("occ", max_steps=2)
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.train()
    path = str(tmp_path / "ckpt.npz")
    trainer.save_checkpoint(state, path)

    # shape drift: smaller hash table
    cfg2 = _tiny_config("occ", max_steps=2)
    cfg2.model.hash_log2_T = 14
    trainer2 = Trainer(cfg2, dataset, scene=scene)
    with _pytest.raises(ValueError, match="config drift|shape"):
        trainer2.load_checkpoint(path, trainer2.init_state())

    # structural drift: different grid type changes the tree structure
    cfg3 = _tiny_config("ngp", max_steps=2)
    trainer3 = Trainer(cfg3, dataset, scene=scene)
    with _pytest.raises(ValueError):
        trainer3.load_checkpoint(path, trainer3.init_state())


def test_debug_mode_invariant_net():
    """debug_mode runs the invariant checks (reference debug assertions:
    ray norms, prob ranges, bitfield consistency) without tripping on a
    healthy run."""
    cfg = _tiny_config("occ", max_steps=8)
    cfg.training.debug_mode = True
    cfg.evaluation.eval_every_n_steps = 4
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.train()
    assert int(state.step) == 8
    # and the checks do fire on a corrupted state
    import pytest as _pytest
    bad = state._replace(
        params=state.params._replace(
            pos_table=state.params.pos_table.at[0].set(jnp.nan)
        )
    )
    with _pytest.raises(FloatingPointError):
        trainer._debug_check_state(bad, {"loss": 1.0}, 8)


def test_mapping_quality_regression():
    """Quality CI threshold (VERDICT round-1 item 3): a 300-step training
    run on the synthetic room must reach fixed NND bounds — the mapping
    metrics the reference optimizes for (score definition:
    /root/reference/run_optimization.py:123-125).  Bounds are ~1.3x the
    3-seed band maxima measured 2026-08-19 UNDER THE CONFTEST ENVIRONMENT
    (8 virtual CPU devices — device count changes XLA reduction
    partitioning and this chaotic 300-step run is sensitive to it; a band
    measured single-device reads ~30% lower and mis-calibrates the
    bounds): median z3 0.087-0.188 m, mean z1 0.109-0.148 m, coverage
    (mean_inv) z1 0.047-0.072 m over seeds 21/7/42, payload-march path.
    A ~30% regression trips CI while seed noise does not (VERDICT r2
    item 7)."""
    import time

    from virus_nerf_tpu.evaluation import Evaluator

    cfg = _tiny_config("occ", max_steps=300)
    cfg.training.batch_size = 512
    cfg.training.max_time = 1e9
    cfg.evaluation.eval_every_n_steps = 50
    cfg.evaluation.num_depth_pts_per_step = 0
    cfg.evaluation.res_angular = 128
    cfg.evaluation.res_map = 128
    cfg.evaluation.batch_size = 1024
    cfg.evaluation.max_samples_per_ray = 64

    ds, scene, info = make_synthetic_dataset(n_images=8, img_wh=(48, 36))
    trainer = Trainer(cfg, ds, scene=scene, img_wh=info["img_wh"])
    state = trainer.train()

    ev = Evaluator(trainer.model, cfg, ds, scene, img_wh=info["img_wh"])
    m, _ = ev.evaluate_depth(
        state.params, state.grid.occ_bool, np.array([0, 4]),
        sensors=("NeRF",),
    )
    nerf = m["NeRF"]
    assert nerf["nn_median"]["zone3"] < 0.245, nerf["nn_median"]
    assert nerf["nn_mean"]["zone1"] < 0.19, nerf["nn_mean"]
    assert nerf["nn_mean_inv"]["zone1"] < 0.094, nerf["nn_mean_inv"]


def test_grouped_chunk_matches_cond_chunk():
    """The cond-free grouped chunk body (chunk % interval == 0, aligned
    entry) must be bit-identical to the general per-step lax.cond body —
    same update steps, same scan semantics, only the control structure
    differs."""
    cfg = _tiny_config("occ")
    ds, scene, _ = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    trainer = Trainer(cfg, ds, scene=scene)
    state0 = trainer.init_state()

    # chunk of 8 steps = 2 update intervals (interval 4)
    grouped = trainer._make_train_chunk(8, entry_step_aligned=True)
    conded = jax.jit(
        trainer._make_chunk_body(8, entry_step_aligned=False)
    )
    ets = jnp.zeros(8, jnp.float32)
    sg, mg = grouped(state0, ds, ets)
    sc, mc = conded(state0, ds, ets)
    assert int(sg.step) == int(sc.step) == 8
    np.testing.assert_array_equal(
        np.asarray(mg["loss"]), np.asarray(mc["loss"])
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sg.params, sc.params,
    )
    np.testing.assert_array_equal(
        np.asarray(sg.grid.occ_3d_grid), np.asarray(sc.grid.occ_3d_grid)
    )


@pytest.mark.full  # default run covers ngp via test_train_loop_decreases_loss[ngp]
def test_ngp_fused_chunk_matches_stepwise():
    """The NGP grid's scan-fused post-warmup chunk (VERDICT r2 item 8) must
    be bit-identical to the per-step path: ngp update at each
    interval-aligned step followed by the train step, same RNG threading."""
    cfg = _tiny_config("ngp")
    ds, scene, _ = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    trainer = Trainer(cfg, ds, scene=scene)
    state0 = trainer.init_state()
    # put the state past warmup: one warmup update so the grid is non-empty
    state0 = trainer._make_ngp_update(warmup=True)(
        state0, ds, jnp.float32(0.0)
    )

    fused = trainer._make_train_chunk(8, entry_step_aligned=True)
    sf, mf = fused(state0, ds, jnp.zeros(8, jnp.float32))

    upd = trainer._make_ngp_update(warmup=False)
    step = jax.jit(trainer._make_train_body())
    ss = state0
    losses = []
    for i in range(8):
        if i % cfg.ngp_grid.update_interval == 0:
            ss = upd(ss, ds, jnp.float32(0.0))
        ss, m = step(ss, ds, jnp.float32(0.0))
        losses.append(float(m["loss"]))

    assert int(sf.step) == int(ss.step) == 8
    np.testing.assert_array_equal(np.asarray(mf["loss"]), np.asarray(losses))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sf.params, ss.params,
    )
    np.testing.assert_array_equal(
        np.asarray(sf.grid.density_grid), np.asarray(ss.grid.density_grid)
    )


@pytest.mark.full  # default run covers the warmup->fused switch in test_train_loop_decreases_loss[ngp]
def test_ngp_train_switches_to_fused():
    """train() on the ngp grid runs stepwise only through warmup, then the
    fused chunk loop finishes the run."""
    cfg = _tiny_config("ngp", max_steps=24)
    cfg.ngp_grid.warmup_steps = 6
    cfg.ngp_grid.update_interval = 4
    ds, scene, _ = make_synthetic_dataset(n_images=8, img_wh=(32, 24))
    trainer = Trainer(cfg, ds, scene=scene)
    state = trainer.train()
    assert int(state.step) == 24
    assert np.isfinite(trainer.logs["loss"][-1])
    assert len(trainer.logs["loss"]) == 24
