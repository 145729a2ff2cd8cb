"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from virus_nerf_tpu.data import make_synthetic_dataset
from virus_nerf_tpu.parallel import make_dp_train_step, make_mesh
from virus_nerf_tpu.training import Trainer

from test_training import _tiny_config


def test_dp_train_step_runs_and_replicates():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    cfg = _tiny_config("occ", max_steps=4)
    cfg.training.batch_size = 256  # 32 rays/device
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.init_state()

    mesh = make_mesh(8)
    step = make_dp_train_step(trainer, mesh)
    import jax.numpy as jnp

    for _ in range(3):
        state, metrics = step(state, dataset, jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
    # params finite after update
    assert np.all(np.isfinite(np.asarray(state.params.xyz_w[0])))


def test_dp_chunk_grid_update_replicates():
    """The full DP chunk (grid update + uss_stats folded in) keeps params,
    occupancy grid, and USS stats bit-identical on every device after
    crossing a grid update."""
    import jax.numpy as jnp

    from virus_nerf_tpu.parallel import make_dp_train_chunk

    cfg = _tiny_config("occ", max_steps=12)
    cfg.training.batch_size = 256
    cfg.training.sampling_strategy = {
        "imgs": "all",
        "pixs": {"valid_uss": 0.3, "valid_tof": 0.3, "closest": 0.1},
    }
    cfg.occ_grid.update_interval = 3
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state = trainer.init_state()

    mesh = make_mesh(8)
    chunk = make_dp_train_chunk(trainer, mesh, chunk_steps=5)
    for _ in range(2):
        state, metrics = chunk(state, dataset, jnp.float32(0.0))
    assert int(state.step) == 10
    # grid updates fired at steps 0, 3, 6, 9
    assert int(state.grid.update_step) == 4
    assert np.isfinite(float(metrics["loss"][-1]))

    for name, arr in (
        ("pos_table", state.params.pos_table),
        ("occ_3d_grid", state.grid.occ_3d_grid),
        ("occ_bool", state.grid.occ_bool),
        ("uss_min_depth", state.uss_stats.min_depth),
        ("uss_min_pix", state.uss_stats.min_pix),
        ("opt_state", jax.tree_util.tree_leaves(state.opt_state)[0]),
    ):
        shards = list(arr.addressable_shards)
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(
                ref, np.asarray(s.data), err_msg=f"{name} diverged"
            )

    # the grid actually moved (the update is not a no-op under DP)
    fresh = trainer.init_state()
    assert not np.allclose(
        np.asarray(state.grid.occ_3d_grid), np.asarray(fresh.grid.occ_3d_grid)
    )


@pytest.mark.full  # default run keeps the SPMD-swarm equality in test_optimization
def test_population_parallel_eval(tmp_path):
    """Batch-synchronous PSO with the concurrent population evaluator: all
    particles of an iteration train at once, one per CPU-mesh device
    (SURVEY.md §5.8 DCN population parallelism)."""
    import time

    from virus_nerf_tpu.optimization.pso import HParamSpace
    from virus_nerf_tpu.optimization.runner import run_optimization
    from virus_nerf_tpu.parallel import make_population_eval, population_devices

    cfg = _tiny_config("occ", max_steps=6)
    cfg.training.batch_size = 128
    cfg.evaluation.eval_every_n_steps = 3
    cfg.evaluation.res_angular = 32
    cfg.evaluation.res_map = 64
    cfg.evaluation.batch_size = 256
    cfg.evaluation.max_samples_per_ray = 32

    lims = {
        "training": {"pixs_valid_uss": [0.2, 0.6], "pixs_valid_tof": [0.2, 0.6]},
        "occ_grid": {"update_interval": [2, 6]},
    }
    train = make_synthetic_dataset(n_images=4, img_wh=(24, 18))
    space = HParamSpace(lims)
    devices = population_devices(5)
    assert len(devices) == 5
    batch_eval = make_population_eval(
        cfg, space, (train, train), devices=devices
    )

    tic = time.time()
    pso = run_optimization(
        cfg, lims, str(tmp_path / "pso"),
        train_and_eval=None, T=3, termination_by_time=False,
        max_iters=2, rng=np.random.default_rng(0),
        batch_eval=batch_eval,
    )
    wall = time.time() - tic
    assert pso.pso.state.t >= 2  # two full swarm iterations ran
    assert np.isfinite(pso.best_score)
    assert np.all(np.isfinite(pso.pso.state.best_score))
    print(f"2 swarm iterations x 5 particles in {wall:.1f}s")


def test_dp_step_deterministic():
    """The DP step is deterministic: same state in, same state out."""
    import jax.numpy as jnp

    cfg = _tiny_config("occ", max_steps=1)
    cfg.training.batch_size = 128
    dataset, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(32, 24))
    trainer = Trainer(cfg, dataset, scene=scene)
    state0 = trainer.init_state()

    mesh = make_mesh(8)
    dp = make_dp_train_step(trainer, mesh)
    s1, m1 = dp(state0, dataset, jnp.float32(0.0))
    s2, m2 = dp(state0, dataset, jnp.float32(0.0))
    np.testing.assert_array_equal(
        np.asarray(s1.params.xyz_w[0]), np.asarray(s2.params.xyz_w[0])
    )
    np.testing.assert_array_equal(float(m1["loss"]), float(m2["loss"]))


def test_pallas_gate_override():
    """The Pallas gate (ops/common.py) must honor the contextvar override:
    mesh-aware callers pin it to the MESH's platform because
    jax.default_backend() still reports "tpu" when the TPU plugin is
    registered but the program is lowered for a virtual CPU mesh — the
    regression that broke dryrun_multichip ("Only interpret mode is
    supported on CPU backend")."""
    from virus_nerf_tpu.ops.common import pallas_kernels, tpu_kernels_enabled

    base = tpu_kernels_enabled()
    with pallas_kernels(False):
        assert tpu_kernels_enabled() is False
        with pallas_kernels(True):
            assert tpu_kernels_enabled() is True
        assert tpu_kernels_enabled() is False
    assert tpu_kernels_enabled() == base


def test_segment_sum_gate_routes_to_jnp():
    """Under pallas_kernels(False) the segment-sum group op must take the
    jnp formulation even where the kernel would be shape-eligible (this is
    what keeps the CPU-mesh dryrun lowerable)."""
    import jax.numpy as jnp

    from virus_nerf_tpu.ops.common import pallas_kernels
    from virus_nerf_tpu.ops.segment_sum_pallas import group_segment_sum_t

    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.normal(size=(2, 256, 16)).astype(np.float32))
    keys = jnp.asarray(rng.integers(0, 64, size=(2, 256)).astype(np.int32))
    with pallas_kernels(False):
        out = np.asarray(group_segment_sum_t(vals, keys, 64))
    ref = np.zeros((2, 16, 64), np.float32)
    v, k = np.asarray(vals), np.asarray(keys)
    for g in range(2):
        for i in range(256):
            ref[g, :, k[g, i]] += v[g, i]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
