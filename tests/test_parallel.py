"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np

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
