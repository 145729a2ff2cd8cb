"""Utility-layer tests: interpolation/smoothing/convergence helpers, USS
stats tracker, deployment export, density-slice inference."""

import numpy as np
import pytest

from virus_nerf_tpu.utils import (
    combine_imgs,
    convolve_ignore_nans,
    data_converged,
    depth2img,
    downsample_data,
    lin_interpolate_array,
    lin_interpolate_nans,
    sensor_id2name,
    sensor_name2id,
    smooth_ignore_nans,
)


class TestInterpolation:
    def test_lin_interpolate_array(self):
        x1 = np.array([0.0, 1.0, 2.0])
        y1 = np.array([0.0, 10.0, 20.0])
        y2 = lin_interpolate_array(x1, y1, np.array([0.5, 1.5]))
        np.testing.assert_allclose(y2, [5.0, 15.0])
        # out of range: nan vs nearest
        out = lin_interpolate_array(x1, y1, np.array([-1.0, 3.0]))
        assert np.all(np.isnan(out))
        out = lin_interpolate_array(
            x1, y1, np.array([-1.0, 3.0]), border_condition="nearest"
        )
        np.testing.assert_allclose(out, [0.0, 20.0])

    def test_lin_interpolate_nans(self):
        arr = np.array([1.0, np.nan, np.nan, 4.0])
        np.testing.assert_allclose(
            lin_interpolate_nans(arr), [1.0, 2.0, 3.0, 4.0]
        )

    def test_convolve_ignore_nans(self):
        arr = np.array([1.0, np.nan, 3.0, 4.0])
        k = np.array([1.0])
        np.testing.assert_allclose(
            convolve_ignore_nans(arr, k), [1.0, 2.0, 3.0, 4.0]
        )

    def test_smooth_short_array_passthrough(self):
        arr = np.array([1.0, 2.0])
        np.testing.assert_allclose(smooth_ignore_nans(arr, 5), arr)

    def test_data_converged(self):
        arr = np.array([0.1, 0.5, 0.9, 0.95, 0.97])
        assert data_converged(arr, 0.8, data_increasing=True) == 2
        assert data_converged(arr, 2.0, data_increasing=True) == -1
        arr_dec = np.array([1.0, 0.5, 0.2, 0.1])
        assert data_converged(arr_dec, 0.3, data_increasing=False) == 2

    def test_downsample(self):
        data = np.arange(8 * 4).reshape(8 * 4)[:, None].astype(float)
        (out,) = downsample_data([data], num_imgs=8, num_imgs_downsampled=4)
        assert out.shape == (16, 1)

    def test_sensor_ids(self):
        assert sensor_name2id("CAM3") == 3
        assert sensor_id2name(1, "USS") == "USS1"


class TestPlottingHelpers:
    def test_combine_imgs(self):
        a = np.zeros((4, 4), bool)
        b = np.zeros((4, 4), bool)
        a[0, 0] = True
        b[0, 0] = True  # later layer wins
        b[1, 1] = True
        img = combine_imgs([a, b], ["red", "blue"])
        assert img.shape == (4, 4, 4)
        assert img[0, 0, 2] == 255 and img[0, 0, 0] == 0  # blue on top
        assert img[1, 1, 2] == 255

    def test_depth2img(self):
        d = np.linspace(0, 1, 16).reshape(4, 4)
        img = depth2img(d)
        assert img.shape == (4, 4, 3) and img.dtype == np.uint8


class TestUSSStats:
    def test_update_tracks_minimum(self):
        import jax.numpy as jnp

        from virus_nerf_tpu.data.uss_stats import (
            uss_stats_init,
            uss_stats_update,
        )

        stats = uss_stats_init(2, center_pix=5)
        mask = jnp.ones(10, bool)
        stats = uss_stats_update(
            stats,
            jnp.array([0, 0, 1]),
            jnp.array([2, 3, 4]),
            jnp.array([1.0, 0.5, 2.0]),
            mask,
        )
        assert float(stats.min_depth[0]) == 0.5
        assert int(stats.min_pix[0]) == 3
        assert float(stats.min_depth[1]) == 2.0
        # same-pixel refresh: depth may INCREASE when the tracked pixel is
        # re-observed (reference: sensor_uss.py:195-205)
        stats = uss_stats_update(
            stats, jnp.array([0]), jnp.array([3]), jnp.array([0.8]), mask
        )
        assert np.isclose(float(stats.min_depth[0]), 0.8)
        # other pixel with larger depth: no change
        stats = uss_stats_update(
            stats, jnp.array([0]), jnp.array([7]), jnp.array([5.0]), mask
        )
        assert np.isclose(float(stats.min_depth[0]), 0.8)
        assert int(stats.min_pix[0]) == 3

    def test_out_of_fov_ignored(self):
        import jax.numpy as jnp

        from virus_nerf_tpu.data.uss_stats import (
            uss_stats_init,
            uss_stats_update,
        )

        stats = uss_stats_init(1)
        mask = jnp.zeros(10, bool).at[5].set(True)
        stats = uss_stats_update(
            stats, jnp.array([0]), jnp.array([2]), jnp.array([0.1]), mask
        )
        assert not np.isfinite(float(stats.min_depth[0]))

    def test_closest_strategy_trains(self):
        """End-to-end: 'closest' sampling threads the tracker through the
        jitted train step."""
        import jax.numpy as jnp

        from virus_nerf_tpu.configs.config import Config
        from virus_nerf_tpu.data import make_synthetic_dataset
        from virus_nerf_tpu.training import Trainer

        cfg = Config()
        cfg.model.grid_type = "occ"
        cfg.model.grid_size = 16
        cfg.model.hash_levels = 4
        cfg.model.hash_log2_T = 12
        cfg.model.hash_max_res = 32
        cfg.training.batch_size = 128
        cfg.training.max_samples_per_ray = 16
        cfg.training.march_candidates = 64
        cfg.training.sensors = ["USS", "ToF"]
        cfg.training.sampling_strategy = {
            "imgs": "all",
            "pixs": {"closest": 0.2, "valid_uss": 0.4},
        }
        cfg.occ_grid.batch_size = 64
        ds, scene, _ = make_synthetic_dataset(n_images=4, img_wh=(24, 18))
        tr = Trainer(cfg, ds, scene=scene)
        st = tr.init_state()
        assert st.uss_stats is not None
        step = tr._get("train_step", tr._make_train_step)
        for _ in range(3):
            st, m = step(st, ds, jnp.float32(0.0))
        assert np.isfinite(float(m["loss"]))
        assert int(np.asarray(st.uss_stats.counts).sum()) > 0


class TestDeployment:
    def test_export_and_density_map(self, tmp_path):
        import jax

        from virus_nerf_tpu.models import NGPModel
        from virus_nerf_tpu.utils import (
            infer_density_map,
            save_deployment_model,
        )

        model = NGPModel(
            scale=0.5, levels=4, log2_T=12, max_res=32, grid_size=16
        )
        params = model.init(jax.random.PRNGKey(0))
        occ = np.random.default_rng(0).random((1, 16**3)).astype(np.float32)
        poses = np.zeros((3, 3, 4))
        path = save_deployment_model(
            model, params, occ, poses, str(tmp_path)
        )
        data = np.load(path, allow_pickle=True).item()
        assert data["poses"].shape == (3, 3, 4)
        assert data["model.density_bitfield"].shape == (16**3 // 8,)
        assert data["model.hash_encoder.params"].shape == (
            model.hash_spec.total_params,
        )
        # rgb params include the 13-row padding of the output layer
        w = model.rgb_net_width
        expected = (
            (16 + model.xyz_net_out_dim) * w + w * w + 16 * w
        )
        assert data["model.rgb_net.params"].shape == (expected,)

        dm = infer_density_map(
            model, params, res_map=32, height_c=0.0, num_avg_heights=2,
            tolerance_c=0.05, batch_size=512,
        )
        assert dm.shape == (32, 32) and np.all(np.isfinite(dm))
